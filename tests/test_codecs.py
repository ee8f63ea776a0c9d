"""Codec + pHash unit tests (SURVEY.md §5.2 'invariants')."""

import numpy as np
import pytest

from lsh_project_spark.sources import codecs as C


def _img(seed=1, size=64, smooth=True):
    rng = np.random.Generator(np.random.PCG64(seed))
    if smooth:
        coarse = rng.integers(0, 256, size=(size // 8, size // 8, 3)).astype(float)
        img = np.kron(coarse, np.ones((8, 8, 1))) + rng.normal(0, 5, (size, size, 3))
        return np.clip(img, 0, 255).astype(np.uint8)
    return rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)


def test_png_roundtrip_lossless():
    img = _img(smooth=False)
    assert (C.png_decode(C.png_encode(img)) == img).all()


def test_png_deterministic():
    img = _img()
    assert C.png_encode(img) == C.png_encode(img)


@pytest.mark.parametrize("quality", [75, 90])
@pytest.mark.parametrize("smooth", [True, False])
def test_lossy_psnr_invariant(quality, smooth):
    """BASELINE.json input_hint: PSNR >= 40 dB for lossy formats."""
    img = _img(smooth=smooth)
    dec = C.lossy_decode(C.lossy_encode(img, quality))
    assert C.psnr(img, dec) >= 40.0


def test_lossy_is_actually_lossy():
    img = _img(smooth=False)
    dec = C.lossy_decode(C.lossy_encode(img, 75))
    assert (dec != img).any()


def test_phash_deterministic_and_robust():
    img = _img(seed=7)
    ph = C.phash64(img)
    assert ph == C.phash64(img.copy())
    # stable under mild noise and re-encode
    rng = np.random.Generator(np.random.PCG64(9))
    noisy = np.clip(img.astype(int) + rng.integers(-5, 6, img.shape), 0, 255).astype(
        np.uint8
    )
    ham = bin((ph ^ C.phash64(noisy)) & (2**64 - 1)).count("1")
    assert ham <= 6
    reenc = C.lossy_decode(C.lossy_encode(img, 75))
    ham2 = bin((ph ^ C.phash64(reenc)) & (2**64 - 1)).count("1")
    assert ham2 <= 6
    # distinct images far apart
    other = _img(seed=8)
    ham3 = bin((ph ^ C.phash64(other)) & (2**64 - 1)).count("1")
    assert ham3 > 10


def test_phash_to_vector_unit_norm():
    v = C.phash_to_vector(np.array([123456789, -42, 0]))
    assert v.shape == (3, 64)
    assert np.allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-6)
