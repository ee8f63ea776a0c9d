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


def test_wav_roundtrip_mono_stereo_bits():
    """RIFF/WAVE PCM encode -> decode is exact for 16-bit signed (mono and
    stereo) and 8-bit unsigned, including odd-length (word-padded) data."""
    import numpy as np

    from lsh_project_spark.sources.codecs import wav_decode, wav_encode

    rng = np.random.Generator(np.random.PCG64(99))
    mono = rng.integers(-32768, 32768, size=1001).astype(np.int16)
    out, rate = wav_decode(wav_encode(mono, 8000))
    assert rate == 8000 and out.shape == (1001, 1)
    assert np.array_equal(out[:, 0], mono)

    stereo = rng.integers(-32768, 32768, size=(500, 2)).astype(np.int16)
    out, rate = wav_decode(wav_encode(stereo, 44100))
    assert rate == 44100 and np.array_equal(out, stereo)

    u8 = rng.integers(0, 256, size=333).astype(np.uint8)  # odd byte count
    out, rate = wav_decode(wav_encode(u8, 16000, bits=8))
    assert rate == 16000 and np.array_equal(out[:, 0], u8)


def test_wav_decode_skips_unknown_chunks():
    """A LIST/INFO chunk between fmt and data (common in real WAV files)
    must be skipped by the chunk walker."""
    import struct

    import numpy as np

    from lsh_project_spark.sources.codecs import wav_decode, wav_encode

    data = wav_encode(np.arange(-50, 50, dtype=np.int16), 8000)
    # splice an unknown chunk right after the fmt chunk (ends at 12+8+16)
    cut = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 7) + b"INFOxyz" + b"\x00"  # padded
    spliced = data[:cut] + junk + data[cut:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    out, rate = wav_decode(spliced)
    assert rate == 8000
    assert np.array_equal(out[:, 0], np.arange(-50, 50))


def test_audio_features_matches_direct_computation(spark):
    """audio_features over real WAV bytes == duration/RMS/zero-crossings
    computed directly from the PCM samples."""
    import numpy as np

    from lsh_project_spark.operators.multimodal import audio_features
    from lsh_project_spark.sources.codecs import wav_encode

    rng = np.random.Generator(np.random.PCG64(7))
    clips, expect = [], {}
    for cid in range(5):
        n = 800 + cid * 321
        s = rng.integers(-20000, 20000, size=n).astype(np.int16)
        clips.append((str(cid), bytearray(wav_encode(s, 8000))))
        sf = s.astype(np.float64)
        expect[str(cid)] = (
            n / 8000,
            round(float(np.sqrt(np.mean(sf * sf))), 6),
            int(np.count_nonzero(sf[:-1] * sf[1:] < 0)),
        )
    df = spark.createDataFrame(clips, "clip_id string, bytes binary")
    got = {
        r["clip_id"]: (r["duration_sec"], r["rms"], r["zero_crossings"])
        for r in audio_features(df).collect()
    }
    assert got == expect
