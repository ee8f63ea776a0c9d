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


def test_avi_roundtrip_all_padding_cases():
    """Encode -> decode is identity across widths that hit every DIB
    row-padding residue (w*3 % 4 in {0, 1, 2, 3}) and frame counts."""
    from lsh_project_spark.sources.codecs import avi_decode, avi_encode

    rng = np.random.Generator(np.random.PCG64(11))
    for w, h, nf, fps in [(6, 4, 3, 10), (11, 7, 5, 25), (16, 4, 1, 30),
                          (7, 2, 4, 10), (1, 1, 2, 15)]:
        fr = rng.integers(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
        dec, got_fps = avi_decode(avi_encode(fr, fps))
        assert dec.shape == fr.shape and got_fps == fps
        assert np.array_equal(dec, fr), (w, h, nf)


def test_avi_layout_is_spec_conformant():
    """Structural spec checks a third-party RIFF parser would rely on:
    RIFF/'AVI ' magic, LIST hdrl with a 56-byte avih carrying
    width/height/frame count, LIST movi with one word-aligned '00db'
    chunk per frame of exactly stride*h bytes."""
    import struct

    from lsh_project_spark.sources.codecs import avi_encode

    w, h, nf = 11, 4, 3
    data = avi_encode(np.zeros((nf, h, w, 3), dtype=np.uint8), fps=10)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    # first child: LIST hdrl, whose first child is avih (56 bytes)
    assert data[12:16] == b"LIST" and data[20:24] == b"hdrl"
    assert data[24:28] == b"avih"
    assert struct.unpack("<I", data[28:32])[0] == 56
    avih = struct.unpack("<14I", data[32:88])
    assert (avih[4], avih[8], avih[9]) == (nf, w, h)
    # movi list holds nf '00db' chunks of stride*h bytes each
    stride = (w * 3 + 3) & ~3
    movi_at = data.find(b"movi")
    assert movi_at > 0
    pos, seen = movi_at + 4, 0
    while seen < nf:
        assert data[pos : pos + 4] == b"00db"
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        assert size == stride * h
        pos += 8 + size + size % 2
        seen += 1


def test_avi_decode_rejects_compressed():
    import struct

    from lsh_project_spark.sources.codecs import avi_encode, avi_decode

    data = bytearray(avi_encode(np.zeros((1, 2, 2, 3), dtype=np.uint8)))
    strf_at = bytes(data).find(b"strf")
    # biCompression lives 16 bytes into BITMAPINFOHEADER
    struct.pack_into("<I", data, strf_at + 8 + 16, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="BI_RGB"):
        avi_decode(bytes(data))


def test_video_frame_sample_feeds_image_path(spark):
    """video_frame_sample emits every n-th frame as real PNG bytes that
    the image codec decodes back to the original pixels — the video ->
    image-dedup bridge."""
    from lsh_project_spark.operators.multimodal import video_frame_sample
    from lsh_project_spark.sources.codecs import avi_encode, png_decode

    rng = np.random.Generator(np.random.PCG64(3))
    vids, frames_by_id = [], {}
    for vid in range(3):
        nf = 5 + vid
        fr = rng.integers(0, 256, size=(nf, 6, 11, 3), dtype=np.uint8)
        frames_by_id[str(vid)] = fr
        vids.append((str(vid), bytearray(avi_encode(fr, 10))))
    df = spark.createDataFrame(vids, "video_id string, bytes binary")
    out = video_frame_sample(df, every_n=2).collect()
    assert {(r["video_id"], r["frame_idx"]) for r in out} == {
        (str(v), i) for v in range(3) for i in range(0, 5 + v, 2)
    }
    for r in out:
        px = png_decode(bytes(r["frame_bytes"]))
        assert np.array_equal(px, frames_by_id[r["video_id"]][r["frame_idx"]])


def test_video_frame_stats_matches_direct_computation(spark):
    from lsh_project_spark.operators.multimodal import video_frame_stats
    from lsh_project_spark.sources.codecs import avi_encode

    rng = np.random.Generator(np.random.PCG64(5))
    fr = rng.integers(0, 256, size=(7, 4, 6, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [("v", bytearray(avi_encode(fr, 10)))], "video_id string, bytes binary"
    )
    got = {r["frame_idx"]: r for r in video_frame_stats(df, every_n=3).collect()}
    assert set(got) == {0, 3, 6}
    for idx in (0, 3, 6):
        s = int(fr[idx].astype(np.int64).sum())
        r = got[idx]
        assert (r["w"], r["h"], r["px_sum"]) == (6, 4, s)
        assert r["mean_px"] == round(s / (6 * 4 * 3), 6)
