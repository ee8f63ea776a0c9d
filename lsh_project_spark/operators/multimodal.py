"""Multimodal binary-column operators.

Images/audio/video ride as opaque ``binary`` columns with typed metadata
(the input_hint schema).  ALL THREE modalities decode for real here with
pure-numpy self-built codecs (sources/codecs.py): PNG/lossy-DCT for
images, RIFF/WAVE PCM for audio, and uncompressed RIFF/AVI (BI_RGB DIB
frames) for video.  Sampled video frames re-encode as PNG rows, so a
video modality joins the image dedup path (phash64 -> CP-LSH) the same
way still images do.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..sources.codecs import area_resize, decode_image, encode_image, gray


def decode_image_stats(images: DataFrame) -> DataFrame:
    """(image_id, bytes, fmt) -> decoded dimensions (FROM the pixel array,
    not metadata), per-channel means + stddev + a simple sharpness proxy
    (mean |laplacian|); the canonical decode+feature pass."""
    id_type = dict(images.dtypes)["image_id"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(data), fmt).astype(np.float64)
                g = gray(px)
                lap = np.abs(
                    4 * g[1:-1, 1:-1]
                    - g[:-2, 1:-1] - g[2:, 1:-1] - g[1:-1, :-2] - g[1:-1, 2:]
                )
                rows.append(
                    {
                        "image_id": image_id,
                        "w": px.shape[1],
                        "h": px.shape[0],
                        "fmt": fmt,
                        "mean_r": round(float(px[..., 0].mean()), 4),
                        "mean_g": round(float(px[..., 1].mean()), 4),
                        "mean_b": round(float(px[..., 2].mean()), 4),
                        "stddev": round(float(px.std()), 4),
                        "sharpness": round(float(lap.mean()), 4),
                    }
                )
            yield pd.DataFrame(rows)

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run,
        schema=f"image_id {id_type}, w int, h int, fmt string, "
        "mean_r double, mean_g double, mean_b double, "
        "stddev double, sharpness double",
    )


def resize_images(images: DataFrame, factor: int = 2) -> DataFrame:
    """Downsample by an integer factor (area mean) and re-encode in the
    same format; returns the input_hint schema with updated bytes/w/h."""
    id_type = dict(images.dtypes)["image_id"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode_image(bytes(r.bytes), r.fmt)
                h, w, _ = px.shape
                small = np.stack(
                    [area_resize(px[..., ch].astype(np.float64), h // factor)
                     for ch in range(3)],
                    axis=-1,
                )
                small = np.clip(np.round(small), 0, 255).astype(np.uint8)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "bytes": encode_image(small, r.fmt, 90),
                        "w": w // factor,
                        "h": h // factor,
                        "fmt": r.fmt,
                    }
                )
            yield pd.DataFrame(rows)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, schema=f"image_id {id_type}, bytes binary, w int, h int, fmt string"
    )


AUDIO_FEATURES_SCHEMA = "clip_id string, duration_sec double, rms double, zero_crossings long"
VIDEO_FRAMES_SCHEMA = "video_id string, frame_idx int, frame_bytes binary"


def audio_features(clips: DataFrame) -> DataFrame:
    """(clip_id, bytes) -> duration / RMS / zero-crossing count, decoding
    RIFF/WAVE PCM with the self-built pure-numpy codec
    (sources/codecs.py wav_decode — RIFF needs no external library, same
    discipline as the PNG codec).  Multi-channel clips are analyzed on the
    channel mean.  A zero crossing is a strict sign change between
    consecutive samples (s[i-1] * s[i] < 0)."""
    from ..sources.codecs import wav_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for clip_id, data in zip(pdf["clip_id"], pdf["bytes"]):
                samples, rate = wav_decode(bytes(data))
                s = samples.mean(axis=1) if samples.shape[1] > 1 else (
                    samples[:, 0].astype(np.float64)
                )
                n = len(s)
                rows.append(
                    {
                        "clip_id": clip_id,
                        "duration_sec": n / rate,
                        "rms": round(float(np.sqrt(np.mean(s * s))), 6)
                        if n else 0.0,
                        "zero_crossings": int(
                            np.count_nonzero(s[:-1] * s[1:] < 0)
                        ),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[
                    "clip_id", "duration_sec", "rms", "zero_crossings"
                ],
            )

    return clips.select("clip_id", "bytes").mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )


def video_frame_sample(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """(video_id, bytes) -> every ``every_n``-th frame, re-encoded as a
    standalone PNG (the lossless self-built codec), decoding uncompressed
    AVI with the pure-numpy RIFF walker (sources/codecs.py avi_decode —
    AVI is RIFF like WAV; BI_RGB DIB frames need no codec library).
    Sampled frames feed the image dedup path (phash64 -> CP-LSH), which
    is how a video modality joins the pipeline at scale: frames become
    rows of the images table."""
    from ..sources.codecs import avi_decode, png_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for video_id, data in zip(pdf["video_id"], pdf["bytes"]):
                frames, _fps = avi_decode(bytes(data))
                for idx in range(0, frames.shape[0], every_n):
                    rows.append(
                        {
                            "video_id": video_id,
                            "frame_idx": idx,
                            "frame_bytes": png_encode(frames[idx]),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["video_id", "frame_idx", "frame_bytes"]
            )

    return videos.select("video_id", "bytes").mapInPandas(
        run, schema=VIDEO_FRAMES_SCHEMA
    )


VIDEO_STATS_SCHEMA = (
    "video_id string, frame_idx int, w int, h int, px_sum long, mean_px double"
)


def video_frame_stats(videos: DataFrame, every_n: int = 3) -> DataFrame:
    """(video_id, bytes) -> per-sampled-frame dimensions + exact pixel sum
    + mean, from real AVI decode.  ``px_sum`` is an exact integer
    (<= 255 * w * h * 3 per frame), so a SQL oracle that regenerates the
    frame pixels from a closed-form rule matches bit-exactly."""
    from ..sources.codecs import avi_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for video_id, data in zip(pdf["video_id"], pdf["bytes"]):
                frames, _fps = avi_decode(bytes(data))
                nf, h, w, _ = frames.shape
                for idx in range(0, nf, every_n):
                    s = int(frames[idx].astype(np.int64).sum())
                    rows.append(
                        {
                            "video_id": video_id,
                            "frame_idx": idx,
                            "w": w,
                            "h": h,
                            "px_sum": s,
                            "mean_px": round(s / (w * h * 3), 6),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "video_id", "frame_idx", "w", "h", "px_sum", "mean_px"
                ],
            )

    return videos.select("video_id", "bytes").mapInPandas(
        run, schema=VIDEO_STATS_SCHEMA
    )
