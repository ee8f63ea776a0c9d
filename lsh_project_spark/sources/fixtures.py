"""Deterministic planted-cluster `images` fixture (FIXTURES.md §1).

Schema is the authoritative input_hint table:
(image_id string, bytes binary, w int, h int, fmt string, caption string,
 phash long) plus a `truth` side table (image_id, true_cluster_id).

Planted structure mirrors the reference's generators — perturbed copies of
base points (createQueries, /root/reference/src/main.cc:76-88) and
planted-at-distance points (/root/reference/falconn/random_benchmark.cc:211-229)
— recast as image/caption duplicates:

  variant 0: the base row itself
  variant 1: exact byte duplicate (same bytes, new id)
  variant 2: lossy re-encode at a different quality
  variant 3: small pixel noise (near-dup image)
  variant 4: caption token-substitution paraphrase (caption near-dup)
  variant 5: caption sharing a long substring (for the substring pass)
  variant 6+: combinations (noise + re-encode + paraphrase)

Every random draw is keyed by (seed, purpose, base_id, variant) via PCG64 —
independent of partition count and row order (FIXTURES.md §5).  Generation
runs distributed via ``mapInPandas`` over a ``spark.range`` of base ids.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from .codecs import encode_image, phash64

_VOCAB = (
    "sun moon river stone cloud forest amber quiet orbit ember glass field "
    "night harbor signal copper violet meadow spiral lantern crystal summit "
    "hollow breeze cinder willow marble falcon tundra prism nectar quartz"
).split()

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, true_cluster_id long"
)


def _rng(seed: int, *key: int) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64(list((seed,) + key)))


def _base_image(seed: int, base_id: int, size: int) -> np.ndarray:
    """Smooth-ish random RGB: coarse 8x8 palette upsampled + mild noise
    (pure random pixels would make every phash maximally far apart)."""
    r = _rng(seed, 0, base_id)
    coarse = r.integers(0, 256, size=(size // 8, size // 8, 3)).astype(np.float64)
    img = np.kron(coarse, np.ones((8, 8, 1)))
    img += r.normal(0, 5, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _base_caption(seed: int, base_id: int) -> list[str]:
    r = _rng(seed, 1, base_id)
    n = int(r.integers(8, 25))
    return [_VOCAB[i] for i in r.integers(0, len(_VOCAB), size=n)]


def _paraphrase(tokens: list[str], seed: int, base_id: int, variant: int) -> list[str]:
    """Substitute ~15% of tokens -> high but non-unit shingle Jaccard."""
    r = _rng(seed, 2, base_id, variant)
    out = list(tokens)
    n_sub = max(1, len(out) * 15 // 100)
    for pos in r.choice(len(out), size=n_sub, replace=False):
        out[pos] = _VOCAB[int(r.integers(0, len(_VOCAB)))]
    return out


def make_images_rows(
    base_ids: np.ndarray, seed: int = 42, size: int = 64
) -> pd.DataFrame:
    """Generate all rows for the given base (cluster) ids. Pure function of
    (seed, base_ids) — safe to call per-partition."""
    rows = []
    for base_id in base_ids.tolist():
        r = _rng(seed, 3, base_id)
        cluster_size = int(r.integers(1, 9))  # 1..8 per FIXTURES.md
        img = _base_image(seed, base_id, size)
        cap = _base_caption(seed, base_id)
        base_fmt = "png" if r.integers(0, 2) == 0 else "jpeg"
        base_quality = int(r.choice([75, 90]))
        base_bytes = encode_image(img, base_fmt, base_quality)
        for variant in range(cluster_size):
            fmt, quality, pix, cap_v = base_fmt, base_quality, img, cap
            v_bytes = None
            kind = variant % 6
            if variant == 0:
                v_bytes = base_bytes
            elif kind == 1:  # exact byte duplicate
                v_bytes = base_bytes
            elif kind == 2:  # lossy re-encode at different quality
                fmt, quality = "jpeg", (90 if base_quality == 75 else 75)
            elif kind == 3:  # pixel noise near-dup
                rn = _rng(seed, 4, base_id, variant)
                pix = np.clip(
                    img.astype(np.int64) + rn.integers(-8, 9, img.shape), 0, 255
                ).astype(np.uint8)
            elif kind == 4:  # caption paraphrase (image unchanged bytes)
                v_bytes = base_bytes
                cap_v = _paraphrase(cap, seed, base_id, variant)
            else:  # kind == 5: shared long substring in caption
                rn = _rng(seed, 5, base_id, variant)
                extra = [
                    _VOCAB[i] for i in rn.integers(0, len(_VOCAB), size=6)
                ]
                cap_v = extra + cap  # shares the full base caption as substring
                v_bytes = base_bytes
            if v_bytes is None:
                v_bytes = encode_image(pix, fmt, quality)
            # recompute phash from the bytes actually stored (decode round trip)
            from .codecs import decode_image

            ph = phash64(decode_image(v_bytes, fmt))
            rows.append(
                {
                    "image_id": f"img{base_id:07d}_{variant}",
                    "bytes": v_bytes,
                    "w": size,
                    "h": size,
                    "fmt": fmt,
                    "caption": " ".join(cap_v),
                    "phash": ph,
                    "true_cluster_id": base_id,
                }
            )
    return pd.DataFrame(rows)


def images_from_documents(docs, seed: int = 42, size: int = 64, tiles: int = 1):
    """Derive the authoritative input_hint `images` table deterministically
    from a driver-provided `documents` DataFrame (doc_id, text): pixels
    seeded by doc_id, caption = document text.  Docs with doc_id % 3 == 0
    get one planted near-duplicate variant, so the flagship dedup query has
    real work to do on /root/testdata.

    ``tiles > 1`` scales the table deterministically for benchmarking
    (FIXTURES.md §1 "bench may also tile this deterministically"): tile t>0
    reuses the base row's encoded bytes but perturbs phash (16 random bit
    flips, Hamming > tau vs every other tile) and caption (~40% token
    substitution, Jaccard < 0.5), so tiles form independent clusters with
    the same planted-duplicate structure.  Tile phash/caption are synthetic
    perturbations (not re-derived from bytes); the dedup pipeline consumes
    only (image_id, caption, phash)."""

    def _tile_phash(rn: np.random.Generator) -> int:
        # independent random phash per tile (bit-flip perturbations of the
        # base would leave every tile at cos 0.5 from its family — a
        # correlation structure real corpora don't have, which floods the
        # CP buckets with candidate pairs)
        v = int(rn.integers(0, 1 << 63)) | (int(rn.integers(0, 2)) << 63)
        return v - (1 << 64) if v >= (1 << 63) else v

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import decode_image

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                img = _base_image(seed, doc_id, size)
                fmt = "png" if doc_id % 2 == 0 else "jpeg"
                data = encode_image(img, fmt, 90)
                ph = phash64(decode_image(data, fmt))
                has_dup = doc_id % 3 == 0
                if has_dup:
                    rn = _rng(seed, 6, doc_id)
                    pix = np.clip(
                        img.astype(np.int64) + rn.integers(-6, 7, img.shape), 0, 255
                    ).astype(np.uint8)
                    d2 = encode_image(pix, "jpeg", 75)
                    ph2 = phash64(decode_image(d2, "jpeg"))
                for t in range(tiles):
                    if t == 0:
                        cap, p0, p1 = text, ph, (ph2 if has_dup else None)
                    else:
                        rt = _rng(seed, 7, doc_id, t)
                        toks = text.split(" ")
                        n_sub = max(1, len(toks) * 40 // 100)
                        for pos in rt.choice(len(toks), size=n_sub, replace=False):
                            toks[pos] = _VOCAB[int(rt.integers(0, len(_VOCAB)))]
                        cap = " ".join(toks)
                        p0 = _tile_phash(rt)
                        # dup variant: 2 extra flips off the tile phash
                        p1 = (p0 ^ (1 | (1 << 33))) if has_dup else None
                    cid = doc_id * 1000 + t
                    # tiles > 0 carry null bytes: the dedup pipeline reads
                    # only (image_id, caption, phash), and parquet column
                    # pruning means an unread binary column costs nothing —
                    # storing 10-100x duplicated image bytes in the sandbox
                    # would only burn disk, not change any measured work
                    rows.append(
                        {"image_id": f"img{doc_id:09d}_t{t}_0",
                         "bytes": data if t == 0 else None,
                         "w": size, "h": size, "fmt": fmt, "caption": cap,
                         "phash": p0, "true_cluster_id": cid}
                    )
                    if has_dup:
                        rows.append(
                            {"image_id": f"img{doc_id:09d}_t{t}_1",
                             "bytes": d2 if t == 0 else None,
                             "w": size, "h": size, "fmt": "jpeg", "caption": cap,
                             "phash": p1, "true_cluster_id": cid}
                        )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", "text").mapInPandas(gen, schema=IMAGES_SCHEMA)


def images_table(spark, num_clusters: int, seed: int = 42, size: int = 64,
                 partitions: int | None = None):
    """Distributed fixture: DataFrame with IMAGES_SCHEMA (truth column kept
    alongside; select it away to get the pure input table)."""
    parts = partitions or max(2, min(64, num_clusters // 32 or 2))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield make_images_rows(pdf["id"].to_numpy(), seed=seed, size=size)

    return (
        spark.range(0, num_clusters, 1, parts)
        .mapInPandas(gen, schema=IMAGES_SCHEMA)
    )


def images_portable(docs):
    """SQL-portable images table for the driver's oracle gate: every column
    is a JVM/DuckDB-expressible function of (doc_id, text), so the DuckDB
    oracle can reconstruct the identical table and check the FULL dedup
    pipeline (candidates -> verify -> connected components) hash-exactly.

    Structure (image_id = doc_id*1000 + variant):
      v0: every doc          caption = text, phash = hash60('img'||doc_id)
      v1: doc_id % 3 == 0    caption = text (identical), phash = v0 ^ 2 bits
                             -> verified via Hamming AND Jaccard; candidate
                                via all 16 MinHash bands (certainty: equal
                                captions give equal signatures)
      v2: doc_id % 5 == 0    caption = text, phash = hash62('alt'||doc_id)
                             -> verified via Jaccard only (random phash)
    Natural near-duplicate captions inside `documents` add further edges.

    The codec-derived fixture (images_from_documents) keeps the realistic
    pixel path for entry()/pytest; this one trades pixel realism for an
    exact cross-engine oracle."""
    import pyspark.sql.functions as F

    from ..functions.hashing import spark_hash62

    base_ph = spark_hash62("concat('img', doc_id)")
    alt_ph = spark_hash62("concat('alt', doc_id)")
    mask = 1 | (1 << 33)  # 2 flipped bits -> Hamming 2
    v0 = docs.select(
        F.expr("cast(doc_id * 1000 as bigint)").alias("image_id"),
        F.col("text").alias("caption"),
        F.expr(base_ph).alias("phash"),
    )
    v1 = docs.filter("doc_id % 3 = 0").select(
        F.expr("cast(doc_id * 1000 + 1 as bigint)").alias("image_id"),
        F.col("text").alias("caption"),
        F.expr(f"({base_ph}) ^ {mask}").alias("phash"),
    )
    v2 = docs.filter("doc_id % 5 = 0").select(
        F.expr("cast(doc_id * 1000 + 2 as bigint)").alias("image_id"),
        F.col("text").alias("caption"),
        F.expr(alt_ph).alias("phash"),
    )
    return v0.unionByName(v1).unionByName(v2)


def images_sized(docs, seed: int = 42):
    """Deterministic variable-size images for the multimodal decode gate:
    per document, size = 32 + (doc_id % 5) * 16 and fmt = png (even doc_id)
    / jpeg (odd) — a rule simple enough that the DuckDB oracle can PREDICT
    the decoded dimensions from doc_id alone, while the Spark side must
    round-trip real bytes through the self-built codecs to report them.
    Returns the input_hint schema (image_id=doc_id, bytes, w, h, fmt)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                size = 32 + (doc_id % 5) * 16
                fmt = "png" if doc_id % 2 == 0 else "jpeg"
                img = _base_image(seed, doc_id, size)
                rows.append(
                    {
                        "image_id": doc_id,
                        "bytes": encode_image(img, fmt, 90),
                        "w": size,
                        "h": size,
                        "fmt": fmt,
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(
        gen, schema="image_id long, bytes binary, w int, h int, fmt string"
    )


def clips_from_documents(docs):
    """Deterministic WAV-PCM clips for the audio gate: per document a mono
    16-bit 8 kHz clip of n = 800 + (doc_id % 5) * 400 samples with
    samples[i] = ((doc_id * 7919 + i * 104729) % 2003) - 1001 — a rule the
    DuckDB oracle reproduces exactly in SQL (all sums of squares are exact
    integers < 2^53, so RMS is bit-identical across engines), while the
    Spark side must round-trip real RIFF/WAVE bytes through the self-built
    codec (sources/codecs.py wav_encode/wav_decode)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import wav_encode

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 800 + (doc_id % 5) * 400
                i = np.arange(n, dtype=np.int64)
                s = ((doc_id * 7919 + i * 104729) % 2003) - 1001
                rows.append(
                    {
                        "clip_id": str(doc_id),
                        "bytes": wav_encode(s.astype(np.int16), 8000),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(
        gen, schema="clip_id string, bytes binary"
    )


def videos_from_documents(docs):
    """Deterministic uncompressed-AVI clips for the video gate: per
    document nf = 6 + (doc_id % 5) frames of w = 6 + (doc_id % 3) * 5 by
    h = 4 + (doc_id % 2) * 3 (widths 6/11/16 exercise all DIB row-padding
    cases) with px[f, y, x, c] = (doc_id*31 + f*17 + y*7 + x*3 + c*11)
    % 256 — a rule the DuckDB oracle reproduces exactly in SQL (pixel
    sums are exact integers), while the Spark side must round-trip real
    RIFF/AVI bytes through the self-built codec (sources/codecs.py
    avi_encode/avi_decode)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import avi_encode

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                nf = 6 + doc_id % 5
                w = 6 + (doc_id % 3) * 5
                h = 4 + (doc_id % 2) * 3
                f, y, x, c = np.ogrid[0:nf, 0:h, 0:w, 0:3]
                px = (
                    (doc_id * 31 + f * 17 + y * 7 + x * 3 + c * 11) % 256
                ).astype(np.uint8)
                rows.append(
                    {
                        "video_id": str(doc_id),
                        "bytes": avi_encode(px, fps=10),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(
        gen, schema="video_id string, bytes binary"
    )
