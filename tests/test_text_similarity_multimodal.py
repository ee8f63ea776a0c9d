"""Text-analysis, ANN similarity, and multimodal operator tests."""

import numpy as np
import pytest

from lsh_project_spark.operators.multimodal import (
    audio_features,
    decode_image_stats,
    resize_images,
)
from lsh_project_spark.operators.similarity import (
    ann_topk_lsh,
    brute_force_topk,
    hyperplane_signatures,
)
from lsh_project_spark.operators.text import lang_id, quality_score, token_stats


DOCS = [
    (0, "the cat and the dog sat in the house for the night"),
    (1, "el perro y el gato en la casa por la noche los dos"),
    (2, "der hund und die katze in dem haus bei der nacht ist ein"),
    (3, "aaa bbb aaa bbb aaa bbb aaa bbb"),
]


def test_token_stats(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in token_stats(df).collect()}
    assert got[3]["n_tokens"] == 8
    assert got[3]["n_distinct_tokens"] == 2
    assert got[0]["n_chars"] == len(DOCS[0][1])


def test_quality_score(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in quality_score(df).collect()}
    assert got[3]["repetition_ratio"] == 0.75
    assert got[0]["stopword_ratio"] > got[1]["stopword_ratio"]
    assert 0 <= got[0]["alpha_ratio"] <= 1


def test_lang_id(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert got[0] == "en"
    assert got[1] == "es"
    assert got[2] == "de"


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.Generator(np.random.PCG64(17))
    base = rng.normal(size=(40, 64)).astype(np.float32)
    rows = []
    for i in range(40):
        v = base[i] / np.linalg.norm(base[i])
        rows.append((i, [float(x) for x in v]))
        # planted near neighbor
        nb = v + rng.normal(0, 0.08, 64).astype(np.float32)
        rows.append((i + 1000, [float(x) for x in nb]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_brute_force_topk_finds_planted(spark, vectors):
    q = vectors.filter("vec_id < 40").withColumnRenamed("vec_id", "query_id")
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in brute_force_topk(vectors, q, k=1).collect()
    }
    hits = sum(1 for (qid, rank), nid in got.items() if nid == qid + 1000)
    assert hits >= 38  # planted neighbor is rank-1 for nearly all


def test_ann_lsh_recall_vs_brute_force(spark, vectors):
    q = vectors.filter("vec_id < 40").withColumnRenamed("vec_id", "query_id")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(vectors, q, k=1).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk_lsh(vectors, q, dim=64, k=1, num_tables=8, bits=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9


def test_hyperplane_signatures_deterministic(spark, vectors):
    a = sorted(map(tuple, hyperplane_signatures(vectors, 64).collect()))
    b = sorted(map(tuple, hyperplane_signatures(vectors, 64).collect()))
    assert a == b


def test_decode_stats_and_resize(spark):
    from lsh_project_spark.sources.fixtures import images_table

    imgs = images_table(spark, num_clusters=4, seed=3).cache()
    stats = decode_image_stats(imgs).collect()
    assert len(stats) == imgs.count()
    for r in stats:
        assert 0 <= r["mean_r"] <= 255 and r["stddev"] > 0
    small = resize_images(imgs.limit(3), factor=2).collect()
    for r in small:
        assert r["w"] == 32 and r["h"] == 32
        from lsh_project_spark.sources.codecs import decode_image

        assert decode_image(bytes(r["bytes"]), r["fmt"]).shape == (32, 32, 3)


def test_audio_stub_raises(spark):
    df = spark.createDataFrame([("c1", bytearray(b"xx"))], "clip_id string, bytes binary")
    import py4j

    with pytest.raises(Exception):
        audio_features(df).collect()
