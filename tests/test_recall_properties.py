"""Recall-vs-distance property tests on controlled-distance planted queries
(the FALCONN benchmark's query model, r = sqrt(2)/2 —
/root/reference/falconn/random_benchmark.cc:211-229) and multi-probe gains."""

import numpy as np
import pytest

from lsh_project_spark.config import CrossPolytopeConfig
from lsh_project_spark.operators.knn import cp_nearest_neighbor
from lsh_project_spark.operators.signatures import (
    cp_multiprobe_signature_table,
    cp_signature_table,
)
from lsh_project_spark.sources.vectors import (
    planted_distance_queries,
    random_unit_vectors,
)

R_FALCONN = 0.7071067811865476  # sqrt(2)/2


@pytest.fixture(scope="module")
def planted_fixture(spark):
    n, d, q = 4096, 64, 256
    data = random_unit_vectors(spark, n, d, seed=31337).cache()
    data.count()
    return data, n, d, q


def _recall_at(spark, data, n, d, q, r, cfg, probes=1):
    queries = planted_distance_queries(spark, data, q, d, n, r=r)
    truth = {row["qid"]: row["planted_id"] for row in queries.collect()}
    pred = {
        row["qid"]: row["nn_id"]
        for row in cp_nearest_neighbor(data, queries, cfg, probes=probes).collect()
    }
    return sum(1 for qid, pid in truth.items() if pred.get(qid) == pid) / len(truth)


def test_planted_distance_is_exact(spark, planted_fixture):
    data, n, d, q = planted_fixture
    queries = planted_distance_queries(spark, data, 64, d, n, r=R_FALCONN)
    base = {r["id"]: np.array(r["features"]) for r in data.collect()}
    for row in queries.collect():
        qv = np.array(row["features"], dtype=np.float64)
        x = base[row["planted_id"]]
        assert abs(np.linalg.norm(qv) - 1.0) < 1e-5
        assert abs(np.linalg.norm(qv - x) - R_FALCONN) < 1e-5


def test_recall_decreases_with_distance(spark, planted_fixture):
    data, n, d, q = planted_fixture
    cfg = CrossPolytopeConfig(dim=d, k=1, num_tables=4)
    r_near = _recall_at(spark, data, n, d, q, 0.3, cfg)
    r_mid = _recall_at(spark, data, n, d, q, R_FALCONN, cfg)
    r_far = _recall_at(spark, data, n, d, q, 1.1, cfg)
    assert r_near >= 0.95, r_near
    # LSH is monotone in distance (small slack for sampling noise)
    assert r_near >= r_mid - 0.02 and r_mid >= r_far - 0.02, (r_near, r_mid, r_far)
    assert r_near > r_far, (r_near, r_far)


def test_multiprobe_improves_recall(spark, planted_fixture):
    data, n, d, q = planted_fixture
    cfg = CrossPolytopeConfig(dim=d, k=2, num_tables=4)
    r1 = _recall_at(spark, data, n, d, q, R_FALCONN, cfg, probes=1)
    r3 = _recall_at(spark, data, n, d, q, R_FALCONN, cfg, probes=3)
    assert r3 > r1 + 0.03, (r1, r3)


def test_multiprobe_base_bucket_matches_single_probe(spark, planted_fixture):
    data, *_ = planted_fixture
    cfg = CrossPolytopeConfig(dim=64, k=2, num_tables=4)
    sample = data.limit(200)
    single = {
        (r["id"], r["table_idx"]): r["bucket"]
        for r in cp_signature_table(sample, cfg, id_col="id").collect()
    }
    multi = cp_multiprobe_signature_table(sample, cfg, probes=3, id_col="id")
    probe0 = {}
    for r in multi.collect():
        key = (r["id"], r["table_idx"])
        # first probe per (id, table) is the base bucket; collect() preserves
        # within-partition order and probes are emitted base-first
        probe0.setdefault(key, r["bucket"])
    assert probe0 == single


def test_broadcast_nn_matches_join_path(spark, planted_fixture):
    from lsh_project_spark.operators.knn import (
        cp_nearest_neighbor,
        cp_nearest_neighbor_broadcast,
    )

    data, n, d, q = planted_fixture
    queries = planted_distance_queries(spark, data, 128, d, n, r=0.5)
    cfg = CrossPolytopeConfig(dim=d, k=1, num_tables=4)
    join_path = {
        r["qid"]: r["nn_id"]
        for r in cp_nearest_neighbor(data, queries, cfg).collect()
    }
    bcast_path = {
        r["qid"]: r["nn_id"]
        for r in cp_nearest_neighbor_broadcast(data, queries, cfg).collect()
    }
    # same buckets, same verify: identical answers wherever the join path
    # found any candidate (the broadcast path answers every query)
    for qid, nn in join_path.items():
        assert bcast_path[qid] == nn, qid
    assert len(bcast_path) == 128
