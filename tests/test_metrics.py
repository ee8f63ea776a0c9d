"""Metrics module tests."""

from lsh_project_spark.metrics import bucket_occupancy, cluster_stats, pair_stats


def test_bucket_occupancy(spark):
    sigs = spark.createDataFrame(
        [(0, 0, 10, "a"), (0, 0, 10, "b"), (0, 0, 11, "c"),
         (1, 0, 10, "a"), (1, 0, 10, "b"), (1, 0, 10, "c")],
        "modality int, band int, bucket long, image_id string",
    )
    occ = bucket_occupancy(sigs)
    assert occ["0"]["buckets"] == 2
    assert occ["0"]["max_bucket"] == 2
    assert occ["0"]["rows_in_shared_buckets"] == 2
    assert occ["1"]["raw_pair_mass"] == 3  # 3 choose 2


def test_pair_stats(spark):
    cands = spark.createDataFrame([("a", "b"), ("a", "c"), ("b", "c"), ("x", "y")],
                                  "a string, b string")
    ver = spark.createDataFrame([("a", "b")], "a string, b string")
    s = pair_stats(cands, ver)
    assert s["candidate_pairs"] == 4 and s["verified_pairs"] == 1
    assert s["verify_selectivity"] == 0.25


def test_cluster_stats(spark):
    asg = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "c"), ("d", "d"), ("e", "d"), ("f", "d")],
        "image_id string, cluster_id string",
    )
    s = cluster_stats(asg)
    assert s["clusters"] == 3
    assert s["max_cluster"] == 3
    assert s["dup_groups"] == 2
    assert s["rows_in_dup_groups"] == 5
