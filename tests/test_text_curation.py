"""repetition_stats / decontaminate: crafted-document ground truth and
scale-shape invariants (zero-shuffle fold; broadcast semi-join)."""

import pyspark.sql.functions as F

from lsh_project_spark.operators.decontam import benchmark_grams, decontaminate
from lsh_project_spark.operators.text import repetition_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_crafted(spark):
    docs = _docs(
        spark,
        [
            # "a b" occurs 3x among 5 2-grams; both 5-grams distinct
            (1, "a b a b a b"),
            # 5-gram "x y z w v" at positions 1 and 6 -> 2 dup positions of 6
            (2, "x y z w v x y z w v"),
            # no repetition at all
            (3, "p q r s t u"),
            # shorter than any gram
            (4, "solo"),
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert got[1]["top_2gram_count"] == 3
    assert got[1]["top_2gram_frac"] == 3 * 2.0 / 6
    assert got[1]["dup_5gram_positions"] == 0
    assert got[2]["dup_5gram_positions"] == 2
    assert got[2]["dup_5gram_frac"] == 2 / 6
    assert got[3]["top_2gram_count"] == 1
    assert got[3]["dup_5gram_positions"] == 0
    assert got[4] == {
        "doc_id": 4,
        "n_tokens": 1,
        "top_2gram_count": 0,
        "dup_5gram_positions": 0,
        "top_2gram_frac": 0.0,
        "dup_5gram_frac": 0.0,
    }


def test_repetition_stats_is_shuffle_free(spark):
    """The whole pass must plan as a projection — no exchange: the gram
    space never leaves the row, which is what makes it a pure scan at
    100 TB."""
    docs = _docs(spark, [(1, "a b c d e f g h")])
    plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_decontaminate_counts_distinct_shared_grams(spark):
    bench = _docs(spark, [(100, "b1 b2 b3 b4 b5 b6 b7 b8 b9")])
    docs = _docs(
        spark,
        [
            # contains benchmark gram positions 1 and 2 -> 2 distinct hits
            (1, "x b1 b2 b3 b4 b5 b6 b7 b8 b9 y"),
            # repeats ONE benchmark gram twice -> still 1 (distinct)
            (2, "b1 b2 b3 b4 b5 b6 b7 b8 z b1 b2 b3 b4 b5 b6 b7 b8"),
            # clean
            (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
        ],
    )
    got = {r["doc_id"]: r["n_contaminated_grams"]
           for r in decontaminate(docs, bench, n=8).collect()}
    assert got == {1: 2, 2: 1}


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark side must enter the plan as a broadcast join — the
    corpus never shuffles for the match."""
    bench = _docs(spark, [(100, "b1 b2 b3 b4 b5 b6 b7 b8")])
    docs = _docs(spark, [(1, "b1 b2 b3 b4 b5 b6 b7 b8 t")])
    plan = (
        decontaminate(docs, bench, n=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_benchmark_grams_distinct(spark):
    bench = _docs(spark, [(1, "w w w w w w w w w")])  # 2 positions, 1 gram
    assert benchmark_grams(bench, n=8).count() == 1
