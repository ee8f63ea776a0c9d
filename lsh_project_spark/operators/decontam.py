"""Benchmark decontamination: flag corpus documents that share any word
n-gram with a held-out benchmark/eval set (the standard pre-training
scrub that keeps test-set text out of the training corpus; cf. the
13-gram overlap rule popularized by GPT-3 appendix C).

Scale shape (the part that matters at 100 TB): the benchmark side is
always tiny relative to the corpus (MBs of eval prompts vs TBs of
corpus), so its distinct gram set is **broadcast** — the corpus is
scanned once, grams are generated inside the row (a JVM ``transform``
over the token array, no explode of the corpus into a shuffle), and the
semi-join + per-doc count happen map-side with a partial aggregate.  No
corpus-sized shuffle exists in the plan.

No reference analog (the reference is pure vector LSH); this is a
corpus-curation pass the same pipeline runs alongside dedup.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .text import _grams_expr


def benchmark_grams(
    bench: DataFrame, n: int = 8, text_col: str = "text"
) -> DataFrame:
    """Distinct word n-grams of the benchmark set — one column ``gram``."""
    return (
        bench.select(F.explode(F.expr(_grams_expr(text_col, n))).alias("gram"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_contaminated_grams) for every corpus document sharing at
    least one word ``n``-gram with ``bench`` — the rows a training run
    must drop.  ``n_contaminated_grams`` counts DISTINCT shared grams.

    The corpus side explodes its grams only logically (generate → explode
    → immediately semi-joined against a broadcast hash set); Catalyst
    keeps the whole match map-side, so cost is one corpus scan."""
    bg = F.broadcast(benchmark_grams(bench, n, text_col))
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(F.expr(f"array_distinct({_grams_expr(text_col, n)})")).alias(
            "gram"
        ),
    )
    return (
        doc_grams.join(bg, "gram")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_contaminated_grams"))
    )
