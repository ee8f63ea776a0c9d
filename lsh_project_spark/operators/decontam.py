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

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _distinct_gram_rows(
    df: DataFrame, n: int, text_col: str, id_col: str | None
) -> DataFrame:
    """Per-document DISTINCT word n-grams as rows — one Arrow map stage.
    Rounds <= 6 generated grams with an interpreted JVM ``transform`` +
    ``concat_ws`` per gram (HOF lambdas run outside codegen); a C-speed
    set of token-tuple joins per doc is ~3x cheaper (guide §4.2).  Gram
    strings are identical (tokens cannot contain the separator)."""
    import pandas as pd

    cols = ([id_col] if id_col else []) + [text_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids_out, grams_out = [], []
            texts = pdf[text_col].fillna("")
            ids = pdf[id_col] if id_col else None
            for i, t in enumerate(texts):
                toks = t.split(" ")
                if len(toks) < n:
                    continue
                gset = {
                    " ".join(toks[j : j + n])
                    for j in range(len(toks) - n + 1)
                }
                grams_out.extend(gset)
                if id_col:
                    ids_out.extend([ids.iloc[i]] * len(gset))
            out = {id_col: ids_out} if id_col else {}
            out["gram"] = grams_out
            yield pd.DataFrame(out)

    if id_col:
        id_type = dict(df.dtypes)[id_col]
        schema = f"{id_col} {id_type}, gram string"
    else:
        schema = "gram string"
    return df.select(*cols).mapInPandas(run, schema=schema)


def benchmark_grams(
    bench: DataFrame, n: int = 8, text_col: str = "text"
) -> DataFrame:
    """Distinct word n-grams of the benchmark set — one column ``gram``."""
    return _distinct_gram_rows(bench, n, text_col, id_col=None).distinct()


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

    The corpus side generates per-doc distinct grams inside the scan's
    record batch (no corpus-sized shuffle) and is immediately semi-joined
    against the broadcast benchmark gram set; the per-doc count happens
    map-side with a partial aggregate."""
    bg = F.broadcast(benchmark_grams(bench, n, text_col))
    doc_grams = _distinct_gram_rows(docs, n, text_col, id_col=id_col)
    return (
        doc_grams.join(bg, "gram")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_contaminated_grams"))
    )
