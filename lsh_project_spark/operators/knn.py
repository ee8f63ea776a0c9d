"""The reference's query path as a DataFrame plan: CP-LSH probe -> exact
verify -> top-1 (SURVEY.md §3.2, /root/reference/src/main.cc:369-408).

Candidates come from an equi-join of query signatures against the data
signature table on (table_idx, bucket); every candidate is verified with
the exact inner product (batched numpy); the answer per query is the
argmax candidate across all tables (max_by with first-index tie-break).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..config import CrossPolytopeConfig
from .signatures import cp_multiprobe_signature_table, cp_signature_table


def cp_nearest_neighbor(
    data: DataFrame, queries: DataFrame, cfg: CrossPolytopeConfig,
    id_col: str = "id", qid_col: str = "qid", vec_col: str = "features",
    probes: int = 1,
) -> DataFrame:
    """(qid, nn_id): approximate NN by cross-polytope LSH + exact re-rank.

    ``probes > 1`` probes that many buckets per (query, table) — the base
    bucket plus the lowest-margin sub-hash swaps (multi-probe LSH): recall
    per table rises without touching the data-side signature table."""
    dsig = cp_signature_table(
        data.select(F.col(id_col), F.col(vec_col)), cfg, id_col=id_col
    )
    qin = queries.select(F.col(qid_col).alias(id_col), F.col(vec_col))
    if probes <= 1:
        qsig = cp_signature_table(qin, cfg, id_col=id_col)
    else:
        qsig = cp_multiprobe_signature_table(qin, cfg, probes, id_col=id_col)
    qsig = qsig.withColumnRenamed(id_col, qid_col)

    cands = (
        qsig.join(dsig, ["table_idx", "bucket"])
        .select(qid_col, id_col)
        .dropDuplicates([qid_col, id_col])
    )
    joined = (
        cands.join(queries.select(qid_col, F.col(vec_col).alias("qv")), qid_col)
        .join(data.select(id_col, F.col(vec_col).alias("dv")), id_col)
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.vstack(pdf["qv"].to_numpy()).astype(np.float64)
            d = np.vstack(pdf["dv"].to_numpy()).astype(np.float64)
            out = pdf[[qid_col, id_col]].copy()
            out["score"] = np.einsum("bd,bd->b", q, d)
            yield out

    qid_type = dict(queries.dtypes)[qid_col]
    id_type = dict(data.dtypes)[id_col]
    scored = joined.mapInPandas(
        score, schema=f"{qid_col} {qid_type}, {id_col} {id_type}, score double"
    )
    return scored.groupBy(qid_col).agg(
        F.expr(f"min_by({id_col}, struct(-score, {id_col}))").alias("nn_id")
    )
