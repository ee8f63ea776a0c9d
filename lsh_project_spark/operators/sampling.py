"""Deterministic sampling/splitting for training-data pipelines: hash-based
train/val/test splits and per-stratum sampling (e.g. by language or quality
band) — the selection a 100 TB corpus assembly job runs after dedup.

Everything is a pure JVM expression over ``hash62('<salt>' || key)``
(functions/hashing.py — the engine's portable two-lane Rabin-Karp), so:

- selection is a FUNCTION OF THE ROW KEY: independent of partitioning,
  row order, cluster size, and rerun (unlike ``df.sample``, whose
  per-partition RNG changes with the split layout);
- adding data never reshuffles old assignments (a doc keeps its split
  forever — the property training pipelines need to avoid train/test
  contamination across corpus versions);
- the same literal arithmetic runs in DuckDB, so the driver gate checks
  the sampled SET hash-exactly (not just its size);
- different ``salt`` values give independent selections (split vs sample
  vs subsample never correlate).

Rates are quantized to integer thresholds out of DENOM=1_000_000 in
Python, so both engines compare against identical integer literals.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.hashing import spark_hash62

DENOM = 1_000_000


def _bucket_sql(key_expr: str, salt: str) -> str:
    """Uniform bucket in [0, DENOM) from the row key — Spark rendering."""
    h = spark_hash62(f"concat('{salt}', cast({key_expr} as string))")
    return f"pmod({h}, {DENOM})"


def hash_split(
    df: DataFrame,
    splits: dict[str, float],
    key_col: str,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Label every row with a split name; fractions must sum to 1.
    Deterministic, partition-independent, stable under corpus growth."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    cum = 0.0
    arms = []
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name]
        arms.append(f"WHEN _b < {int(round(cum * DENOM))} THEN '{name}'")
    case = (
        "CASE " + " ".join(arms) + f" ELSE '{names[-1]}' END"
    )
    return (
        df.withColumn("_b", F.expr(_bucket_sql(key_col, salt)))
        .withColumn(out_col, F.expr(case))
        .drop("_b")
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_col: str,
    salt: str = "sample",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability — exactly (same key +
    salt + rate always decides the same way), via one JVM expression, no
    shuffle.  Strata missing from ``rates`` use ``default_rate``."""
    arms = " ".join(
        f"WHEN {stratum_col} = '{s}' THEN {int(round(r * DENOM))}"
        for s, r in sorted(rates.items())
    )
    thresh = f"CASE {arms} ELSE {int(round(default_rate * DENOM))} END"
    return df.filter(F.expr(f"({_bucket_sql(key_col, salt)}) < ({thresh})"))


def duckdb_bucket_sql(key_expr: str, salt: str) -> str:
    """DuckDB twin of _bucket_sql (same literals, same arithmetic)."""
    from ..functions.hashing import duckdb_hash62

    h = duckdb_hash62(f"concat('{salt}', CAST({key_expr} AS VARCHAR))")
    return f"(({h}) % {DENOM})"
