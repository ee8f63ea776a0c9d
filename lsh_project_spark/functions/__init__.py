"""Engine-level scalar/expression functions (portable across Spark and the
DuckDB oracle)."""

from .hashing import (
    PORTABLE_HASH_MOD,
    portable_hash60_py,
    spark_hash60,
    duckdb_hash60,
    minhash_params,
)

__all__ = [
    "PORTABLE_HASH_MOD",
    "portable_hash60_py",
    "spark_hash60",
    "duckdb_hash60",
    "minhash_params",
]
