"""Engine-level scalar/expression functions (portable across Spark and the
DuckDB oracle)."""

from .hashing import (
    PORTABLE_HASH_MOD,
    portable_hash62_py,
    portable_hash62_np,
    spark_hash62,
    duckdb_hash62,
    hash62_pandas_udf,
    minhash_params,
)

__all__ = [
    "PORTABLE_HASH_MOD",
    "portable_hash62_py",
    "portable_hash62_np",
    "spark_hash62",
    "duckdb_hash62",
    "hash62_pandas_udf",
    "minhash_params",
]
