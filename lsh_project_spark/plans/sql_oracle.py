"""DuckDB oracle SQL generation shared pieces.

Each queries() entry in __spark_entry__.py pairs a Spark DataFrame plan with
ANSI SQL that DuckDB runs on the same parquet tables.  The portable hash
(functions/hashing.py) makes MinHash/SimHash stages bit-identical across
engines; this module renders the DuckDB side.
"""

from __future__ import annotations

from ..config import MinHashConfig
from ..functions.hashing import PORTABLE_HASH_MOD, minhash_params

P = PORTABLE_HASH_MOD


def perms_values(cfg: MinHashConfig) -> str:
    """VALUES list (perm, a, b, c, band_idx) for the MinHash family."""
    a, b, c = minhash_params(cfg.num_perm, cfg.seed)
    rows = ", ".join(
        f"({i}, {int(a[i])}, {int(b[i])}, {int(c[i])}, {i // cfg.rows_per_band})"
        for i in range(cfg.num_perm)
    )
    return f"(VALUES {rows}) AS p(perm, a, b, c, band_idx)"


def duckdb_shingles_cte(cfg: MinHashConfig, table: str = "documents") -> str:
    """CTE producing (doc_id, shingle): distinct word k-shingles, matching
    operators/signatures.shingle_expr exactly (<=k tokens -> whole text)."""
    k = cfg.shingle_size
    return f"""
toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS t FROM {table}
),
sh AS (
  SELECT doc_id,
    CASE WHEN len(t) <= {k} THEN [text]
         ELSE list_distinct([array_to_string(t[i + 1 : i + {k}], ' ')
                             for i in range(0, len(t) - {k} + 1)])
    END AS shs
  FROM toks
),
shingled AS (
  SELECT doc_id, unnest(shs) AS shingle FROM sh
)"""


def duckdb_minhash_bands_sql(cfg: MinHashConfig, table: str = "documents") -> str:
    """Full DuckDB query: (doc_id, band_idx, band_hash)."""
    return f"""
WITH {duckdb_shingles_cte(cfg, table)},
hashed AS (
  SELECT doc_id,
         cast(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) % 4294967296 AS h32
  FROM shingled
),
mh AS (
  SELECT h.doc_id, p.perm, p.band_idx, p.c,
         min((p.a * h.h32 + p.b) % {P}) AS mh
  FROM hashed h CROSS JOIN {perms_values(cfg)}
  GROUP BY h.doc_id, p.perm, p.band_idx, p.c
)
SELECT doc_id, band_idx,
       CAST(sum(((mh % 4294967296) * c) % {P}) AS BIGINT) AS band_hash
FROM mh
GROUP BY doc_id, band_idx
"""


def duckdb_simhash_sql(num_bits: int = 56, table: str = "documents") -> str:
    """DuckDB query: (doc_id, simhash) matching operators/signatures.simhash_table
    (SimHash over distinct word-3-shingles)."""
    cfg = MinHashConfig(shingle_size=3)
    return f"""
WITH {duckdb_shingles_cte(cfg, table)},
hashed AS (
  SELECT doc_id,
         cast(('0x' || substring(md5(shingle), 1, 14)) AS BIGINT) AS h
  FROM shingled
),
votes AS (
  SELECT doc_id, b.b AS b,
         sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM hashed CROSS JOIN (SELECT unnest(range(0, {num_bits})) AS b) b
  GROUP BY doc_id, b.b
)
SELECT doc_id,
       CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
            AS BIGINT) AS simhash
FROM votes
GROUP BY doc_id
"""
