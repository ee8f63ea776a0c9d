"""DuckDB oracle SQL generation shared pieces.

Each queries() entry in __spark_entry__.py pairs a Spark DataFrame plan with
ANSI SQL that DuckDB runs on the same parquet tables.  The portable hash
(functions/hashing.py) makes MinHash/SimHash stages bit-identical across
engines; this module renders the DuckDB side.
"""

from __future__ import annotations

from ..config import MinHashConfig
from ..functions.hashing import PORTABLE_HASH_MOD, duckdb_hash62, minhash_params

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
         {duckdb_hash62('shingle')} % 4294967296 AS h32
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


def duckdb_dedup_clusters_sql(
    mh_cfg: MinHashConfig,
    sim_cfg=None,
    hamming_tau: int = 6,
    jaccard_tau: float = 0.5,
    substring_min_len: int | None = 50,
    emit: str = "sizes",
) -> str:
    """DuckDB twin of the FULL dedup pipeline on the portable images table
    (sources/fixtures.images_portable): rebuild the identical table, derive
    MinHash + SimHash band collisions bit-exactly, add the exhaustive
    Hamming<=tau pair set (superset of CP-LSH candidates), verify with the
    engine's criterion, OR-union the exhaustive substring-duplicate pair
    set (two docs sharing any ``substring_min_len``-char gram — exactly the
    winnow->verify modality's accept set), resolve connected components
    with a recursive CTE, and emit the cluster-size histogram."""
    from ..config import SimHashConfig

    sim_cfg = sim_cfg or SimHashConfig()
    g = substring_min_len
    sub_union = "" if g is None else f"""
  UNION
  SELECT a, b FROM sub_edges"""
    sub_ctes = "" if g is None else f"""
sub_hex AS (
  -- byte-denominated gramming (hex doubles each octet): the engine
  -- winnows/verifies over UTF-8 bytes, so the oracle must too
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM imgs
),
sub_grams AS (
  SELECT doc_id, substring(hx, CAST(2 * i - 1 AS INT), {2 * g}) AS sg
  FROM sub_hex, LATERAL (
    SELECT unnest(range(1, n - {g} + 2)) AS i
  ) p
  WHERE n >= {g}
),
sub_edges AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM sub_grams x JOIN sub_grams y ON x.sg = y.sg AND x.doc_id < y.doc_id
),"""
    mask = 1 | (1 << 33)
    bpb, bph = sim_cfg.bits_per_band, sim_cfg.bands_per_hash
    band_mask = (1 << bpb) - 1
    mh = duckdb_minhash_bands_sql(mh_cfg, "imgs")
    sh = duckdb_simhash_sql(sim_cfg.num_bits, "imgs")
    k = mh_cfg.shingle_size
    return f"""
WITH RECURSIVE imgs AS (
  SELECT CAST(doc_id * 1000 AS BIGINT) AS doc_id, text,
         {duckdb_hash62("concat('img', doc_id)")} AS phash
  FROM documents
  UNION ALL
  SELECT CAST(doc_id * 1000 + 1 AS BIGINT), text,
         xor({duckdb_hash62("concat('img', doc_id)")}, {mask})
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT CAST(doc_id * 1000 + 2 AS BIGINT), text,
         {duckdb_hash62("concat('alt', doc_id)")}
  FROM documents WHERE doc_id % 5 = 0
),
mhb AS (SELECT * FROM ({mh})),
shf AS (SELECT * FROM ({sh})),
shb AS (
  SELECT doc_id, bb.b AS band_idx,
         (CASE WHEN bb.b < {bph} THEN simhash >> (bb.b * {bpb})
               ELSE simhash2 >> ((bb.b - {bph}) * {bpb}) END) & {band_mask}
           AS band_hash
  FROM shf, (SELECT unnest(range(0, {sim_cfg.num_bands})) AS b) bb
),
cand AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM mhb x JOIN mhb y
    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
   AND x.doc_id < y.doc_id
  UNION
  SELECT x.doc_id, y.doc_id
  FROM shb x JOIN shb y
    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
   AND x.doc_id < y.doc_id
  UNION
  SELECT x.doc_id, y.doc_id
  FROM imgs x JOIN imgs y ON x.doc_id < y.doc_id
  WHERE bit_count(xor(x.phash, y.phash)) <= {hamming_tau}
),
shs AS (
  SELECT doc_id,
    CASE WHEN len(t) <= {k} THEN [text]
         ELSE list_distinct([array_to_string(t[i + 1 : i + {k}], ' ')
                             for i in range(0, len(t) - {k} + 1)])
    END AS s
  FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM imgs)
),
feat AS (
  SELECT i.doc_id, i.phash, s.s FROM imgs i JOIN shs s USING (doc_id)
),{sub_ctes}
edges AS (
  SELECT c.a, c.b
  FROM cand c
  JOIN feat fa ON c.a = fa.doc_id
  JOIN feat fb ON c.b = fb.doc_id
  WHERE bit_count(xor(fa.phash, fb.phash)) <= {hamming_tau}
     OR CAST(len(list_intersect(fa.s, fb.s)) AS DOUBLE)
        / (len(fa.s) + len(fb.s) - len(list_intersect(fa.s, fb.s)))
        >= {jaccard_tau}{sub_union}
),
sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
walk(id, comp) AS (
  SELECT doc_id, doc_id FROM imgs
  UNION
  SELECT s.b, w.comp FROM walk w JOIN sym s ON s.a = w.id
),
labels AS (SELECT id, min(comp) AS cluster FROM walk GROUP BY id),
sizes AS (SELECT cluster, count(*) AS cluster_size FROM labels GROUP BY cluster)
{_DEDUP_EMIT[emit]}
"""


# final SELECT per gate over the shared full-pipeline CTE chain: the
# cluster-size histogram (dedup_cluster_sizes) or the keeper-per-cluster
# selection (dedup_representatives: max token count, tie min id — the
# engine's cluster_representatives min_by((-q, id)) policy)
_DEDUP_EMIT = {
    "sizes": """SELECT cluster_size, count(*) AS n_clusters
FROM sizes GROUP BY cluster_size ORDER BY cluster_size""",
    "representatives": """SELECT cluster_id, image_id, n_tokens, cluster_size
FROM (
  SELECT l.cluster AS cluster_id, i.doc_id AS image_id,
         CAST(len(string_split(i.text, ' ')) AS BIGINT) AS n_tokens,
         row_number() OVER (
           PARTITION BY l.cluster
           ORDER BY len(string_split(i.text, ' ')) DESC, i.doc_id ASC
         ) AS rn,
         count(*) OVER (PARTITION BY l.cluster) AS cluster_size
  FROM labels l JOIN imgs i ON l.id = i.doc_id
)
WHERE rn = 1 ORDER BY cluster_id""",
}


def duckdb_ann_topk_sql(
    planes: list[list[str]], k: int = 5, dim: int = 64,
    query_mod: int = 50, target_bucket: int = 8,
) -> str:
    """DuckDB twin of operators/similarity.ann_topk_portable: identical
    '+/-' hyperplane literals, identical integer bits-from-count formula
    (GREATEST(4, bit_length((n-1) // target))), sequential-order double
    dot products, exact cosine re-rank."""
    hp_rows = ", ".join(
        f"({t}, {j}, '{s}')"
        for t, tbl in enumerate(planes)
        for j, s in enumerate(tbl)
    )
    return f"""
WITH params AS (
  SELECT GREATEST(4, length(bin(CAST((count(*) - 1) // {target_bucket} AS BIGINT)))) AS bits
  FROM embeddings
),
hp(t, j, s) AS (SELECT * FROM (VALUES {hp_rows})),
sig AS (
  SELECT e.vec_id, h.t AS table_idx,
         CAST(sum(CASE WHEN list_sum([
             CASE WHEN substring(h.s, i + 1, 1) = '+'
                  THEN CAST(e.embedding[i + 1] AS DOUBLE)
                  ELSE -CAST(e.embedding[i + 1] AS DOUBLE) END
             for i in range(0, {dim})]) > 0
           THEN (CAST(1 AS BIGINT) << h.j) ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings e CROSS JOIN hp h
  WHERE h.j < (SELECT bits FROM params)
  GROUP BY e.vec_id, h.t
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, v.vec_id AS neighbor_id
  FROM sig q JOIN sig v ON q.table_idx = v.table_idx AND q.bucket = v.bucket
  WHERE q.vec_id % {query_mod} = 0 AND v.vec_id <> q.vec_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         list_dot_product(qe.embedding, ve.embedding)
           / (sqrt(list_dot_product(qe.embedding, qe.embedding))
              * sqrt(list_dot_product(ve.embedding, ve.embedding))) AS cos
  FROM cand c
  JOIN embeddings qe ON qe.vec_id = c.query_id
  JOIN embeddings ve ON ve.vec_id = c.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= {k}
"""


def duckdb_near_dup_sql(
    planes: list[list[str]], dim: int = 64, threshold: float = 0.85,
    plant_mod: int = 7, plant_offset: int = 1_000_000,
    target_bucket: int = 8,
) -> str:
    """DuckDB twin of operators/similarity.near_dup_pairs over the
    planted-twin embeddings table (plans/entry_queries._emb_near_dup):
    identical integer-derived perturbation doubles, identical '+/-'
    hyperplane literals and bits-from-count formula, candidate pairs from
    shared (table, bucket), exact cosine accept at ``threshold``.  The
    threshold decision has a wide margin on both engines (planted twins
    >= 0.99, random pairs <= ~0.6), so fold-order float differences
    cannot flip it."""
    hp_rows = ", ".join(
        f"({t}, {j}, '{s}')"
        for t, tbl in enumerate(planes)
        for j, s in enumerate(tbl)
    )
    return f"""
WITH aug AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         [CAST(embedding[i + 1] AS DOUBLE) for i in range(0, {dim})]
           AS embedding
  FROM embeddings
  UNION ALL
  SELECT CAST(vec_id + {plant_offset} AS BIGINT),
         [CAST(embedding[i + 1] AS DOUBLE)
            + (CAST((vec_id * 31 + i) % 11 AS DOUBLE) - 5.0) / 250.0
          for i in range(0, {dim})]
  FROM embeddings WHERE vec_id % {plant_mod} = 0
),
params AS (
  SELECT GREATEST(4, length(bin(CAST((count(*) - 1) // {target_bucket}
                                 AS BIGINT)))) AS bits
  FROM aug
),
hp(t, j, s) AS (SELECT * FROM (VALUES {hp_rows})),
sig AS (
  SELECT e.vec_id, h.t AS table_idx,
         CAST(sum(CASE WHEN list_sum([
             CASE WHEN substring(h.s, i + 1, 1) = '+'
                  THEN e.embedding[i + 1]
                  ELSE -e.embedding[i + 1] END
             for i in range(0, {dim})]) > 0
           THEN (CAST(1 AS BIGINT) << h.j) ELSE 0 END) AS BIGINT) AS bucket
  FROM aug e CROSS JOIN hp h
  WHERE h.j < (SELECT bits FROM params)
  GROUP BY e.vec_id, h.t
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sig a JOIN sig b ON a.table_idx = b.table_idx AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
),
scored AS (
  SELECT c.id_a, c.id_b,
         list_dot_product(ea.embedding, eb.embedding)
           / (sqrt(list_dot_product(ea.embedding, ea.embedding))
              * sqrt(list_dot_product(eb.embedding, eb.embedding))) AS cos
  FROM cand c
  JOIN aug ea ON ea.vec_id = c.id_a
  JOIN aug eb ON eb.vec_id = c.id_b
)
SELECT id_a, id_b FROM scored WHERE cos >= {threshold}
ORDER BY id_a, id_b
"""


def duckdb_cp_multiprobe_sql(rot, d: int = 8) -> str:
    """DuckDB twin of the margin-ranked single-swap multi-probe sequence
    (operators/signatures.cp_multiprobe_signature_table) at L=2, k=2,
    probes=3, over integer features and the same literal +-1 rotation
    matrices ``rot`` [L, k, d, d].  Every intermediate is exact integer
    arithmetic, so argmax tie rules (first index wins; positive sign wins
    at equal magnitude) and the margin sort (ties -> lower k first) are
    reproduced deterministically:

      probe 0: base bucket (h1 of both sub-hashes, (h_0 << cldim) | h_1)
      probe 1: swap the sub-hash with the SMALLER margin to its second hash
      probe 2: swap the other sub-hash
    """
    L, k = rot.shape[0], rot.shape[1]
    assert (L, k) == (2, 2), "gate SQL is written for L=2, k=2"
    cldim = (d - 1).bit_length() + 1
    shift = 1 << cldim
    m_rows = ", ".join(
        f"({t}, {kk}, {i}, {j}, {int(rot[t, kk, i, j])})"
        for t in range(L)
        for kk in range(k)
        for i in range(d)
        for j in range(d)
    )
    fexpr = duckdb_hash62(
        "concat('mp', CAST(doc_id AS VARCHAR), '_', CAST(j.j AS VARCHAR))"
    )
    return f"""
WITH f AS (
  SELECT doc_id, j.j AS j, ({fexpr}) % 201 - 100 AS x
  FROM documents, (SELECT unnest(range(0, {d})) AS j) j
),
m(t, k, i, j, w) AS (SELECT * FROM (VALUES {m_rows})),
yv AS (
  SELECT f.doc_id, m.t, m.k, m.i, CAST(sum(f.x * m.w) AS BIGINT) AS y
  FROM f JOIN m ON f.j = m.j
  GROUP BY f.doc_id, m.t, m.k, m.i
),
ranked AS (
  SELECT doc_id, t, k, i, y,
         row_number() OVER (PARTITION BY doc_id, t, k ORDER BY y DESC, i ASC) AS rp,
         row_number() OVER (PARTITION BY doc_id, t, k ORDER BY y ASC, i ASC) AS rn
  FROM yv
),
h1 AS (
  SELECT doc_id, t, k,
         CASE WHEN vpos >= vneg THEN ipos ELSE ineg + {d} END AS h1,
         CASE WHEN vpos >= vneg THEN ipos ELSE ineg END AS ax,
         CASE WHEN vpos >= vneg THEN vpos ELSE vneg END AS abs1
  FROM (
    SELECT doc_id, t, k,
           max(CASE WHEN rp = 1 THEN y END) AS vpos,
           max(CASE WHEN rp = 1 THEN i END) AS ipos,
           max(CASE WHEN rn = 1 THEN -y END) AS vneg,
           max(CASE WHEN rn = 1 THEN i END) AS ineg
    FROM ranked GROUP BY doc_id, t, k
  )
),
second AS (
  SELECT yv.doc_id, yv.t, yv.k, yv.i, yv.y, abs(yv.y) AS ay,
         row_number() OVER (PARTITION BY yv.doc_id, yv.t, yv.k
                            ORDER BY abs(yv.y) DESC, yv.i ASC) AS r2
  FROM yv JOIN h1 USING (doc_id, t, k)
  WHERE yv.i <> h1.ax
),
subh AS (
  SELECT h1.doc_id, h1.t, h1.k, h1.h1,
         s.h2, h1.abs1 - s.abs2 AS margin
  FROM h1 JOIN (
    SELECT doc_id, t, k,
           max(CASE WHEN r2 = 1
                    THEN i + CASE WHEN y < 0 THEN {d} ELSE 0 END END) AS h2,
           max(CASE WHEN r2 = 1 THEN ay END) AS abs2
    FROM second GROUP BY doc_id, t, k
  ) s USING (doc_id, t, k)
),
agg AS (
  SELECT doc_id, t,
         max(CASE WHEN k = 0 THEN h1 END) AS h1_0,
         max(CASE WHEN k = 1 THEN h1 END) AS h1_1,
         max(CASE WHEN k = 0 THEN h2 END) AS h2_0,
         max(CASE WHEN k = 1 THEN h2 END) AS h2_1,
         max(CASE WHEN k = 0 THEN margin END) AS m0,
         max(CASE WHEN k = 1 THEN margin END) AS m1
  FROM subh GROUP BY doc_id, t
)
SELECT doc_id, CAST(t AS BIGINT) AS table_idx,
       CAST(h1_0 * {shift} + h1_1 AS BIGINT) AS bucket
FROM agg
UNION ALL
SELECT doc_id, CAST(t AS BIGINT),
       CAST(CASE WHEN m0 <= m1 THEN h2_0 * {shift} + h1_1
                 ELSE h1_0 * {shift} + h2_1 END AS BIGINT)
FROM agg
UNION ALL
SELECT doc_id, CAST(t AS BIGINT),
       CAST(CASE WHEN m0 <= m1 THEN h1_0 * {shift} + h2_1
                 ELSE h2_0 * {shift} + h1_1 END AS BIGINT)
FROM agg
"""


def duckdb_simhash_sql(
    num_bits: int = 56, table: str = "documents", salt: str = "s2:"
) -> str:
    """DuckDB query: (doc_id, simhash, simhash2) matching
    operators/signatures.simhash_table (two independent SimHash
    fingerprints over distinct word-3-shingles; second = salted hash62)."""
    cfg = MinHashConfig(shingle_size=3)
    h_expr = duckdb_hash62("shingle")
    h2_expr = duckdb_hash62(f"('{salt}' || shingle)")
    return f"""
WITH {duckdb_shingles_cte(cfg, table)},
hashed AS (
  SELECT doc_id,
         ({h_expr} >> 4) AS h,
         ({h2_expr} >> 4) AS h2
  FROM shingled
),
votes AS (
  SELECT doc_id, b.b AS b,
         sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS vote,
         sum(CASE WHEN (h2 >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS vote2
  FROM hashed CROSS JOIN (SELECT unnest(range(0, {num_bits})) AS b) b
  GROUP BY doc_id, b.b
)
SELECT doc_id,
       CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
            AS BIGINT) AS simhash,
       CAST(sum(CASE WHEN vote2 > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
            AS BIGINT) AS simhash2
FROM votes
GROUP BY doc_id
"""
