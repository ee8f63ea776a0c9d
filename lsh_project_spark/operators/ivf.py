"""IVF (inverted-file) approximate nearest-neighbor search — the
coarse-quantizer scale path for similarity search, complementing the
sign-LSH path (operators/similarity.py).

Shape (classic IVF-Flat, cf. Jégou et al. '11 / FAISS):

1. **Fit** a small codebook of ``n_lists`` centroids with deterministic
   Lloyd iterations on a BOUNDED, hash-selected sample (the quantizer is
   a pretrained artifact, fit once on ~64k rows no matter the corpus
   size — never a corpus-wide iterative job).
2. **Assign** every corpus vector to its nearest centroid with one pure
   JVM fold expression (a projection: NO shuffle; at 100 TB the list id
   becomes the table's bucket/partition column, so probing prunes
   partitions instead of scanning).
3. **Probe**: each query ranks centroids, takes the ``nprobe`` nearest
   lists, and exact-reranks only those lists' members — per-query cost
   tracks ``nprobe / n_lists`` of the corpus, not n².

Everything is engine-portable: centroids are quantized to 6 decimals and
emitted as string->double CAST literals, all dot products are sequential
left-to-right double folds, and ties break on the lower index — so a
DuckDB oracle reproduces assignments, probe sets, and final rankings
bit-exactly (same discipline as ann_topk_portable / cp_multiprobe).

No reference analog (the reference is pure LSH: src/lsh.c); IVF is the
standard alternative scale path the task brief names.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.hashing import spark_hash62

IVF_QUANT_DECIMALS = 6


# --------------------------------------------------------------------- fit


def ivf_fit(X: np.ndarray, n_lists: int = 16, iters: int = 8) -> np.ndarray:
    """Deterministic Lloyd k-means in float64: init = evenly spaced rows of
    the (caller-ordered) sample, argmin ties -> lowest centroid index,
    empty lists keep their previous centroid.  Returns centroids quantized
    to IVF_QUANT_DECIMALS so they round-trip exactly through SQL literals
    in every engine."""
    X = np.asarray(X, dtype=np.float64)
    m = X.shape[0]
    if m < n_lists:
        raise ValueError(f"sample of {m} rows cannot seed {n_lists} lists")
    C = X[(np.arange(n_lists) * m) // n_lists].copy()
    for _ in range(iters):
        d2 = (
            (X * X).sum(axis=1, keepdims=True)
            - 2.0 * X @ C.T
            + (C * C).sum(axis=1)
        )
        a = d2.argmin(axis=1)  # ties -> lowest index
        for j in range(n_lists):
            members = X[a == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return np.round(C, IVF_QUANT_DECIMALS)


def ivf_fit_centroids(
    vectors: DataFrame,
    n_lists: int = 16,
    iters: int = 8,
    sample_cap: int = 65536,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n: int | None = None,
) -> np.ndarray:
    """Fit the codebook from a deterministic hash-selected sample of the
    corpus: keep rows where hash62(id) % ceil(n / cap) == 0 — a pure scan
    + filter (partition-independent, rerun-stable), collecting ~cap rows
    to the driver regardless of corpus size.  Sample order is id-sorted so
    the Lloyd init (and therefore the codebook) is unique for a given
    corpus."""
    if n is None:
        n = vectors.count()
    stride = max(1, -(-n // sample_cap))
    h = spark_hash62(f"cast({id_col} as string)")
    rows = (
        vectors.select(id_col, vec_col)
        .filter(F.expr(f"pmod({h}, {stride}) = 0"))
        .orderBy(id_col)
        .collect()
    )
    X = np.array([r[vec_col] for r in rows], dtype=np.float64)
    return ivf_fit(X, n_lists=n_lists, iters=iters)


# ---------------------------------------------------------------- literals


def _lit_d(v: float) -> str:
    """Engine-portable double literal: strtod of the shortest repr —
    identical bits in Spark and DuckDB."""
    return f"cast('{float(v)!r}' as double)"


def ivf_centroid_literals(cents: np.ndarray) -> tuple[str, str]:
    """(CENTS, C2) Spark SQL literals: array<array<double>> of centroids
    and array<double> of their squared norms.  C2 is precomputed HERE (in
    float64 over the quantized values) and emitted as a literal on both
    engines, so no cross-engine norm arithmetic exists at all."""
    cents = np.asarray(cents, dtype=np.float64)
    arrs = ", ".join(
        "array(" + ", ".join(_lit_d(v) for v in row) + ")" for row in cents
    )
    c2 = ", ".join(_lit_d(v) for v in (cents * cents).sum(axis=1))
    return f"array({arrs})", f"array({c2})"


def _score_expr(vec_col: str, cents_lit: str, c2_lit: str, idx: str) -> str:
    """Squared-L2 rank score |c|^2 - 2 v.c (|v|^2 dropped: constant per
    row) — sequential left-to-right double fold, the engine-portable
    accumulation order."""
    dot = (
        f"aggregate(zip_with({vec_col}, element_at({cents_lit}, {idx} + 1), "
        f"(x, y) -> cast(x as double) * y), cast(0 as double), "
        f"(a, v) -> a + v)"
    )
    return (
        f"(element_at({c2_lit}, {idx} + 1) - cast(2 as double) * ({dot}))"
    )


def ivf_assign_expr(vec_col: str, cents: np.ndarray) -> str:
    """0-based nearest-centroid index as ONE fold expression — a pure
    projection (no shuffle, no explode): strict '<' keeps the lowest
    index on ties, matching the oracle's ORDER BY (score, i)."""
    cents_lit, c2_lit = ivf_centroid_literals(cents)
    score = _score_expr(vec_col, cents_lit, c2_lit, "i")
    return (
        f"aggregate(sequence(0, {len(cents) - 1}), "
        f"named_struct('bi', -1, 'bs', cast('Infinity' as double)), "
        f"(acc, i) -> case when {score} < acc.bs "
        f"then named_struct('bi', i, 'bs', {score}) else acc end, "
        f"acc -> acc.bi)"
    )


# ------------------------------------------------------------------ search


def ivf_assign(
    vectors: DataFrame, cents: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Corpus side: + list_id column.  At warehouse scale this is the
    write-time bucketing column — probes then prune partitions."""
    return vectors.withColumn(
        "list_id", F.expr(ivf_assign_expr(vec_col, cents))
    )


def ivf_probes(
    queries: DataFrame,
    cents: np.ndarray,
    nprobe: int,
    qid_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, list_id) for each query's nprobe nearest centroids.
    The query set is small by definition, so explode x n_lists + a window
    is cheap; ties break on centroid index."""
    cents_lit, c2_lit = ivf_centroid_literals(cents)
    score = _score_expr("qv", cents_lit, c2_lit, "i")
    w = Window.partitionBy(qid_col).orderBy("s", "i")
    return (
        queries.select(F.col(qid_col), F.col(vec_col).alias("qv"))
        .select(
            qid_col,
            "qv",
            F.posexplode(F.expr(cents_lit)).alias("i", "_c"),
        )
        .select(qid_col, "qv", "i", F.expr(score).alias("s"))
        .withColumn("pr", F.row_number().over(w))
        .filter(F.col("pr") <= nprobe)
        .select(qid_col, "qv", F.col("i").alias("list_id"))
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    cents: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
) -> DataFrame:
    """IVF-Flat top-k: probe nprobe lists, exact cosine re-rank within
    them.  The (small) probe side is broadcast into an equi-join on
    list_id, so the corpus-side cost is a scan of the probed lists only —
    never a cross join, and per-query work tracks nprobe/n_lists of the
    corpus."""
    assigned = ivf_assign(vectors.select(id_col, vec_col), cents, vec_col)
    probes = ivf_probes(queries, cents, nprobe, qid_col, vec_col)
    dot = (
        f"aggregate(zip_with(qv, {vec_col}, (x, y) -> cast(x as double) * "
        f"cast(y as double)), cast(0 as double), (acc, v) -> acc + v)"
    )
    nq = (
        "sqrt(aggregate(transform(qv, x -> cast(x as double) * cast(x as double)), "
        "cast(0 as double), (acc, v) -> acc + v))"
    )
    nd = (
        f"sqrt(aggregate(transform({vec_col}, x -> cast(x as double) * "
        f"cast(x as double)), cast(0 as double), (acc, v) -> acc + v))"
    )
    scored = (
        assigned.join(F.broadcast(probes), "list_id")
        .filter(F.col(qid_col) != F.col(id_col))
        .select(
            qid_col,
            F.col(id_col).alias("neighbor_id"),
            F.expr(f"({dot}) / (({nq}) * ({nd}))").alias("cos"),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", "neighbor_id")
    )


# ------------------------------------------------------------------ oracle


def duckdb_ivf_topk_sql(
    cents: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    query_mod: int = 50,
) -> str:
    """DuckDB twin of ivf_topk over the pre-registered `embeddings` view
    with queries = vec_id % query_mod == 0: identical centroid literals,
    identical fold arithmetic (list_dot_product over DOUBLE[] is the same
    left-to-right accumulation), identical tie rules."""
    cents = np.asarray(cents, dtype=np.float64)
    rows = ", ".join(
        "({}, [{}]::DOUBLE[], CAST('{!r}' AS DOUBLE))".format(
            i,
            ", ".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in row),
            float((row * row).sum()),
        )
        for i, row in enumerate(cents)
    )
    return f"""
WITH cents(i, c, c2) AS (VALUES {rows}),
emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
assigned AS (
  SELECT vec_id, v, i AS list_id
  FROM emb CROSS JOIN cents
  QUALIFY row_number() OVER (
    PARTITION BY vec_id ORDER BY c2 - 2.0 * list_dot_product(v, c), i) = 1
),
queries AS (SELECT vec_id AS query_id, v AS qv FROM emb
            WHERE vec_id % {query_mod} = 0),
probes AS (
  SELECT query_id, qv, i AS list_id
  FROM queries CROSS JOIN cents
  QUALIFY row_number() OVER (
    PARTITION BY query_id ORDER BY c2 - 2.0 * list_dot_product(qv, c), i)
    <= {nprobe}
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         list_dot_product(p.qv, a.v)
           / (sqrt(list_dot_product(p.qv, p.qv))
              * sqrt(list_dot_product(a.v, a.v))) AS cos
  FROM probes p JOIN assigned a USING (list_id)
  WHERE p.query_id <> a.vec_id
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id
FROM (SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
WHERE rank <= {k}
ORDER BY query_id, rank
"""
