"""Text-analysis operators for training-data pipelines.

No reference analog (the reference is pure vector LSH); these are the
standard corpus-curation passes a 100 TB text/image-caption pipeline runs
alongside dedup.  All are pure JVM column expressions (whole-stage codegen,
no Python), each with a DuckDB-expressible twin for the oracle gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# tiny built-in stopword/profile tables (public knowledge, language-ID by
# stopword hit-rate; the container has no langdetect libs)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "de": ("der", "die", "und", "das", "von", "mit", "den", "ist", "des", "ein"),
    "fr": ("le", "la", "les", "de", "des", "et", "est", "une", "dans", "pour"),
}


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, chars, and a
    BPE-ish subword estimate (ceil(chars/4) per token, the common ~4
    chars/token heuristic) — all JVM expressions."""
    toks = f"split({text_col}, ' ')"
    return docs.select(
        F.col(id_col),
        F.expr(f"size({toks})").alias("n_tokens"),
        F.expr(f"size(array_distinct({toks}))").alias("n_distinct_tokens"),
        F.expr(f"length({text_col})").alias("n_chars"),
        F.expr(
            f"aggregate({toks}, cast(0 as bigint), "
            f"(acc, t) -> acc + cast(ceil(length(t) / 4.0) as bigint))"
        ).alias("n_subwords_est"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality scoring: mean word length, stopword ratio,
    alphabetic ratio, repetition ratio (1 - distinct/total tokens).
    Mirrors the usual Gopher/C4-style filters; JVM-only."""
    toks = f"split({text_col}, ' ')"
    en = ", ".join(f"'{w}'" for w in LANG_MARKERS["en"])
    return docs.select(
        F.col(id_col),
        F.expr(f"round(length({text_col}) / size({toks}), 4)").alias("mean_word_len"),
        F.expr(
            f"round(size(filter({toks}, t -> t in ({en}))) / size({toks}), 4)"
        ).alias("stopword_ratio"),
        F.expr(
            f"round(length(regexp_replace({text_col}, '[^a-zA-Z ]', '')) / "
            f"length({text_col}), 4)"
        ).alias("alpha_ratio"),
        F.expr(
            f"round(1.0 - size(array_distinct({toks})) / size({toks}), 4)"
        ).alias("repetition_ratio"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Language ID by stopword hit-rate over a 4-language marker table;
    deterministic argmax with language-code tie-break."""
    toks = f"split({text_col}, ' ')"
    hits = []
    for lang, words in sorted(LANG_MARKERS.items()):
        lst = ", ".join(f"'{w}'" for w in words)
        hits.append(
            f"struct(size(filter({toks}, t -> t in ({lst}))) as score, "
            f"'{lang}' as lang)"
        )
    # array_max on structs: max score, then max lang — invert lang for
    # deterministic *ascending* tie-break
    return docs.select(
        F.col(id_col),
        F.expr(
            "array_max(array("
            + ", ".join(hits)
            + ")).lang"
        ).alias("lang_pred"),
    )


def doc_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bottom_k: int = 8
) -> DataFrame:
    """Document fingerprinting: bottom-k sketch of word 3-shingle hashes
    (a rolling-hash winnowing analog that is exactly SQL-expressible).
    Two docs' fingerprints overlap iff they share low-hash shingles.

    Output is exploded to (doc_id, rank, hash) scalar rows — rank 1 = the
    smallest hash — so the sketch is canonical for row-wise comparison."""
    from ..functions.hashing import spark_hash62

    fp = docs.select(
        F.col(id_col),
        F.expr(
            f"slice(array_sort(transform({shingle_expr_sql(text_col, 3)}, "
            f"s -> {spark_hash62('s')})), 1, {bottom_k})"
        ).alias("fingerprint"),
    )
    return fp.select(
        id_col, F.posexplode("fingerprint").alias("pos", "hash")
    ).select(
        id_col, F.expr("cast(pos + 1 as bigint)").alias("rank"), "hash"
    )


def shingle_expr_sql(text_col: str, k: int) -> str:
    toks = f"split({text_col}, ' ')"
    return (
        f"case when size({toks}) <= {k} then array({text_col}) "
        f"else array_distinct(transform(sequence(0, size({toks}) - {k}), "
        f"i -> concat_ws(' ', slice({toks}, i + 1, {k})))) end"
    )


def _grams_expr(text_col: str, k: int) -> str:
    """Positional (non-distinct) word k-grams as a string array, empty when
    the document is shorter than k tokens."""
    toks = f"split({text_col}, ' ')"
    return (
        f"case when size({toks}) < {k} then array() "
        f"else transform(sequence(0, size({toks}) - {k}), "
        f"i -> concat_ws(' ', slice({toks}, i + 1, {k}))) end"
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style (Rae et al. '21 §A1.1) intra-document repetition
    filters, token-denominated: the occupancy of the most frequent word
    2-gram and the fraction of 5-gram positions that are duplicates.
    Training pipelines drop documents above thresholds on these (boiler-
    plate, keyword stuffing, generation loops).

    Both statistics are computed INSIDE one row via array_sort + a
    run-length fold — a pure JVM projection with zero shuffle, so the pass
    is an embarrassingly-parallel scan at any corpus size (no per-gram
    explode/groupBy; the gram space never leaves the row)."""
    runs2 = (
        "aggregate(array_sort(g2), named_struct("
        "'prev', cast(null as string), 'run', cast(0 as bigint), "
        "'best', cast(0 as bigint)), "
        "(a, x) -> named_struct('prev', x, "
        "'run', case when x <=> a.prev then a.run + 1 else cast(1 as bigint) end, "
        "'best', greatest(a.best, case when x <=> a.prev then a.run + 1 "
        "else cast(1 as bigint) end)), a -> a.best)"
    )
    dup5 = (
        "aggregate(array_sort(g5), named_struct("
        "'prev', cast(null as string), 'run', cast(0 as bigint), "
        "'dup', cast(0 as bigint)), "
        "(a, x) -> named_struct('prev', x, "
        "'run', case when x <=> a.prev then a.run + 1 else cast(1 as bigint) end, "
        "'dup', a.dup + case when x <=> a.prev then "
        "(case when a.run = 1 then cast(2 as bigint) else cast(1 as bigint) end) "
        "else cast(0 as bigint) end), a -> a.dup)"
    )
    return (
        docs.select(
            F.col(id_col),
            F.expr(f"size(split({text_col}, ' '))").cast("long").alias("n_tokens"),
            F.expr(_grams_expr(text_col, 2)).alias("g2"),
            F.expr(_grams_expr(text_col, 5)).alias("g5"),
        )
        .select(
            id_col,
            "n_tokens",
            F.expr(runs2).alias("top_2gram_count"),
            F.expr(dup5).alias("dup_5gram_positions"),
        )
        .select(
            id_col,
            "n_tokens",
            "top_2gram_count",
            "dup_5gram_positions",
            F.expr(
                "case when n_tokens >= 2 then top_2gram_count * 2.0 / n_tokens "
                "else cast(0 as double) end"
            ).alias("top_2gram_frac"),
            F.expr(
                "case when n_tokens >= 5 then "
                "dup_5gram_positions / cast(n_tokens - 4 as double) "
                "else cast(0 as double) end"
            ).alias("dup_5gram_frac"),
        )
    )
