"""hash_split / stratified_sample: determinism, partition independence,
fraction accuracy, stability under corpus growth."""

import pytest

from lsh_project_spark.operators.sampling import hash_split, stratified_sample


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 5000).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 3 = 0 THEN 'en' WHEN id % 3 = 1 THEN 'de' "
        "ELSE 'fr' END AS lang",
    )


def test_split_exhaustive_disjoint_and_sized(docs):
    out = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").count().withColumnRenamed(
                  "count", "n").collect()}
    assert sum(counts.values()) == 5000  # exhaustive, disjoint by CASE
    assert abs(counts["train"] / 5000 - 0.8) < 0.02
    assert abs(counts["val"] / 5000 - 0.1) < 0.01
    assert abs(counts["test"] / 5000 - 0.1) < 0.01


def test_split_partition_independent_and_stable(docs):
    splits = {"train": 0.8, "val": 0.2}
    a = {(r["doc_id"], r["split"])
         for r in hash_split(docs, splits, "doc_id").collect()}
    b = {(r["doc_id"], r["split"])
         for r in hash_split(docs.repartition(17), splits, "doc_id").collect()}
    assert a == b
    # stability under growth: the first 1000 docs keep their labels when
    # 4000 more arrive (no train/test contamination across corpus versions)
    small = {(r["doc_id"], r["split"]) for r in
             hash_split(docs.filter("doc_id < 1000"), splits,
                        "doc_id").collect()}
    assert small == {(d, s) for d, s in a if d < 1000}


def test_split_fractions_must_sum_to_one(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, {"train": 0.8, "val": 0.1}, "doc_id")


def test_stratified_rates(docs):
    out = stratified_sample(
        docs, {"en": 1.0, "de": 0.3, "fr": 0.0}, "lang", "doc_id"
    )
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").count().withColumnRenamed(
               "count", "n").collect()}
    n_en = docs.filter("lang = 'en'").count()
    n_de = docs.filter("lang = 'de'").count()
    assert got.get("en") == n_en          # rate 1.0 keeps everything
    assert "fr" not in got                # rate 0.0 drops everything
    assert abs(got["de"] / n_de - 0.3) < 0.03


def test_stratified_salt_independent_of_split(docs):
    """The sample selection and the split labels use different salts, so
    sampling does not bias split membership."""
    sampled = stratified_sample(docs, {"en": 0.5}, "lang", "doc_id")
    out = hash_split(sampled, {"train": 0.8, "val": 0.2}, "doc_id")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").count().withColumnRenamed(
                  "count", "n").collect()}
    total = sum(counts.values())
    assert abs(counts["train"] / total - 0.8) < 0.04


def test_pack_documents_prefix_scan_matches_global(spark):
    """The distributed two-phase prefix scan equals a single global cumsum
    for any partition count, and chunk ranges tile the corpus."""
    import pyspark.sql.functions as F

    from lsh_project_spark.operators.packing import pack_documents

    docs = spark.range(0, 997).selectExpr(
        "id AS doc_id",
        # 1..40 whitespace tokens, deterministic in id
        "array_join(transform(sequence(1, 1 + cast(id % 40 as int)), "
        "x -> 'w'), ' ') AS text",
    )
    want = None
    for P in (1, 4, 13):
        got = sorted(
            (r["doc_id"], r["n_tokens"], r["first_chunk"], r["last_chunk"])
            for r in pack_documents(docs, ctx_len=256,
                                    num_partitions=P).collect()
        )
        if want is None:
            want = got
        assert got == want, P
    # tiling: consecutive docs' chunk ranges never skip a chunk (the next
    # doc starts in the previous doc's last chunk, or the very next chunk
    # when the previous doc ended exactly on a ctx_len boundary), and
    # first_chunk is monotone non-decreasing in doc order
    prev_last = 0
    for _, n, first, last in want:
        assert first <= last
        assert first in (prev_last, prev_last + 1)
        assert prev_last <= last
        prev_last = last
