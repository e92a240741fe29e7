"""Persisted positional index (r04 structural fix): the phrase family
must read a bucket-partitioned positions table, never re-tokenize the
corpus at query time, and the build-side positions table must round-trip
through write_index/load_index byte-identically with the query-side
derivation."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_phrase_plan_reads_persisted_positions(spark):
    """Both q_phrase physical paths scan the positions parquet with a
    bucket PartitionFilter and contain NO corpus scan / re-tokenize
    (no documents.parquet, no regexp_replace, no posexplode Generate):
    the local gather path's ONE probe scan, and the >cap distributed
    join fallback."""
    from pysearch import phrase

    phrase.positions_table(spark, SF_SMOKE)  # warm the store
    for df in (phrase._pair_scan(spark, SF_SMOKE, "merge", "sort"),
               phrase._phrase_pair_join(spark, SF_SMOKE,
                                        "merge", "sort", 0)):
        plan = _plan_of(df)
        assert "documents.parquet" not in plan
        assert "regexp_replace" not in plan.lower()
        # bucket pruning: equality legs print "isnotnull(bucket…",
        # the IN-list probe prints "bucket#N IN (…)"
        pf = plan.split("PartitionFilters: [", 1)
        assert len(pf) == 2 and "bucket" in pf[1][:60], plan
        assert "pysearch_positions" in plan or "FileScan parquet" in plan


def test_phrase_local_gather_equals_join_path(spark):
    """The driver-local intersection (selective phrases, ONE scan job)
    returns exactly the distributed array-join relation, for both exact
    and sloppy phrases."""
    from pysearch import phrase

    for slop in (0, 2):
        local = phrase._phrase_pair("merge", "sort", slop)(
            spark, SF_SMOKE).collect()
        join = phrase._phrase_pair_join(
            spark, SF_SMOKE, "merge", "sort", slop).collect()
        assert [tuple(r) for r in local] == [tuple(r) for r in join]


def test_span_plan_reads_persisted_positions(spark):
    from pysearch import span

    df = span.REGISTRY["q_span_near"].fn(spark, SF_SMOKE)
    plan = _plan_of(df)
    assert "documents.parquet" not in plan
    assert "regexp_replace" not in plan.lower()
    assert "PartitionFilters: [isnotnull(bucket" in plan


def test_positions_store_matches_posexplode(spark):
    """The persisted flat view == the direct posexplode derivation
    (same (doc_id, pos, term) tuples)."""
    from pysearch import analysis, phrase
    from pysearch.registry import tbl

    got = {(r["doc_id"], r["pos"], r["term"])
           for r in phrase.positions(spark, SF_SMOKE).collect()}
    d = tbl(spark, SF_SMOKE, "documents")
    want = {(r["doc_id"], r["pos"], r["term"]) for r in
            d.select("doc_id",
                     F.posexplode(analysis.tokens_expr(F.col("text")))
                     .alias("pos", "term")).collect()}
    assert got == want


def test_bucket_of_matches_spark_crc32(spark):
    """Driver-side pos_bucket_of must equal the Spark column for every
    vocab term (the partition-pruning predicate depends on it)."""
    from pysearch import build

    terms = [r["term"] for r in
             spark.createDataFrame([("mergeSort camelCase http2 value",)],
                                   "text string")
             .select(F.explode(F.split("text", " ")).alias("term"))
             .collect()]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    rows = df.select(
        "term", build.pos_bucket_col(F.col("term"), 16).alias("b")).collect()
    for r in rows:
        assert build.pos_bucket_of(r["term"], 16) == r["b"], r["term"]


def test_build_with_positions_roundtrip(spark):
    """build_index(with_positions=True) -> write_index -> load_index:
    the positions table persists, partitioned by bucket, and equals the
    in-memory derivation row-for-row."""
    from pysearch import build

    corpus = build.corpus_from_documents(spark, SF_SMOKE)
    idx = build.build_index(spark, corpus, n_buckets=8, salt_threshold=50,
                            n_salts=4, with_positions=True)
    assert idx.positions is not None
    with tempfile.TemporaryDirectory(prefix="pysearch_seg_") as d:
        build.write_index(idx, d)
        assert os.path.isdir(os.path.join(d, "positions"))
        # partition layout: bucket=* dirs
        parts = [p for p in os.listdir(os.path.join(d, "positions"))
                 if p.startswith("bucket=")]
        assert parts, "positions not partitioned by bucket"
        loaded = build.load_index(spark, d)
        assert loaded.positions is not None
        a = {(r["term"], r["doc_id"], tuple(r["poss"]))
             for r in idx.positions.collect()}
        b = {(r["term"], r["doc_id"], tuple(r["poss"]))
             for r in loaded.positions.collect()}
        assert a == b


def test_tree_phrase_uses_persisted_positions(spark):
    """search_tree's PhraseNode leg (exec._phrase_docs) reads the
    segment's positional postings when attached — bucket-pruned scan,
    no corpus re-tokenize — and returns exactly the docs the
    forward-index fallback derivation returns."""
    from pysearch import build, phrase
    from pysearch import exec as pexec

    corpus = build.corpus_from_documents(spark, SF_SMOKE)
    idx = build.build_index(spark, corpus, n_buckets=8, salt_threshold=50,
                            n_salts=4)
    assert idx.positions is None
    fallback = {r["doc_id"] for r in
                pexec._phrase_docs(idx, ["merge", "sort"], 1).collect()}

    idx.positions = phrase.positions_table(spark, SF_SMOKE)
    idx.meta["pos_n_buckets"] = phrase.N_POS_BUCKETS
    df = pexec._phrase_docs(idx, ["merge", "sort"], 1)
    plan = _plan_of(df)
    assert "documents.parquet" not in plan
    assert "regexp_replace" not in plan.lower()
    assert "PartitionFilters: [isnotnull(bucket" in plan
    got = {r["doc_id"] for r in df.collect()}
    assert got == fallback
    assert got, "phrase 'merge sort' should match at sf0.001"


def test_phrase_pyarrow_fast_path(spark):
    """r05: with a committed segment on disk, the phrase pair gather is
    a coordinator pyarrow read (no Spark scan job) — same rows as the
    Spark probe+gather scan, same final relation as the distributed
    join; above the cap it signals the join fallback."""
    from pysearch import phrase

    phrase.positions_table(spark, SF_SMOKE)  # commits the segment
    pdf = phrase._pair_rows_pandas(spark, SF_SMOKE, "merge", "sort")
    assert pdf is not None and pdf is not False, \
        "fast path must engage on a disk-backed segment"
    got = {(r.term, int(r.doc_id), tuple(r.poss))
           for r in pdf.itertuples(index=False)}
    want = {(r["term"], r["doc_id"], tuple(r["poss"])) for r in
            phrase._pair_scan(spark, SF_SMOKE, "merge", "sort").collect()}
    assert got == want

    local = phrase._phrase_pair("merge", "sort", 0)(spark, SF_SMOKE)
    join = phrase._phrase_pair_join(spark, SF_SMOKE, "merge", "sort", 0)
    assert [tuple(r) for r in local.collect()] \
        == [tuple(r) for r in join.collect()]


def test_phrase_pyarrow_cap_falls_back(spark, monkeypatch):
    from pysearch import phrase

    phrase.positions_table(spark, SF_SMOKE)
    monkeypatch.setattr(phrase, "LOCAL_MAX_PAIR_ROWS", 0)
    assert phrase._pair_rows_pandas(
        spark, SF_SMOKE, "merge", "sort") is False


def test_mm_phrase_empty_when_term_absent(spark):
    """_mm_phrase guard: absent member term -> empty frame, no error."""
    from pysearch.phrase import _mm_phrase

    out = _mm_phrase("zzqqxyzzy", "sort", 5)(spark, SF_SMOKE)
    assert out.count() == 0
