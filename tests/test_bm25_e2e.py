"""Phase-1 gate: exhaustive DataFrame BM25 is rank-identical to the pure
Python oracle on the reference query set (FIXTURES.md): (a) identical
top-k docIDs in order, (b) scores within 1e-9, (c) sha256(content)
equality per returned row, over the deterministic 1k-doc corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from dbsyncer_spark.fixtures.corpus import reference_queries
from dbsyncer_spark.oracle.bm25_oracle import bm25_oracle_topk, corpus_stats, sha256_hex
from dbsyncer_spark.query.bm25 import bm25_topk


@pytest.fixture(scope="module")
def docs_with_ids(spark, corpus):
    # deterministic dense docIds: row_number over (repo, path, commit) —
    # fine at test scale; the build pipeline uses the distributed
    # two-pass assigner (tests/test_docids.py proves equivalence).
    w = W.orderBy("repo", "path", "commit")
    return corpus.withColumn("doc_id", F.row_number().over(w).cast("long")).cache()


@pytest.fixture(scope="module")
def oracle_docs(docs_with_ids):
    rows = docs_with_ids.select("doc_id", "content", "lang").collect()
    docs = {r.doc_id: r.content for r in rows}
    langs = {r.doc_id: r.lang for r in rows}
    return docs, langs


@pytest.fixture(scope="module")
def oracle_stats(oracle_docs):
    return corpus_stats(oracle_docs[0])


def test_bm25_rank_identical_all_reference_queries(spark, docs_with_ids, oracle_docs, oracle_stats):
    docs, langs = oracle_docs
    for q in reference_queries():
        flt = (F.col("lang") == q["filterLang"]) if q["filterLang"] else None
        pred = (lambda d, L=q["filterLang"]: langs[d] == L) if q["filterLang"] else None
        got = bm25_topk(
            spark, docs_with_ids, q["text"], k=q["k"],
            id_col="doc_id", text_col="content", doc_filter=flt,
        ).collect()
        want = bm25_oracle_topk(docs, q["text"], k=q["k"], doc_pred=pred,
                                precomputed=oracle_stats)
        assert [r.doc_id for r in got] == [d for d, _ in want], f"q{q['queryId']} docIds"
        for r, (_, s) in zip(got, want):
            assert r.score == pytest.approx(s, abs=1e-9), f"q{q['queryId']} score"


def test_sha256_invariant_per_returned_row(spark, docs_with_ids, oracle_docs):
    docs, _ = oracle_docs
    topk = bm25_topk(spark, docs_with_ids, "merge offset", k=10)
    fetched = (
        topk.join(docs_with_ids, "doc_id")
        .select("doc_id", F.sha2("content", 256).alias("sha"))
        .collect()
    )
    assert len(fetched) == 10
    for r in fetched:
        assert r.sha == sha256_hex(docs[r.doc_id])


def test_empty_query_and_miss(spark, docs_with_ids):
    assert bm25_topk(spark, docs_with_ids, "").count() == 0
    assert bm25_topk(spark, docs_with_ids, "zzzqqqxxx").count() == 0


def test_topk_plan_is_take_ordered(spark, docs_with_ids):
    """The top-k must compile to TakeOrderedAndProject (per-partition
    top-k + driver merge), never a global sort."""
    plan = bm25_topk(spark, docs_with_ids, "merge offset", k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
