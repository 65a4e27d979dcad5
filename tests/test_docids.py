"""The distributed two-pass docId assigner must be dense, deterministic,
and (per bucket-count invariance) stable across parallelism levels."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbsyncer_spark.index.docids import assign_doc_ids


def test_dense_and_deterministic(spark, corpus):
    a = assign_doc_ids(corpus, num_buckets=16)
    ids = sorted(r.doc_id for r in a.select("doc_id").collect())
    n = corpus.count()
    assert ids == list(range(n))  # dense 0..N-1

    b = assign_doc_ids(corpus, num_buckets=16)
    ja = {(r.repo, r.path, r.commit): r.doc_id for r in a.collect()}
    jb = {(r.repo, r.path, r.commit): r.doc_id for r in b.collect()}
    assert ja == jb  # same input -> same ids


def test_stable_under_repartition(spark, corpus):
    a = assign_doc_ids(corpus, num_buckets=16)
    b = assign_doc_ids(corpus.repartition(13), num_buckets=16)
    ja = {(r.repo, r.path, r.commit): r.doc_id for r in a.collect()}
    jb = {(r.repo, r.path, r.commit): r.doc_id for r in b.collect()}
    assert ja == jb  # input partitioning must not leak into ids
