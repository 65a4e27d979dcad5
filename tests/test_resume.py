"""Lineage/resume gate (FIXTURES.md case 6): a build interrupted after
stage i, then re-run, produces an identical index and identical lineage
totals — and committed stages are genuinely skipped (no recompute)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dbsyncer_spark.index.build import build_index
from dbsyncer_spark.index.lineage import read_manifest, stage_committed
from dbsyncer_spark.index.search import SearchIndex

PARAMS = dict(num_shards=4, range_size=128, block_size=16, num_id_buckets=8)


def _index_fingerprint(spark, seg_dir: str) -> tuple:
    """Logical content fingerprint: every posting row + docstats row."""
    p = (
        spark.read.parquet(os.path.join(seg_dir, "postings"))
        .select("tid", "range_id", "n_docs", "sum_tf", F.sha2(F.hex("blob"), 256).alias("bh"))
        .orderBy("tid", "range_id")
        .collect()
    )
    d = (
        spark.read.parquet(os.path.join(seg_dir, "docstats"))
        .orderBy("doc_id")
        .collect()
    )
    return (tuple(map(tuple, p)), tuple(map(tuple, d)))


def test_interrupted_build_resumes_identically(spark, corpus, tmp_path):
    small = corpus.limit(200)

    full_dir = str(tmp_path / "full")
    build_index(spark, small, full_dir, **PARAMS)
    want = _index_fingerprint(spark, os.path.join(full_dir, "segments", "seg_000000"))

    # "interrupt" after docstats: run a build whose postings stage we
    # simulate as crashed by deleting its output + manifest
    part_dir = str(tmp_path / "interrupted")
    build_index(spark, small, part_dir, **PARAMS)
    seg = os.path.join(part_dir, "segments", "seg_000000")
    import shutil

    shutil.rmtree(os.path.join(seg, "postings"))
    os.remove(os.path.join(seg, "_lineage", "stage_postings.json"))
    os.remove(os.path.join(seg, "_lineage", "stage_dictionary.json"))

    # resume: docstats must be skipped, postings/dictionary rebuilt
    before = os.stat(os.path.join(seg, "_lineage", "stage_docstats.json")).st_mtime
    build_index(spark, small, part_dir, **PARAMS)
    after = os.stat(os.path.join(seg, "_lineage", "stage_docstats.json")).st_mtime
    assert before == after, "committed stage was recomputed"

    got = _index_fingerprint(spark, seg)
    assert got == want, "resumed index differs from uninterrupted build"


def test_param_change_invalidates_stages(spark, corpus, tmp_path):
    small = corpus.limit(100)
    d = str(tmp_path / "idx")
    build_index(spark, small, d, **PARAMS)
    seg = os.path.join(d, "segments", "seg_000000")
    m = read_manifest(seg, "postings")
    assert m["status"] == "committed"
    # different params hash -> stage not considered committed
    assert not stage_committed(seg, "postings", "deadbeef")


def test_lineage_manifest_contents(spark, corpus, tmp_path):
    small = corpus.limit(150)
    d = str(tmp_path / "idx2")
    build_index(spark, small, d, **PARAMS)
    seg = os.path.join(d, "segments", "seg_000000")
    doc = read_manifest(seg, "docstats")
    assert doc["metrics"]["rows"] == 150
    assert sum(p["rows"] for p in doc["partitions"]) == 150
    post = read_manifest(seg, "postings")
    assert post["metrics"]["total_postings"] > 0
    assert all({"shard", "rows", "postings", "bytes"} <= set(p) for p in post["partitions"])


def test_quarantine_dead_letter(spark, tmp_path):
    """C10 analog: bad rows land in quarantine with a reason; the build
    succeeds on the rest; replay = rebuild over the fixed rows."""
    from pyspark.sql import functions as F

    from dbsyncer_spark.index.build import build_index
    from dbsyncer_spark.index.search import SearchIndex

    rows = [
        ("r", "ok.py", "c1", "python", "def parse(): return merge_offset"),
        ("r", "null.py", "c2", "python", None),
        ("r", "big.py", "c3", "python", "x " * 2500),
    ]
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    d = str(tmp_path / "qidx")
    meta = build_index(
        spark, docs, d, num_shards=4, range_size=256, num_id_buckets=8,
        max_content_bytes=1000,
    )
    assert meta["n_docs"] == 1
    q = spark.read.parquet(d + "/segments/seg_000000/quarantine")
    got = {(r.path, r.reason) for r in q.collect()}
    assert got == {("null.py", "null_content"), ("big.py", "oversized_content")}
    # the quarantine carries the FULL row image (content), so replay
    # cannot depend on the source retaining the bad rows
    assert {r.path: r.content for r in q.collect()}["big.py"] == "x " * 2500
    idx = SearchIndex(spark, d)
    assert idx.search("merge offset", k=5).count() == 1

    # replay from quarantine ALONE (source df gone from scope — nothing
    # re-reads it) with a relaxed limit: the oversized doc becomes
    # searchable; the null row is re-quarantined in the new segment
    from dbsyncer_spark.index.build import replay_quarantine

    del docs
    meta2 = replay_quarantine(
        spark, d, num_id_buckets=8, max_content_bytes=10_000,
    )
    assert meta2 is not None and meta2["n_docs"] == 1
    idx2 = SearchIndex(spark, d)
    assert idx2.n_docs == 2
    assert idx2.search("x", k=5).count() == 1  # "x " * 2500 tokenizes to x's
    q2 = spark.read.parquet(d + f"/segments/{meta2['segment']}/quarantine")
    assert {(r.path, r.reason) for r in q2.collect()} == {("null.py", "null_content")}
