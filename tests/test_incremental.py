"""Incremental (CDC-analog) gate: append segments + tombstone deletes +
compaction must all stay rank-identical to a from-scratch oracle over the
live document set."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from dbsyncer_spark.fixtures.corpus import gen_corpus_pdf
from dbsyncer_spark.index.build import append_segment, build_index
from dbsyncer_spark.index.docids import assign_doc_ids
from dbsyncer_spark.index.search import SearchIndex
from dbsyncer_spark.oracle.bm25_oracle import bm25_oracle_topk, corpus_stats
from dbsyncer_spark.streaming.incremental import compact_segments, delete_docs

PARAMS = dict(num_shards=4, range_size=128, block_size=16, num_id_buckets=8)
SCHEMA = "repo string, path string, commit string, lang string, content string"


@pytest.fixture(scope="module")
def idx_dir(spark, tmp_path_factory):
    pdf = gen_corpus_pdf(n_docs=400, seed=42)
    base = spark.createDataFrame(pdf.iloc[:300], schema=SCHEMA)
    extra = spark.createDataFrame(pdf.iloc[300:], schema=SCHEMA)
    d = str(tmp_path_factory.mktemp("inc_idx"))
    build_index(spark, base, d, **PARAMS)
    append_segment(spark, extra, d, num_id_buckets=8)
    return d


def _oracle_docs(spark, idx: SearchIndex, corpus_by_key):
    """Map index doc_ids -> content via docstats keys."""
    rows = idx.docstats().select("doc_id", "repo", "path", "commit").collect()
    return {r.doc_id: corpus_by_key[(r.repo, r.path, r.commit)] for r in rows}


@pytest.fixture(scope="module")
def corpus_by_key():
    pdf = gen_corpus_pdf(n_docs=400, seed=42)
    return {(r.repo, r.path, r.commit): r.content for r in pdf.itertuples(index=False)}


def test_append_matches_full_oracle(spark, idx_dir, corpus_by_key):
    idx = SearchIndex(spark, idx_dir)
    assert idx.n_docs == 400
    docs = _oracle_docs(spark, idx, corpus_by_key)
    stats = corpus_stats(docs)
    for q in ["merge offset", "getUserName", "import", "token shard batch"]:
        got = idx.search(q, k=10).collect()
        want = bm25_oracle_topk(docs, q, k=10, precomputed=stats)
        assert [r.doc_id for r in got] == [d for d, _ in want], q
        for r, (_, s) in zip(got, want):
            assert r.score == pytest.approx(s, abs=1e-9)


def test_delete_then_search_masks_tombstones(spark, idx_dir, corpus_by_key):
    idx = SearchIndex(spark, idx_dir)
    docs = _oracle_docs(spark, idx, corpus_by_key)
    stats = corpus_stats(docs)
    baseline = bm25_oracle_topk(docs, "merge offset", k=3, precomputed=stats)
    victim = baseline[0][0]
    vic_row = idx.docstats().filter(F.col("doc_id") == victim).select("repo", "path").collect()[0]

    n = delete_docs(spark, idx_dir, spark.createDataFrame([vic_row.asDict()]))
    assert n == 1

    idx2 = SearchIndex(spark, idx_dir)
    got = idx2.search("merge offset", k=10).collect()
    assert victim not in [r.doc_id for r in got]
    # tombstones mask docs but (like Lucene pre-merge) index stats keep
    # counting them; ranking among live docs must match an oracle that
    # filters the same way
    want = bm25_oracle_topk(docs, "merge offset", k=10,
                            doc_pred=lambda d: d != victim, precomputed=stats)
    assert [r.doc_id for r in got] == [d for d, _ in want]


def test_search_many_masks_tombstones(spark, idx_dir, corpus_by_key):
    """Batched search must honor tombstones exactly like per-query search
    (ADVICE r1: search_many previously skipped the tombstone anti-join)."""
    idx = SearchIndex(spark, idx_dir)
    tomb = {r.doc_id for r in spark.read.parquet(f"{idx_dir}/tombstones").collect()}
    assert tomb, "fixture ordering: delete test must have run first"
    queries = {"a": "merge offset", "b": "import", "c": "token shard batch"}
    got = idx.search_many(queries, k=10).collect()
    assert not ({r.doc_id for r in got} & tomb)
    by_q = {}
    for r in got:
        # 12dp rounding: the two paths accumulate per-term partials in a
        # different order (float add non-associative), same as the parity
        # test in test_index_build.py
        by_q.setdefault(r.query_id, []).append((r.doc_id, round(r.score, 12)))
    for qid, q in queries.items():
        want = idx.search(q, k=10, mode="exhaustive").collect()
        assert by_q.get(qid, []) == [(r.doc_id, round(r.score, 12)) for r in want], q


def test_compaction_drops_tombstones_and_rescores(spark, idx_dir, corpus_by_key):
    idx = SearchIndex(spark, idx_dir)
    docs_before = _oracle_docs(spark, idx, corpus_by_key)
    tomb = {r.doc_id for r in spark.read.parquet(f"{idx_dir}/tombstones").collect()}
    live = {d: c for d, c in docs_before.items() if d not in tomb}

    meta = compact_segments(spark, idx_dir)
    assert meta["n_docs"] == len(live)

    idx2 = SearchIndex(spark, idx_dir)
    assert len(idx2.meta["segments"]) == 1
    docs_after = _oracle_docs(spark, idx2, corpus_by_key)
    # same content set survives compaction (ids preserved)
    assert docs_after == live
    stats = corpus_stats(docs_after)
    for q in ["merge offset", "import"]:
        got = idx2.search(q, k=10).collect()
        want = bm25_oracle_topk(docs_after, q, k=10, precomputed=stats)
        assert [r.doc_id for r in got] == [d for d, _ in want], q
        for r, (_, s) in zip(got, want):
            assert r.score == pytest.approx(s, abs=1e-9)


def test_update_docs_replaces_by_key(spark, tmp_path):
    """Shard.update(Term, doc) analog: one call deletes old versions by
    key and appends the new docs; search/count/facets see only the new
    version (VERDICT r2 'What's missing #4')."""
    from dbsyncer_spark.streaming.incremental import update_docs

    pdf = gen_corpus_pdf(n_docs=60, seed=5)
    d = str(tmp_path / "upd_idx")
    build_index(spark, spark.createDataFrame(pdf, schema=SCHEMA), d, **PARAMS)
    idx = SearchIndex(spark, d)
    victim = idx.docstats().orderBy("doc_id").limit(1).collect()[0]

    new_rows = [
        # replaces the victim (same repo/path key)
        (victim.repo, victim.path, "newcommit", "python",
         "zzupdated unique replacement text body"),
        # plain insert (no existing doc with this key)
        ("newrepo", "brand/new.py", "c1", "python", "zzupdated brand new doc"),
    ]
    res = update_docs(
        spark, d, spark.createDataFrame(new_rows, SCHEMA),
        key_cols=("repo", "path"), num_id_buckets=8,
    )
    assert res["deleted"] == 1

    idx2 = SearchIndex(spark, d)
    # the key now maps to exactly ONE live doc, the new version
    live = idx2.match_all(
        doc_filter=(F.col("repo") == victim.repo) & (F.col("path") == victim.path), k=10
    ).collect()
    assert len(live) == 1 and live[0].commit == "newcommit"
    # both new docs are searchable; old content of the victim is not
    assert idx2.count("zzupdated") == 2
    assert idx2.docstats().count() - (
        spark.read.parquet(f"{d}/tombstones").count()
    ) == 61  # 60 - 1 deleted + 2 appended
    with pytest.raises(ValueError, match="lacks key column"):
        update_docs(spark, d, spark.createDataFrame(new_rows, SCHEMA).drop("path"))


def test_update_docs_rejects_duplicate_keys(spark, tmp_path):
    """Two rows for one key in a single update batch is ambiguous (no
    'last write' in an unordered DataFrame) — update_docs raises instead
    of silently leaving two live docs per key (code-review r3)."""
    from dbsyncer_spark.streaming.incremental import update_docs

    pdf = gen_corpus_pdf(n_docs=20, seed=6)
    d = str(tmp_path / "dup_idx")
    build_index(spark, spark.createDataFrame(pdf, schema=SCHEMA), d, **PARAMS)
    rows = [
        ("r", "same/key.py", "c1", "python", "first version text"),
        ("r", "same/key.py", "c2", "python", "second version text"),
    ]
    with pytest.raises(ValueError, match="multiple rows for key"):
        update_docs(spark, d, spark.createDataFrame(rows, SCHEMA), num_id_buckets=8)
    # nothing was ingested or tombstoned by the failed call
    idx = SearchIndex(spark, d)
    assert idx.n_docs == 20 and len(idx.meta["segments"]) == 1
    assert not os.path.exists(os.path.join(d, "tombstones"))


def test_update_docs_append_failure_keeps_old_version(spark, tmp_path):
    """Tombstones are written AFTER the new segment lands: if the append
    fails, the old doc stays live and searchable — never a window where
    the key resolves to nothing (code-review r3; Shard.java:102-120
    keeps the old doc visible until the update commits)."""
    from dbsyncer_spark.streaming.incremental import update_docs

    pdf = gen_corpus_pdf(n_docs=20, seed=6)
    d = str(tmp_path / "fail_idx")
    build_index(spark, spark.createDataFrame(pdf, schema=SCHEMA), d, **PARAMS)
    idx = SearchIndex(spark, d)
    victim = idx.docstats().orderBy("doc_id").limit(1).collect()[0]
    bad = spark.createDataFrame(
        [(victim.repo, victim.path, "c9", "python", None)], SCHEMA
    )  # null content -> append_segment fails during tokenize/build
    with pytest.raises(Exception):
        update_docs(spark, d, bad, num_id_buckets=8)
    assert not os.path.exists(os.path.join(d, "tombstones")), \
        "old version was tombstoned before the append committed"
    idx2 = SearchIndex(spark, d)
    assert idx2.n_docs == 20
    live = idx2.match_all(
        doc_filter=(F.col("repo") == victim.repo) & (F.col("path") == victim.path), k=5
    ).collect()
    assert len(live) == 1 and live[0].commit == victim.commit


def test_tombstone_file_count_compaction(spark, tmp_path_factory):
    """r3 VERDICT #4: many small delete batches accumulate tiny part
    files in the live tombstone generation; once the data-file count
    passes the threshold a maintenance call must compact the generation
    (pointer flip, masking unchanged) even with nothing covered."""
    from dbsyncer_spark.streaming.incremental import (
        _active_tomb_dir, _purge_retired, _tomb_data_files,
    )
    import dbsyncer_spark.streaming.incremental as inc

    pdf = gen_corpus_pdf(n_docs=120, seed=7)
    d = str(tmp_path_factory.mktemp("tomb_compact"))
    build_index(spark, spark.createDataFrame(pdf, schema=SCHEMA), d, **PARAMS)
    idx = SearchIndex(spark, d)
    victims = [r.path for r in idx.docstats().orderBy("doc_id").limit(40)
               .select("path").collect()]
    # 20 delete batches of 2 docs each -> >= 20 part files staged in
    for i in range(0, 40, 2):
        n = delete_docs(spark, d, spark.createDataFrame(
            [(victims[i],), (victims[i + 1],)], "path string"))
        assert n == 2
    cur = _active_tomb_dir(d)
    n_before = len(_tomb_data_files(cur))
    assert n_before >= 20
    before = sorted(r.doc_id for r in SearchIndex(spark, d)._tombstones()
                    .select("doc_id").distinct().collect())
    # force the trigger below the default threshold and run maintenance
    old = inc.TOMB_COMPACT_MAX_FILES
    inc.TOMB_COMPACT_MAX_FILES = 8
    try:
        assert inc._compact_tombstones(spark, d, max_files=8) is True
    finally:
        inc.TOMB_COMPACT_MAX_FILES = old
    cur2 = _active_tomb_dir(d)
    assert cur2 != cur, "compaction must flip to a new generation"
    n_after = len(_tomb_data_files(cur2))
    assert n_after < n_before and n_after <= 8
    after = sorted(r.doc_id for r in SearchIndex(spark, d)._tombstones()
                   .select("doc_id").distinct().collect())
    assert after == before, "compaction must not change the masked set"
    # below threshold: no-op
    assert inc._compact_tombstones(spark, d, max_files=64) is False
    # the maintenance sweep purges the retired generation on the grace clock
    _purge_retired(spark, d, grace_s=0.0)
    assert not os.path.exists(cur)


def test_inflight_sweep_spares_live_owner(spark, tmp_path_factory):
    """r4 ADVICE: the age-based sweep of '.tombstones*.inflight-<pid>'
    rewrite temp dirs must skip dirs whose embedded pid is still alive
    on this host (a slow-but-running rewrite), and still reap dirs left
    by dead pids once past the TTL."""
    import subprocess

    from dbsyncer_spark.streaming.incremental import _purge_retired

    pdf = gen_corpus_pdf(n_docs=30, seed=11)
    d = str(tmp_path_factory.mktemp("inflight_sweep"))
    build_index(spark, spark.createDataFrame(pdf, schema=SCHEMA), d, **PARAMS)
    old = time.time() - (25 * 3600)  # past RESERVATION_TTL_S (24 h)

    def mk(name):
        p = os.path.join(d, name)
        os.makedirs(p)
        os.utime(p, (old, old))
        return p

    live = mk(f".tombstones_g1.inflight-{os.getpid()}")
    # a pid that existed and is now gone: a reaped child is guaranteed dead
    child = subprocess.Popen(["true"])
    child.wait()
    dead = mk(f".tombstones_g2.inflight-{child.pid}")
    junk = mk(".tombstones_g3.inflight-notapid")
    _purge_retired(spark, d, grace_s=0.0)
    assert os.path.isdir(live), "live owner's rewrite dir was swept"
    assert not os.path.exists(dead), "dead owner's dir must be reaped"
    assert not os.path.exists(junk), "unparsable pid degrades to age sweep"


def test_tomb_generation_pin_survives_purge(spark, tmp_path_factory):
    """A generation pinned by an in-flight pack must survive
    _purge_retired past the grace clock (r5 review: a delete-heavy CDC
    stream can flip + retire + purge a generation in 600 s while a
    merge pack that pinned its file listing runs for hours, then dies
    on FileNotFound after all that work). Unpin (or pin-TTL expiry for
    a crashed pack) releases it back to the normal clock, and the
    publish muts + touch_reservations carry the pin atomically."""
    import dbsyncer_spark.streaming.incremental as inc
    from dbsyncer_spark.index.build import touch_reservations

    pdf = gen_corpus_pdf(n_docs=60, seed=23)
    d = str(tmp_path_factory.mktemp("tomb_pin"))
    build_index(spark, spark.createDataFrame(pdf, schema=SCHEMA), d, **PARAMS)
    idx = SearchIndex(spark, d)
    victims = [r.path for r in idx.docstats().limit(6).select("path").collect()]
    for i in range(0, 6, 2):  # several batches -> several part files
        delete_docs(spark, d, spark.createDataFrame(
            [(victims[i],), (victims[i + 1],)], "path string"))
    cur = inc._active_tomb_dir(d)
    gen = os.path.basename(cur)
    assert len(inc._tomb_data_files(cur)) > 1

    inc._pin_tomb_generation(d, "seg_packer", idx.meta)
    # flip to a new generation so ours lands in tomb_retired
    assert inc._compact_tombstones(spark, d, max_files=1) is True
    assert os.path.basename(inc._active_tomb_dir(d)) != gen

    inc._purge_retired(spark, d, grace_s=0.0)
    assert os.path.isdir(cur), "pinned generation was purged under the pack"
    # the heartbeat path refreshes the pin like any claim
    assert touch_reservations(d, "seg_packer") is True

    inc._unpin_tomb_generation(d, "seg_packer")
    inc._purge_retired(spark, d, grace_s=0.0)
    assert not os.path.exists(cur), "unpinned retired generation must purge"
