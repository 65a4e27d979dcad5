"""Structured Streaming path: file-source micro-batches -> index segments
via foreachBatch (C1/C5 analog), exactly-once by checkpoint + idempotent
restart."""

from __future__ import annotations

import os

import pytest

from dbsyncer_spark.fixtures.corpus import gen_corpus_pdf
from dbsyncer_spark.index.search import SearchIndex
from dbsyncer_spark.streaming.incremental import stream_to_index

SCHEMA = "repo string, path string, commit string, lang string, content string"


@pytest.fixture()
def corpus_files(spark, tmp_path):
    src = str(tmp_path / "incoming")
    pdf = gen_corpus_pdf(n_docs=120, seed=7)
    spark.createDataFrame(pdf.iloc[:60], SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src, "batch0")
    )
    return src, pdf


def test_stream_builds_index_and_restart_is_idempotent(spark, tmp_path, corpus_files):
    src, pdf = corpus_files
    idx_dir = str(tmp_path / "sidx")
    ckpt = str(tmp_path / "ckpt")

    stream = spark.readStream.schema(SCHEMA).option("recursiveFileLookup", "true").parquet(src)
    q = stream_to_index(
        stream, idx_dir, ckpt,
        num_shards=4, range_size=256, num_id_buckets=8,
    ).start()
    q.awaitTermination(120)

    idx = SearchIndex(spark, idx_dir)
    assert idx.n_docs == 60
    first = [tuple(r) for r in idx.search("merge offset", k=5).collect()]
    assert first

    # restart with NO new data: checkpoint replays nothing, index unchanged
    q2 = stream_to_index(
        stream, idx_dir, ckpt, num_shards=4, range_size=256, num_id_buckets=8
    ).start()
    q2.awaitTermination(120)
    idx2 = SearchIndex(spark, idx_dir)
    assert idx2.n_docs == 60

    # new file arrives -> appended as a second segment, searchable
    spark.createDataFrame(pdf.iloc[60:], SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src, "batch1")
    )
    q3 = stream_to_index(
        stream, idx_dir, ckpt, num_shards=4, range_size=256, num_id_buckets=8
    ).start()
    q3.awaitTermination(180)
    idx3 = SearchIndex(spark, idx_dir)
    assert idx3.n_docs == 120
    assert len(idx3.meta["segments"]) == 2
    assert idx3.search("merge offset", k=5).count() == 5

    # exactly-once under redelivery: foreachBatch is at-least-once (crash
    # between the meta swap and the checkpoint commit re-delivers the
    # batch); the batchId-derived segment name makes the replay a no-op
    from dbsyncer_spark.index.build import append_segment

    seg = sorted(idx3.meta["segments"])[-1]
    batch1 = spark.read.parquet(os.path.join(src, "batch1"))
    replay_meta = append_segment(
        spark, batch1, idx_dir, segment=seg,
        num_shards=4, range_size=256, num_id_buckets=8,
    )
    assert replay_meta["segment"] == seg
    idx4 = SearchIndex(spark, idx_dir)
    assert idx4.n_docs == 120 and len(idx4.meta["segments"]) == 2


def test_automerge_redelivery_is_exactly_once(spark, tmp_path):
    """auto_merge can rename the just-appended batchId-named segment into
    seg_NNNNNN BEFORE the streaming checkpoint commits; a redelivered
    batch must STILL be a no-op (ADVICE r2 — the name-exists check alone
    re-ingested it as duplicate docs). The per-checkpoint batch HWM in
    root meta closes that window."""
    from dbsyncer_spark.streaming.incremental import make_batch_handler

    pdf = gen_corpus_pdf(n_docs=80, seed=11)
    idx_dir = str(tmp_path / "midx")
    handler = make_batch_handler(
        idx_dir, str(tmp_path / "mckpt"), auto_merge=True,
        num_shards=4, range_size=256, num_id_buckets=8,
    )
    batches = [
        spark.createDataFrame(pdf.iloc[i * 20:(i + 1) * 20], SCHEMA) for i in range(4)
    ]
    for bid, b in enumerate(batches):
        handler(b, bid)
    idx = SearchIndex(spark, idx_dir)
    assert idx.n_docs == 80
    # the 4th batch triggered a tier merge: batchId-named segments are gone
    assert all(not s.startswith("seg_b") for s in idx.meta["segments"]), idx.meta["segments"]

    # redeliver the LAST batch (the crash-between-swap-and-commit case)
    handler(batches[3], 3)
    idx2 = SearchIndex(spark, idx_dir)
    assert idx2.n_docs == 80, "redelivered batch was re-ingested as duplicates"
    # and an out-of-order stale redelivery is equally a no-op
    handler(batches[1], 1)
    assert SearchIndex(spark, idx_dir).n_docs == 80


def test_checkpoint_recreation_reingests_instead_of_silent_drop(spark, tmp_path):
    """Deleting the checkpoint dir to reprocess from scratch restarts
    batch ids at 0 under a FRESH Spark query id; a path-only HWM key
    would drop those batches as stale redeliveries (silent data loss —
    code-review r3). The HWM key and seg_b names carry the query id, so
    the new instance re-ingests (visible duplicates, the caller's stated
    intent) while redelivery WITHIN one instance stays exactly-once."""
    import json

    from dbsyncer_spark.streaming.incremental import make_batch_handler

    pdf = gen_corpus_pdf(n_docs=40, seed=13)
    idx_dir = str(tmp_path / "ridx")
    ck = tmp_path / "rckpt"
    ck.mkdir()
    (ck / "metadata").write_text(json.dumps({"id": "aaaa1111-0000-0000-0000-000000000001"}))
    batch = spark.createDataFrame(pdf.iloc[:20], SCHEMA)

    h1 = make_batch_handler(idx_dir, str(ck), num_shards=4, range_size=256, num_id_buckets=8)
    h1(batch, 0)
    assert SearchIndex(spark, idx_dir).n_docs == 20
    # same-instance redelivery: no-op
    h1(batch, 0)
    assert SearchIndex(spark, idx_dir).n_docs == 20

    # "reprocess": recreate the checkpoint -> new query id, batch ids restart
    (ck / "metadata").write_text(json.dumps({"id": "bbbb2222-0000-0000-0000-000000000002"}))
    h2 = make_batch_handler(idx_dir, str(ck), num_shards=4, range_size=256, num_id_buckets=8)
    h2(batch, 0)
    idx = SearchIndex(spark, idx_dir)
    assert idx.n_docs == 40, "new stream instance's batch 0 was silently dropped"
    assert len([s for s in idx.meta["segments"] if s.startswith("seg_b")]) == 2
    # and the new instance's own redelivery is still a no-op
    h2(batch, 0)
    assert SearchIndex(spark, idx_dir).n_docs == 40


def test_out_of_band_merge_then_crash_before_hwm_is_exactly_once(spark, tmp_path):
    """Guard 3 (r5 review): an OUT-OF-BAND merge process consumes the
    just-appended batch segment and the driver crashes BEFORE the hwm
    write. The hwm guard passes (stale) and the name-exists no-op can't
    fire (the name left "segments") — without the retired-name check the
    redelivered batch re-ingested as duplicate docs with fresh ids."""
    import json

    from dbsyncer_spark.index.build import atomic_write_meta
    from dbsyncer_spark.streaming.incremental import make_batch_handler, maybe_merge

    pdf = gen_corpus_pdf(n_docs=60, seed=17)
    idx_dir = str(tmp_path / "oob_idx")
    handler = make_batch_handler(  # NO auto_merge: merge runs out-of-band
        idx_dir, str(tmp_path / "oob_ck"),
        num_shards=4, range_size=256, num_id_buckets=8,
    )
    batches = [
        spark.createDataFrame(pdf.iloc[i * 20:(i + 1) * 20], SCHEMA)
        for i in range(3)
    ]
    for bid, b in enumerate(batches):
        handler(b, bid)

    # crash-before-hwm for batch 2: erase its hwm entry
    with open(os.path.join(idx_dir, "meta.json")) as f:
        meta = json.load(f)
    (key,) = meta["streaming_hwm"]
    meta["streaming_hwm"][key] = 1
    atomic_write_meta(idx_dir, meta)
    # the out-of-band merge consumes all three batch segments
    assert maybe_merge(spark, idx_dir, merge_at=2) is not None
    idx = SearchIndex(spark, idx_dir)
    assert idx.n_docs == 60
    assert all(not s.startswith("seg_b") for s in idx.meta["segments"])

    handler(batches[2], 2)  # Spark redelivers the un-hwm'd batch
    idx2 = SearchIndex(spark, idx_dir)
    assert idx2.n_docs == 60, "redelivered batch re-ingested after merge"
    with open(os.path.join(idx_dir, "meta.json")) as f:
        healed = json.load(f)["streaming_hwm"][key]
    assert healed == 2, "retired-name guard must heal the missing hwm"
