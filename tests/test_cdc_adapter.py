"""File-tailed ChangedEvent CDC adapter (C1, r4 VERDICT #5): I/U/D/DDL
classification (RowChangedEvent / ChangedEventTypeEnum semantics), the
equivalence of a replayed event file with direct append/update/delete
calls, the DDL barrier between batches, and offset-checkpointed
resumption."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dbsyncer_spark.index.search import SearchIndex
from dbsyncer_spark.sources.cdc import replay_changed_events, tail_changed_events


def _doc(i: int, text: str, lang: str = "python") -> dict:
    return {"repo": "r1", "path": f"src/f{i}.py", "commit": f"c{i}",
            "lang": lang, "content": text}


def _write_events(path: str, events: list[dict]) -> None:
    with open(path, "w") as f:
        for ev in events:
            f.write(json.dumps(ev) + "\n")


def _logical(spark, index_dir) -> list[tuple]:
    """The index's live logical corpus: (path, commit, sha) sorted."""
    idx = SearchIndex(spark, index_dir)
    stats = idx.docstats()
    tomb = idx._tombstones()
    if tomb is not None:
        stats = stats.join(tomb.select("doc_id"), "doc_id", "left_anti")
    return sorted(
        (r.path, r.commit, r.sha256)
        for r in stats.select("path", "commit", "sha256").collect()
    )


def test_replay_equals_direct_calls(spark, tmp_path):
    """The oracle-style gate: one event file with inserts, updates,
    deletes, and within-batch key collisions replayed through the
    adapter must yield the same live corpus AND the same search results
    as the equivalent direct update_docs/delete_docs calls."""
    from dbsyncer_spark.index.build import build_index
    from dbsyncer_spark.streaming.incremental import delete_docs, update_docs

    ev_dir = str(tmp_path / "cdc")
    os.makedirs(ev_dir)
    events_file = os.path.join(ev_dir, "events.jsonl")
    events = (
        [{"type": "ROW", "event": "INSERT", "changedRow": _doc(i, f"merge scan tok{i}")}
         for i in range(12)]
        # updates: rewrite 3 docs; delete 2; insert-then-delete nets to
        # nothing; delete-then-insert nets to the insert
        + [{"type": "ROW", "event": "UPDATE",
            "changedRow": _doc(i, f"updated shard offset tok{i}")} for i in (2, 3, 4)]
        + [{"type": "ROW", "event": "DELETE", "changedRow": _doc(9, "")},
           {"type": "ROW", "event": "DELETE", "changedRow": _doc(10, "")},
           {"type": "ROW", "event": "INSERT", "changedRow": _doc(50, "ephemeral")},
           {"type": "ROW", "event": "DELETE", "changedRow": _doc(50, "")},
           {"type": "ROW", "event": "DELETE", "changedRow": _doc(51, "")},
           {"type": "ROW", "event": "INSERT", "changedRow": _doc(51, "reborn merge")}]
    )
    _write_events(events_file, events)
    got_dir = os.path.join(ev_dir, "got_idx")
    stats = replay_changed_events(
        spark, events_file, got_dir, max_batch_rows=12,
        num_shards=4, range_size=256, num_id_buckets=8,
    )
    # deleted: f9 + f10 (f50's insert nets out to a no-op delete inside
    # its own batch and never reaches the index)
    assert stats["batches"] >= 2 and stats["deleted"] == 2

    # the direct-call twin, batched the same way (batch 1 = 12 inserts,
    # batch 2 = the rest reduced to last-event-per-key)
    want_dir = os.path.join(ev_dir, "want_idx")
    kw = dict(num_shards=4, range_size=256, num_id_buckets=8)
    b1 = spark.createDataFrame([_doc(i, f"merge scan tok{i}") for i in range(12)])
    build_index(spark, b1, want_dir, **kw)
    delete_docs(spark, want_dir, spark.createDataFrame(
        [{"repo": "r1", "path": f"src/f{i}.py"} for i in (9, 10, 50)]
    ).select("repo", "path"))
    b2 = spark.createDataFrame(
        [_doc(i, f"updated shard offset tok{i}") for i in (2, 3, 4)]
        + [_doc(51, "reborn merge")]
    )
    update_docs(spark, want_dir, b2, key_cols=("repo", "path"), **kw)

    assert _logical(spark, got_dir) == _logical(spark, want_dir)
    got_q = [(r.score, ) for r in SearchIndex(spark, got_dir)
             .search("merge shard offset", k=10).collect()]
    want_q = [(r.score, ) for r in SearchIndex(spark, want_dir)
              .search("merge shard offset", k=10).collect()]
    assert got_q == want_q and got_q


def test_ddl_barrier_orders_batches(spark, tmp_path):
    """A DDL event must flush pending rows BEFORE the ALTER applies
    (the reference's buffer-actuator barrier): rows before it land under
    the old schema, rows after it may carry the new column."""
    from dbsyncer_spark.sources.ddl import (
        append_rows, create_table, logical_schema, read_evolved,
    )

    ev_dir = str(tmp_path / "cdcddl")
    os.makedirs(ev_dir)
    table_dir = os.path.join(ev_dir, "table")
    create_table(spark, table_dir, spark.createDataFrame(
        [{"repo": "r1", "path": "seed", "commit": "c", "lang": "python",
          "content": "seed"}]))
    events_file = os.path.join(ev_dir, "events.jsonl")
    # interleaved: rows, DDL, rows — small max_batch_rows would NOT have
    # flushed yet, so only the barrier explains the flush boundary
    _write_events(events_file, [
        {"type": "ROW", "event": "INSERT", "changedRow": _doc(1, "alpha merge")},
        {"type": "ROW", "event": "INSERT", "changedRow": _doc(2, "beta scan")},
        {"type": "DDL", "sql": "ALTER TABLE t ADD COLUMN note string"},
        {"type": "ROW", "event": "INSERT", "changedRow": _doc(3, "gamma merge")},
    ])
    idx_dir = os.path.join(ev_dir, "idx")
    stats = replay_changed_events(
        spark, events_file, idx_dir, table_dir=table_dir,
        max_batch_rows=1000,  # far above the row count: only DDL splits
        num_shards=4, range_size=256, num_id_buckets=8,
    )
    assert stats == {**stats, "ddl": 1, "batches": 2, "upserted": 3}
    assert ("note", "string") in logical_schema(table_dir)
    # post-DDL the evolved table accepts the new column; pre-DDL rows
    # read it as NULL — the C7 evolution contract the barrier feeds
    append_rows(spark, table_dir, spark.createDataFrame(
        [{"repo": "r1", "path": "post", "commit": "c2", "lang": "go",
          "content": "post ddl", "note": "added"}]))
    rows = {r.path: r.note for r in read_evolved(spark, table_dir).collect()}
    assert rows["post"] == "added" and rows["seed"] is None


def test_ddl_without_table_dir_raises(spark, tmp_path):
    events_file = str(tmp_path / "e.jsonl")
    _write_events(events_file, [{"type": "DDL", "sql": "ALTER TABLE t ADD COLUMN x int"}])
    with pytest.raises(ValueError, match="no table_dir"):
        replay_changed_events(spark, events_file, str(tmp_path / "i"))


def test_offset_checkpoint_resumes_and_converges(spark, tmp_path):
    """The binlog-position analog: a second replay with the same
    checkpoint is a no-op; appended events are picked up alone; a torn
    trailing line is left for the next tail."""
    ev_dir = str(tmp_path / "cdcck")
    os.makedirs(ev_dir)
    events_file = os.path.join(ev_dir, "events.jsonl")
    ck = os.path.join(ev_dir, "offset.json")
    idx_dir = os.path.join(ev_dir, "idx")
    kw = dict(checkpoint_file=ck, num_shards=4, range_size=256, num_id_buckets=8)
    _write_events(events_file, [
        {"type": "ROW", "event": "INSERT", "changedRow": _doc(i, f"doc {i} merge")}
        for i in range(5)
    ])
    s1 = replay_changed_events(spark, events_file, idx_dir, **kw)
    assert s1["upserted"] == 5
    s2 = replay_changed_events(spark, events_file, idx_dir, **kw)
    assert s2["upserted"] == 0 and s2["batches"] == 0  # fully consumed
    # append: one complete event + one torn partial line
    with open(events_file, "a") as f:
        f.write(json.dumps({"type": "ROW", "event": "DELETE",
                            "changedRow": _doc(0, "")}) + "\n")
        f.write('{"type": "ROW", "event": "INSERT", "changedRow"')  # torn
    s3 = replay_changed_events(spark, events_file, idx_dir, **kw)
    assert s3["deleted"] == 1 and s3["upserted"] == 0
    evs, off = tail_changed_events(events_file, s3["offset"])
    assert evs == []  # the torn line stays pending
    live = _logical(spark, idx_dir)
    assert len(live) == 4 and all(p != "src/f0.py" for p, _, _ in live)


def test_unknown_event_shapes_raise(spark, tmp_path):
    events_file = str(tmp_path / "bad.jsonl")
    _write_events(events_file, [{"type": "ROW", "event": "TRUNCATE",
                                 "changedRow": _doc(1, "x")}])
    with pytest.raises(ValueError, match="unknown row operation"):
        replay_changed_events(spark, events_file, str(tmp_path / "i"))
    _write_events(events_file, [{"type": "BLOB"}])
    with pytest.raises(ValueError, match="unknown event type"):
        replay_changed_events(spark, events_file, str(tmp_path / "i2"))


def test_all_null_column_and_chunked_tail(spark, tmp_path):
    """r5 review: (a) a column that is NULL in every row of a batch —
    routine right after ALTER TABLE ADD COLUMN — must be dropped, not
    crash schema inference and poison the offset forever; (b) a large
    backlog streams in max_tail_bytes chunks with the offset committed
    per chunk."""
    ev_dir = str(tmp_path / "cdcnull")
    os.makedirs(ev_dir)
    events_file = os.path.join(ev_dir, "events.jsonl")
    ck = os.path.join(ev_dir, "offset.json")
    rows = []
    for i in range(9):
        d = _doc(i, f"merge doc {i}")
        d["note"] = None  # all-NULL payload column (post-DDL binlog shape)
        rows.append({"type": "ROW", "event": "INSERT", "changedRow": d})
    _write_events(events_file, rows)
    line_len = len(json.dumps(rows[0])) + 1
    stats = replay_changed_events(
        spark, events_file, os.path.join(ev_dir, "idx"),
        checkpoint_file=ck, max_tail_bytes=3 * line_len + 10,
        num_shards=4, range_size=256, num_id_buckets=8,
    )
    assert stats["upserted"] == 9
    assert stats["batches"] >= 3  # chunking forced multiple flushes
    live = _logical(spark, os.path.join(ev_dir, "idx"))
    assert len(live) == 9
    # an oversized single line raises loudly instead of spinning
    with pytest.raises(ValueError, match="exceeds max_bytes"):
        tail_changed_events(events_file, 0, max_bytes=10)


def test_ddl_redelivery_is_idempotent(spark, tmp_path):
    """At-least-once redelivery of a chunk containing DDL must converge:
    apply_ddl is not idempotent (re-ADDing a column raises), so a crash
    after the evolution-log append but before the offset commit used to
    wedge the stream re-raising forever (r5 review). Simulated by
    deleting the checkpoint (= offset lost, full chunk redelivered)."""
    from dbsyncer_spark.sources import ddl as D

    base = str(tmp_path / "cdc_ddl")
    os.makedirs(base)
    events_file = os.path.join(base, "events.jsonl")
    ck = os.path.join(base, "ck.json")
    tdir = os.path.join(base, "tbl")
    idx_dir = os.path.join(base, "idx")
    D.create_table(spark, tdir, spark.range(2).selectExpr(
        "id", "concat('u', id) AS name"))
    _write_events(events_file, [
        {"type": "ROW", "event": "INSERT",
         "changedRow": _doc(1, "merge scan alpha")},
        {"type": "DDL", "sql": "ALTER TABLE tbl ADD COLUMN note varchar(20)"},
        {"type": "DDL", "sql": "ALTER TABLE tbl DROP INDEX idx_x"},
        {"type": "ROW", "event": "INSERT",
         "changedRow": _doc(2, "merge scan beta")},
    ])
    s1 = replay_changed_events(spark, events_file, idx_dir,
                               table_dir=tdir, checkpoint_file=ck)
    assert s1["ddl"] == 2
    want = _logical(spark, idx_dir)
    log_after = D._read_log(tdir)

    os.remove(ck)  # crash-before-commit: the whole chunk redelivers
    s2 = replay_changed_events(spark, events_file, idx_dir,
                               table_dir=tdir, checkpoint_file=ck)
    assert s2["ddl"] == 2  # counted, but the log append was skipped
    assert D._read_log(tdir) == log_after, "redelivered DDL re-applied"
    assert _logical(spark, idx_dir) == want


def test_null_key_rows_are_dead_lettered(spark, tmp_path):
    """A row with a NULL key value has no identity to upsert/delete by:
    it must go to the dead-letter file (capture-and-replay analog) and
    the stream must keep moving — not crash-loop on the same chunk with
    the key column dropped by the all-NULL filter (r5 review)."""
    base = str(tmp_path / "cdc_nullkey")
    os.makedirs(base)
    events_file = os.path.join(base, "events.jsonl")
    ck = os.path.join(base, "ck.json")
    idx_dir = os.path.join(base, "idx")
    bad = _doc(9, "orphan row")
    bad["path"] = None
    _write_events(events_file, [
        {"type": "ROW", "event": "INSERT",
         "changedRow": _doc(1, "merge scan alpha")},
        {"type": "ROW", "event": "INSERT", "changedRow": bad},
        {"type": "ROW", "event": "INSERT",
         "changedRow": _doc(2, "merge scan beta")},
    ])
    stats = replay_changed_events(spark, events_file, idx_dir,
                                  checkpoint_file=ck)
    assert stats["dead_letter"] == 1 and stats["upserted"] == 2
    dl = ck + ".deadletter.jsonl"
    with open(dl) as f:
        entries = [json.loads(line) for line in f]
    assert len(entries) == 1 and entries[0]["changedRow"]["commit"] == "c9"
    paths = {p for p, _, _ in _logical(spark, idx_dir)}
    assert paths == {"src/f1.py", "src/f2.py"}
