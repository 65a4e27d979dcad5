"""File-tailed ChangedEvent CDC adapter (C1) — the sandbox-reachable
analog of the reference's binlog listeners.

The reference tails a MySQL binlog and classifies events into
``RowChangedEvent``s with operation INSERT/UPDATE/DELETE plus DDL
(``MySQLListener.java:228-353``: isWrite/isUpdate/isDelete row events →
``RowChangedEvent(table, op, row, binlogFile, position)``; QUERY events
→ ``parseDDL``; ``ChangedEventTypeEnum.java``: ROW / DDL / SCAN), then
buffers them per table and applies merged micro-batches
(``GeneralBufferActuator.java``) — with DDL acting as a BARRIER: the
pending row buffer flushes before the ALTER applies and the field
mapping refreshes.

No database exists in this sandbox, so the transport is a JSON-lines
event file (exactly what a listener process would emit), one event per
line, in commit order:

    {"type": "ROW",  "event": "INSERT", "changedRow": {...doc cols...}}
    {"type": "ROW",  "event": "UPDATE", "changedRow": {...doc cols...}}
    {"type": "ROW",  "event": "DELETE", "changedRow": {...key cols...}}
    {"type": "DDL",  "sql": "ALTER TABLE t ADD COLUMN note string"}
    {"type": "SCAN", "event": ..., "changedRow": ...}   # polled rows

``replay_changed_events`` tails the file from a persisted byte offset
(the binlog-position analog), groups consecutive ROW/SCAN events into
micro-batches, reduces each batch to the LAST event per key (the
reference's primary-key merge inside a buffer flush), and applies it
through the SAME maintenance surface everything else uses:

- last event INSERT/UPDATE -> ``update_docs`` (absent key = insert,
  Lucene updateDocument semantics),
- last event DELETE        -> ``delete_docs``,
- DDL                      -> flush the pending batch FIRST (barrier),
  then ``apply_ddl`` on the evolution log (``sources/ddl.py``), so rows
  after the ALTER may carry the new/renamed columns while rows before
  it cannot — ordering is observable and pytest-gated.

Delivery is at-least-once on crash (the offset commits AFTER the batch
applies); replaying a batch converges because update-by-key tombstones
whatever the first attempt appended and deletes are idempotent — same
contract as the streaming sink's redelivery story, approached from the
other side. Scale note: one adapter instance per event file mirrors the
reference's one-listener-per-source; the heavy lifting per batch is the
same distributed append/tombstone path the streaming sink uses, so
batch size — not file tailing — governs throughput.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

ROW_OPS = ("INSERT", "UPDATE", "DELETE")


def tail_changed_events(events_file: str, offset: int = 0,
                        max_bytes: int | None = None):
    """Read complete JSON-lines events from ``events_file`` starting at
    byte ``offset``; returns ``(events, new_offset)``. A trailing partial
    line (a writer mid-append) is left for the next tail — new_offset
    never splits a line. ``max_bytes`` bounds one tail's read so a large
    backlog streams in chunks instead of one driver-resident read (r5
    review); a single line longer than the bound raises rather than
    spinning."""
    with open(events_file, "rb") as f:
        f.seek(offset)
        buf = f.read() if max_bytes is None else f.read(max_bytes)
    events = []
    consumed = 0
    while True:
        nl = buf.find(b"\n", consumed)
        if nl < 0:
            break  # trailing partial line: a writer mid-append — next tail
        line = buf[consumed:nl]
        consumed = nl + 1
        if line.strip():
            events.append(json.loads(line))
    if (consumed == 0 and max_bytes is not None and len(buf) == max_bytes):
        raise ValueError(
            f"event line at offset {offset} exceeds max_bytes={max_bytes}"
        )
    return events, offset + consumed


def _read_offset(checkpoint_file: str | None) -> int:
    if not checkpoint_file or not os.path.exists(checkpoint_file):
        return 0
    with open(checkpoint_file) as f:
        return int(json.load(f).get("offset", 0))


def _commit_offset(checkpoint_file: str | None, offset: int) -> None:
    if not checkpoint_file:
        return
    tmp = checkpoint_file + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"offset": offset}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, checkpoint_file)


def replay_changed_events(
    spark: SparkSession,
    events_file: str,
    index_dir: str,
    *,
    key_cols: tuple[str, ...] = ("repo", "path"),
    table_dir: str | None = None,
    checkpoint_file: str | None = None,
    max_batch_rows: int = 1000,
    max_tail_bytes: int = 64 << 20,
    **build_kwargs,
) -> dict:
    """Tail + classify + apply (see module docstring). Returns counters:
    ``{"upserted", "deleted", "ddl", "batches", "dead_letter",
    "offset"}`` — ``dead_letter`` counts rows with NULL key values,
    appended as JSON lines to ``<checkpoint or events file>
    .deadletter.jsonl`` for inspection/replay instead of wedging the
    stream (a row with no key identity cannot be upserted or deleted).

    ``table_dir``: the evolution-log table DDL events apply to —
    required if the file contains DDL events. ``checkpoint_file``:
    persists the byte offset so successive calls resume (the
    binlog-position analog); a large backlog streams in
    ``max_tail_bytes`` chunks — driver memory stays O(chunk), and the
    offset commits after each chunk, bounding crash re-work too
    (at-least-once, converging — see module docstring)."""
    from dbsyncer_spark.index.build import build_index
    from dbsyncer_spark.sources.ddl import _read_log, apply_ddl, parse_alter
    from dbsyncer_spark.streaming.incremental import delete_docs, update_docs

    offset = _read_offset(checkpoint_file)
    stats = {"upserted": 0, "deleted": 0, "ddl": 0, "batches": 0,
             "dead_letter": 0, "offset": offset}
    pending: list[dict] = []
    dead_letter_file = (checkpoint_file or events_file) + ".deadletter.jsonl"

    def flush():
        if not pending:
            return
        # last event per key wins inside one flush (the reference's
        # primary-key merge in the buffer actuator): an insert-then-
        # delete nets to delete (of a possibly-absent key: no-op), a
        # delete-then-insert nets to the insert
        last: dict[tuple, dict] = {}
        for ev in pending:
            row = ev["changedRow"]
            try:
                key = tuple(row[k] for k in key_cols)
            except KeyError as e:
                raise ValueError(
                    f"ROW event lacks key column {e} (key_cols={key_cols})"
                ) from None
            last[key] = ev
        # NULL in a key column: the row has no identity to upsert or
        # delete by. Dead-letter it (the reference's capture-and-replay
        # analog, FlushStrategyImpl) and keep the stream moving — the
        # previous behavior dropped the all-NULL key column below and
        # crashed in update_docs with a misleading message, re-reading
        # the same chunk forever (r5 review).
        bad_keys = [k for k in last if any(v is None for v in k)]
        if bad_keys:
            with open(dead_letter_file, "a") as f:
                for k in bad_keys:
                    f.write(json.dumps(last[k]) + "\n")
            stats["dead_letter"] += len(bad_keys)
            for k in bad_keys:
                del last[k]
        del_keys = [k for k, ev in last.items() if ev["event"] == "DELETE"]
        upserts = [ev["changedRow"] for ev in last.values()
                   if ev["event"] != "DELETE"]
        index_exists = os.path.exists(os.path.join(index_dir, "meta.json"))
        if del_keys and index_exists:
            kdf = spark.createDataFrame(
                [dict(zip(key_cols, k)) for k in del_keys]
            ).select(*key_cols)
            stats["deleted"] += delete_docs(spark, index_dir, kdf)
        if upserts:
            # normalize ragged rows (a column can appear mid-batch only
            # via non-doc payload fields; doc columns are the contract).
            # Columns that are NULL in EVERY row of the batch are dropped
            # — schema inference cannot type them and the crash would
            # re-read the same offset forever (r5 review: routine right
            # after ALTER TABLE ADD COLUMN, when binlogs emit the new
            # column as all-NULL); an absent column reads as NULL
            # downstream anyway, and a required doc column that is
            # all-NULL still fails loudly in the index build.
            cols = [c for c in sorted({c for r in upserts for c in r})
                    if any(r.get(c) is not None for r in upserts)]
            rows = spark.createDataFrame(
                [{c: r.get(c) for c in cols} for r in upserts]
            )
            if index_exists:
                update_docs(spark, index_dir, rows, key_cols=key_cols,
                            **build_kwargs)
            else:
                build_index(spark, rows, index_dir, **build_kwargs)
            stats["upserted"] += len(upserts)
        stats["batches"] += 1
        pending.clear()

    while True:
        events, new_offset = tail_changed_events(
            events_file, offset, max_bytes=max_tail_bytes
        )
        if new_offset == offset:
            break  # nothing complete beyond the offset
        for ev in events:
            etype = ev.get("type", "ROW")
            if etype == "DDL":
                flush()  # the DDL barrier: pending rows apply BEFORE the ALTER
                if table_dir is None:
                    raise ValueError(
                        "DDL event in stream but no table_dir to apply it to"
                    )
                # at-least-once redelivery guard: apply_ddl is NOT
                # idempotent (re-ADDing a column raises), so a crash
                # after the log append but before the offset commit
                # would otherwise wedge the stream re-raising forever
                # (r5 review). If this event's exact op sequence is
                # already the evolution log's tail, it IS the prior
                # delivery of this event — skip. (A stream genuinely
                # containing the same ALTER twice is invalid DDL the
                # source database would have rejected.)
                cfg = parse_alter(ev["sql"])
                done = _read_log(table_dir)
                if not (cfg.ops and done[-len(cfg.ops):] == cfg.ops):
                    apply_ddl(table_dir, ev["sql"])
                stats["ddl"] += 1
                continue
            if etype in ("ROW", "SCAN"):  # SCAN = polled rows, same semantics
                op = ev.get("event")
                if op not in ROW_OPS:
                    raise ValueError(f"unknown row operation {op!r}")
                pending.append(ev)
                if len(pending) >= max_batch_rows:
                    flush()
                continue
            raise ValueError(f"unknown event type {etype!r}")
        flush()  # chunk boundary = batch boundary (offset commits below)
        _commit_offset(checkpoint_file, new_offset)
        offset = new_offset
        stats["offset"] = offset
    return stats
