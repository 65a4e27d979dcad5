"""DDL parsing + parquet-native schema evolution (K6 sink / C7 barrier).

Reference semantics under test: ``DDLParserImpl.java:54-104`` (parse +
op classification), ``:109-199`` (field-mapping refresh), and the four
alter strategies (quote stripping, multi-clause statements).
"""

from __future__ import annotations

import pytest

from dbsyncer_spark.sources import ddl as D


# ---------------------------------------------------------------- parsing


def test_parse_add_multi_clause_backquotes():
    cfg = D.parse_alter(
        "ALTER TABLE `test`.`test_user` "
        "ADD COLUMN `aaa` varchar(255) NULL AFTER `create_date`, "
        "ADD COLUMN `bbb` varchar(255) NULL AFTER `aaa`"
    )
    assert cfg.operation == "ADD"
    assert cfg.table == "test_user"
    assert cfg.added == [("aaa", "string"), ("bbb", "string")]


def test_parse_drop_change_modify():
    cfg = D.parse_alter('ALTER TABLE t DROP COLUMN "aaa", DROP `bbb`')
    assert cfg.operation == "DROP" and cfg.dropped == ["aaa", "bbb"]

    cfg = D.parse_alter(
        "ALTER TABLE `test`.`test_user` CHANGE COLUMN `name` `name2` "
        "varchar(200) NULL DEFAULT NULL AFTER `id`"
    )
    assert cfg.operation == "CHANGE" and cfg.changed == {"name": "name2"}

    cfg = D.parse_alter("ALTER TABLE t MODIFY COLUMN price decimal(10,2) NOT NULL;")
    assert cfg.operation == "MODIFY" and cfg.modified == [("price", "decimal(10,2)")]


def test_parse_rejects_non_alter_and_unknown_clause():
    with pytest.raises(ValueError):
        D.parse_alter("DROP TABLE t")
    with pytest.raises(ValueError):
        D.parse_alter("ALTER TABLE t RENAME TO u")


def test_parse_add_index_constraint_are_schema_noops():
    """ADD INDEX/KEY/constraint must not mis-parse as ADD COLUMN (the
    reference's AddStrategy only walks colDataTypes; jsqlparser gives
    index adds none) — regression: these produced columns named
    'INDEX'/'PRIMARY' (r2 review)."""
    for sql in [
        "ALTER TABLE t ADD INDEX idx_name (col)",
        "ALTER TABLE t ADD KEY k1 (col)",
        "ALTER TABLE t ADD PRIMARY KEY (id)",
        "ALTER TABLE t ADD UNIQUE uq (col)",
        "ALTER TABLE t ADD CONSTRAINT fk FOREIGN KEY (a) REFERENCES u(b)",
        "ALTER TABLE t ADD FULLTEXT ft (txt)",
    ]:
        cfg = D.parse_alter(sql)
        assert cfg.added == [] and cfg.operation == "", sql
    # mixed statement: the real column add still lands
    cfg = D.parse_alter("ALTER TABLE t ADD COLUMN c int, ADD INDEX i (c)")
    assert cfg.added == [("c", "int")] and cfg.operation == "ADD"


def test_drop_then_readd_does_not_resurrect_old_data(spark, tmp_path):
    """Re-using a dropped column's name must read NULL from files written
    before the re-add — not the retired column's values (r2: mergeSchema
    resurrected them; the re-added column now gets a fresh mangled
    physical name, the poor man's Iceberg field id)."""
    tdir = str(tmp_path / "readd")
    D.create_table(spark, tdir, spark.range(3).selectExpr("id", "CAST(id * 10 AS int) AS a"))
    D.apply_ddl(tdir, "ALTER TABLE t DROP COLUMN a")
    D.apply_ddl(tdir, "ALTER TABLE t ADD COLUMN a int")
    rows = {r.id: r.a for r in D.read_evolved(spark, tdir).collect()}
    assert rows == {0: None, 1: None, 2: None}
    # appends under the new identity round-trip
    D.append_rows(spark, tdir, spark.createDataFrame([(9, 99)], "id long, a int"))
    rows = {r.id: r.a for r in D.read_evolved(spark, tdir).collect()}
    assert rows[9] == 99 and rows[0] is None

    # mixed-op single statement replays in STATEMENT order
    D.apply_ddl(tdir, "ALTER TABLE t DROP COLUMN a, ADD COLUMN a varchar(10)")
    assert dict(D.logical_schema(tdir))["a"] == "string"

    # rename onto an existing logical name is rejected before publishing
    with pytest.raises(ValueError, match="target name exists"):
        D.apply_ddl(tdir, "ALTER TABLE t CHANGE COLUMN a id int")
    assert [n for n, _ in D.logical_schema(tdir)] == ["id", "a"]


def test_change_applies_mandatory_type(spark, tmp_path):
    """MySQL CHANGE always carries the column type; dropping it kept
    casting to the pre-CHANGE type (silent truncation on widening)."""
    cfg = D.parse_alter("ALTER TABLE t CHANGE COLUMN n n2 bigint")
    assert cfg.changed == {"n": "n2"} and cfg.changed_types == {"n2": "bigint"}

    tdir = str(tmp_path / "chg")
    D.create_table(spark, tdir, spark.range(3).selectExpr("CAST(id AS int) AS n"))
    D.apply_ddl(tdir, "ALTER TABLE t CHANGE COLUMN n n2 bigint")
    assert dict(D.logical_schema(tdir)) == {"n2": "bigint"}
    big = 4_000_000_000  # > int32 max: only survives if the CHANGE widened
    D.append_rows(spark, tdir, spark.createDataFrame([(big,)], "n2 long"))
    got = {r.n2 for r in D.read_evolved(spark, tdir).collect()}
    assert big in got


def test_type_mapping():
    assert D.to_spark_type("varchar(255)") == "string"
    assert D.to_spark_type("BIGINT") == "bigint"
    assert D.to_spark_type("datetime") == "timestamp"
    assert D.to_spark_type("decimal(12,3)") == "decimal(12,3)"
    assert D.to_spark_type("weirdtype") == "string"


# ------------------------------------------------- field-mapping refresh


def test_mapping_refresh_reference_semantics():
    maps = [("id", "id"), ("name", "name"), ("x", "y")]
    both = {"id", "name", "x", "aaa"}

    # ADD: skip already-mapped name->name; only append when on both sides
    cfg = D.DDLConfig(operation="ADD", added=[("aaa", "string"), ("zzz", "string"), ("id", "int")])
    out = D.refresh_field_mappings(maps, cfg, both, both)
    assert ("aaa", "aaa") in out and not any(s == "zzz" for s, _ in out)
    assert out.count(("id", "id")) == 1

    # DROP removes by source name
    cfg = D.DDLConfig(operation="DROP", dropped=["name"])
    assert ("name", "name") not in D.refresh_field_mappings(maps, cfg, both, both)

    # CHANGE renames source; target only when it had the same name
    cfg = D.DDLConfig(operation="CHANGE", changed={"name": "name2", "x": "x2"})
    out = D.refresh_field_mappings(maps, cfg, both, both)
    assert ("name2", "name2") in out and ("x2", "y") in out


# --------------------------------------------------- evolution lifecycle


def test_evolved_table_lifecycle(spark, tmp_path):
    tdir = str(tmp_path / "tbl")
    base = spark.range(0, 6).selectExpr(
        "id", "concat('u', id) AS name", "cast(id * 10 as bigint) AS n"
    )
    D.create_table(spark, tdir, base)

    # ADD then append a batch carrying the new column
    D.apply_ddl(tdir, "ALTER TABLE tbl ADD COLUMN note varchar(64)")
    batch = spark.range(6, 9).selectExpr(
        "id", "concat('u', id) AS name", "cast(id * 10 as bigint) AS n", "'new' AS note"
    )
    D.append_rows(spark, tdir, batch)
    got = {r["id"]: r["note"] for r in D.read_evolved(spark, tdir).collect()}
    assert got[0] is None and got[7] == "new"

    # CHANGE: rename-on-read coalesces old/new physical names
    D.apply_ddl(tdir, "ALTER TABLE tbl CHANGE COLUMN name user_name varchar(64)")
    D.append_rows(
        spark,
        tdir,
        spark.range(9, 10).selectExpr("id", "'u9' AS user_name", "90 AS n", "'new' AS note"),
    )
    rows = {r["id"]: r["user_name"] for r in D.read_evolved(spark, tdir).collect()}
    assert rows[3] == "u3" and rows[9] == "u9"

    # MODIFY casts on read
    D.apply_ddl(tdir, "ALTER TABLE tbl MODIFY COLUMN n int")
    assert dict(D.logical_schema(tdir))["n"] == "int"
    assert D.read_evolved(spark, tdir).schema["n"].dataType.simpleString() == "int"

    # DROP hides the column without touching files
    D.apply_ddl(tdir, "ALTER TABLE tbl DROP COLUMN note")
    assert "note" not in D.read_evolved(spark, tdir).columns

    # invalid DDL is rejected BEFORE publishing (log unchanged)
    with pytest.raises(ValueError):
        D.apply_ddl(tdir, "ALTER TABLE tbl DROP COLUMN nope")
    assert [n for n, _ in D.logical_schema(tdir)] == ["id", "user_name", "n"]

    # appends under a stale schema are rejected
    with pytest.raises(ValueError):
        D.append_rows(spark, tdir, spark.range(1).selectExpr("id", "'x' AS name"))

    # compaction collapses the rename history; results identical
    before = sorted(map(tuple, D.read_evolved(spark, tdir).collect()))
    D.compact_table(spark, tdir)
    after = sorted(map(tuple, D.read_evolved(spark, tdir).collect()))
    assert before == after
    assert [c.physical for c in D._replay(D._read_log(tdir))] == [
        ["id"], ["user_name"], ["n"]
    ]


def test_parse_drop_index_constraint_are_schema_noops():
    """DROP INDEX/KEY/PRIMARY KEY/FOREIGN KEY/CONSTRAINT are routine
    binlog DDL and must parse as schema no-ops — raising here turned
    replay_changed_events into a permanent poison-pill, since the CDC
    offset commits only after apply_ddl succeeds (r5 review). A real
    column drop in the same statement still applies."""
    for sql in (
        "ALTER TABLE t DROP INDEX idx_name",
        "ALTER TABLE t DROP KEY idx_name",
        "ALTER TABLE t DROP PRIMARY KEY",
        "ALTER TABLE t DROP FOREIGN KEY fk_name",
        "ALTER TABLE t DROP CONSTRAINT chk_1",
    ):
        cfg = D.parse_alter(sql)
        assert cfg.ops == [], sql
    cfg = D.parse_alter("ALTER TABLE t DROP INDEX i, DROP COLUMN note")
    assert cfg.ops == [{"op": "drop", "name": "note"}]
    # quoted identifiers stay column drops even with reserved-ish names
    cfg = D.parse_alter("ALTER TABLE t DROP COLUMN `key`")
    assert cfg.ops == [{"op": "drop", "name": "key"}]


def test_compact_crash_atomicity(spark, tmp_path):
    """The log swap is compaction's single commit point: a crash AFTER
    the new data generation is written but BEFORE the log publish must
    leave the table reading its old (log, data) pair exactly — the
    in-place predecessor could strand a log whose mangled physical
    names no longer existed, silently reading columns as NULL
    (r5 review). The orphan generation is swept by the next compact."""
    import os

    tdir = str(tmp_path / "ctab")
    D.create_table(spark, tdir, spark.range(6).selectExpr(
        "id", "concat('u', id) AS name"))
    # force a mangled physical name: drop + re-add
    D.apply_ddl(tdir, "ALTER TABLE ctab DROP COLUMN name")
    D.apply_ddl(tdir, "ALTER TABLE ctab ADD COLUMN name varchar(10)")
    D.append_rows(spark, tdir, spark.range(6, 9).selectExpr(
        "id", "concat('v', id) AS name"))
    want = sorted(map(tuple, D.read_evolved(spark, tdir).collect()))

    # simulate the crash window: compacted generation on disk, log not
    # yet swapped (exactly what a kill between the write and the
    # publish leaves behind)
    D.read_evolved(spark, tdir).write.parquet(os.path.join(tdir, "data-dead00"))
    got = sorted(map(tuple, D.read_evolved(spark, tdir).collect()))
    assert got == want, "orphan generation changed what readers see"

    # real compaction: publishes a fresh generation, sweeps the orphan,
    # removes the old dir; rows identical
    D.compact_table(spark, tdir)
    assert sorted(map(tuple, D.read_evolved(spark, tdir).collect())) == want
    names = set(os.listdir(tdir))
    assert "data-dead00" not in names, "orphan generation not swept"
    live = D._data_dir(D._read_log(tdir))
    assert live in names and live.startswith("data-")
    assert "data" not in names, "old generation not removed after publish"
    # and a second compact (now FROM a versioned dir) still round-trips
    D.compact_table(spark, tdir)
    assert sorted(map(tuple, D.read_evolved(spark, tdir).collect())) == want
