"""DDL parsing + parquet-native schema evolution — the analog of the
reference's DDL sink (K6) and incremental DDL barrier (C7).

Reference behavior (``parser/ddl/impl/DDLParserImpl.java:54-104`` +
``parser/ddl/alter/{Add,Drop,Modify,Change}Strategy.java``): an ALTER
statement is parsed into one of four ops — ADD / DROP / MODIFY / CHANGE
— yielding the affected column names (back-quotes and double quotes
stripped); the statement is re-targeted at the sink table, and the
TableGroup's field mappings are refreshed per op
(``DDLParserImpl.java:109-199``: append skips columns already mapped or
absent from either side; change renames source and, when the names
matched, target; drop removes the mapping; modify re-resolves the field).

Spark shape: the sandbox has no Iceberg runtime, so the sink is an
immutable parquet directory plus a JSON evolution log — exactly
Iceberg's metadata-only evolution model, re-expressed over plain
parquet. ``apply_ddl`` parses the ALTER, validates it against the
current logical schema, and appends one log entry atomically
(temp-file + ``os.replace``). ``read_evolved`` replays the log as a
projection over a ``mergeSchema`` scan:

- ADD    -> column surfaced, NULL for files written before the ALTER
- DROP   -> column no longer projected (files untouched)
- CHANGE -> rename-on-read: ``coalesce`` over the physical name history
            (files written after the rename carry the new name)
- MODIFY -> ``cast``-on-read to the new type

No data file is ever rewritten: every DDL is an O(1) metadata operation
regardless of table size — the property that makes schema evolution
viable on a 100 TB table. The one scale trade-off is documented where
it happens: a renamed column reads as a 2-column ``coalesce`` until the
table is compacted, which widens that column's scan but keeps every
other pushdown intact.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LOG_NAME = "_ddl_log.json"
DATA_DIR = "data"

# ---------------------------------------------------------------------------
# ALTER parsing (reference: jsqlparser Alter -> AlterStrategy dispatch)
# ---------------------------------------------------------------------------

# MySQL-ish source types -> Spark SQL DDL types. Unknown types fall back
# to string, mirroring the reference's default FieldResolver.stringValue().
_TYPE_MAP = {
    "varchar": "string",
    "char": "string",
    "text": "string",
    "longtext": "string",
    "mediumtext": "string",
    "tinytext": "string",
    "json": "string",
    "tinyint": "tinyint",
    "smallint": "smallint",
    "int": "int",
    "integer": "int",
    "mediumint": "int",
    "bigint": "bigint",
    "float": "float",
    "double": "double",
    "real": "double",
    "decimal": "decimal",
    "numeric": "decimal",
    "bit": "boolean",
    "boolean": "boolean",
    "bool": "boolean",
    "date": "date",
    "datetime": "timestamp",
    "timestamp": "timestamp",
    "time": "string",
    "binary": "binary",
    "varbinary": "binary",
    "blob": "binary",
    "longblob": "binary",
}

_ALTER_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>(?:`[^`]*`|\"[^\"]*\"|[\w$])+"
    r"(?:\s*\.\s*(?:`[^`]*`|\"[^\"]*\"|[\w$])+)?)\s+(?P<body>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_IDENT = r"(?:`[^`]*`|\"[^\"]*\"|[\w$]+)"
# ADD INDEX/KEY/constraint clauses are NOT column adds: the reference's
# AddStrategy iterates only colDataTypes (jsqlparser parses index adds
# with none), so they fall through as schema no-ops — without this guard
# 'ADD INDEX idx (col)' would mis-parse as adding a column named 'INDEX'
_ADD_NONCOLUMN_RE = re.compile(
    r"^ADD\s+(?:INDEX|KEY|PRIMARY\s+KEY|UNIQUE|FULLTEXT|SPATIAL|CONSTRAINT|"
    r"FOREIGN\s+KEY|PARTITION|CHECK)\b",
    re.IGNORECASE,
)
_ADD_RE = re.compile(
    rf"^ADD\s+(?:COLUMN\s+)?(?P<col>{_IDENT})\s+(?P<type>\w+(?:\s*\([^)]*\))?)",
    re.IGNORECASE,
)
# DROP INDEX/KEY/constraint clauses are likewise schema no-ops (routine
# MySQL binlog DDL; a column literally named 'index'/'key' must be
# quoted in MySQL, and quoted identifiers don't match this guard).
# Without it 'DROP INDEX idx' raised, and via replay_changed_events —
# which commits its offset only after apply_ddl succeeds — became a
# permanent poison-pill re-raising on every retry (review r5)
_DROP_NONCOLUMN_RE = re.compile(
    r"^DROP\s+(?:INDEX|KEY|PRIMARY\s+KEY|FOREIGN\s+KEY|CONSTRAINT|"
    r"CHECK|PARTITION)\b",
    re.IGNORECASE,
)
_DROP_RE = re.compile(rf"^DROP\s+(?:COLUMN\s+)?(?P<col>{_IDENT})\s*$", re.IGNORECASE)
_MODIFY_RE = re.compile(
    rf"^MODIFY\s+(?:COLUMN\s+)?(?P<col>{_IDENT})\s+(?P<type>\w+(?:\s*\([^)]*\))?)",
    re.IGNORECASE,
)
_CHANGE_RE = re.compile(
    rf"^CHANGE\s+(?:COLUMN\s+)?(?P<old>{_IDENT})\s+(?P<new>{_IDENT})"
    r"(?:\s+(?P<type>\w+(?:\s*\([^)]*\))?))?",
    re.IGNORECASE,
)


def _unquote(name: str) -> str:
    """Strip back-quotes / double quotes, as the reference strategies do
    (``AddStrategy.java:33-35`` et al.)."""
    return name.strip().strip("`").strip('"')


def _split_clauses(body: str) -> list[str]:
    """Split ALTER clauses on top-level commas (``decimal(10,2)`` safe)."""
    out, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


def to_spark_type(source_type: str) -> str:
    """Map a MySQL-ish column type to a Spark SQL type string."""
    m = re.match(r"^(\w+)(?:\s*\(([^)]*)\))?", source_type.strip())
    if not m:
        return "string"
    base = m.group(1).lower()
    spark = _TYPE_MAP.get(base, "string")
    if spark == "decimal":
        args = m.group(2) or "10,0"
        return f"decimal({args})"
    return spark


@dataclass
class DDLConfig:
    """Parsed ALTER — the analog of ``sdk/config/DDLConfig.java``.

    One statement may carry several clauses of the SAME op (the reference
    dispatches per-expression but accumulates into one config); mixed-op
    statements keep the last op tag, like the reference's
    ``setDdlOperationEnum`` overwrite.
    """

    table: str = ""
    operation: str = ""  # ADD | DROP | MODIFY | CHANGE
    added: list[tuple[str, str]] = field(default_factory=list)  # (name, spark type)
    dropped: list[str] = field(default_factory=list)
    modified: list[tuple[str, str]] = field(default_factory=list)
    changed: dict[str, str] = field(default_factory=dict)  # old -> new
    # CHANGE's (MySQL-mandatory) column type, keyed by NEW name — applied
    # as a modify after the rename (the reference re-resolves the Field,
    # picking up the type; dropping it would silently keep casting to the
    # pre-CHANGE type)
    changed_types: dict[str, str] = field(default_factory=dict)
    # log entries in STATEMENT order — 'DROP COLUMN a, ADD COLUMN a ...'
    # is valid MySQL and must replay drop-then-add, not grouped-by-op
    ops: list[dict] = field(default_factory=list)


def parse_alter(sql: str) -> DDLConfig:
    """Parse an ``ALTER TABLE`` statement into a :class:`DDLConfig`.

    Reference: ``DDLParserImpl.parse`` (jsqlparser) + the four
    ``AlterStrategy`` implementations. Raises ``ValueError`` on anything
    that isn't a well-formed ALTER with recognized clauses.
    """
    m = _ALTER_RE.match(sql.strip().rstrip(";"))
    if not m:
        raise ValueError(f"not an ALTER TABLE statement: {sql!r}")
    cfg = DDLConfig(table=_unquote(m.group("table").split(".")[-1]))
    for clause in _split_clauses(m.group("body")):
        if _ADD_NONCOLUMN_RE.match(clause) or _DROP_NONCOLUMN_RE.match(clause):
            continue  # index/constraint add/drop: schema no-op (reference parity)
        if a := _ADD_RE.match(clause):
            name, typ = _unquote(a.group("col")), to_spark_type(a.group("type"))
            cfg.added.append((name, typ))
            cfg.ops.append({"op": "add", "name": name, "type": typ})
            cfg.operation = "ADD"
        elif d := _DROP_RE.match(clause):
            name = _unquote(d.group("col"))
            cfg.dropped.append(name)
            cfg.ops.append({"op": "drop", "name": name})
            cfg.operation = "DROP"
        elif mo := _MODIFY_RE.match(clause):
            name, typ = _unquote(mo.group("col")), to_spark_type(mo.group("type"))
            cfg.modified.append((name, typ))
            cfg.ops.append({"op": "modify", "name": name, "type": typ})
            cfg.operation = "MODIFY"
        elif c := _CHANGE_RE.match(clause):
            new = _unquote(c.group("new"))
            old = _unquote(c.group("old"))
            cfg.changed[old] = new
            cfg.ops.append({"op": "change", "old": old, "new": new})
            if c.group("type"):
                typ = to_spark_type(c.group("type"))
                cfg.changed_types[new] = typ
                cfg.ops.append({"op": "modify", "name": new, "type": typ})
            cfg.operation = "CHANGE"
        else:
            raise ValueError(f"unsupported ALTER clause: {clause!r}")
    return cfg


# ---------------------------------------------------------------------------
# Field-mapping refresh (reference DDLParserImpl.refreshFiledMappings)
# ---------------------------------------------------------------------------


def refresh_field_mappings(
    mappings: list[tuple[str, str]],
    cfg: DDLConfig,
    source_cols: set[str],
    target_cols: set[str],
) -> list[tuple[str, str]]:
    """Patch (source, target) column mappings after a DDL, with the
    reference's exact semantics (``DDLParserImpl.java:109-199``):

    - ADD:    skip a column already mapped name->name; otherwise append a
              mapping only when the column now exists on BOTH sides.
    - DROP:   remove mappings whose source is a dropped column.
    - CHANGE: rename the mapping's source; when the target had the same
              name, rename it too.
    - MODIFY: type-only change — mapping names are untouched (the
              reference re-resolves the Field object; names stay).
    """
    out = list(mappings)
    if cfg.operation == "ADD":
        for name, _t in cfg.added:
            if any(s == name and t == name for s, t in out):
                continue
            if name in source_cols and name in target_cols:
                out.append((name, name))
    elif cfg.operation == "DROP":
        out = [(s, t) for s, t in out if s not in cfg.dropped]
    elif cfg.operation == "CHANGE":
        out = [
            (cfg.changed.get(s, s), cfg.changed[s] if (s in cfg.changed and t == s) else t)
            for s, t in out
        ]
    return out


# ---------------------------------------------------------------------------
# Evolved parquet table: create / apply_ddl / append / read
# ---------------------------------------------------------------------------


def _log_path(table_dir: str) -> str:
    return os.path.join(table_dir, LOG_NAME)


def _data_dir(entries: list[dict]) -> str:
    """Relative data-dir name for this log generation. ``compact_table``
    publishes each compaction as a NEW ``data-<hex>`` dir recorded on
    the log's create entry, so the log swap is the single atomic commit
    point; pre-versioning tables (no ``data_dir`` key) keep ``data``."""
    return entries[0].get("data_dir", DATA_DIR) if entries else DATA_DIR


def _read_log(table_dir: str) -> list[dict]:
    with open(_log_path(table_dir)) as f:
        return json.load(f)


def _write_log(table_dir: str, entries: list[dict]) -> None:
    """Atomic log swap — same visibility rule as the index root-meta
    (write temp, fsync, ``os.replace``): readers see the old or new
    schema, never a torn one. The fsync matters: without it a power
    loss can durably publish the RENAME over unwritten data blocks —
    a zero-length log that bricks the table (review r5; same rule as
    ``cdc._commit_offset``)."""
    fd, tmp = tempfile.mkstemp(dir=table_dir, suffix=".ddltmp")
    with os.fdopen(fd, "w") as f:
        json.dump(entries, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _log_path(table_dir))


@dataclass
class _LogicalColumn:
    name: str  # current logical name
    physical: list[str]  # name history, oldest first (rename appends)
    type: str  # current Spark SQL type (MODIFY updates)


def _replay(entries: list[dict]) -> list[_LogicalColumn]:
    cols: list[_LogicalColumn] = []
    # every physical name EVER used (incl. dropped/renamed-away): a
    # re-added or rename-target name that collides with retired file data
    # gets a fresh mangled physical identity, otherwise mergeSchema would
    # resurrect the old column's values instead of NULL (r2 review) —
    # the poor man's Iceberg field-id
    used_physical: set[str] = set()

    def fresh_physical(name: str) -> str:
        if name not in used_physical:
            used_physical.add(name)
            return name
        k = 2
        while f"{name}__v{k}" in used_physical:
            k += 1
        used_physical.add(f"{name}__v{k}")
        return f"{name}__v{k}"

    for e in entries:
        op = e["op"]
        if op == "create":
            cols = [_LogicalColumn(n, [n], t) for n, t in e["schema"]]
            used_physical = {n for n, _ in e["schema"]}
        elif op == "add":
            if any(c.name == e["name"] for c in cols):
                raise ValueError(f"ADD: column exists: {e['name']}")
            cols.append(
                _LogicalColumn(e["name"], [fresh_physical(e["name"])], e["type"])
            )
        elif op == "drop":
            before = len(cols)
            cols = [c for c in cols if c.name != e["name"]]
            if len(cols) == before:
                raise ValueError(f"DROP: no such column: {e['name']}")
        elif op == "change":
            if any(c.name == e["new"] for c in cols):
                raise ValueError(f"CHANGE: target name exists: {e['new']}")
            for c in cols:
                if c.name == e["old"]:
                    c.name = e["new"]
                    c.physical.append(fresh_physical(e["new"]))
                    break
            else:
                raise ValueError(f"CHANGE: no such column: {e['old']}")
        elif op == "modify":
            for c in cols:
                if c.name == e["name"]:
                    c.type = e["type"]
                    break
            else:
                raise ValueError(f"MODIFY: no such column: {e['name']}")
    return cols


def logical_schema(table_dir: str) -> list[tuple[str, str]]:
    """Current (name, type) list after replaying the evolution log."""
    return [(c.name, c.type) for c in _replay(_read_log(table_dir))]


def create_table(spark: SparkSession, table_dir: str, df: DataFrame) -> None:
    """Materialize ``df`` as the table's first snapshot + log entry 0."""
    os.makedirs(table_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(table_dir, DATA_DIR))
    schema = [(f_.name, f_.dataType.simpleString()) for f_ in df.schema.fields]
    _write_log(table_dir, [{"op": "create", "schema": schema}])


def apply_ddl(table_dir: str, sql: str) -> DDLConfig:
    """Parse + validate + append an ALTER to the evolution log (O(1),
    no data rewrite). Returns the parsed config for mapping refresh."""
    cfg = parse_alter(sql)
    entries = _read_log(table_dir)
    # STATEMENT order: 'DROP COLUMN a, ADD COLUMN a ...' must replay
    # drop-then-add (grouping by op kind rejected valid MySQL — r2)
    entries.extend(cfg.ops)
    _replay(entries)  # validate before publishing
    _write_log(table_dir, entries)
    return cfg


def append_rows(spark: SparkSession, table_dir: str, df: DataFrame) -> None:
    """Append a batch under the CURRENT logical schema (post-rename names;
    added columns may be present or absent — absent reads as NULL).
    Rows are written under each column's current PHYSICAL name (mangled
    when a name was dropped and re-added), so old file data never bleeds
    into the re-added column."""
    cols = {c.name: c for c in _replay(_read_log(table_dir))}
    unknown = [c for c in df.columns if c not in cols]
    if unknown:
        raise ValueError(f"append: columns not in logical schema: {unknown}")
    cast = df.select(
        *[F.col(c).cast(cols[c].type).alias(cols[c].physical[-1]) for c in df.columns]
    )
    cast.write.mode("append").parquet(
        os.path.join(table_dir, _data_dir(_read_log(table_dir)))
    )


def read_evolved(spark: SparkSession, table_dir: str) -> DataFrame:
    """Scan with ``mergeSchema`` and project the logical schema.

    Old files lacking an added column yield NULL; renamed columns
    coalesce over the physical-name history (newest first); MODIFY types
    apply as casts. Filters on non-renamed columns still push down to
    the parquet scan — the projection is plain Column math.
    """
    entries = _read_log(table_dir)
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(table_dir, _data_dir(entries))
    )
    have = set(merged.columns)
    out = []
    for c in _replay(entries):
        present = [p for p in reversed(c.physical) if p in have]
        if not present:
            expr = F.lit(None)
        elif len(present) == 1:
            expr = F.col(present[0])
        else:
            expr = F.coalesce(*[F.col(p) for p in present])
        out.append(expr.cast(c.type).alias(c.name))
    return merged.select(*out)


def compact_table(spark: SparkSession, table_dir: str) -> None:
    """Rewrite the table under its current logical schema and reset the
    log — the explicit, heavyweight operation (full scan + write) that
    collapses rename histories so scans are single-column again.

    Crash-atomic via data-dir versioning: the compacted files land in a
    fresh ``data-<hex>`` dir, and the fsync'd log swap (whose create
    entry names that dir) is the SINGLE commit point — a crash before it
    leaves the old log + old dir fully intact (the orphan dir is swept
    by the next compaction), a crash after it leaves the new generation
    live. The previous in-place ``os.replace`` over ``data/`` could die
    between the data swap and the log reset, leaving a log whose mangled
    physical names (``x__v2``) no longer existed in the files — those
    columns silently read as NULL (review r5)."""
    import shutil

    entries = _read_log(table_dir)
    cur = _data_dir(entries)
    # sweep orphan generations from prior crashed compactions (anything
    # versioned that the live log does not reference)
    for name in os.listdir(table_dir):
        if name.startswith("data-") and name != cur:
            shutil.rmtree(os.path.join(table_dir, name), ignore_errors=True)
    df = read_evolved(spark, table_dir)
    nxt = f"data-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(os.path.join(table_dir, nxt))
    schema = [(f_.name, f_.dataType.simpleString()) for f_ in df.schema.fields]
    _write_log(table_dir, [{"op": "create", "schema": schema, "data_dir": nxt}])
    shutil.rmtree(os.path.join(table_dir, cur), ignore_errors=True)
