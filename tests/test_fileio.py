"""File connector semantics (reference S7/K3): line split/join round trip,
positional typed parse, missing-trailing-field -> NULL."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbsyncer_spark.sources.fileio import format_lines, parse_lines, read_split_file, write_split_file


def test_roundtrip(spark, tmp_path):
    rows = [(1, "alice", 3.5), (2, "bob", None), (3, "", 0.25)]
    df = spark.createDataFrame(rows, "id bigint, name string, score double")
    p = str(tmp_path / "out")
    write_split_file(df, p, sep="|")
    back = read_split_file(
        spark, p, [("id", "bigint"), ("name", "string"), ("score", "double")], sep="|"
    )
    got = sorted([(r.id, r.name, r.score) for r in back.collect()])
    # NULL writes as '' and reads back as NULL for numerics, '' for strings
    assert got == [(1, "alice", 3.5), (2, "bob", None), (3, "", 0.25)]


def test_positional_parse_missing_and_extra(spark):
    df = spark.createDataFrame([("1|x",), ("2|y|9|extra",)], "value string")
    out = df.select(
        *parse_lines("value", [("a", "bigint"), ("b", "string"), ("c", "int")], sep="|")
    ).collect()
    assert (out[0].a, out[0].b, out[0].c) == (1, "x", None)  # missing -> NULL
    assert (out[1].a, out[1].b, out[1].c) == (2, "y", 9)  # extra ignored


def test_separator_is_regex_escaped(spark):
    df = spark.createDataFrame([("a.b.c",)], "value string")
    out = df.select(*parse_lines("value", [("x", "string"), ("y", "string")], sep=".")).collect()
    assert (out[0].x, out[0].y) == ("a", "b")


def test_format_nulls_empty(spark):
    df = spark.createDataFrame([(1, None)], "a bigint, b string")
    assert format_lines(df, ",").collect()[0].value == "1,"
