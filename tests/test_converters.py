"""Scalar converter catalog (reference ConvertEnum) semantics."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from dbsyncer_spark.functions import converters as C


def test_value_converters(spark):
    df = spark.createDataFrame(
        [("hello", None, 1234567890123, "2024-03-01 12:30:45", b"bytes!", 42.5)],
        "s string, missing string, ms long, ts_str string, bin binary, num double",
    )
    out = df.select(
        C.default("missing", "dflt").alias("default"),
        C.replace("s", "l,L").alias("replace"),
        C.prepend("s", "pre_").alias("prepend"),
        C.append("s", "_post").alias("append"),
        C.rem_str_first("s").alias("rem_first"),
        C.rem_str_last("s").alias("rem_last"),
        C.sub_str_first("s", 2).alias("first2"),
        C.sub_str_last("s", 2).alias("last2"),
        C.clear("s").alias("cleared"),
        C.number_to_string("num").alias("numstr"),
        C.bytes_to_string("bin").alias("binstr"),
        C.long_to_timestamp("ms").alias("from_ms"),
        C.string_to_timestamp("ts_str").alias("parsed"),
        C.timestamp_to_long(C.string_to_timestamp("ts_str")).alias("back_ms"),
        C.timestamp_to_chinese_standard_time(C.string_to_timestamp("ts_str")).alias("cst"),
        C.string_to_format_date("ts_str", "yyyy-MM-dd HH:mm:ss").alias("fmt_date"),
    ).collect()[0]
    assert out.default == "dflt"
    assert out.replace == "heLLo"
    assert out.prepend == "pre_hello"
    assert out.append == "hello_post"
    assert out.rem_first == "ello"
    assert out.rem_last == "hell"
    assert out.first2 == "he"
    assert out.last2 == "lo"
    assert out.cleared is None
    assert out.numstr == "42.5"
    assert out.binstr == "bytes!"
    assert out.from_ms == datetime.datetime(2009, 2, 13, 23, 31, 30, 123000)
    assert out.parsed == datetime.datetime(2024, 3, 1, 12, 30, 45)
    assert out.back_ms == 1709296245000
    assert out.cst == "2024-03-01 12:30:45"
    assert out.fmt_date == datetime.date(2024, 3, 1)


def test_null_in_null_out(spark):
    df = spark.createDataFrame([(None,)], "s string")
    out = df.select(
        C.replace("s", "a,b").alias("r"),
        C.rem_str_first("s").alias("rf"),
        C.sub_str_last("s", 3).alias("sl"),
    ).collect()[0]
    assert out.r is None and out.rf is None and out.sl is None


def test_apply_converters_pipeline(spark):
    df = spark.createDataFrame([("abc", None)], "a string, b string")
    out = C.apply_converters(
        df,
        [("a", "PREPEND", ("x_",)), ("a", "APPEND", ("_y",)), ("b", "DEFAULT", ("zz",))],
    ).collect()[0]
    assert out.a == "x_abc_y"
    assert out.b == "zz"
