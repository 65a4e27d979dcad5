"""All three tokenizer implementations (Column expr, pandas UDF, plain
Python) must be byte-identical on the same inputs — the oracle's
semantics are the engine's by construction."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dbsyncer_spark.functions.tokenizer import (
    STOPWORDS,
    tokenize_pandas_udf,
    tokenize_py,
    tokenize_sql_expr,
    tokens_col,
)

CASES = [
    "getUserName",
    "parseHTTPServerResponse",
    "snake_case_name mixedCase99Value",
    "def foo(bar): return bar_baz + 42",
    "public static void main(String[] args)",
    "",
    "   ",
    "UPPER lower 123 ___",
    "a1B2c3D4",
    "éçà unicodeø stays—split",
]


def test_python_tokenizer_basics():
    assert tokenize_py("getUserName") == ["get", "user", "name"]
    assert tokenize_py("parseHTTPServerResponse") == ["parse", "http", "server", "response"]
    assert tokenize_py("snake_case_x") == ["snake", "case", "x"]
    assert tokenize_py(None) == []
    assert tokenize_py("a1B2") == ["a1", "b2"]


def test_stopwords():
    sw = frozenset(STOPWORDS["python"])
    assert tokenize_py("def foo return bar", sw) == ["foo", "bar"]


def test_column_expr_matches_python(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": CASES}))
    got = [r[0] for r in df.select(tokens_col("t")).collect()]
    want = [tokenize_py(c) for c in CASES]
    assert got == want


def test_pandas_udf_matches_python(spark):
    pdf = pd.DataFrame({"t": CASES, "lang": [None] * len(CASES)})
    df = spark.createDataFrame(pdf)
    got = [r[0] for r in df.select(tokenize_pandas_udf("t", "lang")).collect()]
    want = [tokenize_py(c) for c in CASES]
    assert got == want


def test_pandas_udf_lang_stopwords(spark):
    pdf = pd.DataFrame(
        {"t": ["def foo return bar", "def foo return bar"], "lang": ["python", "c"]}
    )
    df = spark.createDataFrame(pdf)
    got = [r[0] for r in df.select(tokenize_pandas_udf("t", "lang")).collect()]
    assert got[0] == ["foo", "bar"]          # python drops def+return
    assert got[1] == ["def", "foo", "bar"]   # c drops return, keeps def


def test_duckdb_sql_tokenizer_matches_python():
    expr = tokenize_sql_expr("t")
    rel = duckdb.sql(
        f"SELECT {expr} AS toks FROM (SELECT unnest(?::VARCHAR[]) AS t)",
        params=[CASES],
    )
    got = [r[0] for r in rel.fetchall()]
    want = [tokenize_py(c) for c in CASES]
    assert got == want
