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
    # CJK: unigram emission, mixed-script adjacency, camel boundaries
    "中文全文检索",
    "abc中国def Big中X 你好world",
    "getUser中Name 索引123构建",
]


def test_python_tokenizer_basics():
    assert tokenize_py("getUserName") == ["get", "user", "name"]
    assert tokenize_py("parseHTTPServerResponse") == ["parse", "http", "server", "response"]
    assert tokenize_py("snake_case_x") == ["snake", "case", "x"]
    assert tokenize_py(None) == []
    assert tokenize_py("a1B2") == ["a1", "b2"]


def test_cjk_unigrams():
    assert tokenize_py("中文检索") == ["中", "文", "检", "索"]
    assert tokenize_py("abc中def") == ["abc", "中", "def"]
    assert tokenize_py("getUser中Name") == ["get", "user", "中", "name"]


def test_arrow_kernel_matches_python_on_cjk(spark):
    """The index build's pyarrow tokenize-count kernel must agree with
    tokenize_py on CJK text (dl + per-term tf)."""
    from collections import Counter

    from dbsyncer_spark.index.build import TERMDOCS_SCHEMA, _tokenize_count, term_id

    rows = [(i, None, c) for i, c in enumerate(CASES)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, content string")
    got = df.mapInPandas(_tokenize_count(False), TERMDOCS_SCHEMA).collect()
    by_doc: dict[int, dict[int, int]] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, {})[r.tid] = r.tf
        assert r.dl == len(tokenize_py(CASES[r.doc_id]))
    for i, c in enumerate(CASES):
        want = {term_id(t): n for t, n in Counter(tokenize_py(c)).items()}
        assert by_doc.get(i, {}) == want, c


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


def test_token_count_col_matches_array_size(spark):
    """token_count_col (regexp_count scalar) == size(tokens_col) on
    every shared case incl. CJK, empties, and NULL — the parity gate
    that lets BM25 doc-length stats skip the array build."""
    from dbsyncer_spark.functions.tokenizer import token_count_col

    df = spark.createDataFrame(
        [(c,) for c in CASES] + [(None,)], "text string"
    )
    rows = df.select(
        F.size(tokens_col("text")).alias("arr"),
        token_count_col("text").alias("cnt"),
    ).collect()
    for r in rows:
        assert r.arr == r.cnt or (r.arr in (None, -1) and r.cnt is None)


def test_token_count_col_matches_on_fixture_corpus(spark):
    """Same parity over the deterministic fixture corpus (real code-ish
    text at volume, all langs)."""
    from dbsyncer_spark.fixtures.corpus import corpus_df
    from dbsyncer_spark.functions.tokenizer import token_count_col

    docs = corpus_df(spark, n_docs=300, seed=11)
    bad = docs.select(
        F.size(tokens_col("content")).alias("arr"),
        token_count_col("content").alias("cnt"),
    ).filter(F.col("arr") != F.col("cnt")).count()
    assert bad == 0
