"""Highlighter (reference F12): Column implementation vs a pure-Python
twin using the same token-boundary rules."""

from __future__ import annotations

import re

from dbsyncer_spark.functions.highlight import POST_TAG, PRE_TAG, highlight_col
from dbsyncer_spark.functions.tokenizer import tokenize_py


def py_highlight(text: str, query: str) -> str:
    terms = sorted(set(tokenize_py(query)), key=len, reverse=True)
    if not terms:
        return text
    alt = "|".join(re.escape(t) for t in terms)
    pat = re.compile(f"(?<![a-zA-Z0-9])({alt})(?![a-zA-Z0-9])", re.IGNORECASE)
    return pat.sub(lambda m: PRE_TAG + m.group(1) + POST_TAG, text)


def test_matches_python_twin(spark, corpus):
    from pyspark.sql import functions as F

    q = "merge offset token"
    got = (
        corpus.limit(50)
        .select("content", highlight_col("content", q).alias("h"))
        .collect()
    )
    hit = 0
    for r in got:
        assert r.h == py_highlight(r.content, q)
        if PRE_TAG in r.h:
            hit += 1
    assert hit > 0  # corpus contains these hot-ish terms


def test_whole_token_only(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("merge merged premerge merge",)], "content string"
    )
    out = df.select(highlight_col("content", "merge").alias("h")).collect()[0].h
    assert out == (
        f"{PRE_TAG}merge{POST_TAG} merged premerge {PRE_TAG}merge{POST_TAG}"
    )


def test_empty_query_unchanged(spark):
    df = spark.createDataFrame([("hello world",)], "content string")
    assert df.select(highlight_col("content", "").alias("h")).collect()[0].h == "hello world"


def test_best_fragment(spark):
    from dbsyncer_spark.functions.highlight import best_fragment_col

    # hits cluster late in the doc: fragment must center on them, not
    # on the head of the text
    text = ("filler " * 40) + "the merge offset pair sits here " + ("tail " * 40)
    df = spark.createDataFrame([(text.strip(),)], "content string")
    frag = df.select(
        best_fragment_col("content", "merge offset", width=10).alias("f")
    ).collect()[0].f
    assert f"{PRE_TAG}merge{POST_TAG}" in frag and f"{PRE_TAG}offset{POST_TAG}" in frag
    assert len(frag) < len(text) / 4  # it's a snippet, not the doc
    # hitless doc -> leading window, unwrapped
    frag2 = df.select(
        best_fragment_col("content", "zzznothere", width=6).alias("f")
    ).collect()[0].f
    assert frag2.startswith("filler filler") and PRE_TAG not in frag2


def test_fragment_duckdb_twin(spark):
    import duckdb

    from dbsyncer_spark.functions.highlight import (
        best_fragment_col,
        highlight_col,
        highlight_sql_exprs,
    )

    texts = [
        "merge the Offset now merge again",
        "getMergeOffset camel stays unmatched",
        "short",
        "",
        "x " * 100 + "merge offset " * 3,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = df.select(
        highlight_col("t", "merge offset").alias("h"),
        best_fragment_col("t", "merge offset", width=8).alias("f"),
    ).collect()
    exprs = highlight_sql_exprs("t", "merge offset", width=8)
    rel = duckdb.sql(
        f"SELECT {exprs['highlight']} AS h, {exprs['fragment']} AS f "
        "FROM (SELECT unnest(?::VARCHAR[]) AS t)",
        params=[texts],
    ).fetchall()
    for (gh, gf), (oh, of) in zip([(r.h, r.f) for r in got], rel):
        assert gh == oh
        assert gf == of
