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
