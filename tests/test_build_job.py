"""Cluster entry point (tools/build_job.py): corpus reader resolution.

The build itself is covered by test_index_build; this pins the
--corpus-format contract (parquet path vs catalog table vs auto)."""

from __future__ import annotations

import importlib.util
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "build_job", os.path.join(os.path.dirname(__file__), "..", "tools", "build_job.py")
)
build_job = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_SPEC and build_job)


@pytest.fixture()
def corpus_pq(spark, tmp_path):
    from dbsyncer_spark.fixtures.corpus import gen_corpus_pdf

    p = str(tmp_path / "corpus_pq")
    spark.createDataFrame(
        gen_corpus_pdf(n_docs=10, seed=3),
        "repo string, path string, commit string, lang string, content string",
    ).write.parquet(p)
    return p


def test_read_corpus_parquet_and_auto_path(spark, corpus_pq):
    assert build_job._read_corpus(spark, corpus_pq, "parquet").count() == 10
    # auto: slash/scheme -> parquet path
    assert build_job._read_corpus(spark, corpus_pq, "auto").count() == 10


def test_read_corpus_table_and_auto_name(spark, corpus_pq):
    spark.read.parquet(corpus_pq).createOrReplaceTempView("corpus_tbl")
    assert build_job._read_corpus(spark, "corpus_tbl", "table").count() == 10
    # auto: bare name -> catalog/table lookup
    assert build_job._read_corpus(spark, "corpus_tbl", "auto").count() == 10
