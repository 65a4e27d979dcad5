"""Structured Streaming path: file-source micro-batches -> index segments
via foreachBatch (C1/C5 analog), exactly-once by checkpoint + idempotent
restart."""

from __future__ import annotations

import os

import pytest

from dbsyncer_spark.fixtures.corpus import gen_corpus_pdf
from dbsyncer_spark.index.search import SearchIndex
from dbsyncer_spark.streaming.incremental import stream_to_index

SCHEMA = "repo string, path string, commit string, lang string, content string"


@pytest.fixture()
def corpus_files(spark, tmp_path):
    src = str(tmp_path / "incoming")
    pdf = gen_corpus_pdf(n_docs=120, seed=7)
    spark.createDataFrame(pdf.iloc[:60], SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src, "batch0")
    )
    return src, pdf


def test_stream_builds_index_and_restart_is_idempotent(spark, tmp_path, corpus_files):
    src, pdf = corpus_files
    idx_dir = str(tmp_path / "sidx")
    ckpt = str(tmp_path / "ckpt")

    stream = spark.readStream.schema(SCHEMA).option("recursiveFileLookup", "true").parquet(src)
    q = stream_to_index(
        stream, idx_dir, ckpt,
        num_shards=4, range_size=256, num_id_buckets=8,
    ).start()
    q.awaitTermination(120)

    idx = SearchIndex(spark, idx_dir)
    assert idx.n_docs == 60
    first = [tuple(r) for r in idx.search("merge offset", k=5).collect()]
    assert first

    # restart with NO new data: checkpoint replays nothing, index unchanged
    q2 = stream_to_index(
        stream, idx_dir, ckpt, num_shards=4, range_size=256, num_id_buckets=8
    ).start()
    q2.awaitTermination(120)
    idx2 = SearchIndex(spark, idx_dir)
    assert idx2.n_docs == 60

    # new file arrives -> appended as a second segment, searchable
    spark.createDataFrame(pdf.iloc[60:], SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src, "batch1")
    )
    q3 = stream_to_index(
        stream, idx_dir, ckpt, num_shards=4, range_size=256, num_id_buckets=8
    ).start()
    q3.awaitTermination(180)
    idx3 = SearchIndex(spark, idx_dir)
    assert idx3.n_docs == 120
    assert len(idx3.meta["segments"]) == 2
    assert idx3.search("merge offset", k=5).count() == 5

    # exactly-once under redelivery: foreachBatch is at-least-once (crash
    # between the meta swap and the checkpoint commit re-delivers the
    # batch); the batchId-derived segment name makes the replay a no-op
    from dbsyncer_spark.index.build import append_segment

    seg = sorted(idx3.meta["segments"])[-1]
    batch1 = spark.read.parquet(os.path.join(src, "batch1"))
    replay_meta = append_segment(
        spark, batch1, idx_dir, segment=seg,
        num_shards=4, range_size=256, num_id_buckets=8,
    )
    assert replay_meta["segment"] == seg
    idx4 = SearchIndex(spark, idx_dir)
    assert idx4.n_docs == 120 and len(idx4.meta["segments"]) == 2
