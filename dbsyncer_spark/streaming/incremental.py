"""Incremental index maintenance — the CDC analog (SURVEY.md §2.7, §3.2).

The reference tails binlogs into per-table buffer actuators and applies
merged micro-batches (``GeneralBufferActuator.java``). Our engine models
the same semantics as append/delete batches against the segmented index:

- ``append_segment`` (in index.build): a new-docs batch becomes a new
  segment; visibility flips with the atomic root-meta swap (the analog of
  the reference's 3 s commit cycle, ``DiskStorageService.java:62-95``).
- ``delete_docs``: tombstones by key; the scorer masks tombstoned docs
  (reference delete-by-Term, ``Shard.java:122-145``).
- ``compact_segments``: decode + re-pack all live postings into a fresh
  single segment, dropping tombstoned docs — the TieredMergePolicy analog
  (``Shard.java:361-368``), run out-of-band like Lucene's merge threads.
- ``stream_to_index``: Structured Streaming ``foreachBatch`` wrapper — a
  micro-batch of new docs runs the same deterministic build pipeline
  (exactly-once by segment-name idempotence: batchId names the segment).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsyncer_spark.index.build import append_segment, build_index
from dbsyncer_spark.index.search import SearchIndex


def delete_docs(spark: SparkSession, index_dir: str, keys: DataFrame) -> int:
    """Tombstone docs matching ``keys`` (columns subset of repo/path/commit).

    Returns number of docs tombstoned. Deletes require a condition —
    mirrors the reference guard (``AbstractStorageService.java:62-75``).
    """
    if not keys.columns:
        raise ValueError("delete requires at least one key column")
    idx = SearchIndex(spark, index_dir)
    doomed = idx.docstats().join(keys, on=list(keys.columns), how="left_semi").select("doc_id")
    tomb_dir = os.path.join(index_dir, "tombstones")
    n = doomed.count()
    if n:
        doomed.write.mode("append").parquet(tomb_dir)
    return n


def compact_segments(spark: SparkSession, index_dir: str) -> dict:
    """Merge all segments into one, dropping tombstones (segment-merge
    analog). Doc ids and content are preserved; stats recomputed.

    Implementation: rather than re-tokenizing, decode every live posting
    back to (term, doc_id, tf, dl) rows and re-pack — a pure shuffle
    job, no Python-per-row, no re-analysis.
    """
    from dbsyncer_spark.index.build import postings_from_tf
    from dbsyncer_spark.index.lineage import commit_stage, params_hash

    idx = SearchIndex(spark, index_dir)
    params = idx.params
    with_positions = bool(params.get("store_positions"))
    tomb = idx._tombstones()

    decoded = decode_postings(idx._postings(), with_positions=with_positions)
    stats = idx.docstats()
    if tomb is not None:
        tomb_ids = tomb.select("doc_id").distinct()
        decoded = decoded.join(tomb_ids, "doc_id", "left_anti")
        stats = stats.join(tomb_ids, "doc_id", "left_anti")

    new_dir = os.path.join(index_dir, "segments_compacting")
    shutil.rmtree(new_dir, ignore_errors=True)
    seg_dir = os.path.join(new_dir, "seg_000000")
    os.makedirs(seg_dir, exist_ok=True)

    packed = postings_from_tf(
        decoded, params["num_shards"], params["range_size"], params["block_size"],
        int(spark.conf.get("spark.sql.shuffle.partitions")),
        with_positions=with_positions,
    )
    packed.write.mode("overwrite").partitionBy("shard").parquet(os.path.join(seg_dir, "postings"))
    stats.write.mode("overwrite").parquet(os.path.join(seg_dir, "docstats"))
    (
        spark.read.parquet(os.path.join(seg_dir, "postings"))
        .groupBy("shard", "tid")
        .agg(
            F.sum("n_docs").cast("long").alias("df"),
            F.sum("sum_tf").cast("long").alias("cf"),
            F.max(F.array_max("block_max_tf")).alias("max_tf"),
            F.min(F.array_min("block_min_dl")).alias("min_dl"),
        )
        .repartition(max(4, int(spark.conf.get("spark.sql.shuffle.partitions")) // 4), "shard")
        .sortWithinPartitions("tid")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(seg_dir, "dictionary"))
    )
    agg = spark.read.parquet(os.path.join(seg_dir, "docstats")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sum_dl"), F.max("doc_id").alias("mx")
    ).collect()[0]
    seg_meta = {
        **params,
        "segment": "seg_000000",
        "doc_id_offset": 0,
        "n_docs": int(agg.n),
        "sum_dl": int(agg.sum_dl or 0),
        "max_doc_id": int(agg.mx if agg.mx is not None else -1),
    }
    with open(os.path.join(seg_dir, "seg_meta.json"), "w") as f:
        json.dump(seg_meta, f, indent=2)
    commit_stage(seg_dir, "meta", params_hash(seg_meta), metrics=seg_meta)

    # atomic-ish swap: move old segments away, promote compacted set
    old = os.path.join(index_dir, "segments_old")
    shutil.rmtree(old, ignore_errors=True)
    os.replace(os.path.join(index_dir, "segments"), old)
    os.replace(new_dir, os.path.join(index_dir, "segments"))
    meta = {
        "params": params,
        "segments": {
            "seg_000000": {
                "n_docs": seg_meta["n_docs"],
                "sum_dl": seg_meta["sum_dl"],
                "doc_id_offset": 0,
                "max_doc_id": seg_meta["max_doc_id"],
            }
        },
    }
    tmp = os.path.join(index_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp, os.path.join(index_dir, "meta.json"))
    shutil.rmtree(os.path.join(index_dir, "tombstones"), ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    return seg_meta


def decode_postings(postings: DataFrame, with_positions: bool = False) -> DataFrame:
    """Compressed posting rows -> (term, doc_id, tf, dl[, pos]) via
    mapInPandas. ``with_positions`` decodes the positions stream too, so
    compaction of a positional index round-trips positions losslessly."""
    import numpy as np
    import pandas as pd

    from dbsyncer_spark.index.codec import unpack_postings, unpack_row_positions

    def gen(batches):
        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                row = {
                    "blob": r.blob,
                    "block_off": list(r.block_off),
                    "block_n": list(r.block_n),
                    "block_first": list(r.block_first),
                }
                if with_positions:
                    row["pos_blob"] = r.pos_blob
                    row["pos_off"] = list(r.pos_off)
                    d, t, l, flat = unpack_row_positions(row)
                else:
                    d, t, l = unpack_postings(row)
                out = {
                    "tid": np.repeat(np.int64(r.tid), d.size),
                    "doc_id": d.astype("int64"),
                    "tf": t.astype("int32"),
                    "dl": l.astype("int32"),
                }
                if with_positions:
                    bounds = np.zeros(d.size + 1, dtype=np.int64)
                    np.cumsum(t.astype(np.int64), out=bounds[1:])
                    out["pos"] = [
                        flat[bounds[i]:bounds[i + 1]].astype(np.int32)
                        for i in range(d.size)
                    ]
                outs.append(pd.DataFrame(out))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    schema = "tid long, doc_id long, tf int, dl int"
    if with_positions:
        schema += ", pos array<int>"
    return postings.mapInPandas(gen, schema)


def stream_to_index(
    docs_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    **build_kwargs,
):
    """Structured Streaming sink: each micro-batch of new docs becomes a
    segment (idempotent by batchId-derived segment name)."""

    def handle_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if os.path.exists(os.path.join(index_dir, "meta.json")):
            append_segment(spark, batch_df, index_dir, **build_kwargs)
        else:
            build_index(spark, batch_df, index_dir, **build_kwargs)

    return (
        docs_stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
