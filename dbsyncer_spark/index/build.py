"""Distributed inverted-index build (the reference's "full sync" analog —
query lifecycle SURVEY.md §3.1, re-expressed as one declarative Spark job
chain instead of reader/picker/writer thread pools).

Pipeline (every stage a DataFrame op; Python only in Arrow UDFs):

  docs(repo,path,commit,lang,content)
    -> assign dense deterministic doc_ids        (docids.py, two-pass)
    -> tokenize (vectorized Arrow pandas_udf)    (code-aware, north star)
    -> docstats: (doc_id, keys, dl, sha256)      [stage: docstats]
    -> explode -> groupBy(term, doc_id) tf       (partial+final hash agg;
       hot terms don't skew this agg because doc_id is in the key)
    -> shard = md5(term) % S, range_id = doc_id // range_size
       (hot terms are *split* across ranges = the north rule's per-term
       split postings; the salted repartition below spreads pack work)
    -> repartition(salted) -> sortWithinPartitions(shard,term,range_id,doc_id)
    -> mapInPandas streaming packer -> delta+VByte blocks w/ skip +
       block-max metadata                        [stage: postings]
    -> dictionary from postings metadata cols    [stage: dictionary]
    -> meta.json (N, avgdl, params)              [stage: meta]

Each stage commits a lineage manifest (lineage.py); a re-run with the same
params skips committed stages — resume without recompute.

Index layout on disk::

    index_dir/
      meta.json                    # root: segments list + shared params
      segments/<name>/
        docstats/   (parquet, sorted by doc_id)
        postings/   (parquet, partitioned by shard, sorted term,range_id)
        dictionary/ (parquet, partitioned by shard)
        seg_meta.json
        _lineage/stage_*.json
      tombstones/  (parquet doc_id, optional — delete support)

Shard function is md5-based (computable identically driver-side for
partition pruning at query time): shard = int(md5(term)[:8], 16) % S.
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbsyncer_spark import BM25_B, BM25_K1
from dbsyncer_spark.functions.tokenizer import tokenize_pandas_udf, tokens_col
from dbsyncer_spark.index.codec import BLOCK_SIZE, pack_postings
from dbsyncer_spark.index.docids import assign_doc_ids
from dbsyncer_spark.index.lineage import commit_stage, params_hash, stage_committed

DEFAULT_NUM_SHARDS = 32
DEFAULT_RANGE_SIZE = 1 << 16

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("term", T.StringType()),
        T.StructField("range_id", T.LongType()),
        T.StructField("n_docs", T.IntegerType()),
        T.StructField("sum_tf", T.LongType()),
        T.StructField("blob", T.BinaryType()),
        T.StructField("block_first", T.ArrayType(T.LongType())),
        T.StructField("block_n", T.ArrayType(T.IntegerType())),
        T.StructField("block_off", T.ArrayType(T.IntegerType())),
        T.StructField("block_max_tf", T.ArrayType(T.IntegerType())),
        T.StructField("block_min_dl", T.ArrayType(T.IntegerType())),
    ]
)


def shard_col(term_col, num_shards: int):
    """md5-based term shard, JVM-side; mirror of py_shard()."""
    c = F.col(term_col) if isinstance(term_col, str) else term_col
    return F.pmod(F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long"), F.lit(num_shards)).cast("int")


def py_shard(term: str, num_shards: int) -> int:
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % num_shards


def _pack_stream(block_size: int):
    """mapInPandas streaming packer: rows sorted by (shard, term,
    range_id, doc_id) within the partition; groups never span partitions
    (repartition guarantees it) but may span Arrow batches — carry the
    tail group across batches."""

    def run(batches):
        carry: pd.DataFrame | None = None

        def pack_group(g: pd.DataFrame) -> dict:
            packed = pack_postings(
                g["doc_id"].to_numpy(), g["tf"].to_numpy(), g["dl"].to_numpy(), block_size
            )
            return {
                "shard": int(g["shard"].iloc[0]),
                "term": g["term"].iloc[0],
                "range_id": int(g["range_id"].iloc[0]),
                "n_docs": packed["n_docs"],
                "sum_tf": int(g["tf"].sum()),
                "blob": packed["blob"],
                "block_first": packed["block_first"],
                "block_n": packed["block_n"],
                "block_off": packed["block_off"],
                "block_max_tf": packed["block_max_tf"],
                "block_min_dl": packed["block_min_dl"],
            }

        def flush(pdf: pd.DataFrame, hold_tail: bool):
            nonlocal carry
            if pdf.empty:
                return None
            keys = pdf["term"].astype(str) + "\x00" + pdf["range_id"].astype(str)
            if hold_tail:
                last = keys.iloc[-1]
                tail_mask = keys == last
                # hold back the last (possibly incomplete) group
                carry = pdf[tail_mask]
                pdf = pdf[~tail_mask]
                keys = keys[~tail_mask]
                if pdf.empty:
                    return None
            else:
                carry = None
            out = [pack_group(g) for _, g in pdf.groupby(keys, sort=False)]
            return pd.DataFrame(out)

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            res = flush(pdf, hold_tail=True)
            if res is not None:
                yield res
        if carry is not None and not carry.empty:
            res = flush(carry, hold_tail=False)
            if res is not None:
                yield res

    return run


def tokenized_docs(
    docs: DataFrame, use_stopwords: bool, assign_ids: bool, num_id_buckets: int
) -> DataFrame:
    """docs -> (doc_id, repo, path, commit, lang, content, toks, dl)."""
    d = docs
    if assign_ids:
        d = assign_doc_ids(d, num_buckets=num_id_buckets)
    lang_col = F.col("lang") if use_stopwords else F.lit(None).cast("string")
    return d.withColumn("toks", tokenize_pandas_udf(F.col("content"), lang_col)).withColumn(
        "dl", F.size("toks")
    )


def postings_from_tf(
    tf: DataFrame,
    num_shards: int,
    range_size: int,
    block_size: int,
    pack_parallelism: int,
) -> DataFrame:
    """(term, doc_id, tf, dl) -> packed posting rows.

    The salted repartition keys on (shard, term, range_id) so a hot
    term's ranges land on *different* tasks (split postings), and the
    within-partition sort keeps groups contiguous for the streaming
    packer."""
    enriched = tf.withColumn("shard", shard_col("term", num_shards)).withColumn(
        "range_id", (F.col("doc_id") / F.lit(range_size)).cast("long")
    )
    return (
        enriched.repartition(pack_parallelism, "shard", "term", "range_id")
        .sortWithinPartitions("shard", "term", "range_id", "doc_id")
        .mapInPandas(_pack_stream(block_size), POSTINGS_SCHEMA)
    )


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    *,
    segment: str = "seg_000000",
    doc_id_offset: int = 0,
    num_shards: int = DEFAULT_NUM_SHARDS,
    range_size: int = DEFAULT_RANGE_SIZE,
    block_size: int = BLOCK_SIZE,
    use_stopwords: bool = False,
    k1: float = BM25_K1,
    b: float = BM25_B,
    num_id_buckets: int = 256,
    pack_parallelism: int | None = None,
    resume: bool = True,
    docs_have_ids: bool = False,
) -> dict:
    """Build one index segment; returns the segment meta dict.

    Deterministic: same (docs, params) -> byte-equivalent index. Resume:
    committed stages are skipped (per-stage lineage manifests)."""
    seg_dir = os.path.join(index_dir, "segments", segment)
    os.makedirs(seg_dir, exist_ok=True)
    if pack_parallelism is None:
        pack_parallelism = int(spark.conf.get("spark.sql.shuffle.partitions"))
    params = {
        "segment": segment,
        "doc_id_offset": doc_id_offset,
        "num_shards": num_shards,
        "range_size": range_size,
        "block_size": block_size,
        "use_stopwords": use_stopwords,
        "k1": k1,
        "b": b,
        "tokenizer": "code_aware_v1",
    }
    phash = params_hash(params)

    base = tokenized_docs(docs, use_stopwords, not docs_have_ids, num_id_buckets)
    if doc_id_offset:
        base = base.withColumn("doc_id", F.col("doc_id") + F.lit(doc_id_offset))
    base = base.persist()

    docstats_path = os.path.join(seg_dir, "docstats")
    postings_path = os.path.join(seg_dir, "postings")
    dict_path = os.path.join(seg_dir, "dictionary")

    # ---- stage: docstats ---------------------------------------------
    if not (resume and stage_committed(seg_dir, "docstats", phash)):
        (
            base.select(
                "doc_id",
                "repo",
                "path",
                "commit",
                "lang",
                F.col("dl").cast("int").alias("dl"),
                F.sha2("content", 256).alias("sha256"),
                (F.col("doc_id") / F.lit(range_size)).cast("long").alias("range_id"),
            )
            .repartition(max(4, pack_parallelism // 4), "range_id")
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(docstats_path)
        )
        per_part = (
            spark.read.parquet(docstats_path)
            .groupBy(F.input_file_name().alias("file"))
            .agg(F.count(F.lit(1)).alias("rows"), F.sum("dl").alias("sum_dl"))
            .collect()
        )
        commit_stage(
            seg_dir,
            "docstats",
            phash,
            partitions=[{"file": os.path.basename(r.file), "rows": r.rows, "sum_dl": r.sum_dl} for r in per_part],
            metrics={"rows": int(sum(r.rows for r in per_part))},
        )

    # ---- stage: postings ---------------------------------------------
    if not (resume and stage_committed(seg_dir, "postings", phash)):
        tf = (
            base.select("doc_id", "dl", F.explode("toks").alias("term"))
            .groupBy("term", "doc_id", "dl")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        packed = postings_from_tf(tf, num_shards, range_size, block_size, pack_parallelism)
        (
            packed.write.mode("overwrite")
            .partitionBy("shard")
            .parquet(postings_path)
        )
        per_shard = (
            spark.read.parquet(postings_path)
            .groupBy("shard")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum("n_docs").alias("postings"),
                F.sum(F.length("blob")).alias("bytes"),
            )
            .collect()
        )
        commit_stage(
            seg_dir,
            "postings",
            phash,
            partitions=[
                {"shard": r.shard, "rows": r.rows, "postings": int(r.postings), "bytes": int(r.bytes)}
                for r in per_shard
            ],
            metrics={"total_postings": int(sum(r.postings for r in per_shard))},
        )

    # ---- stage: dictionary (from postings metadata columns only —
    # column-pruned scan, the blob column is never read) ----------------
    if not (resume and stage_committed(seg_dir, "dictionary", phash)):
        (
            spark.read.parquet(postings_path)
            .groupBy("shard", "term")
            .agg(
                F.sum("n_docs").cast("long").alias("df"),
                F.sum("sum_tf").cast("long").alias("cf"),
                F.max(F.array_max("block_max_tf")).alias("max_tf"),
                F.min(F.array_min("block_min_dl")).alias("min_dl"),
            )
            .repartition(1, "shard")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(dict_path)
        )
        commit_stage(seg_dir, "dictionary", phash)

    # ---- stage: seg meta ----------------------------------------------
    stats = spark.read.parquet(docstats_path).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sum_dl"),
        F.max("doc_id").alias("max_doc_id"),
    ).collect()[0]
    seg_meta = {
        **params,
        "n_docs": int(stats.n),
        "sum_dl": int(stats.sum_dl or 0),
        "max_doc_id": int(stats.max_doc_id if stats.max_doc_id is not None else -1),
    }
    with open(os.path.join(seg_dir, "seg_meta.json"), "w") as f:
        json.dump(seg_meta, f, indent=2)
    commit_stage(seg_dir, "meta", phash, metrics=seg_meta)

    _update_root_meta(index_dir, segment, seg_meta)
    base.unpersist()
    return seg_meta


def _update_root_meta(index_dir: str, segment: str, seg_meta: dict) -> None:
    root = os.path.join(index_dir, "meta.json")
    meta = {"segments": {}, "params": {}}
    if os.path.exists(root):
        with open(root) as f:
            meta = json.load(f)
    shared = {k: seg_meta[k] for k in ("num_shards", "range_size", "block_size", "use_stopwords", "k1", "b", "tokenizer")}
    if meta["params"] and meta["params"] != shared:
        raise ValueError(f"segment params mismatch: {shared} vs index {meta['params']}")
    meta["params"] = shared
    meta["segments"][segment] = {
        "n_docs": seg_meta["n_docs"],
        "sum_dl": seg_meta["sum_dl"],
        "doc_id_offset": seg_meta["doc_id_offset"],
        "max_doc_id": seg_meta["max_doc_id"],
    }
    tmp = root + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp, root)


def append_segment(spark: SparkSession, docs: DataFrame, index_dir: str, **kwargs) -> dict:
    """Incremental append (CDC-analog): new docs become a new segment with
    doc_ids offset to the next range boundary so ranges never straddle
    segments (visibility = atomic root-meta swap, the Spark analog of the
    reference's commit-interval snapshot, ``DiskStorageService.java:62-95``)."""
    root = os.path.join(index_dir, "meta.json")
    with open(root) as f:
        meta = json.load(f)
    range_size = meta["params"]["range_size"]
    max_doc = max(s["max_doc_id"] for s in meta["segments"].values())
    offset = ((max_doc // range_size) + 1) * range_size
    seg_name = f"seg_{len(meta['segments']):06d}"
    for k in ("num_shards", "block_size", "use_stopwords", "k1", "b", "range_size"):
        if k in kwargs and kwargs[k] != meta["params"][k]:
            raise ValueError(
                f"append_segment: param {k}={kwargs[k]} conflicts with index "
                f"params ({meta['params'][k]}) — segments must share build params"
            )
        kwargs[k] = meta["params"][k]
    return build_index(spark, docs, index_dir, segment=seg_name, doc_id_offset=offset, **kwargs)
