#!/usr/bin/env python
"""Cluster entry point: build the inverted index over a corpus table and
optionally serve a query — shipped via spark-submit --py-files.

    zip -r dbsyncer_spark.zip dbsyncer_spark
    spark-submit --master <cluster> --py-files dbsyncer_spark.zip \
        tools/build_job.py --corpus s3://bucket/corpus --index s3://bucket/idx \
        --num-shards 512 --query "parse buffer offset"

The session comes from spark-submit (master/executors/memory set there);
this script only sets SQL-level knobs that belong to the job.
"""

from __future__ import annotations

import argparse
import json


def _read_corpus(spark, corpus: str, fmt: str):
    """Resolve --corpus: the index build is source-agnostic (any DataFrame
    with the input_hint columns), so the only job-level concern is which
    reader to use. Iceberg reads go through DataSourceV2, so column
    pruning and partition pruning are the catalog's responsibility and
    arrive for free in the build's scan."""
    if fmt == "parquet":
        return spark.read.parquet(corpus)
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(corpus)
    if fmt == "table":
        return spark.read.table(corpus)
    looks_path = "/" in corpus or ":" in corpus
    return spark.read.parquet(corpus) if looks_path else spark.read.table(corpus)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True,
                    help="corpus of (repo,path,commit,lang,content): a parquet "
                         "path, an Iceberg table path, or a catalog table name")
    ap.add_argument("--corpus-format", default="auto",
                    choices=["auto", "parquet", "iceberg", "table"],
                    help="how to read --corpus. 'iceberg' needs the Iceberg "
                         "runtime on the cluster (spark-submit --packages "
                         "org.apache.iceberg:iceberg-spark-runtime-...); "
                         "'table' = spark.read.table (any configured catalog, "
                         "incl. Iceberg catalogs — scan pushdown/partition "
                         "pruning come from the catalog's DataSourceV2). "
                         "'auto': path-looking values read as parquet, bare "
                         "names as catalog tables")
    ap.add_argument("--index", required=True, help="output index directory")
    ap.add_argument("--num-shards", type=int, default=512)
    ap.add_argument("--use-stopwords", action="store_true")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--store-positions", action="store_true",
                    help="positional index (enables search_phrase)")
    ap.add_argument("--max-content-bytes", type=int, default=None,
                    help="dead-letter rows with NULL/oversized content instead of failing")
    ap.add_argument("--append", action="store_true",
                    help="append to an existing index as a new segment (CDC batch)")
    ap.add_argument("--maintain", action="store_true",
                    help="run one tiered-policy merge (maybe_merge) after the build/append")
    ap.add_argument("--query", default=None, help="optional BM25 query to run after the build")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("dbsyncer_spark_build")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(2**31 - 1))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    from dbsyncer_spark.index.build import append_segment, build_index
    from dbsyncer_spark.index.search import SearchIndex
    from dbsyncer_spark.streaming.incremental import maybe_merge

    docs = _read_corpus(spark, args.corpus, args.corpus_format)
    if args.append:
        # forward explicitly-requested params so append_segment's
        # params-conflict check can fire (silently ignoring
        # --store-positions against a non-positional index would produce
        # a phrase-blind segment with no error)
        fwd = {}
        if args.store_positions:
            fwd["store_positions"] = True
        if args.use_stopwords:
            fwd["use_stopwords"] = True
        meta = append_segment(
            spark, docs, args.index, max_content_bytes=args.max_content_bytes, **fwd
        )
    else:
        meta = build_index(
            spark,
            docs,
            args.index,
            num_shards=args.num_shards,
            use_stopwords=args.use_stopwords,
            resume=not args.no_resume,
            store_positions=args.store_positions,
            max_content_bytes=args.max_content_bytes,
        )
    print(json.dumps({"built": meta}, default=str))
    if args.maintain:
        merged = maybe_merge(spark, args.index)
        print(json.dumps({"maintenance": merged}, default=str))

    if args.query:
        idx = SearchIndex(spark, args.index)
        idx.warm()
        top = idx.search(args.query, k=args.k, mode="wand")
        for r in idx.fetch(top).collect():
            print(json.dumps({"doc_id": r.doc_id, "score": r.score, "path": r.path,
                              "repo": r.repo, "sha256": r.sha256}))


if __name__ == "__main__":
    main()
