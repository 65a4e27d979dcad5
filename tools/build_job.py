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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="parquet/Iceberg path of (repo,path,commit,lang,content)")
    ap.add_argument("--index", required=True, help="output index directory")
    ap.add_argument("--num-shards", type=int, default=512)
    ap.add_argument("--use-stopwords", action="store_true")
    ap.add_argument("--no-resume", action="store_true")
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

    from dbsyncer_spark.index.build import build_index
    from dbsyncer_spark.index.search import SearchIndex

    docs = spark.read.parquet(args.corpus)
    meta = build_index(
        spark,
        docs,
        args.index,
        num_shards=args.num_shards,
        use_stopwords=args.use_stopwords,
        resume=not args.no_resume,
    )
    print(json.dumps({"built": meta}, default=str))

    if args.query:
        idx = SearchIndex(spark, args.index)
        idx.warm()
        top = idx.search(args.query, k=args.k, mode="wand")
        for r in idx.fetch(top).collect():
            print(json.dumps({"doc_id": r.doc_id, "score": r.score, "path": r.path,
                              "repo": r.repo, "sha256": r.sha256}))


if __name__ == "__main__":
    main()
