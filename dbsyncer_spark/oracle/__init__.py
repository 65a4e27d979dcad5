from dbsyncer_spark.oracle.bm25_oracle import bm25_oracle_topk, corpus_stats  # noqa: F401
