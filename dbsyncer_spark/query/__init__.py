from dbsyncer_spark.query.bm25 import bm25_topk, idf_col, tfnorm_col  # noqa: F401
