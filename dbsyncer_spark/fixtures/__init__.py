from dbsyncer_spark.fixtures.corpus import gen_corpus_pdf, corpus_df, reference_queries  # noqa: F401
