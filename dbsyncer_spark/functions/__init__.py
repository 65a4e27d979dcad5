from dbsyncer_spark.functions.tokenizer import (  # noqa: F401
    CAMEL_RULES,
    STOPWORDS,
    tokenize_pandas_udf,
    tokens_col,
    tokenize_py,
)
