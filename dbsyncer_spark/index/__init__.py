from dbsyncer_spark.index.build import build_index  # noqa: F401
from dbsyncer_spark.index.search import SearchIndex  # noqa: F401
