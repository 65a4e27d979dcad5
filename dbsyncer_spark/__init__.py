"""dbsyncer_spark — a brand-new PySpark-native fulltext (inverted-index +
BM25 top-k) analytics engine with the query and data-processing
capabilities of the reference system (86dbs/dbsyncer), re-expressed
Spark-first.

Layout
------
- ``session``    : tuned SparkSession factory (local testing; cluster-ready)
- ``fixtures``   : deterministic synthetic source-code corpus + query set
- ``functions``  : code-aware tokenizer (Column + Arrow/pandas UDF forms),
                   scalar value converters, text-analysis functions
- ``index``      : distributed inverted-index build — posting construction,
                   term-sharded merge, delta+VByte compression, block-max
                   metadata, per-partition lineage/resume
- ``query``      : BM25 scoring (exhaustive DataFrame scorer and block-max
                   WAND), filter IR, top-k paging, highlighting
- ``oracle``     : pure-Python exhaustive BM25 oracle used by the tests
- ``ops``        : training-data pipeline operators — dedup (exact, MinHash
                   LSH, SimHash, n-gram Jaccard, embedding-cosine),
                   similarity search, multimodal column plumbing
- ``sources``    : separated-values file source/sink (File-connector analog)
- ``streaming``  : incremental (CDC-analog) index maintenance

Design stance (see SURVEY.md §7): everything is DataFrames; Python touches
data only through vectorized Arrow UDFs; determinism everywhere (stable
sort keys, fixed seeds, no wall-clock/UUID in data paths).
"""

__version__ = "0.1.0"

BM25_K1 = 1.2
BM25_B = 0.75
