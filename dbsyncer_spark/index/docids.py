"""Deterministic, dense, *distributed* docId assignment.

The reference assigns doc identity with a time-based Snowflake ID
(``storage/impl/SnowflakeIdWorker.java:12-80``) — nondeterministic across
runs, which would break rank-identical replay. We replace it with dense
deterministic IDs (SURVEY.md §2.5 F15).

A naive ``row_number() OVER (ORDER BY key)`` collapses to a single
partition at 10^12 rows. Instead, a two-pass bucket scheme that stays
fully parallel:

1. bucket = pmod(xxhash64(key_cols), B)  — pure hash, deterministic
2. count rows per bucket (one small agg; B ints to the driver)
3. offset[b] = cumulative count of buckets < b
4. doc_id = offset[bucket] + (row_number within bucket ordered by key) - 1

IDs are dense 0..N-1 and a pure function of the input key set. The
within-bucket window shuffles on ``bucket`` (B ≈ cores × 4 — balanced by
the hash), never globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

KEY_COLS = ["repo", "path", "commit"]


def assign_doc_ids(df: DataFrame, key_cols: list[str] | None = None, num_buckets: int = 256) -> DataFrame:
    """Add a dense deterministic ``doc_id`` (long, 0-based) column."""
    keys = key_cols or KEY_COLS
    with_bucket = df.withColumn("_bucket", F.pmod(F.xxhash64(*keys), F.lit(num_buckets)))
    counts = {
        r["_bucket"]: r["cnt"]
        for r in with_bucket.groupBy("_bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for b in range(num_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)
    # offsets map is tiny -> embed as a CASE-like map expression
    mapping = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = W.partitionBy("_bucket").orderBy(*keys)
    return (
        with_bucket.withColumn(
            "doc_id",
            (mapping[F.col("_bucket")] + F.row_number().over(w) - F.lit(1)).cast("long"),
        )
        .drop("_bucket")
    )
