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


def bucket_counts(
    df: DataFrame, key_cols: list[str] | None = None, num_buckets: int = 256
) -> dict[int, int]:
    """Per-bucket row counts — the one aggregation job behind the id
    assignment (keys-only scan; Catalyst prunes every other column),
    returning ``num_buckets`` ints to the driver. Exposed separately
    from :func:`bucket_offsets` because the counts also carry the total
    row count (their sum): ``append_segment`` sizes its doc-id-space
    claim from the SAME pass that assigns ids, instead of paying a
    separate ``docs.count()`` scan over the batch (r5 review)."""
    keys = key_cols or KEY_COLS
    with_bucket = df.withColumn("_bucket", F.pmod(F.xxhash64(*keys), F.lit(num_buckets)))
    return {
        int(r["_bucket"]): int(r["cnt"])
        for r in with_bucket.groupBy("_bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }


def offsets_from_counts(counts: dict[int, int], num_buckets: int = 256) -> dict[int, int]:
    """Cumulative per-bucket start offsets from :func:`bucket_counts`."""
    offsets, acc = {}, 0
    for b in range(num_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)
    return offsets


def bucket_offsets(
    df: DataFrame, key_cols: list[str] | None = None, num_buckets: int = 256
) -> dict[int, int]:
    """Pass 1 of the id assignment: cumulative per-bucket row offsets.

    One small aggregation job returning ``num_buckets`` ints to the
    driver. Exposed so a caller that derives several lineages from the
    SAME key set (e.g. ``build_index``'s termdocs and docstats stages)
    runs the count job once and shares the offsets."""
    return offsets_from_counts(
        bucket_counts(df, key_cols, num_buckets), num_buckets
    )


def assign_doc_ids(
    df: DataFrame,
    key_cols: list[str] | None = None,
    num_buckets: int = 256,
    offsets: dict[int, int] | None = None,
) -> DataFrame:
    """Add a dense deterministic ``doc_id`` (long, 0-based) column.

    ``doc_id`` is a pure function of the key set: two DataFrames with
    the same (key_cols, num_buckets, key values) get identical ids no
    matter what OTHER columns they carry — so a caller can assign ids
    on a narrow projection (shuffling 100-byte rows instead of document
    content) and trust they line up with a wide lineage over the same
    rows. Pass ``offsets`` (from :func:`bucket_offsets`) to skip the
    count job when it was already run for this key set."""
    keys = key_cols or KEY_COLS
    with_bucket = df.withColumn("_bucket", F.pmod(F.xxhash64(*keys), F.lit(num_buckets)))
    if offsets is None:
        offsets = bucket_offsets(df, keys, num_buckets)
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
