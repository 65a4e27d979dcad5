"""Physical-plan gates: the optimizations we rely on at scale must be
visible in the executed plan — shard partition pruning + tid pushdown on
the postings scan, broadcast join for the tiny query side, TakeOrdered
(never a global sort) for top-k, no exchange when cached partitioning
matches the grouping."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbsyncer_spark.index.build import build_index, py_shard, term_id
from dbsyncer_spark.index.search import SearchIndex


@pytest.fixture(scope="module")
def pindex(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planidx"))
    build_index(spark, corpus, d, num_shards=8, range_size=256, num_id_buckets=32)
    return SearchIndex(spark, d)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_postings_scan_is_pruned(pindex):
    """Query-term filter must reach the parquet scan: shard partition
    pruning + tid row-group pushdown (dictionary sorted by tid)."""
    tid = term_id("merge")
    shard = py_shard("merge", pindex.num_shards)
    scan = pindex._postings().filter(
        (F.col("shard") == shard) & (F.col("tid") == tid)
    )
    p = _plan(scan)
    assert "PartitionFilters" in p
    assert f"shard#" in p or "shard" in p
    assert "PushedFilters" in p and "tid" in p.split("PushedFilters", 1)[1][:200]


def test_topk_uses_take_ordered(pindex):
    p = _plan(pindex.search("merge offset", k=10))
    assert "TakeOrderedAndProject" in p
    # local sorts (", false, 0" = global=false) for the pandas grouping
    # are fine; a GLOBAL sort for top-k would be the scale bug
    for line in p.splitlines():
        if "Sort [" in line:
            assert ", false, 0" in line, f"global sort in top-k plan: {line}"


def test_fetch_uses_broadcast_join(pindex):
    top = pindex.search("merge offset", k=5)
    p = _plan(pindex.fetch(top))
    assert "BroadcastHashJoin" in p


def test_exhaustive_bm25_plan(spark, corpus):
    from dbsyncer_spark.index.docids import assign_doc_ids
    from dbsyncer_spark.query.bm25 import bm25_topk

    docs = assign_doc_ids(corpus.limit(200), num_buckets=8)
    p = _plan(bm25_topk(spark, docs, "merge offset", k=10))
    assert "TakeOrderedAndProject" in p
    assert "BroadcastHashJoin" in p  # df-stats + corpus-stats joins


def test_cached_partitioning_elides_exchange(spark, pindex):
    """With warmed caches, the scoring job must not re-shuffle postings:
    the persisted repartition(range_id) satisfies the groupBy."""
    pindex.warm(cache_postings=True)
    try:
        df = pindex.search("merge offset", k=10)
        p = _plan(df)
        assert "InMemoryTableScan" in p
        # zero shuffle exchanges between the cache read and the pandas
        # grouping (the Exchange inside InMemoryRelation is the one-time
        # cache build, not the per-query hot path)
        hot_path = p.split("FlatMapGroupsInPandas", 1)[1].split("InMemoryRelation", 1)[0]
        assert "Exchange" not in hot_path, hot_path
    finally:
        # don't leak cached blocks into other module tests
        for key in ("postings", "docstats"):
            cached = pindex._df_cache.pop(key, None)
            if cached is not None:
                cached.unpersist()
