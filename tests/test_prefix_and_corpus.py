"""Prefix search (reference F10) + distributed-corpus determinism."""

from __future__ import annotations

import pytest

from dbsyncer_spark.index.build import build_index
from dbsyncer_spark.index.search import SearchIndex


@pytest.fixture(scope="module")
def tindex(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pidx"))
    build_index(spark, corpus, d, num_shards=8, range_size=256,
                num_id_buckets=32, store_terms=True)
    return SearchIndex(spark, d)


def test_expand_prefix(tindex):
    terms = tindex.expand_prefix("mer")
    assert terms and all(t.startswith("mer") for t in terms)
    assert "merge" in terms


def test_search_prefix_matches_or_query(tindex):
    terms = tindex.expand_prefix("shar")
    got = [(r.doc_id, round(r.score, 9)) for r in tindex.search_prefix("shar", k=5).collect()]
    want = [(r.doc_id, round(r.score, 9)) for r in tindex.search(" ".join(terms), k=5).collect()]
    assert got == want and len(got) == 5


def test_expand_wildcard_and_fuzzy(tindex):
    w = tindex.expand_wildcard("sh?rd")
    assert "shard" in w and all(len(t) == 5 for t in w)
    star = tindex.expand_wildcard("merge*")
    assert "merge" in star and all(t.startswith("merge") for t in star)
    fz = tindex.expand_fuzzy("shard", max_edits=1)
    assert "shard" in fz
    import re

    for t in fz:
        assert abs(len(t) - 5) <= 1
    got = [(r.doc_id, round(r.score, 9)) for r in tindex.search_fuzzy("shard", k=5).collect()]
    want = [(r.doc_id, round(r.score, 9)) for r in tindex.search(" ".join(fz), k=5).collect()]
    assert got == want


def test_prefix_requires_terms_table(spark, corpus, tmp_path):
    d = str(tmp_path / "noterm")
    build_index(spark, corpus.limit(50), d, num_shards=4, range_size=256,
                num_id_buckets=8, store_terms=False)
    idx = SearchIndex(spark, d)
    with pytest.raises(ValueError, match="store_terms"):
        idx.expand_prefix("mer")


def test_corpus_distributed_deterministic(spark):
    """Same (n_docs, seed) -> identical rows regardless of partitioning."""
    from dbsyncer_spark.fixtures.corpus import corpus_df_distributed

    a = corpus_df_distributed(spark, 300, seed=11, partitions=3)
    b = corpus_df_distributed(spark, 300, seed=11, partitions=17)
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb
    assert len(ra) == 300
    c = corpus_df_distributed(spark, 300, seed=12, partitions=3)
    assert sorted(tuple(r) for r in c.collect()) != ra
