"""Persisted-index gate: build the compressed term-sharded index over the
deterministic corpus and verify both scorers (exhaustive + block-max WAND)
are rank-identical to the pure-Python oracle on every reference query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbsyncer_spark.fixtures.corpus import reference_queries
from dbsyncer_spark.index.build import build_index
from dbsyncer_spark.index.docids import assign_doc_ids
from dbsyncer_spark.index.search import SearchIndex
from dbsyncer_spark.oracle.bm25_oracle import bm25_oracle_topk, corpus_stats, sha256_hex


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx"))
    build_index(
        spark, corpus, d,
        num_shards=8, range_size=256, block_size=32, num_id_buckets=32,
    )
    return SearchIndex(spark, d)


@pytest.fixture(scope="module")
def oracle_side(spark, corpus):
    rows = assign_doc_ids(corpus, num_buckets=32).select("doc_id", "content", "lang").collect()
    docs = {r.doc_id: r.content for r in rows}
    langs = {r.doc_id: r.lang for r in rows}
    return docs, langs, corpus_stats(docs)


def test_meta_stats(index, oracle_side):
    docs, _, (tf, dl, df, n, avgdl) = oracle_side
    assert index.n_docs == n
    assert index.avgdl == pytest.approx(avgdl, rel=1e-12)


@pytest.mark.parametrize("mode", ["exhaustive", "wand"])
def test_rank_identical_to_oracle(spark, index, oracle_side, mode):
    docs, langs, stats = oracle_side
    for q in reference_queries():
        flt = (F.col("lang") == q["filterLang"]) if q["filterLang"] else None
        pred = (lambda d, L=q["filterLang"]: langs[d] == L) if q["filterLang"] else None
        got = index.search(q["text"], k=q["k"], mode=mode, doc_filter=flt).collect()
        want = bm25_oracle_topk(docs, q["text"], k=q["k"], doc_pred=pred, precomputed=stats)
        assert [r.doc_id for r in got] == [d for d, _ in want], f"q{q['queryId']} ({mode})"
        for r, (_, s) in zip(got, want):
            assert r.score == pytest.approx(s, abs=1e-9), f"q{q['queryId']} score ({mode})"


def test_wand_equals_exhaustive_large_k(index):
    a = index.search("merge offset token", k=100, mode="wand").collect()
    b = index.search("merge offset token", k=100, mode="exhaustive").collect()
    assert [(r.doc_id, round(r.score, 12)) for r in a] == [
        (r.doc_id, round(r.score, 12)) for r in b
    ]


def test_fetch_sha256(index, oracle_side):
    docs, _, _ = oracle_side
    top = index.search("token shard batch", k=5)
    fetched = index.fetch(top).collect()
    assert len(fetched) == 5
    for r in fetched:
        assert r.sha256 == sha256_hex(docs[r.doc_id])


def test_count_short_circuit(index, oracle_side):
    docs, _, (tf, dl, df, n, avgdl) = oracle_side
    assert index.count("shard") == df.get("shard", 0)
    multi = index.count("merge offset")
    want = len({d for d, c in tf.items() if c.get("merge") or c.get("offset")})
    assert multi == want
    assert index.count("zzzqqq") == 0


def test_miss_and_empty(index):
    assert index.search("zzzqqq").count() == 0
    assert index.search("").count() == 0


def test_search_many_rank_identical(index):
    """Batched multi-query scoring (one Spark job) must return exactly the
    per-query search() rows — including a miss and shared-term queries."""
    queries = {
        "a": "merge offset",
        "b": "token shard batch",
        "c": "zzzqqq",
        "d": "import",
    }
    index.warm()
    got = index.search_many(queries, k=7).collect()
    by_q: dict[str, list] = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.doc_id, round(r.score, 12)))
    assert "c" not in by_q
    for qid, qtext in queries.items():
        want = [
            (r.doc_id, round(r.score, 12))
            for r in index.search(qtext, k=7, mode="exhaustive").collect()
        ]
        assert by_q.get(qid, []) == want, qid


def test_cjk_docs_searchable_via_index(spark, tmp_path):
    """zh text must round-trip the full index path (arrow-kernel tokenize
    -> postings -> WAND): CJK queries tokenize to char unigrams and rank
    by BM25 like any other terms."""
    rows = [
        ("r", "a.md", "c1", "zh", "全文检索引擎 支持中文"),
        ("r", "b.md", "c2", "zh", "检索 检索 检索 其他内容"),
        ("r", "c.md", "c3", "en", "plain latin text no match"),
    ]
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    d = str(tmp_path / "zhidx")
    build_index(spark, docs, d, num_shards=4, range_size=64, num_id_buckets=4)
    idx = SearchIndex(spark, d)
    got = idx.search("检索", k=3, mode="wand").collect()
    paths = {r.path for r in idx.fetch(idx.search("检索", k=3)).collect()}
    assert len(got) == 2 and paths == {"a.md", "b.md"}
    # tf=3 doc must outrank tf=1 doc (same unigram, comparable dl)
    top_path = idx.fetch(idx.search("检索", k=1)).collect()[0].path
    assert top_path == "b.md"
    assert idx.search("不存在词", k=3).count() == 0


def test_search_after_pages(index):
    """Cursor paging (reference searchAfter, Shard.java:57-58,182-183):
    pages are disjoint, strictly descending across the boundary, and
    their union is row-identical to one big top-K."""
    q = "merge shard token"
    full = index.search(q, k=30, mode="exhaustive").collect()
    assert len(full) >= 12, "fixture query too sparse for a paging test"
    p1 = index.search(q, k=10, mode="wand").collect()
    cursor = (p1[-1].score, p1[-1].doc_id)
    p2 = index.search_after(q, after=cursor, k=10).collect()
    assert {r.doc_id for r in p1}.isdisjoint({r.doc_id for r in p2})
    got = [(r.doc_id, r.score) for r in p1 + p2]
    want = [(r.doc_id, r.score) for r in full[: len(got)]]
    assert got == want
    # a cursor past the very last result yields an empty page, not an error
    everything = index.search(q, k=1 << 20, mode="exhaustive").collect()
    tail = everything[-1]
    assert index.search_after(q, after=(tail.score, tail.doc_id), k=10).count() == 0


def test_search_after_filtered(index, oracle_side):
    """Cursor paging composes with MUST-clause doc filters."""
    _, langs, _ = oracle_side
    q = "import return"
    flt = F.col("lang") == "python"
    full = index.search(q, k=50, mode="exhaustive", doc_filter=flt).collect()
    if len(full) < 6:
        pytest.skip("not enough python matches in fixture corpus")
    p1 = full[:3]
    p2 = index.search_after(q, after=(p1[-1].score, p1[-1].doc_id), k=3, doc_filter=flt).collect()
    assert [(r.doc_id, r.score) for r in p2] == [(r.doc_id, r.score) for r in full[3:6]]
    assert all(langs[r.doc_id] == "python" for r in p2)


def test_term_cache_eviction_spares_current_query(spark, index):
    """Eviction on overflow must never remove terms of the CURRENT query:
    a cache-hit term + enough new misses used to KeyError at the return
    (ADVICE r2)."""
    idx = SearchIndex(spark, index.index_dir)
    idx._TERM_CACHE_MAX = 4
    idx.lookup(["merge"])  # cache hit-to-be
    # 5 misses overflow the cache while 'merge' is the oldest entry
    got = idx.lookup(["merge", "zzqa", "zzqb", "zzqc", "zzqd", "zzqe"])
    assert "merge" in got and got["merge"] > 0


def test_search_many_wand_rank_identical(spark, index):
    """Batched WAND (per-query theta cuts over the shared decode) must be
    row-identical to both batched exhaustive and per-query search on
    every reference query (VERDICT r2 stretch item)."""
    from dbsyncer_spark.fixtures.corpus import reference_queries

    batch = {
        f"q{q['queryId']}": q["text"]
        for q in reference_queries() if not q["filterLang"]
    }
    # prune_min_postings=0 FORCES per-query pruning: the adaptive default
    # would route this small index to the TAAT path (r4) and the gate
    # would stop exercising the WAND bookkeeping
    wand = index.search_many(batch, k=10, mode="wand", prune_min_postings=0).collect()
    exh = index.search_many(batch, k=10, mode="exhaustive").collect()
    assert [(r.query_id, r.doc_id, r.score) for r in wand] == [
        (r.query_id, r.doc_id, r.score) for r in exh
    ]
    by_q: dict[str, list] = {}
    for r in wand:
        by_q.setdefault(r.query_id, []).append((r.doc_id, round(r.score, 12)))
    for qid, q in batch.items():
        want = index.search(q, k=10, mode="exhaustive").collect()
        assert by_q.get(qid, []) == [(r.doc_id, round(r.score, 12)) for r in want], qid


def test_search_many_thousand_query_batch_sparse(spark, index):
    """r3 VERDICT #3: a 1,000-query batch must run within the sparse TAAT
    memory bound — per-range cost O(decoded postings) via shared-array
    references, never 1,000 × range_size dense accumulators (those are
    capped at _BATCH_PRUNE_MAX_QUERIES and used only when pruning
    engages) — and stay rank-identical to per-query search."""
    import random

    terms = ["merge", "offset", "import", "token", "shard",
             "batch", "commit", "log", "parse", "index"]
    rng = random.Random(7)
    batch = {f"q{i}": " ".join(rng.sample(terms, 3)) for i in range(1000)}
    got = index.search_many(batch, k=5).collect()
    by_q: dict[str, list] = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.doc_id, round(r.score, 12)))
    for qid in ("q0", "q499", "q999"):
        want = [(r.doc_id, round(r.score, 12))
                for r in index.search(batch[qid], k=5, mode="exhaustive").collect()]
        assert by_q.get(qid, []) == want, qid


def test_search_many_with_shared_doc_filter(spark, index):
    """r4: a batch-wide MUST filter must make every query's rows
    identical to per-query search(doc_filter=...) — on BOTH adaptive
    mask sides (forced via filter_selectivity) and both scorer modes."""
    from pyspark.sql import functions as F

    batch = {"a": "merge offset", "b": "import", "c": "token shard batch"}
    flt = F.col("lang") == "python"
    for sel in (None, 0.01, 0.9):
        for mode in ("wand", "exhaustive"):
            got = index.search_many(batch, k=7, mode=mode, doc_filter=flt,
                                    filter_selectivity=sel).collect()
            by_q: dict[str, list] = {}
            for r in got:
                by_q.setdefault(r.query_id, []).append(
                    (r.doc_id, round(r.score, 12)))
            for qid, q in batch.items():
                want = [(r.doc_id, round(r.score, 12))
                        for r in index.search(q, k=7, mode="exhaustive",
                                              doc_filter=flt).collect()]
                assert by_q.get(qid, []) == want, (qid, sel, mode)


def test_stopword_build_dl_excludes_stopwords(spark, corpus, tmp_path_factory):
    """Stopword builds must set dl = sum(tf) of the INDEXED
    (stopword-free) terms, never the all-token count. All builds now
    share the termdocs-aggregate dl source (the map-side
    token_count_col experiment was reverted by measurement — ~25x the
    CPU of a content scan at 2M docs; commit a2cc7b7 / SURVEY §8.28),
    and this test pins the semantics that make the aggregate the only
    CORRECT source under stopwording, whatever the default build does."""
    d = str(tmp_path_factory.mktemp("swidx"))
    build_index(
        spark, corpus, d,
        num_shards=8, range_size=256, block_size=32, num_id_buckets=32,
        use_stopwords=True,
    )
    idx = SearchIndex(spark, d)
    td = spark.read.parquet(f"{d}/segments/seg_000000/termdocs")
    want = {r.doc_id: r.dl for r in
            td.groupBy("doc_id").agg(F.sum("tf").cast("int").alias("dl")).collect()}
    got = {r.doc_id: r.dl for r in idx.docstats().select("doc_id", "dl").collect()}
    for did, dl in got.items():
        assert dl == want.get(did, 0), did
    # and the corpus actually contains stopwords, so this differs from
    # the all-token count (otherwise the branch test is vacuous)
    from dbsyncer_spark.functions.tokenizer import token_count_col
    all_tok = {r.doc_id: r.c for r in
               assign_doc_ids(corpus, num_buckets=32)
               .select("doc_id", token_count_col("content").alias("c")).collect()}
    assert any(got[did] < all_tok[did] for did in got), "no stopwords dropped: vacuous"
