"""Phrase query gate (reference PhraseQuery with slop,
``LuceneFactoryTest.java:351-367``): positional index round-trip, exact
and sloppy matching, Lucene-style phrase-freq scoring, multi-segment +
tombstone + compaction interplay — all vs a from-scratch Python oracle
sharing only tokenize_py."""

from __future__ import annotations

from math import log

import pytest
from pyspark.sql import functions as F

from dbsyncer_spark.functions.tokenizer import tokenize_py
from dbsyncer_spark.index.build import append_segment, build_index
from dbsyncer_spark.index.search import SearchIndex

PARAMS = dict(num_shards=4, range_size=64, block_size=8, num_id_buckets=4,
              store_positions=True)

DOCS = [
    "big car drives fast",
    "big red car",
    "car big",
    "the big car and the big car again",
    "nothing relevant here",
    "big apple car big car",
    "carbig bigcar big_car",          # joined forms: "big_car" tokenizes to big,car!
    "big big big car car",
]


def phrase_oracle(docs: dict[int, str], phrase: str, slop: int = 0, k: int = 10,
                  exclude: set[int] | None = None):
    """Independent implementation of the documented semantics: anchor at
    each term_0 position p; match iff the SUM over instances i of the
    minimal |pos - i - p| (each instance's nearest occurrence) is within
    the shared slop budget — Lucene's sloppy-phrase total move distance.
    score = idf_sum(phrase instances) * tfnorm(freq, dl); stats over the
    FULL doc set (tombstones mask results, not stats — Lucene pre-merge
    behavior)."""
    terms = tokenize_py(phrase)
    toks = {d: tokenize_py(c) for d, c in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {t: sum(1 for tk in toks.values() if t in tk) for t in set(terms)}
    if not terms or any(df[t] == 0 for t in terms):
        return []
    idf_sum = 0.0
    for t in terms:
        idf_sum += log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
    out = []
    for d, tk in toks.items():
        if exclude and d in exclude:
            continue
        pos = {t: [i for i, x in enumerate(tk) if x == t] for t in set(terms)}
        if any(not pos[t] for t in terms):
            continue
        freq = 0
        for p in pos[terms[0]]:
            total = sum(
                min(abs((q - i) - p) for q in pos[t])
                for i, t in enumerate(terms)
            )
            if total <= slop:
                freq += 1
        if freq:
            tfn = freq * 2.2 / (freq + 1.2 * (0.25 + 0.75 * len(tk) / avgdl))
            out.append((d, idf_sum * tfn))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.fixture(scope="module")
def pidx(spark, tmp_path_factory):
    rows = [
        (i, "r", f"f{i}.txt", f"c{i}", "en", c) for i, c in enumerate(DOCS[:6])
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, repo string, path string, commit string, lang string, content string",
    )
    d = str(tmp_path_factory.mktemp("phraseidx"))
    build_index(spark, docs, d, docs_have_ids=True, **PARAMS)
    # second segment exercises the multi-segment union path
    extra = spark.createDataFrame(
        [(i, "r", f"f{i}.txt", f"c{i}", "en", c) for i, c in enumerate(DOCS[6:], start=6)],
        "doc_id long, repo string, path string, commit string, lang string, content string",
    )
    append_segment(spark, extra, d, docs_have_ids=False, num_id_buckets=4)
    return d


def _doc_map(spark, d):
    idx = SearchIndex(spark, d)
    rows = idx.docstats().select("doc_id", "path").collect()
    by_path = {r.path: r.doc_id for r in rows}
    # original text by index doc_id (append re-assigned ids for seg 2)
    return idx, {by_path[f"f{i}.txt"]: DOCS[i] for i in range(len(DOCS))}


@pytest.mark.parametrize("phrase,slop", [
    ("big car", 0),
    ("big car", 1),
    ("big car", 2),
    ("big car again", 0),
    ("big big", 0),      # duplicate term in phrase
    ("car", 0),          # single-term phrase == term query
    ("big zzznothere", 0),
    ("big drives fast", 1),  # 3-term: two 1-distance moves -> total 2
    ("big drives fast", 2),
])
def test_phrase_matches_oracle(spark, pidx, phrase, slop):
    idx, docs = _doc_map(spark, pidx)
    got = [(r.doc_id, r.score) for r in idx.search_phrase(phrase, k=10, slop=slop).collect()]
    want = phrase_oracle(docs, phrase, slop=slop, k=10)
    assert [g[0] for g in got] == [w[0] for w in want], (phrase, slop)
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9), (phrase, slop, gd)


def test_exact_phrase_specifics(spark, pidx):
    idx, docs = _doc_map(spark, pidx)
    inv = {v: k for k, v in docs.items()}
    hits = {r.doc_id for r in idx.search_phrase("big car", k=10).collect()}
    assert inv[DOCS[0]] in hits            # "big car drives fast"
    assert inv[DOCS[1]] not in hits        # "big red car" needs slop 1
    assert inv[DOCS[6]] in hits            # "big_car" splits to big,car
    assert inv[DOCS[4]] not in hits
    # slop widens: red-separated + reversed appear at slop>=1/2
    h1 = {r.doc_id for r in idx.search_phrase("big car", k=10, slop=1).collect()}
    assert inv[DOCS[1]] in h1
    h2 = {r.doc_id for r in idx.search_phrase("big car", k=10, slop=2).collect()}
    assert inv[DOCS[2]] in h2


def test_phrase_requires_positions(spark, corpus, tmp_path):
    d = str(tmp_path / "nopos")
    build_index(spark, corpus.limit(20), d, num_shards=4, range_size=64, num_id_buckets=4)
    with pytest.raises(ValueError, match="store_positions"):
        SearchIndex(spark, d).search_phrase("merge scan")


def test_slop_budget_is_shared_across_instances(spark, pidx):
    """Lucene charges ONE slop budget for the whole phrase: in
    'big car drives fast', the phrase 'big drives fast' needs drives and
    fast each moved 1 (total 2) — a per-instance window would accept
    slop=1, the shared budget requires slop>=2."""
    idx, docs = _doc_map(spark, pidx)
    inv = {v: k for k, v in docs.items()}
    d0 = inv[DOCS[0]]  # "big car drives fast"
    assert d0 not in {r.doc_id for r in idx.search_phrase("big drives fast", k=10, slop=1).collect()}
    assert d0 in {r.doc_id for r in idx.search_phrase("big drives fast", k=10, slop=2).collect()}


def test_phrase_gate_ids_match_and_no_global_sort(spark, pidx):
    """The parsed-query phrase gate (_phrase_match_ids) returns exactly
    the phrase match set, with NO top-k cut and NO global sort in the
    plan — search_phrase(k=2**30) used to full-sort the entire match set
    just to throw the order away (VERDICT r2)."""
    idx, docs = _doc_map(spark, pidx)
    ids = {r.doc_id for r in idx._phrase_match_ids("big car").collect()}
    want = {d for d, _ in phrase_oracle(docs, "big car", k=100)}
    assert ids == want
    gate = idx._phrase_match_ids("big car")
    p = gate._jdf.queryExecution().executedPlan().toString()
    for line in p.splitlines():
        if "Sort [" in line:
            assert ", false, 0" in line, f"global sort in phrase-gate plan: {line}"
    # and through search_parsed: a phrase-gated parsed query plans no
    # global sort either (the TakeOrdered of the final top-k is fine)
    parsed = idx.search_parsed('big +"big car"', k=5)
    pp = parsed._jdf.queryExecution().executedPlan().toString()
    for line in pp.splitlines():
        if "Sort [" in line:
            assert ", false, 0" in line, f"global sort in parsed plan: {line}"
    assert "TakeOrderedAndProject" in pp


def test_reversed_pair_needs_slop_2_like_lucene(spark, pidx):
    """Lucene move-distance slop: 'car big' (reversed adjacent pair)
    matches phrase 'big car' at slop=2 and NOT at slop<=1
    (LuceneFactoryTest.java:351-367 asserts exactly this)."""
    idx, docs = _doc_map(spark, pidx)
    inv = {v: k for k, v in docs.items()}
    rev = inv[DOCS[2]]  # "car big"
    assert rev not in {r.doc_id for r in idx.search_phrase("big car", k=10, slop=0).collect()}
    assert rev not in {r.doc_id for r in idx.search_phrase("big car", k=10, slop=1).collect()}
    assert rev in {r.doc_id for r in idx.search_phrase("big car", k=10, slop=2).collect()}


def test_phrase_tombstones_and_compaction(spark, pidx):
    from dbsyncer_spark.streaming.incremental import compact_segments, delete_docs

    idx, docs = _doc_map(spark, pidx)
    inv = {v: k for k, v in docs.items()}
    victim_path = "f0.txt"
    delete_docs(spark, pidx, spark.createDataFrame([(victim_path,)], "path string"))
    idx2 = SearchIndex(spark, pidx)
    got = [(r.doc_id, r.score) for r in idx2.search_phrase("big car", k=10).collect()]
    want = phrase_oracle(docs, "big car", k=10, exclude={inv[DOCS[0]]})
    assert [g[0] for g in got] == [w[0] for w in want]
    # compaction preserves positions: same phrase results, stats now over
    # the live set only
    compact_segments(spark, pidx)
    idx3 = SearchIndex(spark, pidx)
    live = {d: c for d, c in docs.items() if d != inv[DOCS[0]]}
    got = [(r.doc_id, r.score) for r in idx3.search_phrase("big car", k=10).collect()]
    want = phrase_oracle(live, "big car", k=10)
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)


def test_search_many_phrase_rank_identical(spark, pidx):
    """Batched phrase serving (shared positional decode, r3 VERDICT
    stretch #9) must return exactly the per-query search_phrase rows —
    including misses, duplicate-term phrases, and (because this test
    runs after the tombstone test mutated the fixture) dead-doc
    masking."""
    idx = SearchIndex(spark, pidx)
    batch = {
        "a": "big car",
        "b": "big car again",
        "c": "big big",
        "d": "big zzznothere",
        "e": "car",
        "f": "",
    }
    for slop in (0, 1, 2):
        got = idx.search_many_phrase(batch, k=5, slop=slop).collect()
        by_q: dict[str, list] = {}
        for r in got:
            by_q.setdefault(r.query_id, []).append((r.doc_id, round(r.score, 12)))
        for qid, q in batch.items():
            want = [
                (r.doc_id, round(r.score, 12))
                for r in idx.search_phrase(q, k=5, slop=slop).collect()
            ]
            assert by_q.get(qid, []) == want, (qid, slop)


def test_search_many_phrase_with_shared_doc_filter(spark, pidx):
    """r4: batched phrases honor a batch-wide MUST filter identically to
    per-query search_phrase(doc_filter=...), on both mask sides."""
    idx = SearchIndex(spark, pidx)
    batch = {"a": "big car", "b": "car"}
    flt = F.col("path") != "f3.txt"
    for sel in (None, 0.01, 0.9):
        got = idx.search_many_phrase(batch, k=5, slop=0, doc_filter=flt,
                                     filter_selectivity=sel).collect()
        by_q: dict[str, list] = {}
        for r in got:
            by_q.setdefault(r.query_id, []).append((r.doc_id, round(r.score, 12)))
        for qid, q in batch.items():
            want = [(r.doc_id, round(r.score, 12))
                    for r in idx.search_phrase(q, k=5, slop=0,
                                               doc_filter=flt).collect()]
            assert by_q.get(qid, []) == want, (qid, sel)
