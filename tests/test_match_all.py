"""Match-all / filter-only queries + field-sorted cursor paging — the
reference's MatchAllDocsQuery storage path with the default updateTime
DESC sort (DiskStorageService.java:176-179, 420-436) and
ensureSortForPaging's searchAfter-under-field-sort (Shard.java:231-247)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbsyncer_spark.index.build import build_index
from dbsyncer_spark.index.search import SearchIndex


@pytest.fixture(scope="module")
def midx(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("matchall_idx"))
    build_index(spark, corpus.limit(300), d, num_shards=4, range_size=128,
                num_id_buckets=16)
    return SearchIndex(spark, d)


@pytest.fixture(scope="module")
def stats_pdf(midx):
    return midx.docstats().toPandas()


def test_match_all_default_sort_is_docid_desc(midx, stats_pdf):
    got = [r.doc_id for r in midx.match_all(k=15).collect()]
    want = sorted(stats_pdf["doc_id"].tolist(), reverse=True)[:15]
    assert got == want


def test_match_all_filter_and_field_sort(midx, stats_pdf):
    got = [
        (r.doc_id, r.lang, r.dl)
        for r in midx.match_all(
            doc_filter=(F.col("lang") == "python"),
            sort_cols=[("dl", False), ("path", True)],
            k=20,
        ).collect()
    ]
    sub = stats_pdf[stats_pdf["lang"] == "python"]
    want = sorted(
        ((r.doc_id, r.lang, r.dl, r.path) for r in sub.itertuples(index=False)),
        key=lambda t: (-t[2], t[3], t[0]),
    )[:20]
    assert got == [(d, lg, dl) for d, lg, dl, _ in want]


def test_match_all_plan_is_takeordered_docstats_only(midx):
    p = (
        midx.match_all(doc_filter=(F.col("lang") == "python"), k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in p
    # docstats-only scan: the postings blob column must never be read
    assert "blob" not in p
    for line in p.splitlines():
        if "Sort [" in line:
            assert ", false, 0" in line, f"global sort in match_all plan: {line}"


def test_match_all_cursor_pages_stitch_exactly(midx):
    sort_cols = [("lang", True), ("dl", False)]
    whole = midx.match_all(sort_cols=sort_cols, k=30).collect()
    pages, after = [], None
    for _ in range(3):
        page = midx.match_all(sort_cols=sort_cols, k=10, after=after).collect()
        pages.extend(page)
        last = page[-1]
        after = (last.lang, last.dl, last.doc_id)
    assert [tuple(r) for r in pages] == [tuple(r) for r in whole]


def test_search_sorted_cursor_pages_stitch_exactly(midx):
    sort_cols = [("lang", True), ("path", True)]
    whole = midx.search_sorted("merge", sort_cols, k=24).collect()
    assert len(whole) == 24
    pages, after = [], None
    for _ in range(3):
        page = midx.search_sorted("merge", sort_cols, k=8, after=after).collect()
        pages.extend(page)
        last = page[-1]
        after = (last.lang, last.path, last.doc_id)
    assert [tuple(r) for r in pages] == [tuple(r) for r in whole]


def test_match_all_masks_tombstones_and_respects_cursor_len(spark, corpus, tmp_path):
    from dbsyncer_spark.streaming.incremental import delete_docs

    d = str(tmp_path / "ma_tomb")
    build_index(spark, corpus.limit(50), d, num_shards=4, range_size=128,
                num_id_buckets=8)
    idx = SearchIndex(spark, d)
    top = idx.match_all(k=3).collect()
    victim = idx.docstats().filter(F.col("doc_id") == top[0].doc_id).select("path")
    assert delete_docs(spark, d, victim) == 1
    idx2 = SearchIndex(spark, d)
    got = [r.doc_id for r in idx2.match_all(k=3).collect()]
    assert top[0].doc_id not in got
    assert got[:2] == [top[1].doc_id, top[2].doc_id]
    # cursor arity is validated up front (one value per sort col + doc_id)
    with pytest.raises(ValueError, match="cursor has"):
        idx2.match_all(sort_cols=[("lang", True)], k=3, after=(1,))


def test_filter_only_parsed_query_routes_to_match_all(midx, stats_pdf):
    """'lang:python' has zero scored terms: r2 returned empty; now it is
    the MatchAllDocsQuery analog — constant score 1.0, default doc_id
    DESC order, gates applied."""
    got = midx.search_parsed("lang:python", k=12).collect()
    sub = stats_pdf[stats_pdf["lang"] == "python"]
    want = sorted(sub["doc_id"].tolist(), reverse=True)[:12]
    assert [r.doc_id for r in got] == want
    assert all(r.score == 1.0 for r in got)

    # exclusion-only query: -merge drops docs containing the term
    got2 = {r.doc_id for r in midx.search_parsed("lang:python -merge", k=300).collect()}
    with_merge = {
        r.doc_id for r in midx.search_sorted("merge", [("doc_id", True)], k=300).collect()
    }
    assert got2 and not (got2 & with_merge)
    assert got2 <= set(sub["doc_id"].tolist())

    # fully-empty query = match ALL docs (MatchAllDocsQuery proper)
    got3 = midx.search_parsed("", k=5).collect()
    want3 = sorted(stats_pdf["doc_id"].tolist(), reverse=True)[:5]
    assert [r.doc_id for r in got3] == want3


def test_fetch_preserves_constant_score_order_with_sort_cols(midx, stats_pdf):
    """Constant-score pages (filter-only parsed / match_all: every score
    1.0) are newest-first; the default fetch sort would tie-break doc_id
    ASC and silently flip the page oldest-first (r3 review). The
    explicit sort_cols pass-through preserves the page order."""
    rows = midx.search_parsed("lang:python", k=8)
    want = [r.doc_id for r in rows.collect()]
    sub = stats_pdf[stats_pdf["lang"] == "python"]
    assert want == sorted(sub["doc_id"].tolist(), reverse=True)[:8]

    fetched = midx.fetch(rows, sort_cols=[("score", False), ("doc_id", False)])
    assert [r.doc_id for r in fetched.collect()] == want
    # display fields ride along
    assert set(fetched.columns) >= {"doc_id", "score", "repo", "path", "sha256"}
    # default fetch keeps the relevance contract for scored queries
    scored = midx.search("merge offset", k=5)
    assert [r.doc_id for r in midx.fetch(scored).collect()] == [
        r.doc_id for r in scored.collect()
    ]
