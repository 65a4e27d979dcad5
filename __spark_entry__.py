"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps every implemented operator family (SURVEY.md §2 +
the training-data ops) to a (spark, sf_dir) -> DataFrame callable;
``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL over the
pre-registered views. Column names and float formatting are aligned on
both sides (aggregates aliased identically, scores rounded to 6dp,
money sums forced through decimal(18,2) so summation order can't skew
the hash).

Cross-engine float determinism: BM25 uses a *fixed* per-term summation
order (`bm25_topk_wide`); the only cross-engine wiggle left is libm
``ln`` (≤1 ulp), absorbed by the 6dp rounding.
"""

from __future__ import annotations

import functools
import glob
import hashlib
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsyncer_spark.functions.tokenizer import tokenize_py, tokenize_sql_expr, tokens_col
from dbsyncer_spark.query.bm25 import bm25_topk_wide
from dbsyncer_spark.session import empty_df

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

FLAGSHIP_QUERY = "slow merge scan"  # multi-term; exercises idf spread


@functools.lru_cache(maxsize=1)
def _engine_code_hash() -> str:
    """Content hash of every engine source file (plus this entry file) —
    keys on-disk caches like the lifecycle work dir so code changes
    invalidate them (r4 ADVICE: a corpus-only key froze the mutation
    path after its first run)."""
    import dbsyncer_spark

    pkg_dir = os.path.dirname(dbsyncer_spark.__file__)
    h = hashlib.sha256()
    for path in sorted(
        glob.glob(os.path.join(pkg_dir, "**", "*.py"), recursive=True)
    ) + [os.path.abspath(__file__)]:
        h.update(path.encode())
        with open(path, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:12]

_TOK = tokenize_sql_expr("text")  # DuckDB tokens expr over documents.text

# CJK derivation for the zh fulltext query: the driver corpus has no real
# CJK text (its "zh" rows are latin), so the query derives a deterministic
# CJK view by translating each lowercase letter to a distinct CJK char —
# same pure function on both engines, no external data. Exercises the
# tokenizer's CJK unigram path end to end.
_ASCII26 = "abcdefghijklmnopqrstuvwxyz"
_CJK26 = "一二三四五六七八九十百千万亿上下左右中大小天地人口日"
assert len(_CJK26) == 26
_ZH_QUERY = FLAGSHIP_QUERY.translate(str.maketrans(_ASCII26, _CJK26))


def _tune(spark: SparkSession) -> None:
    """Runtime-settable session confs the contract queries rely on, in
    case the caller's session differs from dbsyncer_spark.session:
    UTC so NTZ->LTZ casts in the timestamp queries match the UTC-based
    DuckDB oracles, and the Arrow batch-size fix (see session.py)."""
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.execution.arrow.maxBytesPerBatch", str(2**31 - 1))
    except Exception:
        pass


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _tune(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _bm25_oracle(query: str, k: int, lang: str | None = None,
                 src: str = "documents", token_pred: str | None = None,
                 boosts: dict[str, float] | None = None,
                 meta_pred: str | None = None) -> str:
    """DuckDB twin of bm25_topk_wide — identical formula, parenthesization
    and per-sorted-term summation order (k1=1.2, b=0.75). ``lang``
    restricts the CANDIDATES only (df/avgdl stay corpus-global, matching
    filtered Lucene queries — reference MUST clauses). ``src`` is the
    FROM-able corpus (table name or parenthesized subquery with doc_id,
    text[, lang]). ``token_pred``: extra SQL condition over the token
    array ``t`` (candidate gate — e.g. the parsed-query MUST clauses).
    ``meta_pred``: arbitrary SQL condition over ``src``'s metadata
    columns (field equality/range clauses — generalizes ``lang``)."""
    terms = sorted(set(tokenize_py(query)))
    inlist = ", ".join(f"'{t}'" for t in terms)
    boosts = boosts or {}
    wide = " + ".join(
        f"COALESCE(SUM(CASE WHEN term = '{t}' THEN partial END)"
        + (f" * {boosts[t]!r}" if t in boosts else "")
        + ", 0.0)"
        for t in terms
    )
    preds = []
    if lang:
        preds.append(f"doc_id IN (SELECT doc_id FROM {src} WHERE lang = '{lang}')")
    if meta_pred:
        preds.append(f"doc_id IN (SELECT doc_id FROM {src} WHERE {meta_pred})")
    if token_pred:
        preds.append(f"doc_id IN (SELECT doc_id FROM base WHERE {token_pred})")
    lang_pred = ("WHERE " + "\n  AND ".join(preds)) if preds else ""
    return f"""
WITH toks AS (SELECT doc_id, {_TOK} AS t FROM {src}),
base AS (SELECT doc_id, t, len(t) AS dl FROM toks),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term IN ({inlist})
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
partials AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
         * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)) AS partial
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
),
wide AS (SELECT doc_id, {wide} AS score FROM partials GROUP BY doc_id)
SELECT doc_id, round(score, 6) AS score FROM wide
{lang_pred}
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def _phrase_oracle(phrase: str, k: int) -> str:
    """DuckDB twin of SearchIndex.search_phrase(slop=0): token positions
    via zipped unnest, per-instance adjusted-position INTERSECT (exact
    consecutive phrase), freq = anchors per doc, score =
    idf_sum(instances, phrase order) * tfnorm(freq, dl)."""
    terms = tokenize_py(phrase)
    inst_sets = "\nINTERSECT\n".join(
        f"SELECT doc_id, p - {i} AS s FROM pos WHERE term = '{t}'"
        for i, t in enumerate(terms)
    )
    uniq = sorted(set(terms))
    inlist = ", ".join(f"'{t}'" for t in uniq)
    idf_sum = " + ".join(
        f"(SELECT ln(1.0 + (stats.n - df + 0.5) / (df + 0.5)) FROM dfreq, stats WHERE term = '{t}')"
        for t in terms
    )
    return f"""
WITH toks AS (SELECT doc_id, {_TOK} AS t FROM documents),
base AS (SELECT doc_id, t, len(t) AS dl FROM toks),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM base),
pos AS (SELECT doc_id, dl, unnest(t) AS term, unnest(range(len(t))) AS p FROM base),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM pos
          WHERE term IN ({inlist}) GROUP BY term),
m AS ({inst_sets}),
freq AS (SELECT doc_id, count(*) AS f FROM m GROUP BY doc_id)
SELECT doc_id,
       round(({idf_sum})
             * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * base.dl / stats.avgdl)), 6) AS score
FROM freq JOIN base USING (doc_id) CROSS JOIN stats
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def _phrase_slop_oracle(phrase: str, k: int, slop: int) -> str:
    """DuckDB twin of SearchIndex.search_phrase(slop>0) — Lucene
    move-distance slop: anchor = occurrence p of term_0; the doc matches
    at p iff the SUM over instances i of min over occurrences q of
    |q - i - p| fits the shared slop budget (out-of-order within the
    budget — the reversed adjacent pair matches at slop=2,
    LuceneFactoryTest.java:351-367). freq = distinct matching anchors;
    score = idf_sum * tfnorm(freq, dl), same formula as the exact-phrase
    oracle."""
    terms = tokenize_py(phrase)
    uniq = sorted(set(terms))
    inlist = ", ".join(f"'{t}'" for t in uniq)
    # per-instance scalar-subquery min distance; a doc missing a term
    # yields NULL -> total NULL -> no match (engine requires all terms)
    dist_sum = " + ".join(
        f"(SELECT min(abs(b{i}.p - {i} - a.p)) FROM pos b{i} "
        f"WHERE b{i}.doc_id = a.doc_id AND b{i}.term = '{t}')"
        for i, t in enumerate(terms[1:], start=1)
    )
    # single-term phrase: no later instances, every anchor matches at
    # total distance 0 (an empty join would otherwise emit "() <= slop")
    exists = f"({dist_sum}) <= {slop}" if dist_sum else "TRUE"
    idf_sum = " + ".join(
        f"(SELECT ln(1.0 + (stats.n - df + 0.5) / (df + 0.5)) FROM dfreq, stats WHERE term = '{t}')"
        for t in terms
    )
    return f"""
WITH toks AS (SELECT doc_id, {_TOK} AS t FROM documents),
base AS (SELECT doc_id, t, len(t) AS dl FROM toks),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM base),
pos AS (SELECT doc_id, dl, unnest(t) AS term, unnest(range(len(t))) AS p FROM base),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM pos
          WHERE term IN ({inlist}) GROUP BY term),
m AS (SELECT DISTINCT a.doc_id, a.p FROM pos a WHERE a.term = '{terms[0]}'
  AND {exists}),
freq AS (SELECT doc_id, count(*) AS f FROM m GROUP BY doc_id)
SELECT doc_id,
       round(({idf_sum})
             * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * base.dl / stats.avgdl)), 6) AS score
FROM freq JOIN base USING (doc_id) CROSS JOIN stats
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def _shingle_sql(n: int) -> str:
    """DuckDB distinct word-n-gram shingles from token list ``t``."""
    return (
        f"list_distinct([array_to_string(t[i:i+{n - 1}], ' ') "
        f"for i in range(1, greatest(len(t)-{n - 1}, 1)+1)])"
    )


# ---------------------------------------------------------------------------
# fulltext / BM25
# ---------------------------------------------------------------------------

def _rounded_rerank(df: DataFrame, k: int) -> DataFrame:
    """Re-cut at k under the ORACLE's order: rounded-6dp score desc,
    doc_id asc. ``bm25_topk_wide`` ROUNDS its output but CUTS on the
    full-precision score, so a rounded tie straddling k could pick
    different members than the oracle (the same hazard
    ``_docid_from_path`` handles for the index queries). Callers fetch
    ``k + _TIE_SLACK`` rows and re-rank here."""
    return df.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return _rounded_rerank(
        bm25_topk_wide(spark, docs, FLAGSHIP_QUERY, k=20 + _TIE_SLACK,
                       id_col="doc_id", text_col="text"),
        20,
    )


def _entry_index(spark: SparkSession, sf_dir: str, positional: bool = False):
    """Build (resume-cached) the persisted index over the documents table;
    returns a SearchIndex. ``positional=True`` builds a separate
    positions-bearing index (own dir — the BM25 bench index stays
    position-free so its scan never pays the positions column)."""
    from dbsyncer_spark.index.build import build_index
    from dbsyncer_spark.index.search import SearchIndex

    docs = _t(spark, sf_dir, "documents").select(
        F.lit("corpus").alias("repo"),
        F.concat(F.lit("d"), F.lpad(F.col("doc_id").cast("string"), 12, "0")).alias("path"),
        F.md5("text").alias("commit"),
        "lang",
        F.col("text").alias("content"),
    )
    tag = "posidx" if positional else "idx"
    idx_dir = os.path.join(
        tempfile.gettempdir(),
        # versioned by index format so a stale dir from an older build
        # never trips the segment-params consistency check
        f"dbsyncer_entry_{tag}_v4_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    build_index(spark, docs, idx_dir, num_shards=8, resume=True,
                store_positions=positional)
    return SearchIndex(spark, idx_dir)


def _docid_from_path(fetched: DataFrame, k: int) -> DataFrame:
    """Map index docIds back to the original documents.doc_id (embedded
    in the synthetic path) and re-rank on (rounded score, ORIGINAL id).

    The oracle SQL orders by the rounded score with the original doc_id
    as tiebreaker; the engine ranks by full-precision score with the
    INDEX docId tiebreaker. When a rounded-score tie straddles the k
    cutoff the two pick different members, so the caller searches with
    slack (> k rows) and this re-rank applies the oracle's cut
    deterministically."""
    return (
        fetched.select(
            F.substring("path", 2, 12).cast("long").alias("doc_id"),
            F.round("score", 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


_TIE_SLACK = 60  # rows fetched beyond k to cover rounded-score tie groups


def q_bm25_index_wand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full index pipeline: build persisted compressed index over the
    documents table, then block-max WAND top-k — rank-identical to the
    exhaustive oracle, so it shares the exhaustive SQL oracle."""
    idx = _entry_index(spark, sf_dir)
    topk = idx.search(FLAGSHIP_QUERY, k=20 + _TIE_SLACK, mode="wand")
    return _docid_from_path(idx.fetch(topk), k=20)


def q_search_after_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cursor deep paging through the index — the reference's searchAfter
    walk (Shard.java:57-58,182-183). Page 1 is a normal WAND top-20; page
    2 resumes strictly after page 1's last (score, docId) cursor. The
    stitched pages are row-identical to one big top-40 (that is the
    oracle), proving the cursor loses/duplicates nothing at the
    boundary."""
    idx = _entry_index(spark, sf_dir)
    p1_rows = idx.search(FLAGSHIP_QUERY, k=20, mode="wand").collect()
    if not p1_rows:  # empty/mismatched corpus: empty result, not
        return empty_df(spark, "doc_id long, score double")  # IndexError
    last = p1_rows[-1]
    # rebuild page 1 from the COLLECTED rows rather than re-executing the
    # query inside the union — avoids paying the scoring job twice. (Since
    # r3 the scorer pins per-term summation order, so a re-execution WOULD
    # reproduce the scores bit-for-bit; reusing the collected page is now
    # purely a cost choice, not a correctness workaround.)
    p1 = spark.createDataFrame(
        [(r.doc_id, r.score) for r in p1_rows], "doc_id long, score double"
    )
    p2 = idx.search_after(FLAGSHIP_QUERY, after=(last.score, last.doc_id),
                          k=20 + _TIE_SLACK)
    return _docid_from_path(idx.fetch(p1.unionByName(p2)), k=40)


PHRASE_QUERY = "fast merge"  # adjacent pair present at every sf


def q_bm25_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase top-k through the positional index (reference
    PhraseQuery, LuceneFactoryTest.java:351-367): positions stream in the
    codec, anchor-intersection matcher, Lucene-style phrase-freq BM25."""
    idx = _entry_index(spark, sf_dir, positional=True)
    topk = idx.search_phrase(PHRASE_QUERY, k=20 + _TIE_SLACK, slop=0)
    return _docid_from_path(idx.fetch(topk), k=20)


PHRASE_SLOP_QUERY = "merge fast"  # REVERSED adjacent pair: only matches via slop


def q_bm25_phrase_slop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sloppy phrase (Lucene move-distance slop): 'merge fast' at slop=2
    matches docs containing the adjacent REVERSED pair 'fast merge' —
    the reference's sloppy PhraseQuery (LuceneFactoryTest.java:351-367
    asserts the reversed bigram matches at slop=2)."""
    idx = _entry_index(spark, sf_dir, positional=True)
    topk = idx.search_phrase(PHRASE_SLOP_QUERY, k=20 + _TIE_SLACK, slop=2)
    return _docid_from_path(idx.fetch(topk), k=20)


def q_match_all_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-only (match-all) corpus paging through the index — the
    reference UI's default query (MatchAllDocsQuery + default field
    sort, DiskStorageService.java:176-179, 420-436): no keyword clause,
    lang filter, ordered by (doc length desc, original doc id asc). The
    plan is a docstats-only TakeOrdered — postings are never read."""
    idx = _entry_index(spark, sf_dir)
    rows = idx.match_all(
        doc_filter=(F.col("lang") == "en"),
        sort_cols=[("dl", False), ("path", True)],
        k=20,
    )
    return rows.select(
        F.substring("path", 2, 12).cast("long").alias("doc_id"),
        "lang",
        F.col("dl").alias("n_tokens"),
    )


def q_bm25_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered search — the reference's MUST clauses: candidates
    restricted by a predicate, corpus stats stay global."""
    docs = _t(spark, sf_dir, "documents")
    return _rounded_rerank(
        bm25_topk_wide(
            spark, docs, FLAGSHIP_QUERY, k=20 + _TIE_SLACK,
            id_col="doc_id", text_col="text",
            doc_filter=(F.col("lang") == "en"),
        ),
        20,
    )


def q_sorted_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-sorted index query (reference Option.sortField /
    ensureSortForPaging, Shard.java:231-247): docs containing 'merge'
    ordered by (lang, original doc id) — the synthetic path embeds the
    original id zero-padded, so sorting by path IS the oracle's doc_id
    order (deterministic total order, no score involved)."""
    idx = _entry_index(spark, sf_dir)
    rows = idx.search_sorted("merge", [("lang", True), ("path", True)], k=20)
    return rows.select(
        F.substring("path", 2, 12).cast("long").alias("doc_id"),
        "lang",
        F.col("dl").alias("n_tokens"),
    )


def q_facet_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terms-facet over the index (the reference's ES aggregation
    capability, S6 SearchSourceBuilder, and the Shard.java:196-201 count
    short-circuit generalized to group-by): per-lang count of documents
    matching ANY flagship-query term, computed from the pruned postings'
    docId streams joined to docstats — never a corpus scan."""
    idx = _entry_index(spark, sf_dir)
    return idx.facet_counts(FLAGSHIP_QUERY, by="lang")


def q_highlight_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k + best-fragment highlighting (reference F12 getBestFragment)
    on the fetched page only. Piece-array implementation is fully
    RE2-expressible, so this is value-hash-checked against DuckDB (was
    rows-only in r1). Top-k computed with slack then cut on the rounded
    score (same tie discipline as the index queries)."""
    from dbsyncer_spark.functions.highlight import best_fragment_col

    docs = _t(spark, sf_dir, "documents")
    # 10 + _TIE_SLACK, the file-wide tie discipline (was a bespoke 40 —
    # a rounded-score tie group spanning rank 10 past the slack would
    # cut differently engine- vs oracle-side, r5 review)
    topk = bm25_topk_wide(spark, docs, FLAGSHIP_QUERY, k=10 + _TIE_SLACK,
                          id_col="doc_id", text_col="text")
    return (
        docs.join(F.broadcast(topk), "doc_id")
        .select(
            "doc_id", "score",
            best_fragment_col("text", FLAGSHIP_QUERY, width=24).alias("snippet"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


PARSED_QUERY = "merge scan +table -window lang:en"
BOOSTED_QUERY = "merge^2.5 scan table^0.5"


def q_boosted_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boost clauses (Lucene QueryParser ``term^2.5``): each boosted
    term's BM25 partial is scaled before the deterministic wide sum —
    parser -> boosts dict -> scorer, same semantics on the index path
    (SearchIndex.search boosts fold into idf, keeping WAND bounds exact;
    pytest-gated twin)."""
    from dbsyncer_spark.query.parser import parsed_topk_wide

    docs = _t(spark, sf_dir, "documents")
    return _rounded_rerank(
        parsed_topk_wide(spark, docs, BOOSTED_QUERY, k=20 + _TIE_SLACK,
                         id_col="doc_id", text_col="text"),
        20,
    )



def q_parsed_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parsed boolean/field query (reference QueryParser +
    MUST/SHOULD composition): +table required, -window excluded, lang:en
    metadata filter, BM25 scores merge|scan|table."""
    from dbsyncer_spark.query.parser import parsed_topk_wide

    docs = _t(spark, sf_dir, "documents")
    return _rounded_rerank(
        parsed_topk_wide(spark, docs, PARSED_QUERY, k=20 + _TIE_SLACK,
                         id_col="doc_id", text_col="text"),
        20,
    )


def q_update_merge_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-gated maintenance lifecycle (r3 VERDICT missing #2): build
    -> append a second batch -> update-by-key -> delete -> tiered merge
    -> search. The DuckDB oracle computes BM25 over the FINAL LOGICAL
    corpus (updates applied, deletes removed), putting the
    update/tombstone/merge/covered-GC path under the same value-hash
    gate as the query surface. Reference: Shard.update/deleteBatch +
    IndexWriter maintenance (``Shard.java:102-140``).

    Deterministic doc_id-modulus subsets: base = id%37==0, appended
    batch = id%37==1, updated = base & id%5==0 (content + ' merge
    merge', so update visibility changes the ranking), deleted =
    (base & id%5==1) | (batch & id%7==0). The merge covers every
    tombstoned doc, so post-merge index stats (n_docs, avgdl, df) equal
    the logical corpus exactly — the invariant the oracle checks. The
    mutation sequence is idempotent (re-running converges to the same
    logical corpus) and a DONE marker skips re-mutation on reruns."""

    from dbsyncer_spark.index.build import append_segment, build_index
    from dbsyncer_spark.index.search import SearchIndex
    from dbsyncer_spark.streaming.incremental import (
        delete_docs, maybe_merge, update_docs,
    )

    docs = _t(spark, sf_dir, "documents")

    def m(a: int, b: int):
        return (F.col("doc_id") % a) == b

    def view(df, content=None):
        return df.select(
            F.lit("corpus").alias("repo"),
            F.concat(F.lit("d"), F.lpad(F.col("doc_id").cast("string"), 12, "0")).alias("path"),
            F.md5("text").alias("commit"),
            "lang",
            (F.col("text") if content is None else content).alias("content"),
        )

    # the DONE-marker cache is keyed on the ENGINE CODE HASH as well as
    # the corpus (r4 ADVICE): without it, the first run pins the mutated
    # index forever and later changes to build/append/update/delete/
    # merge/GC code would silently never be re-exercised by this gate
    sf_base = os.path.basename(os.path.normpath(sf_dir))
    code = _engine_code_hash()
    for stale in glob.glob(os.path.join(
            tempfile.gettempdir(), f"dbsyncer_lifecycle_*_{sf_base}")):
        if f"_{code}_" not in os.path.basename(stale):
            shutil.rmtree(stale, ignore_errors=True)
    work = os.path.join(
        tempfile.gettempdir(), f"dbsyncer_lifecycle_{code}_{sf_base}",
    )
    done = os.path.join(work, "_LIFECYCLE_DONE")
    if not os.path.exists(done):
        shutil.rmtree(work, ignore_errors=True)
        build_index(spark, view(docs.filter(m(37, 0))), work,
                    num_shards=8, resume=False)
        append_segment(spark, view(docs.filter(m(37, 1))), work,
                       segment="seg_batch2")
        update_docs(
            spark, work,
            view(docs.filter(m(37, 0) & m(5, 0)),
                 content=F.concat(F.col("text"), F.lit(" merge merge"))),
        )
        doomed = docs.filter((m(37, 0) & m(5, 1)) | (m(37, 1) & m(7, 0)))
        delete_docs(spark, work, view(doomed).select("repo", "path"))
        merged = maybe_merge(spark, work, tier_factor=1 << 30, merge_at=2,
                             max_merge=10, reclaim_ratio=0.01,
                             retire_grace_s=0.0)
        if merged is None:
            raise RuntimeError("lifecycle merge found no candidates")
        with open(done, "w") as f:
            f.write("ok")
    idx = SearchIndex(spark, work)
    topk = idx.search(FLAGSHIP_QUERY, k=20 + _TIE_SLACK, mode="wand")
    return _docid_from_path(idx.fetch(topk), k=20)


def q_cdc_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-tailed ChangedEvent CDC replay (C1) under the oracle gate:
    a JSON-lines event file — the exact payload a binlog listener
    process would emit (``MySQLListener.java:228-353`` RowChangedEvent,
    ``ChangedEventTypeEnum`` ROW ops) — is replayed through
    ``replay_changed_events`` into a FRESH index (insert batch A,
    insert batch B, updates, deletes, multiple micro-batch flushes with
    last-event-per-key reduction), then searched; the DuckDB oracle
    computes BM25 over the final logical corpus. This puts the whole
    transport->classify->batch->apply chain under the same value-hash
    gate as the direct-call lifecycle row (`update_merge_search`).

    Deterministic doc_id-modulus subsets (disjoint from the lifecycle
    row's %37 so the two cached work dirs never alias): batch A =
    id%41==0, batch B = id%41==1, updated = A & id%3==0 (content +
    ' replay replay'), deleted = (A & id%3==1) | (B & id%5==0). The
    driver-side collect is the transport itself (an event FILE is by
    definition driver/edge-resident) and is bounded to ~2/41 of the
    corpus."""

    from dbsyncer_spark.index.search import SearchIndex
    from dbsyncer_spark.sources.cdc import replay_changed_events

    docs = _t(spark, sf_dir, "documents")
    sf_base = os.path.basename(os.path.normpath(sf_dir))
    code = _engine_code_hash()
    for stale in glob.glob(os.path.join(
            tempfile.gettempdir(), f"dbsyncer_cdc_*_{sf_base}")):
        if f"_{code}_" not in os.path.basename(stale):
            shutil.rmtree(stale, ignore_errors=True)
    work = os.path.join(
        tempfile.gettempdir(), f"dbsyncer_cdc_{code}_{sf_base}",
    )
    done = os.path.join(work, "_CDC_DONE")
    idx_dir = os.path.join(work, "idx")
    if not os.path.exists(done):
        import hashlib as _hl
        import json as _json

        shutil.rmtree(work, ignore_errors=True)
        os.makedirs(work, exist_ok=True)
        rows = (
            docs.filter((F.col("doc_id") % 41).isin(0, 1))
            .select("doc_id", "lang", "text")
            .collect()
        )
        by_id = {r.doc_id: r for r in rows}

        def ev(op: str, i: int, text: str | None = None) -> str:
            r = by_id[i]
            content = r.text if text is None else text
            row = {"repo": "corpus", "path": f"d{str(i).zfill(12)}",
                   "commit": _hl.md5(content.encode()).hexdigest(),
                   "lang": r.lang, "content": content}
            if op == "DELETE":  # a binlog delete carries only the key image
                row = {"repo": row["repo"], "path": row["path"]}
            return _json.dumps({"type": "ROW", "event": op,
                                "changedRow": row})

        a = sorted(i for i in by_id if i % 41 == 0)
        b = sorted(i for i in by_id if i % 41 == 1)
        lines = (
            [ev("INSERT", i) for i in a]
            + [ev("INSERT", i) for i in b]
            + [ev("UPDATE", i, by_id[i].text + " replay replay")
               for i in a if i % 3 == 0]
            + [ev("DELETE", i) for i in a if i % 3 == 1]
            + [ev("DELETE", i) for i in b if i % 5 == 0]
        )
        events_file = os.path.join(work, "events.jsonl")
        with open(events_file, "w") as f:
            f.write("\n".join(lines) + "\n")
        # max_batch_rows forces >=2 flushes even at the smoke sf, so the
        # update/delete-against-existing-index paths run (not just the
        # single-batch insert fold)
        replay_changed_events(
            spark, events_file, idx_dir,
            max_batch_rows=max(16, len(a)),
            checkpoint_file=os.path.join(work, "offset.json"),
            num_shards=8,
        )
        # cover every tombstone so index stats (n_docs, avgdl, df) equal
        # the logical corpus exactly — the invariant the oracle checks;
        # same reasoning as q_update_merge_search (un-merged deletes
        # still count in corpus stats, Lucene semantics)
        from dbsyncer_spark.streaming.incremental import maybe_merge

        if maybe_merge(spark, idx_dir, tier_factor=1 << 30, merge_at=2,
                       max_merge=10, reclaim_ratio=0.01,
                       retire_grace_s=0.0) is None:
            raise RuntimeError("cdc replay merge found no candidates")
        with open(done, "w") as f:
            f.write("ok")
    idx = SearchIndex(spark, idx_dir)
    topk = idx.search(FLAGSHIP_QUERY, k=20 + _TIE_SLACK, mode="wand")
    return _docid_from_path(idx.fetch(topk), 20)


#: batched serving contract: one search_many job; every query's rows must
#: equal its per-query BM25 oracle (vocabulary-present term sets)
BATCH_QUERIES = {"q1": FLAGSHIP_QUERY, "q2": "hash join",
                 "q3": "group order stream"}
BATCH_PHRASES = {"p1": "fast merge", "p2": "table scan"}


def _batch_docid_rerank(idx, out: DataFrame, k: int) -> DataFrame:
    """Shared tail of the batched contracts (the per-query analog of
    ``_docid_from_path``): map index docIds back to the original
    documents.doc_id via the synthetic path, then re-cut each query at k
    under the ORACLE's order (rounded-6dp score desc, doc_id asc) — the
    callers search with ``_TIE_SLACK`` for the same rounded-tie reason."""
    from pyspark.sql import Window as W

    stats = idx.docstats().select("doc_id", "path")
    mapped = out.join(stats, "doc_id").select(
        "query_id",
        F.substring("path", 2, 12).cast("long").alias("doc_id"),
        F.round("score", 6).alias("score"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        mapped.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .orderBy("query_id", F.col("score").desc(), F.col("doc_id").asc())
    )


def q_batch_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched term serving UNDER THE ORACLE GATE (r4): all queries run
    in ONE Spark job through search_many's adaptive per-query-WAND /
    sparse-TAAT scorer; per query the rows must hash-match the same
    DuckDB BM25 oracle the single-query contracts use. This is the
    high-throughput serving shape (BASELINE.md: 13.4-14.5 q/s)."""
    idx = _entry_index(spark, sf_dir)
    return _batch_docid_rerank(
        idx, idx.search_many(BATCH_QUERIES, k=20 + _TIE_SLACK), k=20
    )


def q_batch_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched serving with a BATCH-WIDE MUST filter under the oracle
    gate (r4): one search_many job, a lang='en' gate shared by every
    query in the batch — the adaptive mask side (_mask_plan) is planned
    and counted once per batch; per query the rows hash-match the
    filtered single-query oracle (candidates gated, stats corpus-global,
    reference MUST-clause semantics)."""
    idx = _entry_index(spark, sf_dir)
    out = idx.search_many(BATCH_QUERIES, k=20 + _TIE_SLACK,
                          doc_filter=(F.col("lang") == "en"))
    return _batch_docid_rerank(idx, out, k=20)


def q_batch_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched PHRASE serving under the oracle gate (r4 stretch): both
    phrases share one positional decode per docId-range
    (search_many_phrase); per query the rows must hash-match the
    single-phrase DuckDB oracle."""
    idx = _entry_index(spark, sf_dir, positional=True)
    return _batch_docid_rerank(
        idx, idx.search_many_phrase(BATCH_PHRASES, k=20 + _TIE_SLACK, slop=0),
        k=20,
    )


BATCH_PARSED = {
    "g1": FLAGSHIP_QUERY,                # pure terms -> search_many route
    "g2": PARSED_QUERY,                  # +MUST / -MUST_NOT / lang:en field
    "g3": BOOSTED_QUERY,                 # ^boost clauses
    "g4": "(merge OR scan) AND table",   # r5: OR-group + AND operator
    "g5": "slow lang:[de TO es]",        # r5: field range (de/en/es langs)
}


def q_batch_parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched GATED/parsed serving under the oracle gate (r4 VERDICT #2
    + #7): a mixed batch — pure terms, MUST/MUST_NOT + field gates,
    boosts, an (a OR b) AND c group, a field:[x TO y] range — runs in
    ONE shared job per route (search_many for the pure query,
    _search_many_gated for every gated one: shared postings decode,
    per-query range-local gates); per query the rows must hash-match the
    parser-generated DuckDB oracle. Replaces the r4 per-query fallback
    (one Spark job per gated query at the scheduling floor)."""
    idx = _entry_index(spark, sf_dir)
    out = idx.search_many_parsed(BATCH_PARSED, k=20 + _TIE_SLACK)
    return _batch_docid_rerank(idx, out, k=20)


PARSED_WILDCARD_QUERY = "s* merge -windo?"


def q_parsed_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix/wildcard expansions inside the parsed surface (reference
    PrefixQuery/WildcardQuery, ``LuceneFactoryTest.java:338-405``; r3
    VERDICT missing #1): ``s*`` expands against the corpus vocabulary
    (scan/slow/small/sort/spark/stream) and scores as a BM25 disjunction
    alongside ``merge``; ``-windo?`` excludes docs containing any term
    matching the wildcard. Expansion is capped at Lucene's
    maxClauseCount (raises past it, pytest-gated)."""
    from dbsyncer_spark.query.parser import parsed_topk_wide

    docs = _t(spark, sf_dir, "documents")
    return _rounded_rerank(
        parsed_topk_wide(spark, docs, PARSED_WILDCARD_QUERY, k=20 + _TIE_SLACK,
                         id_col="doc_id", text_col="text"),
        20,
    )


def _parsed_wildcard_oracle(q: str, k: int) -> str:
    """Oracle for parsed queries WITH prefix/wildcard expansions: the
    term set is dynamic (LIKE over the corpus vocabulary), so the static
    per-term COALESCE chain of ``_bm25_oracle`` can't pin summation
    order — instead the partials are summed via
    ``list_aggregate(list(partial ORDER BY term), 'sum')``, the exact
    term-sorted order the engine's wide sum uses (absent terms contribute
    literal 0.0 there, which is an exact float no-op)."""
    from dbsyncer_spark.query.parser import parse_query

    pq = parse_query(q)

    def like_of(e) -> str:
        # reuse the engine's own wildcard->LIKE mapping: it escapes
        # literal %/_ in the pattern, which a naive replace would leave
        # as LIKE metacharacters and silently diverge from the engine's
        # expansion set (r5 review)
        from dbsyncer_spark.query.parser import wildcard_to_like

        pat = e.pattern + ("*" if e.kind == "prefix" else "")
        return wildcard_to_like(pat)

    scoring_likes = [like_of(e) for e in pq.expansions if e.mod != "-"]
    not_likes = [like_of(e) for e in pq.expansions if e.mod == "-"]
    # this generator encodes ONLY should/must_not expansions + plain
    # SHOULD terms; any other clause in the query would be silently
    # dropped from the oracle, making the gate hash-green but WRONG —
    # fail loudly instead (r5 review), like the fuzzy assert always did
    assert scoring_likes and not any(e.kind == "fuzzy" for e in pq.expansions)
    assert not (pq.must or pq.must_not or pq.phrases or pq.not_phrases
                or pq.fields or pq.not_fields or pq.field_ranges
                or pq.not_field_ranges or pq.boosts or pq.must_groups
                or pq.not_groups), (
        "extend _parsed_wildcard_oracle before adding gated clauses to "
        "PARSED_WILDCARD_QUERY"
    )
    # ESCAPE: wildcard_to_like backslash-escapes literal %/_ — Spark's
    # like() honors backslash by default, DuckDB only with an explicit
    # ESCAPE clause
    like_pred = " OR ".join(f"term LIKE '{p}' ESCAPE '\\'"
                            for p in scoring_likes)
    static = ", ".join(f"'{t}'" for t in pq.scored_terms)
    static_branch = f"UNION\n  SELECT unnest([{static}]) AS term" if static else ""
    not_pred = " OR ".join(f"term LIKE '{p}' ESCAPE '\\'"
                           for p in not_likes)
    not_clause = f"""
WHERE doc_id NOT IN (
  SELECT doc_id FROM (SELECT doc_id, unnest(t) AS term FROM base)
  WHERE {not_pred}
)""" if not_pred else ""
    return f"""
WITH toks AS (SELECT doc_id, {_TOK} AS t FROM documents),
base AS (SELECT doc_id, t, len(t) AS dl FROM toks),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM base),
vocab AS (SELECT DISTINCT unnest(t) AS term FROM base),
terms AS (
  SELECT term FROM vocab WHERE {like_pred}
  {static_branch}
),
tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM base)
  WHERE term IN (SELECT term FROM terms)
  GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
partials AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
         * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)) AS partial
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
),
wide AS (
  SELECT doc_id, list_aggregate(list(partial ORDER BY term), 'sum') AS score
  FROM partials GROUP BY doc_id
)
SELECT doc_id, round(score, 6) AS score FROM wide
{not_clause}
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def _parsed_oracle(q: str, k: int) -> str:
    """Oracle generated FROM the parser itself, so the SQL tracks whatever
    the query string means: MUST/MUST_NOT -> token-array membership
    conditions, (a OR b) groups -> list_intersect any-of gates, field
    equality AND field:[x TO y] ranges -> metadata predicates, ^boosts ->
    per-term partial multipliers, scored set = SHOULD ∪ MUST through the
    standard wide-BM25 skeleton."""
    from dbsyncer_spark.query.parser import parse_query

    pq = parse_query(q)
    conds = [f"list_contains(t, '{t}')" for t in pq.must] + [
        f"NOT list_contains(t, '{t}')" for t in pq.must_not
    ]

    def any_of(terms: list[str]) -> str:
        inlist = ", ".join(f"'{t}'" for t in terms)
        return f"len(list_intersect(t, [{inlist}])) > 0"

    conds += [any_of(g) for g in pq.must_groups]
    conds += [f"NOT ({any_of(g)})" for g in pq.not_groups]
    assert not (pq.phrases or pq.not_phrases), "phrase clauses: use bm25_phrase"
    assert not pq.expansions, "expansion units: use _parsed_wildcard_oracle"
    token_pred = " AND ".join(conds) or None

    def range_sql(f: str, lo, hi) -> str:
        if lo is None and hi is None:
            return f"{f} IS NOT NULL"
        if lo is None:
            return f"{f} <= '{hi}'"
        if hi is None:
            return f"{f} >= '{lo}'"
        return f"({f} >= '{lo}' AND {f} <= '{hi}')"

    meta = [f"{f} = '{v}'" for f, v in pq.fields.items()]
    meta += [f"NOT ({f} IS NOT DISTINCT FROM '{v}')"
             for f, v in pq.not_fields.items()]
    meta += [range_sql(f, lo, hi) for f, lo, hi in pq.field_ranges]
    meta += [f"NOT COALESCE({range_sql(f, lo, hi)}, FALSE)"
             for f, lo, hi in pq.not_field_ranges]
    return _bm25_oracle(
        " ".join(pq.scored_terms), k,
        meta_pred=" AND ".join(meta) or None,
        token_pred=token_pred,
        boosts=pq.boosts or None,
    )


def q_bm25_topk_zh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CJK fulltext: BM25 over the deterministic CJK view of the corpus
    (letters translated to CJK chars — see _CJK26). The query string is
    pure CJK; the tokenizer emits char unigrams (reference provisions a
    Chinese analyzer per shard, Shard.java:88)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.translate(F.lower("text"), _ASCII26, _CJK26).alias("text")
    )
    return _rounded_rerank(
        bm25_topk_wide(spark, docs, _ZH_QUERY, k=20 + _TIE_SLACK,
                       id_col="doc_id", text_col="text"),
        20,
    )


def q_term_match_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.filter(F.array_contains(tokens_col("text"), "value"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# relational operators (SURVEY §2.2/2.3/2.4/2.6)
# ---------------------------------------------------------------------------

def q_picker_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.col("c_name").alias("name"),
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("tag"),
        F.concat_ws("|", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias("merged"),
    )


def q_filters_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cond = (
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000.0))
        | F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ) & F.col("o_custkey").isNotNull()
    return orders.filter(cond).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


def q_range_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter((F.col("value") >= 10.0) & (F.col("value") < 50.0))
        .orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(100)
        .select("event_id", "event_type", "value")
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_lookup_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        )
    )


def q_virtual_table_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-SQL-as-table (reference virtual tables): the query text is
    executed by spark.sql over registered views — joins delegated to
    Catalyst."""
    for t in ("customer", "orders", "nation"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n.n_name AS nation, count(*) AS n_orders,
               CAST(sum(CAST(o.o_totalprice AS decimal(18,2))) AS double) AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                      JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    return cust.select(F.col("c_nationkey").cast("long").alias("nationkey")).intersect(
        supp.select(F.col("s_nationkey").cast("long").alias("nationkey"))
    )


def q_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            # parquet timestamps land as TIMESTAMP_NTZ; session TZ is UTC so
            # the cast reinterprets without shifting
            F.unix_millis(F.col("ts").cast("timestamp_ltz")).alias("last_ts_ms"),
        )
    )


def q_scalar_converters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(F.col("props"), F.lit("{}")).alias("props_d"),
        F.replace(F.col("event_type"), F.lit("click"), F.lit("tap")).alias("replaced"),
        F.concat(F.lit("evt_"), F.col("event_type")).alias("prepended"),
        F.substring(F.col("event_type"), 2, 1000).alias("rem_first"),
        F.left(F.col("event_type"), F.lit(3)).alias("first3"),
        F.unix_millis(F.col("ts").cast("timestamp_ltz")).alias("ts_ms"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
    )


def q_file_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-connector semantics (reference S7/K3): rows -> sep-joined
    lines -> parsed typed columns. Round-trips through the line format."""
    from dbsyncer_spark.sources.fileio import format_lines, parse_lines

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    lines = format_lines(ev, sep="|")
    return lines.select(
        *parse_lines(
            "value",
            [("event_id", "bigint"), ("user_id", "bigint"), ("event_type", "string")],
            sep="|",
        )
    )


def q_like_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference LIKE semantics (FilterEnum.java:52-70): contains /
    prefix / suffix; a pattern with NO wildcard matches nothing."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("text").contains("table").alias("has_table"),
        F.col("text").startswith("the").alias("pfx_the"),
        F.col("text").endswith("end").alias("sfx_end"),
        F.lit(False).alias("nowild"),  # LIKE 'exact' w/o wildcard => false
    )


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregate (C9 analog; also the
    batch shape of the streaming path in dbsyncer_spark.streaming)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window(F.col("ts"), "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_millis(F.col("w.start").cast("timestamp_ltz")).alias("window_start_ms"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact baseline; LSH-blocked scale
    variant in ops.similarity.embedding_dup_pairs)."""
    from dbsyncer_spark.ops.similarity import embedding_dup_pairs_gemm

    emb = _t(spark, sf_dir, "embeddings")
    # synthetic embeddings are near-orthogonal (max pairwise cosine ~0.51
    # at sf0.01), so the "near-dup" threshold is set where pairs exist.
    # GEMM variant: exact, broadcast + one matrix product (no cross join).
    out = embedding_dup_pairs_gemm(emb, threshold=0.4)
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbsyncer_spark.ops.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"), "text", "doc_id")


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbsyncer_spark.ops.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", n=3, threshold=0.8
    )


def q_decontam_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing a word 3-gram with
    the held-out 'benchmark' slice (every 97th doc — a deterministic
    stand-in for an eval suite). Broadcast benchmark shingle set; the
    corpus side is a map-side join, never shuffled."""
    from dbsyncer_spark.ops.dedup import contaminated_ids

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return contaminated_ids(corpus, bench, "text", "doc_id", n=3)


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language quota sampling (md5-hash membership —
    stable across runs, retries, and cluster sizes, unlike rand())."""
    from dbsyncer_spark.ops.sampling import stratified_sample

    return stratified_sample(
        _t(spark, sf_dir, "documents"),
        {"en": 0.5, "zh": 0.25, "de": 1.0},
        "lang", key_col="doc_id", seed=5,
    ).select("doc_id", "lang")


def q_mix_oversampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix with an epoch-repeat source (weight > 1): zh docs ~2.5x
    (every doc twice, a hash-chosen half thrice, copies numbered in
    `epoch`) next to a 0.5-sampled en slice."""
    from dbsyncer_spark.ops.sampling import weighted_mix

    docs = _t(spark, sf_dir, "documents")
    return weighted_mix(
        [("zh", docs.filter(F.col("lang") == "zh"), 2.5),
         ("en", docs.filter(F.col("lang") == "en"), 0.5)],
        key_col="doc_id", seed=13,
    ).select("doc_id", "mix_source", F.col("epoch").cast("int").alias("epoch"))


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbsyncer_spark.ops.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", num_hashes=16, bands=4, shingle_n=3
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash via the vectorized Arrow kernel — the 100 TB path (one
    md5 per distinct term per worker, numpy bit votes). Byte-identical
    to the Column-math twin `simhash_df` (pytest parity gate), so it
    shares the same SQL oracle; r2 ran the Column form here and it was
    the 2nd-slowest contract query (3.4 s — token × 64-bit-position
    explode)."""
    from dbsyncer_spark.ops.dedup import _spread, simhash_pandas_udf

    docs = _spread(_t(spark, sf_dir, "documents"))
    return docs.select("doc_id", simhash_pandas_udf("text").alias("simhash"))


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def q_cosine_topk_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbsyncer_spark.ops.similarity import _dot, _norm

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").cast("array<double>").alias("qv"))
    v = F.col("embedding").cast("array<double>")
    scored = emb.crossJoin(F.broadcast(q)).select(
        "vec_id", (_dot(v, F.col("qv")) / (_norm(v) * _norm(F.col("qv")))).alias("s")
    )
    return (
        scored.orderBy(F.col("s").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", F.round("s", 6).alias("score"))
    )


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbsyncer_spark.ops.similarity import knn_join

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = knn_join(emb, queries, k=5, qid_col="query_id")
    return out.select("query_id", "vec_id", F.round("score", 6).alias("score"))


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbsyncer_spark.ops.similarity import hyperplanes, lsh_ann_topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    planes = hyperplanes(len(qvec), n_planes=16, seed=7)
    out = lsh_ann_topk(emb, qvec, k=10, planes=planes, max_probe_hamming=2)
    return out.select("vec_id", F.round("score", 6).alias("score"))


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN plumbing, driven exactly: spherical k-means centroids on a
    deterministic sample, map-only list assignment (centroid literals in
    plan), probe top-nprobe inverted lists, exact cosine rerank. With
    nprobe == n_centroids every list is probed, so the result is exact
    and shares the brute-force SQL oracle; pytest covers the
    recall-vs-nprobe tradeoff separately (tests/test_ops.py)."""
    from dbsyncer_spark.ops.similarity import ivf_ann_topk, ivf_centroids

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    cents = ivf_centroids(emb, n_centroids=8, sample=2000)
    out = ivf_ann_topk(emb, qvec, k=12, nprobe=8, centroids=cents)
    return out.select("vec_id", F.round("score", 6).alias("score"))


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbsyncer_spark.ops.textstats import (
        bpe_token_count,
        mean_token_len,
        punct_ratio,
        ws_token_count,
    )

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        ws_token_count("text").alias("ws_tokens"),
        bpe_token_count("text").alias("bpe_tokens"),
        F.round(punct_ratio("text"), 6).alias("punct_ratio"),
        F.round(mean_token_len("text"), 6).alias("mean_token_len"),
    )


def q_quality_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbsyncer_spark.ops.textstats import lang_id, quality_score

    from dbsyncer_spark.ops.dedup import _spread

    docs = _t(spark, sf_dir, "documents")
    # tokenize ONCE in a child projection; every ratio reads the attribute
    # (CollapseProject keeps multi-referenced non-cheap aliases intact)
    base = _spread(docs).select("doc_id", "text", tokens_col("text").alias("_t"))
    t = F.col("_t")
    return base.select(
        "doc_id",
        quality_score("text", tokens=t).alias("quality"),
        lang_id("text", tokens=t).alias("lang_pred"),
    )


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbsyncer_spark.ops.textstats import fingerprints

    return fingerprints(_t(spark, sf_dir, "documents"), "text", "doc_id", kgram=5, window=4)


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbsyncer_spark.ops.multimodal import binary_meta, docs_as_media

    media = docs_as_media(_t(spark, sf_dir, "documents"))
    return binary_meta(media).select("media_id", "n_bytes", "sha256", "format")


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode plumbing with the deterministic fake decoder
    (real decode stubbed — no image libs in env). Rows-only check."""
    from dbsyncer_spark.ops.multimodal import decode_media, docs_as_media

    media = docs_as_media(_t(spark, sf_dir, "documents"))
    return decode_media(media, fake=True)


def q_ddl_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDL lifecycle (K6 sink + C7 barrier analog; reference
    ``DDLParserImpl.java:54-104``): create a parquet table from the
    even-doc_id half of documents, ALTER ADD a column, append the odd
    half with it populated, CHANGE-rename lang->language, MODIFY-narrow
    n_chars to int, DROP text — then read the evolved table. Every ALTER
    is a metadata-only log append (no data rewrite), the property that
    keeps DDL O(1) on a 100 TB table."""

    from dbsyncer_spark.sources import ddl as D

    docs = _t(spark, sf_dir, "documents")
    # fixed per-sf dir, recreated per run: mkdtemp leaked a full copy of
    # the documents table into /tmp on EVERY bench/contract invocation
    tdir = os.path.join(
        tempfile.gettempdir(),
        f"dbss_ddl_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(tdir, ignore_errors=True)
    D.create_table(
        spark, tdir, docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text", "lang", "n_chars")
    )
    D.apply_ddl(tdir, "ALTER TABLE documents ADD COLUMN `source` varchar(255) NULL")
    D.append_rows(
        spark,
        tdir,
        docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text", "lang", "n_chars", "source"),
    )
    D.apply_ddl(tdir, "ALTER TABLE documents CHANGE COLUMN `lang` `language` varchar(16)")
    D.apply_ddl(tdir, "ALTER TABLE documents MODIFY COLUMN n_chars int")
    D.apply_ddl(tdir, "ALTER TABLE documents DROP COLUMN text")
    return D.read_evolved(spark, tdir)


# ---------------------------------------------------------------------------
# the contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exhaustive BM25 top-k over sf0.001 documents."""
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # The driver's correctness gate checks the FIRST ~50 entries, so the
    # suite stays <= 50 (r4 VERDICT #1: multimodal/DDL fell past the cap).
    # Rows subsumed r5 and dropped to make room (each one's machinery is
    # fully exercised by a surviving row): fulltext_like ⊂ term_match_count
    # (same tokenize+membership path), deep_paging ⊂ search_after_page
    # (cursor paging strictly generalizes OFFSET), count_group ⊂ tpch_q1
    # (hash agg + decimal sums), mix_weighted ⊂ mix_oversampled (the
    # oversample mix contains a sub-1.0 weighted slice). The at-risk
    # multimodal/DDL rows now sit early as extra insurance. r5 adds
    # cdc_replay (the file-tailed ChangedEvent adapter under the hash
    # gate) and drops cosine_topk ⊂ knn_join (same cosine kernel and
    # TakeOrdered plan; knn_join is its n_queries>1 generalization) for
    # exactly 50 rows.
    return {
        "bm25_topk": q_bm25_topk,
        "bm25_index_wand": q_bm25_index_wand,
        "bm25_phrase": q_bm25_phrase,
        "bm25_phrase_slop": q_bm25_phrase_slop,
        "multimodal_meta": q_multimodal_meta,
        "multimodal_decode": q_multimodal_decode,
        "ddl_evolution": q_ddl_evolution,
        "match_all_sorted": q_match_all_sorted,
        "search_after_page": q_search_after_page,
        "bm25_filtered": q_bm25_filtered,
        "bm25_topk_zh": q_bm25_topk_zh,
        "parsed_query": q_parsed_query,
        "parsed_wildcard": q_parsed_wildcard,
        "update_merge_search": q_update_merge_search,
        "cdc_replay": q_cdc_replay,
        "batch_search": q_batch_search,
        "batch_filtered": q_batch_filtered,
        "batch_phrase": q_batch_phrase,
        "batch_parsed": q_batch_parsed,
        "boosted_query": q_boosted_query,
        "sorted_match": q_sorted_match,
        "facet_lang_counts": q_facet_lang_counts,
        "highlight_topk": q_highlight_topk,
        "term_match_count": q_term_match_count,
        "picker_projection": q_picker_projection,
        "filters_combo": q_filters_combo,
        "range_sort_topk": q_range_sort_topk,
        "tpch_q1": q_tpch_q1,
        "lookup_join_agg": q_lookup_join_agg,
        "virtual_table_sql": q_virtual_table_sql,
        "set_ops": q_set_ops,
        "upsert_latest": q_upsert_latest,
        "scalar_converters": q_scalar_converters,
        "file_roundtrip": q_file_roundtrip,
        "like_semantics": q_like_semantics,
        "events_window": q_events_window,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "decontam_ngram": q_decontam_ngram,
        "sample_stratified": q_sample_stratified,
        "mix_oversampled": q_mix_oversampled,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_embedding": q_dedup_embedding,
        "knn_join": q_knn_join,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "text_stats": q_text_stats,
        "quality_lang": q_quality_lang,
        "fingerprints": q_fingerprints,
    }


def oracle_sql() -> dict[str, str]:
    toks = f"(SELECT doc_id, lang, {_TOK} AS t FROM documents)"
    sh3 = _shingle_sql(3)
    sql: dict[str, str] = {}

    from dbsyncer_spark.functions.highlight import highlight_sql_exprs

    frag = highlight_sql_exprs("d.text", FLAGSHIP_QUERY, width=24)["fragment"]
    sql["highlight_topk"] = f"""
SELECT t.doc_id, t.score, {frag} AS snippet
FROM ({_bm25_oracle(FLAGSHIP_QUERY, 10 + _TIE_SLACK)}) t
  JOIN documents d USING (doc_id)
ORDER BY t.score DESC, t.doc_id ASC LIMIT 10
"""

    sql["bm25_topk"] = _bm25_oracle(FLAGSHIP_QUERY, 20)
    sql["bm25_index_wand"] = _bm25_oracle(FLAGSHIP_QUERY, 20)
    sql["bm25_phrase"] = _phrase_oracle(PHRASE_QUERY, 20)
    sql["bm25_phrase_slop"] = _phrase_slop_oracle(PHRASE_SLOP_QUERY, 20, slop=2)
    sql["match_all_sorted"] = f"""
SELECT doc_id, lang, len({_TOK}) AS n_tokens FROM documents
WHERE lang = 'en'
ORDER BY n_tokens DESC, doc_id ASC LIMIT 20
"""
    sql["search_after_page"] = _bm25_oracle(FLAGSHIP_QUERY, 40)
    sql["parsed_query"] = _parsed_oracle(PARSED_QUERY, 20)
    sql["parsed_wildcard"] = _parsed_wildcard_oracle(PARSED_WILDCARD_QUERY, 20)
    # the final logical corpus after the lifecycle's update/delete steps —
    # see q_update_merge_search for the modulus partition
    lifecycle_src = """(
  SELECT doc_id, text FROM documents WHERE doc_id % 37 = 0 AND doc_id % 5 NOT IN (0, 1)
  UNION ALL
  SELECT doc_id, text || ' merge merge' AS text FROM documents
  WHERE doc_id % 37 = 0 AND doc_id % 5 = 0
  UNION ALL
  SELECT doc_id, text FROM documents WHERE doc_id % 37 = 1 AND doc_id % 7 <> 0
)"""
    sql["update_merge_search"] = _bm25_oracle(FLAGSHIP_QUERY, 20, src=lifecycle_src)
    # the final logical corpus after the CDC replay's I/U/D events —
    # see q_cdc_replay for the modulus partition
    cdc_src = """(
  SELECT doc_id, text FROM documents WHERE doc_id % 41 = 0 AND doc_id % 3 NOT IN (0, 1)
  UNION ALL
  SELECT doc_id, text || ' replay replay' AS text FROM documents
  WHERE doc_id % 41 = 0 AND doc_id % 3 = 0
  UNION ALL
  SELECT doc_id, text FROM documents WHERE doc_id % 41 = 1 AND doc_id % 5 <> 0
)"""
    sql["cdc_replay"] = _bm25_oracle(FLAGSHIP_QUERY, 20, src=cdc_src)
    sql["batch_search"] = " UNION ALL ".join(
        f"SELECT '{qid}' AS query_id, * FROM ({_bm25_oracle(q, 20)})"
        for qid, q in BATCH_QUERIES.items()
    ) + "\nORDER BY query_id, score DESC, doc_id ASC"
    sql["batch_filtered"] = " UNION ALL ".join(
        f"SELECT '{qid}' AS query_id, * FROM ({_bm25_oracle(q, 20, lang='en')})"
        for qid, q in BATCH_QUERIES.items()
    ) + "\nORDER BY query_id, score DESC, doc_id ASC"
    sql["batch_phrase"] = " UNION ALL ".join(
        f"SELECT '{qid}' AS query_id, * FROM ({_phrase_oracle(p, 20)})"
        for qid, p in BATCH_PHRASES.items()
    ) + "\nORDER BY query_id, score DESC, doc_id ASC"
    sql["batch_parsed"] = " UNION ALL ".join(
        f"SELECT '{qid}' AS query_id, * FROM ({_parsed_oracle(q, 20)})"
        for qid, q in BATCH_PARSED.items()
    ) + "\nORDER BY query_id, score DESC, doc_id ASC"
    sql["boosted_query"] = _bm25_oracle(
        BOOSTED_QUERY.replace("^2.5", "").replace("^0.5", ""), 20,
        boosts={"merge": 2.5, "table": 0.5},
    )
    sql["bm25_filtered"] = _bm25_oracle(FLAGSHIP_QUERY, 20, lang="en")
    from dbsyncer_spark.functions.tokenizer import tokenize_py as _tok_py

    _facet_terms = ", ".join(f"'{t}'" for t in sorted(set(_tok_py(FLAGSHIP_QUERY))))
    sql["facet_lang_counts"] = f"""
SELECT lang, count(*) AS cnt FROM documents
WHERE len(list_intersect({_TOK}, [{_facet_terms}])) > 0
GROUP BY lang ORDER BY lang
"""
    sql["sorted_match"] = f"""
SELECT doc_id, lang, len({_TOK}) AS n_tokens FROM documents
WHERE list_contains({_TOK}, 'merge')
ORDER BY lang ASC, doc_id ASC LIMIT 20
"""
    sql["bm25_topk_zh"] = _bm25_oracle(
        _ZH_QUERY, 20,
        src=(f"(SELECT doc_id, translate(lower(text), '{_ASCII26}', '{_CJK26}')"
             " AS text FROM documents)"),
    )
    sql["file_roundtrip"] = """
SELECT parts[1]::BIGINT AS event_id,
       parts[2]::BIGINT AS user_id,
       parts[3] AS event_type
FROM (
  SELECT string_split(
           concat_ws('|', coalesce(event_id::VARCHAR, ''),
                          coalesce(user_id::VARCHAR, ''),
                          coalesce(event_type, '')), '|') AS parts
  FROM events
)
"""

    sql["like_semantics"] = """
SELECT doc_id,
       text LIKE '%table%' AS has_table,
       text LIKE 'the%' AS pfx_the,
       text LIKE '%end' AS sfx_end,
       FALSE AS nowild
FROM documents
"""

    sql["events_window"] = """
SELECT epoch_ms(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start_ms,
       event_type, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""

    sql["dedup_embedding"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT id_a, id_b, round(c, 6) AS cosine FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(a.v, b.v) /
         (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS c
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
WHERE c >= 0.4
"""

    sql["term_match_count"] = f"""
SELECT lang, count(*) AS n_docs FROM {toks} WHERE list_contains(t, 'value') GROUP BY lang
"""

    sql["picker_projection"] = """
SELECT c_custkey, c_name AS name,
       c_name || '#' || c_mktsegment AS tag,
       concat_ws('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS merged
FROM customer
"""

    sql["filters_combo"] = """
SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice FROM orders
WHERE ((o_orderstatus = 'F' AND o_totalprice > 150000.0)
       OR o_orderpriority IN ('1-URGENT', '2-HIGH'))
  AND o_custkey IS NOT NULL
"""

    sql["range_sort_topk"] = """
SELECT event_id, event_type, value FROM events
WHERE value >= 10.0 AND value < 50.0
ORDER BY value DESC, event_id ASC LIMIT 100
"""

    sql["tpch_q1"] = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

    sql["lookup_join_agg"] = """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""

    sql["virtual_table_sql"] = """
SELECT n.n_name AS nation, count(*) AS n_orders,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""

    sql["set_ops"] = """
SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
INTERSECT
SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
"""

    sql["upsert_latest"] = """
SELECT user_id, event_type AS last_event_type, epoch_ms(ts) AS last_ts_ms
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""

    sql["scalar_converters"] = """
SELECT event_id,
       coalesce(props, '{}') AS props_d,
       replace(event_type, 'click', 'tap') AS replaced,
       'evt_' || event_type AS prepended,
       substring(event_type, 2, 1000) AS rem_first,
       left(event_type, 3) AS first3,
       epoch_ms(ts) AS ts_ms,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
FROM events
"""

    sql["dedup_exact"] = """
SELECT doc_id, content_hash,
       count(*) OVER (PARTITION BY content_hash) AS group_size,
       doc_id = min(doc_id) OVER (PARTITION BY content_hash) AS is_canonical
FROM (SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash
      FROM documents)
"""

    sql["dedup_ngram_jaccard"] = f"""
WITH toks AS (SELECT doc_id, {_TOK} AS t FROM documents),
sh0 AS (SELECT doc_id, unnest({sh3}) AS shingle FROM toks),
ok AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 1000),
sh AS (SELECT sh0.* FROM sh0 JOIN ok USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT doc_a, doc_b,
         round(inter.i / (sa.n_sh + sb.n_sh - inter.i), 6) AS jaccard
  FROM inter JOIN sizes sa ON inter.doc_a = sa.doc_id
             JOIN sizes sb ON inter.doc_b = sb.doc_id
) WHERE jaccard >= 0.8
"""

    sql["decontam_ngram"] = f"""
WITH toks AS (SELECT doc_id, {_TOK} AS t FROM documents),
sh AS (SELECT doc_id, unnest({sh3}) AS shingle FROM toks),
shf AS (SELECT * FROM sh WHERE shingle <> ''),
bench AS (SELECT DISTINCT shingle FROM shf WHERE doc_id % 97 = 0)
SELECT s.doc_id, count(*) AS n_overlap
FROM shf s JOIN bench USING (shingle)
WHERE s.doc_id % 97 <> 0
GROUP BY s.doc_id
"""

    from dbsyncer_spark.ops.sampling import _salt, threshold_u32, u32_sql

    sql["sample_stratified"] = f"""
SELECT doc_id, lang FROM documents
WHERE ({u32_sql('doc_id', seed=5)}) <
      CASE lang WHEN 'en' THEN {threshold_u32(0.5)}
                WHEN 'zh' THEN {threshold_u32(0.25)}
                WHEN 'de' THEN {threshold_u32(1.0)}
                ELSE 0 END
"""

    sql["mix_oversampled"] = f"""
WITH zh AS (
  SELECT doc_id,
         2 + CASE WHEN ({u32_sql('doc_id', seed=_salt(13, 'zh'))})
                       < {threshold_u32(0.5)} THEN 1 ELSE 0 END AS n
  FROM documents WHERE lang = 'zh')
SELECT doc_id, 'zh' AS mix_source,
       CAST(unnest(generate_series(0, n - 1)) AS INTEGER) AS epoch FROM zh
UNION ALL
SELECT doc_id, 'en' AS mix_source, 0 AS epoch FROM documents
WHERE lang = 'en'
  AND ({u32_sql('doc_id', seed=_salt(13, 'en'))}) < {threshold_u32(0.5)}
"""

    mh_cols = ",\n  ".join(
        f"min(md5('{i}:' || shingle)) AS mh{i}" for i in range(16)
    )
    band_rows = "\nUNION ALL\n".join(
        f"SELECT doc_id, {bi} AS band, md5(mh{bi * 4} || '|' || mh{bi * 4 + 1} || '|' "
        f"|| mh{bi * 4 + 2} || '|' || mh{bi * 4 + 3}) AS bh FROM sig"
        for bi in range(4)
    )
    # ok CTE mirrors the engine's pre-agg bucket cap (2..1000 members)
    sql["dedup_minhash_lsh"] = f"""
WITH toks AS (SELECT doc_id, {_TOK} AS t FROM documents),
sh AS (SELECT doc_id, unnest({sh3}) AS shingle FROM toks),
sig AS (SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id),
bands AS ({band_rows}),
ok AS (SELECT band, bh FROM bands GROUP BY band, bh
       HAVING count(*) BETWEEN 2 AND 1000)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
JOIN ok ON a.band = ok.band AND a.bh = ok.bh
"""

    sql["dedup_simhash"] = f"""
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS term FROM (SELECT doc_id, {_TOK} AS t FROM documents))
  GROUP BY doc_id, term
),
h AS (SELECT doc_id, tf, md5(term) AS hx FROM tf),
votes AS (
  SELECT doc_id, b,
         sum(tf * (2 * ((strpos('0123456789abcdef', substring(hx, (b // 4) + 1, 1)) - 1)
                        >> (3 - (b % 4)) & 1) - 1)) AS v
  FROM h CROSS JOIN (SELECT range AS b FROM range(60))
  GROUP BY doc_id, b
)
SELECT doc_id,
       sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END)::BIGINT AS simhash
FROM votes GROUP BY doc_id
"""

    _cos = (
        "list_dot_product(embedding::DOUBLE[], q.qv) / "
        "(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(q.qv, q.qv)))"
    )
    # cosine_topk's oracle retired with its queries() row (⊂ knn_join);
    # q_cosine_topk_impl stays as the library example + pytest surface
    sql["knn_join"] = f"""
WITH qs AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id IN (0,1,2)),
s AS (
  SELECT q.query_id, e.vec_id,
         list_dot_product(e.embedding::DOUBLE[], q.qv) /
         (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * sqrt(list_dot_product(q.qv, q.qv))) AS s,
         row_number() OVER (PARTITION BY q.query_id ORDER BY list_dot_product(e.embedding::DOUBLE[], q.qv) /
           (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * sqrt(list_dot_product(q.qv, q.qv))) DESC,
           e.vec_id ASC) AS rn
  FROM embeddings e CROSS JOIN qs q
)
SELECT query_id, vec_id, round(s, 6) AS score FROM s WHERE rn <= 5
"""

    sql["ann_lsh"] = _ann_lsh_oracle()
    sql["ann_ivf"] = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(s, 6) AS score FROM (
  SELECT vec_id, {cos} AS s FROM embeddings CROSS JOIN q
) ORDER BY s DESC, vec_id ASC LIMIT 12
""".format(cos=_cos)

    sql["text_stats"] = f"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(text), '\\s+')) END::BIGINT AS ws_tokens,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))::BIGINT AS bpe_tokens,
       round(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) / greatest(length(text), 1), 6) AS punct_ratio,
       round(list_sum(list_transform({_TOK}, x -> length(x)))::DOUBLE / greatest(len({_TOK}), 1), 6) AS mean_token_len
FROM documents
"""

    en = "', '".join(["the", "and", "of", "to", "is", "in", "that", "with"])
    de = "', '".join(["der", "die", "das", "und", "ist", "nicht", "ein", "mit"])
    es = "', '".join(["el", "la", "los", "que", "es", "una", "por", "con"])
    fr = "', '".join(["le", "la", "les", "est", "une", "dans", "pour", "avec"])

    def ratio(langlist: str) -> str:
        return (
            f"len(list_filter(t, x -> x IN ('{langlist}')))::DOUBLE / greatest(len(t), 1)"
        )

    sql["quality_lang"] = f"""
WITH base AS (
  SELECT doc_id, text, {_TOK} AS t,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END::DOUBLE AS nt,
         length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) / greatest(length(text), 1) AS pr
  FROM documents
),
feat AS (
  SELECT doc_id, t, text,
         least(nt / 20.0, 1.0) AS len_band,
         1.0 - least(pr * 4.0, 1.0) AS low_punct,
         1.0 - least(abs(list_sum(list_transform(t, x -> length(x)))::DOUBLE / greatest(len(t), 1) - 5.0) / 5.0, 1.0) AS mtl_band,
         least({ratio(en)} * 5.0, 1.0) AS sw_band,
         {ratio(en)} AS r_en, {ratio(de)} AS r_de, {ratio(es)} AS r_es, {ratio(fr)} AS r_fr,
         length(regexp_replace(text, '[^一-鿿]', '', 'g')) > 0 AS cjk
  FROM base
)
SELECT doc_id,
       round((len_band + low_punct + mtl_band + sw_band) / 4.0, 6) AS quality,
       CASE WHEN cjk THEN 'zh'
            WHEN r_en >= r_de AND r_en >= r_es AND r_en >= r_fr AND r_en > 0 THEN 'en'
            WHEN r_de >= r_es AND r_de >= r_fr AND r_de > 0 THEN 'de'
            WHEN r_es >= r_fr AND r_es > 0 THEN 'es'
            WHEN r_fr > 0 THEN 'fr'
            ELSE 'und' END AS lang_pred
FROM feat
"""

    sql["fingerprints"] = f"""
WITH toks AS (SELECT doc_id, {_TOK} AS t FROM documents),
kg AS (
  SELECT doc_id, unnest([{{'pos': i, 'h': md5(array_to_string(t[i:i+4], ' '))}}
                         for i in range(1, greatest(len(t)-4, 1)+1)]) AS u
  FROM toks
),
pos AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM kg)
SELECT DISTINCT doc_id,
       min(h) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
FROM pos
"""

    sql["multimodal_meta"] = """
SELECT doc_id AS media_id,
       octet_length(text::BLOB)::BIGINT AS n_bytes,
       sha256(text) AS sha256,
       'unknown' AS format
FROM documents
"""
    # the FAKE decoder's dims are a pure function of the payload bytes
    # (ops/multimodal.py), so the mapInPandas plumbing IS oracle-checkable
    # (was rows-only in r1): byte k extracted via hex + strpos (portable,
    # encoding-independent)
    def byte_at(k: int) -> str:
        # DuckDB substring() is VARCHAR-only: hex the blob, read 2 chars
        h = f"substring(hex(text::BLOB), {2 * k - 1}, 2)"
        return (
            f"((strpos('0123456789ABCDEF', substring({h}, 1, 1)) - 1) * 16"
            f" + strpos('0123456789ABCDEF', substring({h}, 2, 1)) - 1)"
        )

    sql["multimodal_decode"] = f"""
SELECT doc_id AS media_id,
       'image' AS kind,
       octet_length(text::BLOB)::BIGINT AS n_bytes,
       sha256(text) AS sha256,
       (16 + (CASE WHEN octet_length(text::BLOB) >= 1 THEN {byte_at(1)} ELSE 0 END) % 240)::INT AS width,
       (16 + (CASE WHEN octet_length(text::BLOB) >= 2 THEN {byte_at(2)} ELSE 0 END) % 240)::INT AS height,
       1 AS n_frames
FROM documents
"""
    # evolved read = merged scan + projection replay: added column is NULL
    # for pre-ALTER files (the even half), rename/cast are pure projection
    sql["ddl_evolution"] = """
SELECT doc_id,
       lang AS language,
       CAST(n_chars AS INTEGER) AS n_chars,
       CASE WHEN doc_id % 2 = 1 THEN source END AS source
FROM documents
"""
    return sql


def _ann_lsh_oracle() -> str:
    """Generated SQL twin of lsh_ann_topk: literal hyperplanes (seeded,
    identical constants both sides), sign-bit signature, hamming<=2
    multiprobe, exact cosine rerank."""
    from dbsyncer_spark.ops.similarity import hyperplanes

    planes = hyperplanes(64, n_planes=16, seed=7)

    def vec_lit(p):
        return "[" + ", ".join(repr(float(x)) for x in p) + "]::DOUBLE[]"

    def sig_expr(var: str) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product({var}, {vec_lit(p)}) > 0 THEN (1::BIGINT << {i}) ELSE 0::BIGINT END)"
            for i, p in enumerate(planes)
        )

    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
sigs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
with_sig AS (SELECT vec_id, v, ({sig_expr('v')}) AS sig FROM sigs),
qsig AS (SELECT ({sig_expr('q.qv')}) AS s FROM q),
cand AS (
  SELECT w.vec_id, w.v FROM with_sig w, qsig
  WHERE bit_count(xor(w.sig, qsig.s)) <= 2
)
SELECT vec_id, round(s, 6) AS score FROM (
  SELECT c.vec_id,
         list_dot_product(c.v, q.qv) / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS s
  FROM cand c CROSS JOIN q
) ORDER BY s DESC, vec_id ASC LIMIT 10
"""
