"""Fulltext hit highlighting — the reference's highlighter (SURVEY.md §2.5
F12: ``SimpleHTMLFormatter`` + ``QueryScorer`` with best-fragment
extraction, ``Shard.java:294-316``; the SQL-backend emulation is a plain
string replace, ``MySQLStorageService.java:528-537``).

Implementation: the text is losslessly partitioned into PIECES — maximal
alphanumeric runs, single CJK chars, or separator runs — with one
``regexp_extract_all``; a piece is a hit iff its lowercase form equals a
query token (whole-token, case-insensitive, same boundaries as the
tokenizer's; camelCase sub-words do NOT match, mirroring the previous
lookaround-regex semantics). Everything downstream is array Column math
(codegen'd, no UDF) and — unlike the old lookaround regex — every step is
RE2-expressible, so the DuckDB oracle checks values exactly.

``best_fragment_col`` is the ``getBestFragment`` analog: score every
window of ``width`` consecutive pieces by hit count, return the first
best window with hits wrapped. A hitless doc yields its leading window
(Lucene returns null; a leading snippet is the friendlier contract for
the fetch page, and the oracle mirrors it).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from dbsyncer_spark.functions.hof import bind_once
from dbsyncer_spark.functions.tokenizer import CJK_CLASS, tokenize_py

PRE_TAG = "<span style='color:red'>"
POST_TAG = "</span>"

# lossless partition: token runs | CJK unigrams | separator runs
PIECES_RE = rf"[a-zA-Z0-9]+|[{CJK_CLASS}]|[^a-zA-Z0-9{CJK_CLASS}]+"


def _pieces(c: Column) -> Column:
    return F.regexp_extract_all(c, F.lit(PIECES_RE), 0)


def _wrap(piece: Column, terms: list[str], pre: str, post: str) -> Column:
    return F.when(
        F.lower(piece).isin(*terms), F.concat(F.lit(pre), piece, F.lit(post))
    ).otherwise(piece)


def highlight_col(
    text: Column | str,
    query: str,
    pre: str = PRE_TAG,
    post: str = POST_TAG,
) -> Column:
    """Wrap every whole-token hit of ``query`` in the full text with
    pre/post tags. Empty/stop-only queries return the text unchanged."""
    c = F.col(text) if isinstance(text, str) else text
    terms = sorted(set(tokenize_py(query)))
    if not terms:
        return c
    return F.array_join(
        F.transform(_pieces(c), lambda p: _wrap(p, terms, pre, post)), ""
    )


def best_fragment_col(
    text: Column | str,
    query: str,
    width: int = 24,
    pre: str = PRE_TAG,
    post: str = POST_TAG,
) -> Column:
    """Best-fragment snippet: the first ``width``-piece window with the
    most hits, hits wrapped (reference ``getBestFragment``,
    ``Shard.java:304-316``). ~width/2 words since pieces alternate
    token/separator."""
    c = F.col(text) if isinstance(text, str) else text
    terms = sorted(set(tokenize_py(query)))
    if not terms:
        return F.array_join(F.slice(_pieces(c), 1, width), "")

    # bind pieces / hits / win_scores once each: hits is probed at every
    # window start and win_scores is referenced twice (array_position +
    # array_max) — unbound, each reference re-runs the full-text regex
    # extraction per window, O(n^2) per row (see functions/hof.py)
    def over_pieces(pieces):
        def over_hits(hits):
            starts = F.sequence(
                F.lit(1), F.greatest(F.size(hits) - F.lit(width - 1), F.lit(1))
            )
            win_scores = F.transform(
                starts,
                lambda i: F.aggregate(
                    F.slice(hits, i, width), F.lit(0), lambda acc, x: acc + x
                ),
            )

            def over_scores(ws):
                best = F.array_position(ws, F.array_max(ws)).cast("int")
                frag = F.transform(
                    F.slice(pieces, best, width),
                    lambda p: _wrap(p, terms, pre, post),
                )
                return F.array_join(frag, "")

            return bind_once(win_scores, over_scores)

        hits = F.transform(pieces, lambda p: F.lower(p).isin(*terms).cast("int"))
        return bind_once(hits, over_hits)

    return bind_once(_pieces(c), over_pieces)


def highlight_sql_exprs(col_sql: str, query: str, width: int = 24,
                        pre: str = PRE_TAG, post: str = POST_TAG) -> dict[str, str]:
    """DuckDB twins of highlight_col / best_fragment_col (oracle parity).
    Returns {"highlight": expr, "fragment": expr}."""
    terms = sorted(set(tokenize_py(query)))
    inlist = ", ".join(f"'{t}'" for t in terms)
    pre_q, post_q = pre.replace("'", "''"), post.replace("'", "''")
    pieces = f"regexp_extract_all({col_sql}, '{PIECES_RE}')"
    wrap = (
        f"list_transform({{P}}, p -> CASE WHEN lower(p) IN ({inlist}) "
        f"THEN '{pre_q}' || p || '{post_q}' ELSE p END)"
    )
    # coalesce: DuckDB's array_to_string([]) is NULL, Spark's is ''
    highlight = "coalesce(array_to_string(" + wrap.format(P=pieces) + ", ''), '')"
    hits = (
        f"list_transform({pieces}, p -> CASE WHEN lower(p) IN ({inlist}) "
        f"THEN 1 ELSE 0 END)"
    )
    scores = (
        f"[coalesce(list_sum(({hits})[i:i+{width - 1}]), 0) "
        f"for i in range(1, greatest(len({pieces}) - {width - 1}, 1) + 1)]"
    )
    best = f"list_position({scores}, list_max({scores}))"
    frag_slice = f"({pieces})[({best}):({best}) + {width - 1}]"
    fragment = "coalesce(array_to_string(" + wrap.format(P=frag_slice) + ", ''), '')"
    return {"highlight": highlight, "fragment": fragment}
