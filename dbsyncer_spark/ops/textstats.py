"""Text analysis operators: token counting, quality scoring, language ID,
winnowing document fingerprints.

Everything is pure Column math (JVM-side, codegen) with exact ANSI-SQL
twins — see __spark_entry__.oracle_sql. At 100 TB these are all map-only
passes (fingerprints add one window over (doc, position), partitioned by
doc so it never global-sorts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbsyncer_spark.functions.tokenizer import tokens_col

# tiny per-language stopword cores for the heuristic language ID
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "es": ["el", "la", "los", "que", "es", "una", "por", "con"],
    "fr": ["le", "la", "les", "est", "une", "dans", "pour", "avec"],
}

# BPE-ish token regex: words, numbers, or single non-space symbols —
# a cheap proxy for subword tokenizer cost accounting.
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def ws_token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.split(F.trim(c), r"\s+")
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(F.size(arr)).cast("long")


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish token count via regexp extraction (words/numbers/symbols)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0)).cast("long")


def punct_ratio(col: Column | str) -> Column:
    """Non-alphanumeric-non-space chars / total chars (float64)."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(F.regexp_replace(c, r"[a-zA-Z0-9\s]", ""))
    return n_punct.cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double")


def stopword_ratio(col: Column | str, stopwords: list[str],
                   tokens: Column | None = None) -> Column:
    toks = tokens_col(col) if tokens is None else tokens
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def mean_token_len(col: Column | str, tokens: Column | None = None) -> Column:
    toks = tokens_col(col) if tokens is None else tokens
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(col: Column | str, stopwords: list[str] | None = None,
                  tokens: Column | None = None) -> Column:
    """Composite document quality in [0,1]: length band + low punctuation
    + healthy mean token length + stopword presence. Deterministic
    heuristic (the point is the Column-math shape, not linguistics).

    ``tokens``: pre-tokenized array column. Pass it when combining with
    other token-deriving features so the text is tokenized ONCE in a
    child projection (each inline ``tokens_col`` re-runs the full regex
    pipeline per expression — 5 expansions cost ~2.3x at sf0.1)."""
    sw = stopwords or LANG_MARKERS["en"]
    toks_n = ws_token_count(col).cast("double")
    len_band = F.least(toks_n / F.lit(20.0), F.lit(1.0))  # saturate at 20 tokens
    low_punct = F.lit(1.0) - F.least(punct_ratio(col) * F.lit(4.0), F.lit(1.0))
    mtl = mean_token_len(col, tokens=tokens)
    mtl_band = F.lit(1.0) - F.least(F.abs(mtl - F.lit(5.0)) / F.lit(5.0), F.lit(1.0))
    sw_band = F.least(stopword_ratio(col, sw, tokens=tokens) * F.lit(5.0), F.lit(1.0))
    return F.round((len_band + low_punct + mtl_band + sw_band) / F.lit(4.0), 6)


def lang_id(col: Column | str, tokens: Column | None = None) -> Column:
    """Heuristic language ID: argmax of per-language marker-token hit
    ratios; 'zh' if CJK chars present; 'und' when nothing scores.

    Ties broken by fixed language order (deterministic). ``tokens``:
    pre-tokenized array column (see quality_score).
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens_col(c) if tokens is None else tokens
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*marks))).cast("double") / n
        for lang, marks in LANG_MARKERS.items()
    }
    has_cjk = F.length(F.regexp_replace(c, r"[^一-鿿]", "")) > 0
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    for lang in ["en", "de", "es", "fr"]:  # fixed priority order for ties
        s = scores[lang]
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return F.when(has_cjk, F.lit("zh")).otherwise(best_lang)


def fingerprints_col(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    kgram: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints, Column/window form — the oracle twin of
    the Arrow kernel below (identical rows, parity-tested). The per-
    position slice+concat_ws+md5 is allocation-bound in codegen, so the
    hot path is the kernel; this form documents the declarative shape
    (bounded window over (doc, pos) — shuffles on doc_id only)."""
    from pyspark.sql import Window as W

    from dbsyncer_spark.ops.dedup import _spread

    from dbsyncer_spark.functions.hof import bind_once

    # toks bound once: an unbound reference re-tokenizes the text at
    # every k-gram position (see functions/hof.py)
    kg = bind_once(tokens_col(text_col), lambda toks: F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - F.lit(kgram), F.lit(0))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, kgram))),
    ))
    pos = _spread(docs).select(
        F.col(id_col).alias("doc_id"), F.posexplode(kg).alias("pos", "h")
    )
    w = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    return (
        pos.select("doc_id", F.min("h").over(w).alias("fp"))
        .distinct()
    )


def fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    kgram: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03): hash every
    word k-gram, keep the min hash of each sliding window of ``window``
    consecutive k-grams, distinct per doc. md5-hex min (=numeric min on
    fixed-width hex). Returns (doc_id, fp).

    Arrow-kernel implementation: tokenize (same pyarrow passes as the
    index build), per-doc k-gram md5 + sliding-window min in Python over
    the batch — the whole operator becomes MAP-ONLY + one distinct
    (the Column/window twin ``fingerprints_col`` shuffles on doc_id for
    its window; rows are identical — parity gate in tests)."""
    import hashlib

    import pandas as pd

    from dbsyncer_spark.functions.tokenizer import tokenize_arrow
    from dbsyncer_spark.index.build import _limit_arrow_threads
    from dbsyncer_spark.ops.dedup import _spread

    sel = _spread(docs).select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )

    def gen(batches):
        _limit_arrow_threads()
        for pdf in batches:
            if not len(pdf):
                continue
            lists = tokenize_arrow(pdf["text"].fillna(""))
            ids_out: list[int] = []
            fp_out: list[str] = []
            for did, toks in zip(pdf["doc_id"].to_numpy(), lists.to_pylist()):
                toks = [t for t in toks if t]
                hs = [
                    hashlib.md5(" ".join(toks[i:i + kgram]).encode()).hexdigest()
                    for i in range(max(len(toks) - kgram, 0) + 1)
                ]
                fps = {min(hs[i:i + window]) for i in range(len(hs))}
                ids_out.extend([int(did)] * len(fps))
                fp_out.extend(fps)
            yield pd.DataFrame({"doc_id": ids_out, "fp": fp_out})

    # per-doc set already emits distinct (doc_id, fp) and a doc lives in
    # exactly one input row — no distinct() shuffle needed
    return sel.mapInPandas(gen, "doc_id long, fp string")
