"""Pure-Python exhaustive BM25 oracle (float64) for the pytest gate.

Golden semantics per FIXTURES.md T3: Okapi BM25 k1=1.2 b=0.75,
idf = ln(1 + (N - df + 0.5)/(df + 0.5)), query terms summed in
sorted-term order, ranking = (score desc, docId asc) — the docId
tiebreak mirrors Lucene's ``_doc`` sort field (reference
``Shard.java:234-247``).

Deliberately simple and sequential — this is the thing the distributed
engine must match, not the thing that needs to be fast.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from dbsyncer_spark import BM25_B, BM25_K1
from dbsyncer_spark.functions.tokenizer import tokenize_py


def corpus_stats(docs: dict[int, str], stopwords=None):
    """docs: {doc_id: content}. Returns (tf, dl, df, N, avgdl)."""
    tf: dict[int, Counter] = {}
    dl: dict[int, int] = {}
    df: Counter = Counter()
    for doc_id, content in docs.items():
        toks = tokenize_py(content, stopwords)
        tf[doc_id] = Counter(toks)
        dl[doc_id] = len(toks)
        df.update(set(toks))
    n = len(docs)
    avgdl = (sum(dl.values()) / n) if n else 0.0
    return tf, dl, df, n, avgdl


def bm25_oracle_topk(
    docs: dict[int, str],
    query: str,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    stopwords=None,
    doc_pred=None,
    precomputed=None,
) -> list[tuple[int, float]]:
    """Exhaustive BM25 top-k: [(doc_id, score)] by (score desc, id asc).

    ``doc_pred`` optionally restricts returned docs (corpus stats stay
    global, matching a filtered Lucene query). ``precomputed`` may carry
    the result of :func:`corpus_stats` to amortize across queries.
    """
    tf, dl, df, n, avgdl = precomputed if precomputed else corpus_stats(docs, stopwords)
    q_terms = sorted(set(tokenize_py(query, stopwords)))
    scores: dict[int, float] = {}
    for t in q_terms:  # sorted-term summation order (deterministic floats)
        d_f = df.get(t, 0)
        if d_f == 0:
            continue
        idf = math.log(1.0 + (n - d_f + 0.5) / (d_f + 0.5))
        for doc_id, counts in tf.items():
            f = counts.get(t)
            if not f:
                continue
            tfn = f * (k1 + 1.0) / (f + k1 * (1.0 - b + b * dl[doc_id] / avgdl))
            scores[doc_id] = scores.get(doc_id, 0.0) + idf * tfn
    items = [(d, s) for d, s in scores.items() if doc_pred is None or doc_pred(d)]
    items.sort(key=lambda x: (-x[1], x[0]))
    return items[:k]


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()
