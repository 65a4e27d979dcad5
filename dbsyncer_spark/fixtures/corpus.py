"""Deterministic synthetic source-code corpus (FIXTURES.md T1/T2).

Input shape fixed by BASELINE.json input_hint:
``(repo string, path string, commit string, lang string, content string)``.

Generation is fully deterministic (numpy PCG64 with a fixed seed, no
wall-clock): Zipf-skewed keyword stream with hot terms (``import``,
``return``, ...) to exercise skew/salting, camelCase + snake_case
identifiers from a seeded vocabulary, log-normal doc lengths 10-2000
tokens. The per-row invariant vs the reference is sha256(content)
(verified on every returned row by the query path).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

LANGS = ["python", "java", "go", "js", "c"]
_EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "c": "c"}

# hot keywords at Zipfian frequency — the skew drivers
HOT = ["import", "return", "def", "public", "func", "var", "if", "else",
       "for", "class", "int", "string", "new", "const", "static", "void"]

_ROOTS = ["get", "set", "parse", "build", "load", "flush", "merge", "scan",
          "read", "write", "index", "query", "token", "shard", "batch",
          "sync", "user", "name", "config", "buffer", "offset", "commit",
          "stream", "field", "value", "filter", "page", "score", "rank",
          "term", "doc", "split", "hash", "byte", "block", "skip", "meta"]


def _vocab(rng: np.random.Generator, size: int = 4000) -> list[str]:
    """Seeded identifier vocabulary: camelCase and snake_case compounds."""
    out = []
    for _ in range(size):
        k = rng.integers(2, 4)
        parts = [str(_ROOTS[i]) for i in rng.integers(0, len(_ROOTS), k)]
        if rng.random() < 0.5:  # camelCase
            out.append(parts[0] + "".join(p.capitalize() for p in parts[1:]))
        else:  # snake_case
            out.append("_".join(parts))
    return out


def gen_corpus_pdf(n_docs: int = 1000, seed: int = 42) -> pd.DataFrame:
    """Generate the corpus as a pandas DataFrame (small/medium scales).

    For bench scales this is generated once and written to parquet; the
    engine itself never generates data — it reads the table.
    """
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)
    # Zipf ranks over the combined vocabulary: HOT terms get ranks 1..len(HOT)
    full = HOT + vocab
    probs = 1.0 / np.arange(1, len(full) + 1) ** 1.1
    probs /= probs.sum()

    dls = np.clip(rng.lognormal(mean=4.2, sigma=1.0, size=n_docs), 10, 2000).astype(int)

    rows = []
    for i in range(n_docs):
        repo = f"org{i % 7}/repo{i % 23}"
        lang = LANGS[i % len(LANGS)]
        path = f"src/m{i % 13}/f{i}.{_EXT[lang]}"
        commit = hashlib.sha1(f"42:{repo}:{path}".encode()).hexdigest()
        toks = rng.choice(len(full), size=dls[i], p=probs)
        words = [full[t] for t in toks]
        # line lengths 40-120 chars: break into lines greedily
        lines, cur = [], ""
        for w in words:
            if len(cur) + len(w) + 1 > 80:
                lines.append(cur)
                cur = w
            else:
                cur = w if not cur else cur + " " + w
        if cur:
            lines.append(cur)
        rows.append((repo, path, commit, lang, "\n".join(lines)))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def corpus_df(spark, n_docs: int = 1000, seed: int = 42):
    """Corpus as a Spark DataFrame with the canonical schema."""
    return spark.createDataFrame(
        gen_corpus_pdf(n_docs, seed),
        schema="repo string, path string, commit string, lang string, content string",
    )


def _gen_rows_for_ids(ids: np.ndarray, seed: int, full: list[str], probs: np.ndarray) -> pd.DataFrame:
    """Rows for the given doc indices; each doc's randomness is seeded by
    (seed, doc_index) so the output is independent of partitioning."""
    rows = []
    for i in ids:
        i = int(i)
        rng = np.random.default_rng([seed, i])
        dl = int(np.clip(rng.lognormal(mean=4.2, sigma=1.0), 10, 2000))
        repo = f"org{i % 7}/repo{i % 23}"
        lang = LANGS[i % len(LANGS)]
        path = f"src/m{i % 13}/f{i}.{_EXT[lang]}"
        commit = hashlib.sha1(f"{seed}:{repo}:{path}".encode()).hexdigest()
        toks = rng.choice(len(full), size=dl, p=probs)
        words = [full[t] for t in toks]
        lines, cur = [], ""
        for w in words:
            if len(cur) + len(w) + 1 > 80:
                lines.append(cur)
                cur = w
            else:
                cur = w if not cur else cur + " " + w
        if cur:
            lines.append(cur)
        rows.append((repo, path, commit, lang, "\n".join(lines)))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def corpus_df_distributed(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    """Bench-scale corpus generated ON THE EXECUTORS (mapInPandas over a
    range), deterministic per doc index regardless of partitioning — the
    driver never materializes the corpus. Statistically matches
    ``gen_corpus_pdf`` (same vocab/Zipf/length model) but per-doc seeding
    differs, so use one or the other consistently within a test."""
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def gen(batches):
        rng0 = np.random.default_rng(seed)
        vocab = _vocab(rng0)
        full = HOT + vocab
        probs = 1.0 / np.arange(1, len(full) + 1) ** 1.1
        probs /= probs.sum()
        for pdf in batches:
            yield _gen_rows_for_ids(pdf["id"].to_numpy(), seed, full, probs)

    return spark.range(n_docs, numPartitions=partitions).mapInPandas(
        gen, "repo string, path string, commit string, lang string, content string"
    )


def reference_queries() -> list[dict]:
    """The reference query set (FIXTURES.md T2): hot single terms, rare
    terms, conjunctions, camelCase-only matches, misses, filtered."""
    qs = [
        {"queryId": 1, "text": "import", "k": 10, "filterLang": None},
        {"queryId": 2, "text": "return", "k": 10, "filterLang": None},
        {"queryId": 3, "text": "shard", "k": 10, "filterLang": None},
        {"queryId": 4, "text": "merge offset", "k": 10, "filterLang": None},
        {"queryId": 5, "text": "token shard batch", "k": 10, "filterLang": None},
        {"queryId": 6, "text": "getUserName", "k": 10, "filterLang": None},
        {"queryId": 7, "text": "parseBufferOffset", "k": 10, "filterLang": None},
        {"queryId": 8, "text": "zzz_does_not_exist", "k": 10, "filterLang": None},
        {"queryId": 9, "text": "import", "k": 10, "filterLang": "python"},
        {"queryId": 10, "text": "query score rank", "k": 1, "filterLang": None},
        {"queryId": 11, "text": "flush_commit_stream", "k": 100, "filterLang": None},
        {"queryId": 12, "text": "index Query TOKEN", "k": 10, "filterLang": "java"},
        {"queryId": 13, "text": "doc block skip meta", "k": 10, "filterLang": None},
        {"queryId": 14, "text": "public static void", "k": 10, "filterLang": None},
        {"queryId": 15, "text": "readWriteSplit hash_byte", "k": 10, "filterLang": "go"},
    ]
    return qs
