"""Property-based lifecycle gate: RANDOM maintenance histories must stay
rank- and score-identical to the pure-Python oracle.

The fixed-sequence lifecycle tests (test_incremental, the
update_merge_search contract row) pin one known-good history each;
Lucene-class index bugs classically hide in the histories nobody wrote
down (delete-after-update-after-merge, compaction of an almost-empty
live set, tombstones spanning merged and unmerged segments — the
reference's equivalents live in ``Shard.java:102-145`` and its
TieredMergePolicy interactions). Hypothesis drives the SAME public API
(``append_segment`` / ``update_docs`` / ``delete_docs`` /
``maybe_merge`` / ``compact_segments``) through bounded random
histories against a version-list mirror:

- every live key the mirror expects must be physically present;
- nothing outside the mirror's version history may exist;
- the engine's live set (docstats minus tombstones) must EQUAL the
  mirror's alive set exactly;
- BM25 top-k over the current physical corpus (stats count tombstoned
  docs until a merge covers them — Lucene pre-merge semantics, same
  contract as test_incremental) must be rank-identical with float64
  score equality vs ``bm25_oracle_topk``.

Verification runs after every delete / merge / compact (the ops that
change masking or physical layout) and at history end. ``derandomize``
keeps CI deterministic; the example budget is small because each
example replays real Spark jobs — the value is the history SHAPES, not
volume.
"""

from __future__ import annotations

import random
import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dbsyncer_spark.index.build import append_segment, build_index
from dbsyncer_spark.index.search import SearchIndex
from dbsyncer_spark.oracle.bm25_oracle import bm25_oracle_topk, corpus_stats
from dbsyncer_spark.streaming.incremental import (
    compact_segments,
    delete_docs,
    maybe_merge,
    update_docs,
)

PARAMS = dict(num_shards=2, range_size=32, block_size=8, num_id_buckets=4)
SCHEMA = "repo string, path string, commit string, lang string, content string"
VOCAB = ("merge offset import return shard token batch spark index query "
         "delta vbyte lease commit window").split()
QUERIES = ["merge offset", "import shard", "token batch query"]
LANGS = ["java", "python", "go"]


class _Mirror:
    """Pure-Python version-list model of the index's logical state.

    Each entry is one appended doc VERSION (unique (repo, path, commit)
    triple — commits are fresh per version so doc identity is
    unambiguous even when an update supersedes a key). ``alive`` tracks
    tombstoning; physical presence is the engine's business (merges
    drop covered versions), bounded by the invariants asserted in
    ``_verify``.
    """

    def __init__(self):
        self.versions: list[dict] = []
        self._next = 0

    def fresh_docs(self, rng: random.Random, n: int) -> list[dict]:
        out = []
        for _ in range(n):
            i = self._next
            self._next += 1
            out.append({
                "repo": f"org{i % 3}/r{i % 5}",
                "path": f"src/f{i}.py",
                "commit": f"c{i:06d}",
                "lang": LANGS[i % len(LANGS)],
                "content": " ".join(
                    rng.choice(VOCAB) for _ in range(rng.randint(6, 40))
                ),
            })
        return out

    def new_versions_for(self, rng: random.Random, keys: list[tuple]) -> list[dict]:
        out = []
        for repo, path in keys:
            i = self._next
            self._next += 1
            out.append({
                "repo": repo,
                "path": path,
                "commit": f"c{i:06d}",
                "lang": LANGS[i % len(LANGS)],
                "content": " ".join(
                    rng.choice(VOCAB) for _ in range(rng.randint(6, 40))
                ),
            })
        return out

    def append(self, docs: list[dict]) -> None:
        for d in docs:
            self.versions.append({**d, "alive": True})

    def live_keys(self) -> list[tuple]:
        return sorted({(v["repo"], v["path"]) for v in self.versions if v["alive"]})

    def kill_key(self, repo: str, path: str) -> None:
        for v in self.versions:
            if v["repo"] == repo and v["path"] == path:
                v["alive"] = False

    def content_by_triple(self) -> dict[tuple, str]:
        return {(v["repo"], v["path"], v["commit"]): v["content"]
                for v in self.versions}

    def alive_triples(self) -> set[tuple]:
        return {(v["repo"], v["path"], v["commit"])
                for v in self.versions if v["alive"]}


def _verify(spark, index_dir: str, mirror: _Mirror) -> None:
    idx = SearchIndex(spark, index_dir)
    rows = idx.docstats().select("doc_id", "repo", "path", "commit").collect()
    by_id = {r.doc_id: (r.repo, r.path, r.commit) for r in rows}
    physical = set(by_id.values())
    contents = mirror.content_by_triple()
    alive = mirror.alive_triples()

    # physical-set invariants: no live doc lost, nothing invented
    assert alive <= physical, f"live docs missing from index: {alive - physical}"
    assert physical <= set(contents), f"unknown docs in index: {physical - set(contents)}"

    # exact live set: docstats minus tombstones == mirror alive
    tomb = idx._tombstones()
    dead_ids = (set() if tomb is None
                else {r.doc_id for r in tomb.select("doc_id").distinct().collect()})
    live_engine = {t for i, t in by_id.items() if i not in dead_ids}
    assert live_engine == alive

    # BM25 identity: stats over the PHYSICAL corpus (tombstoned docs
    # keep counting until merged away — Lucene pre-merge semantics),
    # ranking over live docs only
    docs = {i: contents[t] for i, t in by_id.items()}
    stats = corpus_stats(docs)
    for q in QUERIES:
        got = idx.search_rows(q, k=8)
        want = bm25_oracle_topk(
            docs, q, k=8, precomputed=stats,
            doc_pred=lambda d: d not in dead_ids,
        )
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9), q


_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(2, 6)),
        st.tuples(st.just("update"), st.integers(0, 2**30)),
        st.tuples(st.just("delete"), st.integers(0, 2**30)),
        st.tuples(st.just("compact"), st.just(0)),
        st.tuples(st.just("merge"), st.just(0)),
    ),
    min_size=3,
    max_size=7,
)


@settings(max_examples=5, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=_OPS, seed=st.integers(0, 2**30))
def test_random_lifecycle_matches_oracle(spark, ops, seed):
    rng = random.Random(seed)
    mirror = _Mirror()
    work = tempfile.mkdtemp(prefix="lifecycle_prop_")
    try:
        base = mirror.fresh_docs(rng, rng.randint(8, 16))
        mirror.append(base)
        build_index(spark, spark.createDataFrame(base, SCHEMA), work, **PARAMS)

        for op, arg in ops:
            if op == "append":
                docs = mirror.fresh_docs(rng, arg)
                mirror.append(docs)
                append_segment(spark, spark.createDataFrame(docs, SCHEMA),
                               work, num_id_buckets=4)
            elif op == "update":
                r = random.Random(arg)
                live = mirror.live_keys()
                picked = (r.sample(live, r.randint(1, min(3, len(live))))
                          if live else [])
                # sometimes an update-insert of a brand-new key (Lucene
                # updateDocument on an absent term)
                fresh = mirror.fresh_docs(rng, 1) if r.random() < 0.3 else []
                new_rows = mirror.new_versions_for(rng, picked) + fresh
                if not new_rows:
                    continue
                for repo, path in picked:
                    mirror.kill_key(repo, path)
                mirror.append(new_rows)
                update_docs(spark, work,
                            spark.createDataFrame(new_rows, SCHEMA),
                            key_cols=("repo", "path"), num_id_buckets=4)
            elif op == "delete":
                r = random.Random(arg)
                live = mirror.live_keys()
                if len(live) <= 2:
                    continue  # keep the corpus non-trivial
                picked = r.sample(live, r.randint(1, max(1, len(live) // 2)))
                for repo, path in picked:
                    mirror.kill_key(repo, path)
                delete_docs(spark, work, spark.createDataFrame(
                    [{"repo": rp, "path": p} for rp, p in picked],
                    "repo string, path string"))
                _verify(spark, work, mirror)
            elif op == "compact":
                compact_segments(spark, work)
                _verify(spark, work, mirror)
            elif op == "merge":
                # aggressive thresholds so small histories actually merge
                maybe_merge(spark, work, tier_factor=2, merge_at=2,
                            max_merge=4, reclaim_ratio=0.05)
                _verify(spark, work, mirror)

        _verify(spark, work, mirror)
    finally:
        shutil.rmtree(work, ignore_errors=True)
