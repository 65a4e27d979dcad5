"""Deterministic sampling / mixing ops (ops/sampling.py) and benchmark
decontamination (ops/dedup.py): reproducibility across partitionings,
cross-engine parity of the hash draw, and the map-only plan shapes."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dbsyncer_spark.ops.dedup import contaminated_ids, decontaminate
from dbsyncer_spark.ops.sampling import (
    deterministic_sample,
    hash_u32,
    split_train_eval,
    stratified_sample,
    threshold_u32,
    u32_sql,
    weighted_mix,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"word{i} alpha beta gamma delta{i % 7} epsilon zeta", ["en", "de", "fr"][i % 3])
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string").cache()
    df.count()
    return df


def test_hash_u32_matches_duckdb_oracle(spark, docs):
    got = {
        r.doc_id: r.u
        for r in docs.select("doc_id", hash_u32("doc_id", seed=7).alias("u")).collect()
    }
    con = duckdb.connect()
    expr = u32_sql("i", seed=7)
    want = {
        i: u for i, u in con.sql(
            f"SELECT i, {expr} AS u FROM (SELECT range AS i FROM range(600))"
        ).fetchall()
    }
    assert got == want
    assert all(0 <= u < (1 << 32) for u in got.values())


def test_deterministic_sample_stable_across_partitionings(spark, docs):
    a = {r.doc_id for r in deterministic_sample(docs, 0.3, seed=1).collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(docs.repartition(17, "lang"), 0.3, seed=1).collect()
    }
    assert a == b, "membership must not depend on partitioning"
    # quantized-threshold semantics: membership is exactly u < thr
    thr = threshold_u32(0.3)
    u = {
        r.doc_id: r.u
        for r in docs.select("doc_id", hash_u32("doc_id", 1).alias("u")).collect()
    }
    assert a == {i for i, v in u.items() if v < thr}
    # ~30% of 600 within generous tolerance
    assert 120 <= len(a) <= 240


def test_split_train_eval_disjoint_exhaustive(spark, docs):
    out = split_train_eval(docs, 0.2, seed=3).groupBy("split").count().collect()
    counts = {r.split: r["count"] for r in out}
    assert set(counts) == {"train", "eval"} and sum(counts.values()) == 600
    # same seed = same split; different seed = different split
    again = split_train_eval(docs, 0.2, seed=3)
    assert again.filter(F.col("split") == "eval").count() == counts["eval"]
    other = split_train_eval(docs, 0.2, seed=4).filter(F.col("split") == "eval")
    assert {r.doc_id for r in other.collect()} != {
        r.doc_id
        for r in split_train_eval(docs, 0.2, seed=3)
        .filter(F.col("split") == "eval").collect()
    }


def test_stratified_sample_per_stratum(spark, docs):
    fr = {"en": 1.0, "de": 0.5, "fr": 0.0}
    got = stratified_sample(docs, fr, "lang", seed=5)
    by_lang = {r.lang: r["count"] for r in got.groupBy("lang").count().collect()}
    assert by_lang.get("fr", 0) == 0
    assert by_lang["en"] == 200  # fraction 1.0 keeps every row
    # de: exact membership check against the draw
    thr = threshold_u32(0.5)
    de_ids = {
        r.doc_id
        for r in docs.filter(F.col("lang") == "de")
        .select("doc_id", hash_u32("doc_id", 5).alias("u"))
        .filter(F.col("u") < thr).collect()
    }
    assert {r.doc_id for r in got.filter(F.col("lang") == "de").collect()} == de_ids


def test_stratified_sample_is_map_only(docs):
    plan = stratified_sample(docs, {"en": 0.5}, "lang")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "stratified sampling must not shuffle"


def test_weighted_mix_tags_and_independence(spark, docs):
    py = docs.filter(F.col("lang") == "en")
    rest = docs.filter(F.col("lang") != "en")
    mix = weighted_mix([("en", py, 0.9), ("rest", rest, 0.25)], seed=11)
    tags = {r.mix_source for r in mix.select("mix_source").distinct().collect()}
    assert tags == {"en", "rest"}
    n_en = mix.filter(F.col("mix_source") == "en").count()
    assert 150 <= n_en <= 200  # ~0.9 * 200
    # same doc under two source names draws independently (salted seed)
    both = weighted_mix([("a", py, 0.5), ("b", py, 0.5)], seed=11)
    ids_a = {r.doc_id for r in both.filter(F.col("mix_source") == "a").collect()}
    ids_b = {r.doc_id for r in both.filter(F.col("mix_source") == "b").collect()}
    assert ids_a != ids_b


def test_oversample_fractional_repeats(spark, docs):
    from dbsyncer_spark.ops.sampling import hash_u32, oversample, threshold_u32

    out = oversample(docs, 2.25, seed=21)
    # exact expected count: 2*N + |{u < thr(0.25)}|
    thr = threshold_u32(0.25)
    n_extra = docs.filter(hash_u32("doc_id", 21) < thr).count()
    assert out.count() == 2 * 600 + n_extra
    per_doc = {r.doc_id: r["count"] for r in out.groupBy("doc_id").count().collect()}
    assert set(per_doc.values()) <= {2, 3} and len(per_doc) == 600
    epochs = {r.epoch for r in out.select("epoch").distinct().collect()}
    assert epochs == {0, 1, 2}
    # factor < 1 degrades to plain sampling, epoch all 0
    small = oversample(docs, 0.3, seed=21)
    assert small.count() < 600
    assert {r.epoch for r in small.select("epoch").distinct().collect()} == {0}
    # map-only plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError, match=">= 0"):
        oversample(docs, -1.0)


def test_oversample_tolerates_float_noise_integer_factors(spark, docs):
    """ADVICE r3: factor=3.0000000000000004 (float arithmetic on mix
    ratios) must mean exactly 3 copies, not a sub-resolution error; a
    genuinely sub-resolution positive factor must still raise."""
    from dbsyncer_spark.ops.sampling import oversample

    out = oversample(docs, 3.0000000000000004, seed=21)
    assert out.count() == 3 * 600
    assert {r.epoch for r in out.select("epoch").distinct().collect()} == {0, 1, 2}
    # silently-empty guard still holds for real tiny fractions
    with pytest.raises(ValueError, match="resolution"):
        oversample(docs, 1e-12, seed=21)
    # base > 0 with float-noise fraction on top of base also fine
    assert oversample(docs, 1.0 + 1e-15, seed=21).count() == 600


def test_weighted_mix_oversampling_source(spark, docs):
    from dbsyncer_spark.ops.sampling import weighted_mix

    de = docs.filter(F.col("lang") == "de")
    mix = weighted_mix([("de", de, 2.0), ("all", docs, 0.1)], seed=7)
    assert mix.filter(F.col("mix_source") == "de").count() == 2 * 200
    assert {r.epoch for r in mix.filter(F.col("mix_source") == "all")
            .select("epoch").distinct().collect()} == {0}


def test_decontaminate_removes_ngram_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "entirely unrelated content about spark pipelines"),
            (2, "prefix words then the quick brown fox appears here"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox"), (101, "")], "doc_id long, text string"
    )
    bad = contaminated_ids(corpus, bench, n=3)
    got = {r.doc_id: r.n_overlap for r in bad.collect()}
    assert set(got) == {0, 2}
    assert got[0] == 1 and got[2] == 1  # the single shared 3-gram
    clean = decontaminate(corpus, bench, n=3)
    assert {r.doc_id for r in clean.collect()} == {1, 3}, \
        "empty docs must never count as contaminated"


def test_decontaminate_broadcasts_benchmark(spark):
    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma {i}") for i in range(50)], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(0, "alpha beta gamma")], "doc_id long, text string")
    plan = (
        contaminated_ids(corpus, bench, n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, \
        "benchmark shingles must broadcast — the corpus side is never shuffled"


def test_threshold_u32_rejects_sub_resolution_fractions():
    with pytest.raises(ValueError, match="below the 1/2\\^32"):
        threshold_u32(1e-12)
    assert threshold_u32(1e-6) > 0  # representable at u32 resolution
    assert threshold_u32(0.0) == 0


def test_salt_is_collision_resistant_for_anagram_names():
    from dbsyncer_spark.ops.sampling import _salt

    assert _salt(9, "ab") != _salt(9, "ba")
    assert _salt(9, "en-v2") != _salt(9, "v2-en")


def test_mix_refuses_to_clobber_existing_columns(spark, docs):
    from dbsyncer_spark.ops.sampling import oversample

    tagged = docs.withColumn("epoch", F.lit(42))
    with pytest.raises(ValueError, match="already exist"):
        oversample(tagged, 2.0)
    with pytest.raises(ValueError, match="already exist"):
        weighted_mix([("a", tagged, 0.5)])
    with pytest.raises(ValueError, match="already exist"):
        split_train_eval(docs.withColumn("split", F.lit("x")), 0.1)


def test_decontaminate_catches_short_benchmark_docs(spark):
    """A benchmark doc shorter than n tokens must be matched WHOLE inside
    longer corpus docs (r3 review: the n-gram-only stream silently missed
    short eval items — QA benchmarks are full of them)."""
    corpus = spark.createDataFrame(
        [
            (0, "intro text what is the boiling point of water trailing words"),
            (1, "entirely unrelated content about spark pipelines running fast"),
            (2, "boiling point"),  # shorter than the bench doc: NOT contaminated
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "what is the boiling point of water")],  # 7 tokens < n=8
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_overlap for r in contaminated_ids(corpus, bench, n=8).collect()}
    assert got == {0: 1}, got
    clean = decontaminate(corpus, bench, n=8)
    assert {r.doc_id for r in clean.collect()} == {1, 2}
