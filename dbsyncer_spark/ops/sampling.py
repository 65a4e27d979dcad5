"""Deterministic sampling / dataset-mixing operators for training-data
pipelines.

A 100 TB training mix cannot use ``rand()``: Spark re-executes lost
tasks, AQE re-plans stages, and two cluster sizes split the input
differently — non-deterministic sampling yields a different dataset on
every run/retry/scale, which breaks dataset reproducibility, ablation
comparisons, and incremental re-runs. Every operator here derives its
randomness from ``md5(seed ':' key)`` instead: a pure, portable Column
expression, so

- the same (seed, key) always draws the same uniform — on any executor
  count, any retry, any engine (the DuckDB oracle reproduces it exactly,
  see ``u32_sql``);
- membership is a per-row map-only decision: zero shuffle, no UDFs,
  whole-stage codegen end to end — the selectivity filter pushes down to
  the parquet/Iceberg scan boundary like any other predicate.

Fractions quantize to 1/2^32 (the first 8 md5 hex chars) — fine enough
that even a 1e-9 fraction of a 10^10-doc corpus resolves with <0.3%
relative error; a nonzero fraction that would quantize to zero raises
instead of silently returning an empty sample.

The reference has no sampling surface (it syncs full tables); these
operators cover the training-pipeline needs layered on the same corpus
(SURVEY.md "beyond the reference" mandate), next to ops.dedup /
ops.textstats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: denominator of the quantized uniform: first 8 md5 hex chars.
U32_SPACE = 1 << 32


def hash_u32(key: Column | str, seed: int = 0) -> Column:
    """Deterministic uniform draw in [0, 2^32) from md5(seed ':' key).

    Column-only (md5 + substring + base-16 conv): identical on every
    engine that has md5 — the cross-engine contract the DuckDB oracle
    checks via ``u32_sql``."""
    key = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def u32_sql(key_expr: str, seed: int = 0) -> str:
    """The ANSI-ish SQL twin of ``hash_u32`` (DuckDB-compatible): nibble
    arithmetic over the same md5 prefix, so oracle checks reproduce the
    engine's draws bit-for-bit."""
    h = f"md5('{seed}:' || CAST({key_expr} AS VARCHAR))"
    nib = "(strpos('0123456789abcdef', substring({h}, {i}, 1)) - 1)"
    return " + ".join(
        f"{nib.format(h=h, i=i + 1)} * {16 ** (7 - i)}" for i in range(8)
    )


def threshold_u32(fraction: float) -> int:
    """Quantized keep-threshold for a sampling fraction (round-to-nearest
    of fraction * 2^32). A nonzero fraction that quantizes to zero raises
    — silently keeping nothing is never what the caller meant (r3
    review: at u16 resolution, a 1e-6 sample of a 10^10-doc corpus
    silently returned empty)."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thr = min(U32_SPACE, max(0, round(fraction * U32_SPACE)))
    if fraction > 0 and thr == 0:
        raise ValueError(
            f"fraction {fraction} is below the 1/2^32 sampling resolution"
        )
    return thr


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Keep ~fraction of rows, decided per row by hash(seed, key): stable
    across runs, retries, and cluster sizes (unlike ``df.sample``, whose
    output depends on partitioning). Map-only — no shuffle, no UDF."""
    return df.filter(hash_u32(key_col, seed) < F.lit(threshold_u32(fraction)))


def split_train_eval(
    df: DataFrame,
    eval_fraction: float,
    key_col: str = "doc_id",
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Tag every row 'train' or 'eval' by the same deterministic draw —
    the standard held-out split that must not move between pipeline runs
    (an unstable split leaks eval docs into training). Disjoint and
    exhaustive by construction."""
    _no_clobber(df, split_col)
    u = hash_u32(key_col, seed)
    return df.withColumn(
        split_col,
        F.when(u < F.lit(threshold_u32(eval_fraction)), F.lit("eval"))
        .otherwise(F.lit("train")),
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict,
    strata_col: str,
    key_col: str = "doc_id",
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum value -> fraction
    (e.g. per-language quotas when rebalancing a multilingual corpus).
    Strata absent from ``fractions`` keep ``default_fraction``.

    The per-stratum threshold folds into ONE CASE expression — still
    map-only with the filter at the scan; no join against a quota table,
    no shuffle, and adding a stratum never re-draws other strata (each
    row's uniform depends only on (seed, key))."""
    thr = F.lit(threshold_u32(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(threshold_u32(frac))
        ).otherwise(thr)
    return df.filter(hash_u32(key_col, seed) < thr)


def oversample(
    df: DataFrame,
    factor: float,
    key_col: str = "doc_id",
    seed: int = 0,
    copy_col: str = "epoch",
) -> DataFrame:
    """Deterministic fractional repetition — the epoch policy for mix
    weights above 1. factor=2.3: every row appears twice, and a
    hash-chosen 30% of keys appear a third time; factor=0.3 degrades to
    plain sampling. Copies are distinguished by ``copy_col`` (0-based),
    so a downstream exact-dedup pass doesn't silently undo the repeats
    and shuffles hash distinct (key, epoch) pairs. Map-only: one
    ``explode(sequence(...))`` per row, no shuffle, and the expected
    output size is exactly factor x input."""
    if factor < 0:
        raise ValueError(f"factor must be >= 0, got {factor}")
    _no_clobber(df, copy_col, "__n_copies")
    base = int(factor)
    # Quantize the fractional part directly instead of routing it through
    # threshold_u32: float arithmetic (weighted_mix ratios) can produce
    # 3.0000000000000004, whose ~4e-16 fractional part must mean "no
    # extra copy", not the sub-resolution error threshold_u32 raises for.
    frac_thr = min(U32_SPACE, max(0, round((factor - base) * U32_SPACE)))
    if frac_thr == 0:
        if base == 0 and factor > 0:
            # the silently-empty guard threshold_u32 exists for
            raise ValueError(
                f"factor {factor} is below the 1/2^32 sampling resolution"
            )
        n = F.lit(base)
    else:
        extra = (hash_u32(key_col, seed) < F.lit(frac_thr)).cast("int")
        n = F.lit(base) + extra
    return (
        df.withColumn("__n_copies", n)
        .filter(F.col("__n_copies") > 0)
        .withColumn(
            copy_col,
            F.explode(F.sequence(F.lit(0), F.col("__n_copies") - 1)),
        )
        .drop("__n_copies")
    )


def weighted_mix(
    sources: list,
    key_col: str = "doc_id",
    seed: int = 0,
    source_col: str = "mix_source",
    copy_col: str = "epoch",
) -> DataFrame:
    """Compose a training mix from weighted sources: each (name, df,
    weight) contributes a deterministic sample, tagged with its name,
    unioned by name. weight <= 1 samples that fraction of the source;
    weight > 1 oversamples with the explicit epoch policy (``oversample``
    — whole repeats plus a hash-chosen fraction, copies numbered in
    ``copy_col``; epoch is 0 for plain-sampled sources so the schema is
    uniform). The per-source draw salts the seed with the source name,
    so a doc present in two sources is sampled independently in each
    (corpus overlap must not correlate the draws). Union of map-only
    branches: the mix is a zero-shuffle plan whose branches read in
    parallel; downstream shuffles see the already-resampled volume."""
    if not sources:
        raise ValueError("weighted_mix needs at least one (name, df, weight)")
    for _name, df, _w in sources:
        _no_clobber(df, source_col, copy_col)
    parts = []
    for name, df, weight in sources:
        if weight > 1.0:
            part = oversample(df, weight, key_col, seed=_salt(seed, name),
                              copy_col=copy_col)
        else:
            part = deterministic_sample(
                df, weight, key_col, seed=_salt(seed, name)
            ).withColumn(copy_col, F.lit(0))
        parts.append(part.withColumn(source_col, F.lit(name)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _no_clobber(df: DataFrame, *cols: str) -> None:
    """withColumn silently OVERWRITES an existing column — a source that
    already carries e.g. an 'epoch' column would lose it to the mix's
    copy counter with no error (r3 review). Raise instead; callers pick
    non-colliding names via the *_col parameters."""
    hit = [c for c in cols if c in df.columns]
    if hit:
        raise ValueError(
            f"column(s) {hit} already exist on the input DataFrame — pass "
            "different output column name(s)"
        )


def _salt(seed: int, name: str) -> int:
    """Fold a source name into the integer seed, deterministically and
    portably. md5-based, NOT a byte sum: anagram names ('en-v2' vs
    'v2-en') must not collide, or their draws correlate perfectly and
    overlapping sources stop sampling independently (r3 review). The
    salted seed is a plain int, so oracle SQL built in Python embeds it
    verbatim — nothing to reproduce engine-side."""
    import hashlib

    digest = hashlib.md5(f"{seed}:{name}".encode()).hexdigest()
    return int(digest[:12], 16)
