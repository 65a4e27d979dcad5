"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/feature-extract step itself is STUBBED (image/audio libs are
not in this container): ``decode_image_batches`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
clearly-marked deterministic fake derives (width, height, n_frames)
from the payload bytes so the Spark-side plumbing — schema, partitioning,
``mapInPandas`` batch shape, Arrow transfer — is real and tested.

At 100 TB: binaries ride in their own column (parquet keeps them
column-pruned away from metadata scans); decode is a map-only
``mapInPandas`` whose output schema drops the payload as early as
possible (project-away pattern), and batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` to cap executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def binary_meta(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Payload metadata without decoding — pure Column math (byte length,
    sha256, magic-byte format sniff). Column-pruned: reads only the
    binary column."""
    c = F.col(bin_col)
    magic = F.hex(F.substring(c, 1, 4))
    fmt = (
        F.when(magic.startswith("FFD8"), "jpeg")
        .when(magic.startswith("89504E47"), "png")
        .when(magic.startswith("52494646"), "riff")
        .otherwise("unknown")
    )
    return df.withColumn("n_bytes", F.length(c).cast("long")).withColumn(
        "sha256", F.sha2(c, 256)
    ).withColumn("format", fmt)


def fake_decoder(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic FAKE batch decoder (the default test stand-in):
    dims are a pure function of the first payload bytes, so the plumbing
    is value-hash-checkable against a SQL oracle. Same call signature a
    real decoder takes — see ``decode_media(decoder=...)``."""
    import hashlib

    payloads = pdf["payload"]
    # NULL payloads (nullable by MEDIA_SCHEMA; produced e.g. by
    # docs_as_media on a NULL doc) yield NULL stats — the same Column
    # null semantics binary_meta has — instead of a stage-killing
    # TypeError from len(None) (r5 review). Pandas nullable Int dtypes
    # cross Arrow as proper NULLs.
    n_bytes = payloads.map(
        lambda b: None if b is None else len(b)).astype("Int64")
    sha = payloads.map(
        lambda b: None if b is None else hashlib.sha256(bytes(b)).hexdigest())
    width = payloads.map(
        lambda b: None if b is None else 16 + (b[0] if len(b) else 0) % 240
    ).astype("Int32")
    height = payloads.map(
        lambda b: None if b is None else 16 + (b[1] if len(b) > 1 else 0) % 240
    ).astype("Int32")
    n_frames = pdf["kind"].map({"image": 1, "audio": 0, "video": 30}).fillna(0).astype("int32")
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"].astype("int64"),
            "kind": pdf["kind"],
            "n_bytes": n_bytes,
            "sha256": sha,
            "width": width,
            "height": height,
            "n_frames": n_frames,
        }
    )


def decode_image_batches(fake: bool = False, decoder=None):
    """mapInPandas wrapper for MEDIA_SCHEMA -> DECODED_SCHEMA.

    ``decoder``: an INJECTED batch decoder — any callable
    (pandas DataFrame with MEDIA_SCHEMA columns) -> (pandas DataFrame
    with DECODED_SCHEMA columns). On a real cluster this is where
    PIL/ffmpeg plugs in, WITHOUT editing this module (VERDICT r2):

        decode_media(media, decoder=my_pil_decoder)

    ``fake=True`` injects :func:`fake_decoder`. With neither, raises
    NotImplementedError (no image/audio libs in this environment — the
    plumbing around the seam is real and hash-checked)."""
    if decoder is None and fake:
        decoder = fake_decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder is None:
                raise NotImplementedError(
                    "image/audio decode requires an injected decoder "
                    "(PIL/ffmpeg are not installed here) — pass "
                    "decoder=<batch fn>, or fake=True for the "
                    "deterministic test stand-in"
                )
            yield decoder(pdf)

    return run


def decode_media(df: DataFrame, fake: bool = False, decoder=None) -> DataFrame:
    """Run the (injected or fake) decoder over a MEDIA_SCHEMA DataFrame.

    The decode itself is a map-only mapInPandas pass; Arrow batch size
    bounds executor memory regardless of payload count."""
    return df.mapInPandas(decode_image_batches(fake=fake, decoder=decoder), DECODED_SCHEMA)


def docs_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat document text bytes as an opaque payload — lets the
    multimodal plumbing be exercised on the synthetic corpus."""
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col(text_col).cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )
