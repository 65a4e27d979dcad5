"""Separated-values file source/sink — the reference's File connector.

The reference reads files by splitting each line on a one-char separator
into user-declared typed columns (``FileConnector.java:151-182``) and
writes by joining row values with the separator (``:185-216``). Spark
shape: ``spark.read.text`` + one ``split`` + typed casts (all codegen'd;
the scan stays a plain line scan so it parallelizes by file split at any
scale), and ``concat_ws`` for the sink. We do NOT use spark.read.csv so
the semantics (no quoting/escaping — the reference does none) match
exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_lines(lines: Column | str, fields: list[tuple[str, str]], sep: str = "|") -> list[Column]:
    """Split a line column into typed columns per the declared schema.

    ``fields`` is [(name, spark_type_ddl), ...] in file order. Missing
    trailing fields become NULL (split yields fewer elements); extra
    fields are ignored — mirroring the reference's positional read.
    """
    c = F.col(lines) if isinstance(lines, str) else lines
    import re as _re

    parts = F.split(c, _re.escape(sep))
    # F.get + try_cast: missing trailing fields and empty/malformed values
    # become NULL (ANSI getItem/cast would throw; the reference's
    # positional read is similarly lenient)
    return [F.get(parts, i).try_cast(t).alias(n) for i, (n, t) in enumerate(fields)]


def read_split_file(
    spark: SparkSession, path: str, fields: list[tuple[str, str]], sep: str = "|"
) -> DataFrame:
    """Line scan -> typed columns (reference ``FileConnector.java:151-182``)."""
    return spark.read.text(path).select(*parse_lines("value", fields, sep))


def format_lines(df: DataFrame, sep: str = "|") -> DataFrame:
    """Rows -> one string column ``value`` joined by ``sep`` (sink format,
    reference ``FileConnector.java:185-216``). NULLs render as empty."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in df.columns]
    return df.select(F.concat_ws(sep, *cols).alias("value"))


def write_split_file(df: DataFrame, path: str, sep: str = "|", mode: str = "overwrite") -> None:
    format_lines(df, sep).write.mode(mode).text(path)
