"""Scalar value converters — the reference's expression library
(``parser/enums/ConvertEnum.java:34-115``, handlers under
``parser/convert/handler/``), one Column function per handler.

Reference semantics preserved:
- null input -> null output for value transforms
  (``parser/convert/AbstractHandler.java:17-28``)
- DEFAULT fills nulls with a constant (``DefaultHandler.java``)
- REPLACE takes "a,b" args and replaces a -> b (``ReplaceHandler.java:12-22``)

All are thin, codegen-friendly Column expressions (no UDFs). Apply a
pipeline of them with :func:`apply_converters` — the analog of
``ConvertUtil.convert``'s name-keyed per-row dispatch, but columnar.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --- the catalog (name -> handler), mirroring ConvertEnum codes ---------

def default(col, value) -> Column:
    """DEFAULT: constant fallback when null (DefaultHandler.java)."""
    return F.coalesce(_c(col), F.lit(value))


def system_timestamp() -> Column:
    """SYSTEM_TIMESTAMP (TimestampHandler.java). Nondeterministic — keep
    out of replayable data paths (tests pin it with a literal)."""
    return F.current_timestamp()


def system_date() -> Column:
    return F.current_date()


def timestamp_to_date(col) -> Column:
    return F.to_date(_c(col))


def timestamp_to_chinese_standard_time(col) -> Column:
    return F.date_format(_c(col), "yyyy-MM-dd HH:mm:ss")


def timestamp_to_long(col) -> Column:
    return F.unix_millis(_c(col))


def long_to_timestamp(col) -> Column:
    return F.timestamp_millis(_c(col))


def string_to_timestamp(col) -> Column:
    return F.to_timestamp(_c(col), "yyyy-MM-dd HH:mm:ss")


def string_to_format_date(col, fmt: str) -> Column:
    return F.to_date(_c(col), fmt)


def number_to_string(col) -> Column:
    return _c(col).cast("string")


def bytes_to_string(col) -> Column:
    return F.decode(_c(col), "UTF-8")


def replace(col, args: str) -> Column:
    """REPLACE with the reference's "a,b" packed-args form."""
    a, b = args.split(",", 1)
    return F.replace(_c(col), F.lit(a), F.lit(b))


def prepend(col, prefix: str) -> Column:
    return F.concat(F.lit(prefix), _c(col))


def append(col, suffix: str) -> Column:
    return F.concat(_c(col), F.lit(suffix))


def uuid() -> Column:
    """UUID (UUIDHandler.java). Nondeterministic — not for data paths."""
    return F.uuid()


def rem_str_first(col) -> Column:
    """Drop first char (RemStrFirstHandler.java)."""
    return F.substring(_c(col), 2, 2**31 - 1)


def rem_str_last(col) -> Column:
    """Drop last char (RemStrLastHandler.java)."""
    c = _c(col)
    return F.left(c, F.length(c) - F.lit(1))


def sub_str_first(col, n: int) -> Column:
    """Keep first n chars (SubStrFirstHandler.java)."""
    return F.left(_c(col), F.lit(n))


def sub_str_last(col, n: int) -> Column:
    """Keep last n chars (SubStrLastHandler.java)."""
    return F.right(_c(col), F.lit(n))


def clear(col) -> Column:
    """CLEAR: null out, type-preserving (ClearHandler.java)."""
    c = _c(col)
    return F.when(F.lit(False), c)


CONVERTERS = {
    "DEFAULT": default,
    "SYSTEM_TIMESTAMP": system_timestamp,
    "SYSTEM_DATE": system_date,
    "TIMESTAMP_TO_DATE": timestamp_to_date,
    "TIMESTAMP_TO_CHINESE_STANDARD_TIME": timestamp_to_chinese_standard_time,
    "TIMESTAMP_TO_LONG": timestamp_to_long,
    "LONG_TO_TIMESTAMP": long_to_timestamp,
    "STRING_TO_TIMESTAMP": string_to_timestamp,
    "STRING_TO_FORMAT_DATE": string_to_format_date,
    "NUMBER_TO_STRING": number_to_string,
    "BYTES_TO_STRING": bytes_to_string,
    "REPLACE": replace,
    "PREPEND": prepend,
    "APPEND": append,
    "UUID": uuid,
    "REM_STR_FIRST": rem_str_first,
    "REM_STR_LAST": rem_str_last,
    "SUB_STR_FIRST": sub_str_first,
    "SUB_STR_LAST": sub_str_last,
    "CLEAR": clear,
}


def apply_converters(df: DataFrame, specs: list[tuple[str, str, tuple]]) -> DataFrame:
    """Columnar analog of ``ConvertUtil.convert``: apply (column, code,
    args) specs in order, each replacing its named column."""
    for col_name, code, args in specs:
        fn = CONVERTERS[code]
        if code in ("SYSTEM_TIMESTAMP", "SYSTEM_DATE", "UUID"):
            df = df.withColumn(col_name, fn(*args))
        else:
            df = df.withColumn(col_name, fn(col_name, *args))
    return df
