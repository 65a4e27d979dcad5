"""Code-aware tokenizer.

The reference's fulltext layer analyzes TextFields with Lucene's
``SimpleAnalyzer`` (letter runs, lowercased) — see reference
``dbsyncer-storage/.../lucene/Shard.java:87-88``. Our engine extends that
to source code (per the north star): identifier splitting (camelCase +
snake_case), lowercase, alphanumeric token runs, optional per-language
stopword removal.

Tokenization spec (all three implementations below are verified identical
by tests/test_tokenizer.py):

1. camelCase boundary split:  ``([a-z0-9])([A-Z])``   -> ``\\1 \\2``
2. acronym boundary split:    ``([A-Z]+)([A-Z][a-z])`` -> ``\\1 \\2``
   (``HTTPServer`` -> ``HTTP Server``)
3. lowercase
4. tokens are maximal ``[a-z0-9]+`` runs (so ``snake_case`` splits on
   ``_``, punctuation/whitespace are separators) OR single CJK chars:
   every char in U+4E00-U+9FFF is its own token (unigram emission, the
   Lucene StandardAnalyzer CJK behavior — the reference provisions a
   Chinese analyzer per shard, ``Shard.java:88`` /
   ``LuceneFactoryTest.java:469-487``; char unigrams make zh text
   searchable with exact cross-engine parity, where a segmenting
   analyzer would not be reproducible in SQL)
5. optional: drop per-language stopwords (language keywords)

Three forms:

- ``tokens_col``          : pure Column expression — JVM-side, whole-stage
                            codegen, zero Python. The hot path for
                            SQL-oracle-matched queries.
- ``tokenize_pandas_udf`` : vectorized Arrow UDF (pandas batch in/out) —
                            used by the index build (north-star
                            requirement: code-aware tokenization via
                            vectorized Arrow UDFs); carries the stopword
                            tables and is where richer analysis
                            (per-language rules) lives.
- ``tokenize_py``         : plain-Python single string — shared by the
                            pandas UDF and the pytest oracle so the
                            oracle's semantics are the engine's by
                            construction.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (pattern, replacement) camel/acronym boundary rules. Same regex dialect
# subset works in java.util.regex (Spark), RE2 (DuckDB), and Python `re`.
CAMEL_RULES: list[tuple[str, str]] = [
    (r"([a-z0-9])([A-Z])", r"\1 \2"),
    (r"([A-Z]+)([A-Z][a-z])", r"\1 \2"),
]

# CJK unified ideographs (BMP core block). The findall twin matches CJK
# chars as single-char alternates; the split-based twins (Column / Arrow
# kernel / DuckDB) first space-pad each CJK char (CJK_PAD rule) and then
# split on "not token char" — verified identical in tests.
CJK_CLASS = "一-鿿"  # U+4E00-U+9FFF
CJK_PAD: tuple[str, str] = (f"([{CJK_CLASS}])", r" \1 ")
_TOKEN_RE = re.compile(rf"[a-z0-9]+|[{CJK_CLASS}]")
_CAMEL_COMPILED = [(re.compile(p), r) for p, r in CAMEL_RULES]

# Per-language keyword stopwords (small, deterministic; covers the langs of
# the synthetic corpus — FIXTURES.md T1).
STOPWORDS: dict[str, list[str]] = {
    "python": ["def", "import", "return", "if", "else", "for", "in", "self",
               "class", "from", "pass", "none", "true", "false", "and", "or",
               "not", "with", "as", "try", "except", "raise", "lambda"],
    "java": ["public", "private", "protected", "static", "void", "final",
             "class", "import", "return", "if", "else", "for", "new", "this",
             "null", "true", "false", "int", "long", "string", "boolean"],
    "go": ["func", "package", "import", "return", "if", "else", "for",
           "range", "var", "const", "type", "struct", "interface", "nil",
           "true", "false", "go", "defer", "chan", "map", "string", "int"],
    "js": ["function", "var", "let", "const", "return", "if", "else", "for",
           "new", "this", "null", "undefined", "true", "false", "typeof",
           "import", "export", "default", "async", "await"],
    "c": ["int", "char", "void", "long", "short", "unsigned", "signed",
          "return", "if", "else", "for", "while", "struct", "typedef",
          "static", "const", "include", "define", "null", "sizeof"],
}


def tokenize_py(text: str | None, stopwords: frozenset[str] | None = None) -> list[str]:
    """Reference tokenizer on one string (shared by UDF + oracle)."""
    if text is None:
        return []
    for pat, repl in _CAMEL_COMPILED:
        text = pat.sub(repl, text)
    toks = _TOKEN_RE.findall(text.lower())
    if stopwords:
        toks = [t for t in toks if t not in stopwords]
    return toks


def _padded_lower(col: Column | str) -> Column:
    """The shared camel/acronym/CJK padding passes + lowercase — THE one
    Column-side definition of the pre-split normalization, used by both
    ``tokens_col`` and ``token_count_col`` so the regexp_count scalar
    can never drift from the token-array size (BM25 doc-length parity
    rests on it)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in CAMEL_RULES:
        # java.util.regex replacement uses $1/$2
        c = F.regexp_replace(c, pat, repl.replace("\\1", "$1").replace("\\2", "$2"))
    return F.lower(F.regexp_replace(c, CJK_PAD[0], " $1 "))


def tokens_col(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Tokenizer as a pure Column expression (JVM-side, codegen'd).

    Returns ``array<string>`` of tokens in document order (duplicates
    preserved — term frequency is derived downstream by groupBy).
    """
    arr = F.split(_padded_lower(col), rf"[^a-z0-9{CJK_CLASS}]+")
    arr = F.filter(arr, lambda t: t != F.lit(""))
    if stopwords:
        sw = stopwords
        arr = F.filter(arr, lambda t: ~t.isin(*sw))
    return arr


def token_count_col(col: Column | str) -> Column:
    """``size(tokens_col(col))`` WITHOUT materializing the token array:
    one ``regexp_count`` of maximal token runs over the camel/CJK-padded
    lowered string. Exactly equal to the array size by construction
    (same padding passes, and a maximal ``[a-z0-9]+`` run or single CJK
    char is one token in both) — gated by tests/test_tokenizer.py. Used
    by BM25 doc-length stats, where the count is needed but the tokens
    are not (the array build is ~4x the cost of the count at sf0.1).
    No stopword variant: doc length in BM25 counts all tokens
    (``bm25_scored_terms`` tokenizes without stopwords)."""
    return F.regexp_count(
        _padded_lower(col), F.lit(rf"[a-z0-9]+|[{CJK_CLASS}]")
    )


def tokenize_arrow(texts):
    """Arrow-kernel twin of ``tokens_col``/``tokenize_py`` over a pandas
    Series (or any ``pa.array``-able sequence) of strings: camel/acronym
    rules + CJK pad (RE2 rewrite syntax — \\1/\\2 backrefs, same as the
    Python twin) -> lower -> split. Returns the pyarrow list array of
    raw split tokens; EMPTY-string tokens survive the split exactly as
    before, callers filter them.

    THE one definition for the three batch kernels (index-build
    termdocs, dedup shingles, textstats fingerprints): their documented
    parity gates vs the Column/SQL twins rest on identical rule lists,
    and three hand-synced copies meant a tokenizer rule change applied
    to one silently broke the others (r5 review)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(texts, type=pa.string())
    for pat, repl in CAMEL_RULES + [CJK_PAD]:
        arr = pc.replace_substring_regex(arr, pattern=pat, replacement=repl)
    arr = pc.utf8_lower(arr)
    return pc.split_pattern_regex(arr, pattern=f"[^a-z0-9{CJK_CLASS}]+")


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_pandas_udf(text: pd.Series, lang: pd.Series) -> pd.Series:
    """Vectorized Arrow tokenizer with per-language stopwording.

    Batch-level vectorization: the camel/acronym regex passes run via
    pandas ``str.replace`` over the whole Arrow batch; token extraction is
    one ``str.findall``. ``lang`` selects the stopword table per row
    (NULL/unknown lang -> no stopwords).
    """
    s = text.fillna("")
    for pat, repl in CAMEL_RULES:
        s = s.str.replace(pat, repl, regex=True)
    toks = s.str.lower().str.findall(_TOKEN_RE)

    def drop_stop(pair):
        tk, lg = pair
        sw = _STOP_SETS.get(lg)
        if sw:
            return [t for t in tk if t not in sw]
        return tk

    return pd.Series(map(drop_stop, zip(toks, lang)), index=text.index)


_STOP_SETS = {k: frozenset(v) for k, v in STOPWORDS.items()}


def tokenize_sql_expr(col_sql: str) -> str:
    """The same tokenizer as a DuckDB SQL expression (for oracle parity).

    Produces a DuckDB expression yielding a VARCHAR[] of tokens.
    """
    e = col_sql
    for pat, repl in CAMEL_RULES + [CJK_PAD]:
        e = f"regexp_replace({e}, '{pat}', '{repl}', 'g')"
    return (
        f"list_filter(string_split_regex(lower({e}), '[^a-z0-9{CJK_CLASS}]+'), t -> t <> '')"
    )
