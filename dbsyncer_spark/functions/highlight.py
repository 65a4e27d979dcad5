"""Fulltext hit highlighting — the reference's highlighter (SURVEY.md §2.5
F12: ``SimpleHTMLFormatter`` + ``QueryScorer``, ``Shard.java:294-316``; the
SQL-backend emulation is a plain string replace,
``MySQLStorageService.java:528-537``).

Spark shape: a single ``regexp_replace`` Column over the (tiny, <= k-row)
fetched result — the reference likewise highlights only the returned page.
Matching follows the tokenizer: a term hits as a whole token (bounded by
non-alphanumerics), case-insensitive, after camelCase splitting the QUERY
(the document text is wrapped as-is so offsets stay valid — same behavior
as the SQL-backend emulation).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from dbsyncer_spark.functions.tokenizer import tokenize_py

PRE_TAG = "<span style='color:red'>"
POST_TAG = "</span>"


def highlight_col(
    text: Column | str,
    query: str,
    pre: str = PRE_TAG,
    post: str = POST_TAG,
) -> Column:
    """Wrap every token of ``query`` found in ``text`` with pre/post tags.

    Pure Column expression (one regexp_replace; case-insensitive whole-
    token matches). Empty/stop-only queries return the text unchanged.
    """
    c = F.col(text) if isinstance(text, str) else text
    terms = sorted(set(tokenize_py(query)), key=len, reverse=True)
    if not terms:
        return c
    alt = "|".join(re.escape(t) for t in terms)
    # (?i) case-insensitive; token boundaries = not adjacent to [a-z0-9]
    pattern = f"(?i)(?<![a-zA-Z0-9])({alt})(?![a-zA-Z0-9])"
    # $1 keeps the original casing of the hit
    return F.regexp_replace(c, pattern, pre + "$1" + post)
