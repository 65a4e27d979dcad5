"""Property-based fuzz gate for the query parser (hypothesis).

The parser is the engine's outermost user-facing input surface — the
reference exposes the same surface through Lucene's QueryParser
(``LuceneFactoryTest.java:415-428``), which throws only
``ParseException`` on malformed input. Our contract: ``parse_query``
either returns a well-formed ``ParsedQuery`` or raises ``ValueError``
with a readable message — never ``IndexError``/``KeyError``/regex
crashes — for ANY input string, and its outputs obey the invariants the
scorers downstream rely on (lowercased terms, sorted-unique scored set,
non-negative boosts, expansion kinds from the closed set).

Pure Python (no SparkSession) so the whole file runs in milliseconds.
"""

from __future__ import annotations

import string

from hypothesis import example, given, settings
from hypothesis import strategies as st

from dbsyncer_spark.query.parser import MAX_EXPANSIONS, parse_query

# printable-ish query alphabet, biased toward the parser's special
# characters so syntax corners are hit constantly
_SPECIAL = '+-"():^~*?[]{} \t'
_ALPHA = st.text(
    alphabet=string.ascii_letters + string.digits + "_." + _SPECIAL,
    max_size=80,
)


def _parse_or_valueerror(q: str):
    try:
        return parse_query(q)
    except ValueError:
        return None


@settings(max_examples=400, deadline=None)
@given(_ALPHA)
@example('+term lang:python "a phrase" -(x OR y) f:[a TO b] t~1 pre* w?ld')
@example("lang:[go TO")  # unterminated range
@example("a AND OR b")  # consecutive operators
@example("roam~1.5")  # malformed fuzzy
@example('"unterminated phrase')
@example("(((")
@example("^2")
@example("field:")
@example(":value")
@example("~")
def test_parse_total_over_arbitrary_input(q):
    """parse_query is total modulo ValueError: no other exception type
    escapes, and a successful parse satisfies the scorer invariants."""
    pq = _parse_or_valueerror(q)
    if pq is None:
        return
    # scored set: sorted unique, lowercase, non-empty strings
    st_terms = pq.scored_terms
    assert st_terms == sorted(set(st_terms))
    for t in st_terms + pq.must_not:
        assert t and t == t.lower()
    # boosts are non-negative finite (Lucene allows ^0) and only on
    # scored terms
    for t, b in pq.boosts.items():
        assert b >= 0 and b == b and t in set(st_terms)
    # expansions come from the closed kind set with sane params
    for e in pq.expansions:
        assert e.kind in ("prefix", "wildcard", "fuzzy")
        assert e.mod in ("", "+", "-")
        assert 0 <= e.max_edits <= 2
        assert e.pattern == e.pattern.lower()
        assert e.boost >= 0
    # groups hold only lowercase tokens; ranges are (field, lo, hi)
    for g in pq.must_groups + pq.not_groups:
        assert g and all(t == t.lower() for t in g)
    for f, lo, hi in pq.field_ranges + pq.not_field_ranges:
        assert isinstance(f, str) and f
        assert lo is None or isinstance(lo, str)
        assert hi is None or isinstance(hi, str)


@settings(max_examples=200, deadline=None)
@given(st.lists(
    st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=10),
    min_size=1, max_size=8,
))
def test_plain_term_queries_always_parse(terms):
    """A whitespace-joined list of plain lowercase words never raises and
    lands entirely in SHOULD (Lucene's default OR semantics) — unless a
    word is an operator-reserved lowercase form, which stays a term."""
    pq = parse_query(" ".join(terms))
    assert not pq.must and not pq.must_not and not pq.expansions
    # every input word survives tokenization (lowercase ascii words are
    # never dropped) and appears in the scored set
    for w in terms:
        assert any(w == t or t in w for t in pq.should)


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=10),
    st.sampled_from(["", "+", "-"]),
    st.floats(min_value=0.1, max_value=99.0, allow_nan=False),
)
def test_modifier_and_boost_routing(term, mod, boost):
    """mod^boost routing is deterministic: + -> must, - -> must_not
    (boost ignored on exclusions), bare -> should with the boost."""
    b = float(f"{boost:.2f}")  # the literal the query actually carries
    q = f"{mod}{term}^{b}"
    pq = parse_query(q)
    if mod == "-":
        assert term in pq.must_not and term not in pq.boosts
    else:
        dest = pq.must if mod == "+" else pq.should
        assert term in dest
        if b != 1.0:
            assert abs(pq.boosts[term] - b) < 1e-9


@settings(max_examples=100, deadline=None)
@given(st.lists(
    st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8),
    min_size=1, max_size=6,
))
def test_or_group_equals_flat_should(words):
    """A bare (a OR b OR ...) group scores exactly like the flat SHOULD
    query of the same words (Lucene: default-OR makes parens decorative)."""
    grouped = parse_query("(" + " OR ".join(words) + ")")
    flat = parse_query(" ".join(words))
    assert grouped.scored_terms == flat.scored_terms
    assert not grouped.must_groups and not grouped.not_groups


def test_expansion_cap_constant_matches_lucene():
    assert MAX_EXPANSIONS == 1024  # BooleanQuery.maxClauseCount default
