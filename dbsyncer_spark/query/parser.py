"""Query-string parser: Lucene-style boolean/field syntax over the BM25
engine — the analog of the reference's ``QueryParser`` usage
(``LuceneFactoryTest.java:380-428``) and its MUST/SHOULD query composition
(``DiskStorageService.java:294-346``).

Syntax (whitespace-separated units, quotes group):

- ``term``          SHOULD clause: scores, not required
- ``+term``         MUST clause: required AND scores (Lucene semantics)
- ``-term``         MUST_NOT clause: excludes docs containing the term
- ``field:value``   metadata equality filter (repo/path/lang/... columns);
                    ``+field:value`` is the same (filters are MUST),
                    ``-field:value`` excludes matching docs (docs where
                    the field is NULL are kept, Lucene MUST_NOT
                    semantics). A field name that is not a column of the
                    target raises ValueError naming the known columns —
                    quote colon-bearing text (URLs, times) to search it
                    as a phrase instead.
- ``"a phrase"``    exact-phrase MUST clause (filter; scored by the
                    phrase-capable paths only — documented simplification
                    vs Lucene, which also scores sloppy phrases)
- ``+"a phrase"`` / ``-"a phrase"`` required / excluded phrase
- ``term^2.5``      boost: the term's BM25 partial is multiplied by the
                    factor (Lucene QueryParser ``^`` syntax). A multi-
                    token unit spreads its boost to every token; if the
                    same term appears in several clauses the LARGEST
                    boost wins (our scorers sum each unique term once,
                    unlike Lucene's per-clause sum — documented). A boost
                    on a quoted phrase parses but is ignored, since
                    phrases gate candidates rather than score here.
- ``test*``         prefix expansion (Lucene PrefixQuery,
                    ``LuceneFactoryTest.java:338-350``); ``te?t`` /
                    ``t*st`` wildcard expansion (``*`` = any run, ``?``
                    = one char, WildcardQuery); ``roam~`` / ``roam~1``
                    fuzzy expansion (FuzzyQuery, default 2 edits, capped
                    at Lucene's max 2). Expansion units honor the same
                    +/-/^ modifiers: SHOULD/MUST expansions SCORE all
                    matched terms (BM25 over the disjunction, like the
                    engine's search_prefix), a MUST expansion also gates
                    candidates to docs containing >= 1 matched term, a
                    MUST_NOT expansion excludes them. Expansion is capped
                    at ``max_expansions`` (1024, Lucene maxClauseCount) —
                    exceeding it raises like BooleanQuery.TooManyClauses.
                    Patterns are lowercased verbatim (NOT camel-split —
                    ``getUser*`` matches terms starting with "getuser",
                    matching Lucene where multi-term queries bypass the
                    analyzer). A ``field:value*`` wildcard on a metadata
                    field is not supported (fields are equality filters).

- ``A AND B`` / ``A OR B`` / ``NOT B`` (also ``&&``/``||``) — Lucene's
                    flat boolean operators, uppercase only (lowercase
                    and/or/not stay ordinary terms): ``AND`` upgrades both
                    operands to MUST (explicit +/- win), ``OR`` leaves
                    SHOULD, ``NOT`` excludes the next unit — left-to-right
                    like the classic QueryParser, no precedence tree.
- ``(a OR b)``      token-level OR group. Bare = plain SHOULD terms;
                    ``+(a OR b)`` / ``(a OR b) AND c`` requires >= 1
                    group token (and the tokens score); ``-(a OR b)``
                    excludes docs containing any. Only OR inside parens
                    (AND/NOT there raises — nested boolean trees are
                    beyond the reference's usage). ``(a OR b)^2`` spreads
                    the boost to the group's tokens.
- ``field:[x TO y]`` inclusive range filter on a metadata column
                    (Lucene TermRangeQuery): ``*`` = open endpoint,
                    ``[* TO *]`` = field exists; ``-field:[x TO y]``
                    excludes in-range docs (NULL fields kept). Endpoints
                    are verbatim strings (binary collation on string
                    columns, cast to the column type on numeric ones).

Every unit's text runs through the engine tokenizer (camelCase split,
lowercase, CJK unigrams), so ``+getUserName`` requires all three of
get/user/name. A unit that tokenizes to nothing (punctuation, stop-only)
is dropped. Scoring set = SHOULD ∪ MUST terms; docs matching zero scored
terms never surface (conjunctive-filter, disjunctive-score — matching the
reference's boolean builder where MUST clauses gate candidates).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from dbsyncer_spark.functions.tokenizer import tokenize_py
from dbsyncer_spark.session import empty_df

# unit = optional +/- prefix, then field range / parenthesized group /
# quoted phrase (each may carry spaces) or bare run
_UNIT_RE = re.compile(
    r'([+-]?)('
    r'[A-Za-z_][A-Za-z0-9_]*:\[[^\]]*\](?:\^[0-9]*\.?[0-9]+)?'  # field:[x TO y]
    r'|\([^()]*\)(?:\^[0-9]*\.?[0-9]+)?'            # (a OR b) group
    r'|"([^"]*)"(?:\^[0-9]*\.?[0-9]+)?'             # "a phrase"
    r'|\S+)'
)
_FIELD_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):(.+)$", re.DOTALL)
_BOOST_RE = re.compile(r"^(.+)\^([0-9]*\.?[0-9]+)$", re.DOTALL)
_FUZZY_RE = re.compile(r"^([^\s~*?]+)~(\d*)$")
_RANGE_RE = re.compile(r"^\[\s*(\S+)\s+TO\s+(\S+)\s*\]$")
#: standalone boolean operator tokens (Lucene QueryParser: uppercase
#: AND/OR/NOT plus the &&/|| aliases; lowercase and/or/not stay terms)
_OPERATORS = {"AND", "&&", "OR", "||", "NOT"}

#: Lucene BooleanQuery.maxClauseCount — the default expansion cap for
#: prefix/wildcard/fuzzy units; exceeding it raises (TooManyClauses)
MAX_EXPANSIONS = 1024


@dataclass
class Expansion:
    """A multi-term query unit (``test*`` / ``te?t`` / ``roam~N``)
    resolved against the term dictionary at execution time."""
    kind: str            # 'prefix' | 'wildcard' | 'fuzzy'
    pattern: str         # lowercased prefix / wildcard pattern / term
    mod: str = ""        # '' SHOULD, '+' MUST, '-' MUST_NOT
    max_edits: int = 2   # fuzzy only (Lucene classic default, max 2)
    boost: float = 1.0


@dataclass
class ParsedQuery:
    should: list[str] = field(default_factory=list)    # scored, optional
    must: list[str] = field(default_factory=list)      # scored, required
    must_not: list[str] = field(default_factory=list)  # excluded
    phrases: list[str] = field(default_factory=list)   # required phrases
    not_phrases: list[str] = field(default_factory=list)
    fields: dict[str, str] = field(default_factory=dict)
    not_fields: dict[str, str] = field(default_factory=dict)  # -field:value
    boosts: dict[str, float] = field(default_factory=dict)  # term -> ^boost
    expansions: list = field(default_factory=list)  # prefix/wildcard/fuzzy units
    # (a OR b) groups: required groups gate (doc contains >= 1 group
    # term) AND score; excluded groups exclude. Bare groups are plain
    # SHOULD terms and never land here.
    must_groups: list[list[str]] = field(default_factory=list)
    not_groups: list[list[str]] = field(default_factory=list)
    # field:[lo TO hi] inclusive ranges (Lucene TermRangeQuery); None
    # endpoint = open ('*'); both None = field-exists (Lucene [* TO *])
    field_ranges: list[tuple] = field(default_factory=list)
    not_field_ranges: list[tuple] = field(default_factory=list)

    @property
    def scored_terms(self) -> list[str]:
        """SHOULD ∪ MUST, sorted unique — the BM25 term set."""
        return sorted(set(self.should) | set(self.must))

    def is_empty(self) -> bool:
        return not (
            self.should or self.must or self.must_not
            or self.phrases or self.not_phrases or self.fields or self.not_fields
            or self.expansions or self.must_groups or self.not_groups
            or self.field_ranges or self.not_field_ranges
        )


def _apply_operators(units: list[tuple]) -> list[tuple]:
    """Lucene-style flat boolean operators: standalone uppercase AND/OR/
    NOT (and &&/||) rewrite their operand modifiers left-to-right the way
    the classic QueryParser does — ``AND`` upgrades the PREVIOUS clause
    (if unmodified) and the next one to MUST, ``OR`` leaves the next
    clause SHOULD, ``NOT`` makes the next clause MUST_NOT. Explicit +/-
    prefixes always win. Lowercase and/or/not stay ordinary terms, and a
    quoted "AND" stays a phrase."""
    resolved: list[tuple] = []
    pending_must = pending_not = pending_or = False
    for mod, unit, quoted in units:
        if mod == "" and not quoted and unit in _OPERATORS:
            # Lucene's parser rejects consecutive operators (the only
            # legal pair is AND NOT / OR NOT) and leading AND/OR; so do
            # we — the old guard tracked only NOT/AND, so 'OR OR',
            # 'merge OR AND scan', and leading operators were silently
            # accepted with typo-dependent semantics (r5 review)
            if pending_not or (unit != "NOT" and (pending_must or pending_or)):
                raise ValueError(
                    f"consecutive boolean operators before {unit!r}"
                )
            if not resolved and unit != "NOT":
                raise ValueError(f"leading boolean operator {unit!r}")
            if unit == "NOT":
                pending_not = True
            elif unit in ("AND", "&&"):
                pending_must = True
                if resolved and resolved[-1][0] == "":
                    resolved[-1] = ("+", resolved[-1][1], resolved[-1][2])
            else:  # OR / ||
                pending_must = False
                pending_or = True
            continue
        if pending_not:
            mod = mod or "-"
        elif pending_must:
            mod = mod or "+"
        pending_must = pending_not = pending_or = False
        resolved.append((mod, unit, quoted))
    if pending_not or pending_must or pending_or:
        raise ValueError("trailing boolean operator with no operand")
    return resolved


def parse_query(q: str) -> ParsedQuery:
    """Parse a query string into clause lists (see module docstring)."""
    out = ParsedQuery()
    plain: set[str] = set()  # terms that appear unboosted in a scoring clause
    for mod, unit, quoted in _apply_operators(_UNIT_RE.findall(q or "")):
        if quoted or unit.startswith('"'):
            phrase = quoted
            if tokenize_py(phrase):
                (out.not_phrases if mod == "-" else out.phrases).append(phrase)
            continue
        fm = _FIELD_RE.match(unit)
        if fm:
            val = fm.group(2)
            # a boost on ANY filter clause parses but is ignored, like
            # the boosted-phrase rule (filters gate, they don't score) —
            # it must not leak '^2' into a range as a phantom unit, nor
            # into an equality value ('lang:en^2.5' silently filtered on
            # the literal string 'en^2.5' and matched nothing, r5 review)
            vb = _BOOST_RE.match(val)
            if vb:
                val = vb.group(1)
            if val.startswith("["):
                rm = _RANGE_RE.match(val)
                if not rm:
                    # 'lang:[go to java]' (lowercase to) would silently
                    # become an equality filter on the literal bracket
                    # string — Lucene rejects malformed ranges, so do we
                    # (r5 review; same rule as malformed fuzzy units)
                    raise ValueError(
                        f"malformed range {unit!r}: expected "
                        f"{fm.group(1)}:[<lo> TO <hi>] with uppercase TO "
                        "('*' = open endpoint)"
                    )
                # field:[lo TO hi] — Lucene TermRangeQuery, inclusive;
                # '*' = open endpoint. Values stay verbatim (multi-term
                # queries bypass the analyzer, like wildcards).
                lo = None if rm.group(1) == "*" else rm.group(1)
                hi = None if rm.group(2) == "*" else rm.group(2)
                dest = (out.not_field_ranges if mod == "-"
                        else out.field_ranges)
                dest.append((fm.group(1), lo, hi))
                continue
            # +field:value == field:value (filters are MUST);
            # -field:value excludes (r2: previously fell through and the
            # field name itself was tokenized as content terms)
            dest = out.not_fields if mod == "-" else out.fields
            dest[fm.group(1)] = val
            continue
        boost = 1.0
        bm = _BOOST_RE.match(unit)
        if bm:
            unit, boost = bm.group(1), float(bm.group(2))
        if unit.startswith("(") and unit.endswith(")"):
            # (a OR b) group: a token-level disjunction. Bare groups are
            # plain SHOULD terms (Lucene's default OR makes the parens
            # decorative); '+'/AND-required groups additionally gate
            # candidates to docs containing >= 1 group token (the
            # must_any shape expansions already use); '-' excludes. Only
            # OR is allowed inside a group — AND/NOT inside parens would
            # need general nested boolean trees, which the reference
            # never exercises (it only ever parses plain terms,
            # LuceneFactoryTest.java:415-428).
            items = unit[1:-1].split()
            if any(i in ("AND", "&&", "NOT") for i in items):
                raise ValueError(
                    f"group {unit!r}: only OR is supported inside parentheses"
                )
            terms = [t for i in items if i not in ("OR", "||")
                     for t in tokenize_py(i)]
            if not terms:
                continue  # empty/punctuation-only group is dropped
            if mod == "-":
                out.not_groups.append(terms)
                continue
            if mod == "+":
                out.must_groups.append(terms)
            out.should.extend(terms)
            if boost != 1.0:
                for t in terms:
                    out.boosts[t] = max(out.boosts.get(t, 0.0), boost)
            else:
                plain.update(terms)
            continue
        fz = _FUZZY_RE.match(unit)
        if fz and fz.group(2) != "0":  # roam~0 = exact term, falls through
            edits = min(int(fz.group(2)) if fz.group(2) else 2, 2)
            out.expansions.append(
                Expansion("fuzzy", fz.group(1).lower(), mod, edits, boost)
            )
            continue
        if fz:
            unit = fz.group(1)  # strip the ~0
            mm = None
        else:
            # a tilde in fuzzy position with a non-integer suffix
            # ('roam~1.5', 'roam~x') is a malformed fuzzy unit: Lucene's
            # QueryParser rejects it, and tokenizing through it would
            # silently score 'roam', '1', '5' as separate SHOULD terms
            # (r4 ADVICE) — raise instead of guessing
            mm = re.match(r"^([^\s~*?]+)~(.+)$", unit)
        if mm:
            raise ValueError(
                f"malformed fuzzy unit {unit!r}: expected <term>~ or "
                f"<term>~<int edits>, got suffix {mm.group(2)!r}"
            )
        if "*" in unit or "?" in unit:
            pat = unit.lower()
            if re.fullmatch(r"[^*?]+\*", pat):
                out.expansions.append(
                    Expansion("prefix", pat[:-1], mod, 2, boost)
                )
            else:
                out.expansions.append(
                    Expansion("wildcard", pat, mod, 2, boost)
                )
            continue
        terms = tokenize_py(unit)
        if not terms:
            continue
        dest = {"": out.should, "+": out.must, "-": out.must_not}[mod]
        dest.extend(terms)
        if mod != "-":
            if boost != 1.0:
                for t in terms:
                    out.boosts[t] = max(out.boosts.get(t, 0.0), boost)
            else:
                plain.update(terms)
    # largest boost wins INCLUDING the implicit 1.0 of an unboosted clause
    # (r2: 'error error^0.5' previously scored error at 0.5x)
    for t in out.boosts:
        if t in plain:
            out.boosts[t] = max(out.boosts[t], 1.0)
    return out


# ---------------------------------------------------------------------------
# DataFrame execution (exhaustive twin — shares semantics with the index
# path SearchIndex.search_parsed; both are contract-gated)
# ---------------------------------------------------------------------------

def phrase_contains_col(text_col, phrase: str):
    """Pure-Column exact-phrase membership over the tokenized text:
    TRUE iff the token sequence of ``phrase`` occurs consecutively.

    The token array is BOUND ONCE per row (``bind_once``) before the
    window probes run. Referencing the raw ``tokens_col`` expression
    inside the probes instead would re-tokenize the document for every
    ``element_at`` at every window start — O(doc_len) tokenize passes
    per doc (measured 28x on the parser twin suite)."""
    from pyspark.sql import functions as F

    from dbsyncer_spark.functions.hof import bind_once
    from dbsyncer_spark.functions.tokenizer import tokens_col

    terms = tokenize_py(phrase)
    if not terms:
        return F.lit(True)
    m = len(terms)

    def over_bound_tokens(toks):
        def window_is_match(i):
            cond = F.element_at(toks, i + 1) == terms[0]
            for j in range(1, m):
                cond = cond & (F.element_at(toks, i + 1 + j) == terms[j])
            return cond

        # clamp to 0 (sequence(0,-1) would DESCEND); docs shorter than
        # the phrase are rejected by the size guard, and out-of-range
        # element_at inside the probe window yields NULL -> no match
        starts = F.sequence(
            F.lit(0), F.greatest(F.size(toks) - F.lit(m), F.lit(0))
        )
        return (F.size(toks) >= m) & F.exists(starts, window_is_match)

    return bind_once(tokens_col(text_col), over_bound_tokens)


def check_fields(pq: ParsedQuery, columns) -> None:
    """Reject field clauses naming unknown columns with a clear error —
    otherwise F.col('<unknown>') surfaces as an AnalysisException deep in
    plan analysis (e.g. an unquoted URL parsing as ``http://...``)."""
    cols = set(columns)
    range_fields = [f for f, _, _ in (*pq.field_ranges, *pq.not_field_ranges)]
    bad = [f for f in (*pq.fields, *pq.not_fields, *range_fields)
           if f not in cols]
    if bad:
        raise ValueError(
            f"unknown field(s) {bad}; known columns: {sorted(cols)} — "
            "quote colon-bearing text to search it as a phrase"
        )


def _range_cond(f: str, lo, hi):
    """Column condition for one inclusive field range (open endpoints
    skipped; [* TO *] = field exists, Lucene semantics)."""
    from pyspark.sql import functions as F

    c = F.col(f)
    if lo is None and hi is None:
        return c.isNotNull()
    if lo is None:
        return c <= hi
    if hi is None:
        return c >= lo
    return (c >= lo) & (c <= hi)


def field_filter(pq: ParsedQuery):
    """Column predicate over METADATA columns only (field equality +
    ranges; None when the query has none) — THE one lowering of field
    clauses, shared by the DataFrame twin (``parsed_doc_filter``) and
    the index path (``SearchIndex.search_parsed``) so their semantics
    can never diverge. Negated clauses are NULL-safe: a doc whose field
    is NULL is KEPT by ``-field:v`` / ``-field:[x TO y]`` (Lucene
    MUST_NOT excludes only actual matches)."""
    from functools import reduce

    from pyspark.sql import functions as F

    conds = []
    for f, v in pq.fields.items():
        conds.append(F.col(f) == v)
    for f, v in pq.not_fields.items():
        conds.append(~F.col(f).eqNullSafe(v))
    for f, lo, hi in pq.field_ranges:
        conds.append(_range_cond(f, lo, hi))
    for f, lo, hi in pq.not_field_ranges:
        conds.append(
            ~F.coalesce(_range_cond(f, lo, hi).cast("boolean"), F.lit(False))
        )
    if not conds:
        return None
    return reduce(lambda a, b: a & b, conds)


def parsed_doc_filter(pq: ParsedQuery, text_col: str):
    """Column predicate for the non-scoring clauses (must / must_not /
    fields / phrases). Returns None when there are none."""
    from functools import reduce

    from pyspark.sql import functions as F

    from dbsyncer_spark.functions.tokenizer import tokens_col

    toks = tokens_col(text_col)
    conds = []
    for t in pq.must:
        conds.append(F.array_contains(toks, t))
    for t in pq.must_not:
        conds.append(~F.array_contains(toks, t))
    ff = field_filter(pq)  # equality + range clauses, NULL-safe negation
    if ff is not None:
        conds.append(ff)
    for p in pq.phrases:
        conds.append(phrase_contains_col(text_col, p))
    for p in pq.not_phrases:
        conds.append(~phrase_contains_col(text_col, p))
    if not conds:
        return None
    return reduce(lambda a, b: a & b, conds)


def wildcard_to_like(pattern: str) -> str:
    """Lucene wildcard -> SQL LIKE (escaping LIKE's own metachars)."""
    like = pattern.replace("%", r"\%").replace("_", r"\_")
    return like.replace("*", "%").replace("?", "_")


def expansion_predicate(exp: Expansion):
    """Column predicate over a ``term`` column matching this Expansion —
    THE one definition of which dictionary terms a prefix/wildcard/fuzzy
    unit matches, shared by the index path (``SearchIndex._expand_unit``
    over the terms table) and the DataFrame twin (``expand_wide`` over
    the corpus vocabulary) so the two can never drift."""
    from pyspark.sql import functions as F

    if exp.kind == "prefix":
        return F.col("term").startswith(exp.pattern)
    if exp.kind == "wildcard":
        return F.col("term").like(wildcard_to_like(exp.pattern))
    return F.levenshtein(F.col("term"), F.lit(exp.pattern)) <= exp.max_edits


def expansion_prefilter(exp: Expansion):
    """Cheap SUPERSET of ``expansion_predicate`` for pushdown BELOW the
    vocab distinct, where it runs per token OCCURRENCE (100-1000x the
    distinct-term count). Exact for prefix/wildcard (a LIKE is cheap);
    for fuzzy, a length band — |len(term) - len(pattern)| <= max_edits —
    instead of per-occurrence levenshtein. ``expand_wide`` re-applies
    the exact predicate on the distinct vocab, so a superset here can
    only admit extra candidates, never change results."""
    from pyspark.sql import functions as F

    if exp.kind in ("prefix", "wildcard"):
        return expansion_predicate(exp)
    n = len(exp.pattern)
    return F.length(F.col("term")).between(n - exp.max_edits, n + exp.max_edits)


def too_many_clauses(exp: Expansion, limit: int) -> ValueError:
    """The shared TooManyClauses error (Lucene maxClauseCount analog)."""
    return ValueError(
        f"{exp.kind} '{exp.pattern}' expands to more than {limit} "
        "terms (maxClauseCount) — narrow the pattern"
    )


def corpus_vocab(docs, text_col: str, candidates=None):
    """The corpus's distinct token vocabulary — the expansion target of
    the DataFrame twin (the index path uses the terms table instead).

    ``candidates``: optional Column predicate on ``term`` applied BELOW
    the distinct. A multi-unit query persists the vocab, and the persist
    boundary stops Catalyst from pushing the units' LIKE filters through
    the aggregate — so the caller passes the OR of all units' predicates
    here and the hash-agg only ever sees candidate tokens, not the whole
    token stream's vocabulary."""
    from pyspark.sql import functions as F

    from dbsyncer_spark.functions.tokenizer import tokens_col

    toks = docs.select(F.explode(tokens_col(text_col)).alias("term"))
    if candidates is not None:
        toks = toks.filter(candidates)
    return toks.distinct()


def expand_wide(docs, text_col: str, exp: Expansion,
                limit: int = MAX_EXPANSIONS, vocab=None) -> list[str]:
    """Resolve an Expansion against the corpus's own token vocabulary
    (DataFrame twin of ``SearchIndex.expand_prefix/wildcard/fuzzy``):
    distinct matching tokens, term-sorted. Exceeding ``limit`` raises —
    Lucene's BooleanQuery.TooManyClauses, not a silent truncation.
    ``vocab``: optional prebuilt (e.g. persisted) ``corpus_vocab`` so a
    multi-expansion query tokenizes the corpus once, not per unit."""
    base = vocab if vocab is not None else corpus_vocab(docs, text_col)
    rows = (base.filter(expansion_predicate(exp))
            .orderBy("term").limit(limit + 1).collect())
    if len(rows) > limit:
        raise too_many_clauses(exp, limit)
    return [r.term for r in rows]


def fold_expansions(pq: ParsedQuery, expanded: list[list[str]]):
    """Fold resolved expansion term lists into (extra scored terms,
    any-of MUST gates, any-of MUST_NOT gates) and merge expansion boosts
    into ``pq.boosts`` — shared by the wide twin and the index path so
    the two can never diverge on modifier semantics.

    Boost merge keeps the parser's invariant: the LARGEST boost wins,
    INCLUDING the implicit 1.0 of any unboosted scoring clause — plain
    term or expansion (review r4: merging with a 0.0 default re-opened
    the r2 down-boost bug for 'merge mer*^0.5', scoring the plain term
    at half weight)."""
    extra_scored: set[str] = set()
    # (a OR b) groups share the expansion gates' any-of shape: a required
    # group gates on >= 1 of its tokens, an excluded one excludes them
    # (group terms already score via pq.should — parse_query put them
    # there — so they are NOT re-added to extra_scored)
    must_any: list[list[str]] = [list(g) for g in pq.must_groups]
    not_any: list[list[str]] = [list(g) for g in pq.not_groups]
    # terms carrying an implicit 1.0: UNBOOSTED plain scoring clauses
    # (a plain term WITH a boosts entry was already floored by
    # parse_query iff it also appeared unboosted — including boosted
    # plain terms here would phantom-floor 'merge^0.5 merg*^0.7' to 1.0,
    # review r4 pass 2) + every term matched by an UNBOOSTED scoring
    # expansion
    implicit: set[str] = {
        t for t in (*pq.should, *pq.must) if t not in pq.boosts
    }
    boosted: list[tuple[list[str], float]] = []
    for exp, terms in zip(pq.expansions, expanded):
        if exp.mod == "-":
            not_any.append(terms)
            continue
        if exp.mod == "+":
            # empty expansion on a MUST clause = unsatisfiable gate
            must_any.append(terms)
        extra_scored.update(terms)
        if exp.boost != 1.0:
            boosted.append((terms, exp.boost))
        else:
            implicit.update(terms)
    for terms, bst in boosted:
        for t in terms:
            cur = pq.boosts.get(t, 1.0 if t in implicit else 0.0)
            pq.boosts[t] = max(cur, bst)
    # the implicit 1.0 also floors EXISTING entries (e.g. 'merge^0.5
    # merg*' — the unboosted expansion matches the down-boosted plain
    # term; review r4 pass 2: the floor only fired inside the boosted
    # loop, so it never applied when no boosted expansion matched)
    for t in implicit:
        if t in pq.boosts:
            pq.boosts[t] = max(pq.boosts[t], 1.0)
    return extra_scored, must_any, not_any


def parsed_topk_wide(spark, docs, query: str, k: int = 10,
                     id_col: str = "doc_id", text_col: str = "content",
                     max_expansions: int = MAX_EXPANSIONS):
    """Parse + execute over a document DataFrame: boolean/field/phrase
    clauses gate candidates, BM25 (deterministic wide sum) scores
    SHOULD ∪ MUST terms plus any prefix/wildcard/fuzzy expansions. A
    query with no scored terms returns no rows (documented: pure-filter
    queries need a match-all scorer we don't emulate — the reference
    always pairs filters with a scored clause)."""
    from functools import reduce

    from pyspark.sql import functions as F

    from dbsyncer_spark.functions.tokenizer import tokens_col
    from dbsyncer_spark.query.bm25 import bm25_topk_wide

    pq = parse_query(query)
    check_fields(pq, docs.columns)
    if len(pq.expansions) > 1:
        # tokenize the corpus ONCE for all units, not once per unit —
        # and pre-filter to the union of the units' CHEAP candidate
        # supersets so the persisted distinct is over candidates, not
        # the full vocab (expand_wide re-applies the exact predicates
        # on the distinct terms)
        any_unit = reduce(lambda a, b: a | b,
                          [expansion_prefilter(e) for e in pq.expansions])
        vocab = corpus_vocab(docs, text_col, candidates=any_unit).persist()
        try:
            expanded = [expand_wide(docs, text_col, e, max_expansions, vocab=vocab)
                        for e in pq.expansions]
        finally:
            vocab.unpersist()
    elif pq.expansions:
        # single unit: same shape as the multi-unit branch — the cheap
        # candidate prefilter goes BELOW the distinct and the persist
        # boundary keeps the exact predicate ABOVE it. Without this,
        # Catalyst pushes the exact predicate (a per-occurrence
        # levenshtein for a fuzzy unit) through the vocab aggregate,
        # paying it on every token occurrence instead of once per
        # distinct candidate (r5 review).
        e = pq.expansions[0]
        vocab = corpus_vocab(docs, text_col,
                             candidates=expansion_prefilter(e)).persist()
        try:
            expanded = [expand_wide(docs, text_col, e, max_expansions,
                                    vocab=vocab)]
        finally:
            vocab.unpersist()
    else:
        expanded = []
    extra_scored, must_any, not_any = fold_expansions(pq, expanded)
    scored = sorted(set(pq.scored_terms) | extra_scored)
    if not scored:
        return empty_df(spark, f"{id_col} long, score double")
    flt = parsed_doc_filter(pq, text_col)
    toks = tokens_col(text_col)
    gates = []
    for terms in must_any:
        gates.append(
            F.arrays_overlap(toks, F.array(*[F.lit(t) for t in terms]))
            if terms else F.lit(False)
        )
    for terms in not_any:
        if terms:
            gates.append(
                ~F.arrays_overlap(toks, F.array(*[F.lit(t) for t in terms]))
            )
    if gates:
        g = reduce(lambda a, b: a & b, gates)
        flt = g if flt is None else (flt & g)
    return bm25_topk_wide(
        spark, docs, " ".join(scored), k=k, id_col=id_col, text_col=text_col,
        doc_filter=flt, boosts=pq.boosts or None,
    )
