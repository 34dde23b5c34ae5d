"""Query AST + parser + logical rewrites — the engine's tiny planner.

Mirrors the capability of Lucene's Query tree + BooleanQuery rewrite
(public knowledge: lucene/core/.../search/BooleanQuery.java#rewrite,
queryparser/classic/QueryParser.jj), restricted to the v1 algebra:

  Term(t)               — TermQuery
  And(clauses)          — BooleanQuery MUST (docID intersection, scores sum)
  Or(clauses, msm)      — BooleanQuery SHOULD (union, scores sum,
                          minimumShouldMatch)
  Not(positive, negative) — MUST + MUST_NOT (anti-join, no score from neg)

Parser syntax (subset of the classic Lucene syntax):
  ``a b c``        -> Or of terms (default OR, like Solr q.op=OR)
  ``+a +b``        -> And
  ``a -b``         -> Not(a, b)
  ``a AND b``, ``a OR b``, ``a NOT b`` -> as expected

Rewrites implemented (SURVEY.md §4.1): flatten nested same-kind boolean
nodes, deduplicate clauses, unwrap single-clause booleans, drop
stop-filtered (empty) terms.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from sparklucene.analysis import ENGLISH_STOP_WORDS, tokenize_text

#: internal separator for field-qualified term keys ("field\x1fterm" —
#: Lucene's Term IS a (field, text) pair; the default field's terms are
#: stored bare so single-field indexes keep their v1 layout). \x1f (unit
#: separator) cannot appear in standard-analyzer output and is asserted
#: absent from keyword-field values at index time.
FIELD_SEP = "\x1f"
DEFAULT_FIELD = "content"


def field_key(field: str | None, term: str) -> str:
    """Internal posting/dictionary key for a (field, term) pair."""
    if field is None or field == DEFAULT_FIELD:
        return term
    return f"{field}{FIELD_SEP}{term}"


def field_of_key(key: str) -> str:
    """Field name encoded in an internal term key."""
    f, sep, _ = key.partition(FIELD_SEP)
    return f if sep else DEFAULT_FIELD


class Query:
    def terms(self) -> list[str]:
        """All positive scoring terms, sorted + deduped."""
        raise NotImplementedError

    def neg_terms(self) -> list[str]:
        return []


@dataclass(frozen=True)
class Term(Query):
    """TermQuery — ``field`` selects a non-default indexed field
    (qualified into the internal key by :func:`qualify` at search time)."""

    term: str
    boost: float = 1.0
    field: str | None = None

    def terms(self) -> list[str]:
        return [self.term]


@dataclass(frozen=True)
class And(Query):
    clauses: tuple[Query, ...]

    def terms(self) -> list[str]:
        out: set[str] = set()
        for c in self.clauses:
            out.update(c.terms())
        return sorted(out)

    def neg_terms(self) -> list[str]:
        out: set[str] = set()
        for c in self.clauses:
            out.update(c.neg_terms())
        return sorted(out)


@dataclass(frozen=True)
class Or(Query):
    clauses: tuple[Query, ...]
    min_should_match: int = 1

    def terms(self) -> list[str]:
        out: set[str] = set()
        for c in self.clauses:
            out.update(c.terms())
        return sorted(out)

    def neg_terms(self) -> list[str]:
        out: set[str] = set()
        for c in self.clauses:
            out.update(c.neg_terms())
        return sorted(out)


@dataclass(frozen=True)
class Not(Query):
    positive: Query
    negative: Query

    def terms(self) -> list[str]:
        return self.positive.terms()

    def neg_terms(self) -> list[str]:
        return sorted(set(self.negative.terms()) | set(self.positive.neg_terms()))


@dataclass(frozen=True)
class DisMax(Query):
    """DisjunctionMaxQuery: per-doc score = max of clause scores +
    tiebreak * (sum of the other clause scores) — public Lucene
    DisjunctionMaxScorer behavior."""

    clauses: tuple[Query, ...]
    tiebreak: float = 0.0

    def terms(self) -> list[str]:
        out: set[str] = set()
        for c in self.clauses:
            out.update(c.terms())
        return sorted(out)

    def neg_terms(self) -> list[str]:
        out: set[str] = set()
        for c in self.clauses:
            out.update(c.neg_terms())
        return sorted(out)


@dataclass(frozen=True)
class Synonym(Query):
    """SynonymQuery (u8:lucene/core/.../search/SynonymQuery.java ~300
    LoC): score all ``members`` as ONE pseudo-term — per-doc frequency
    is the SUM of member term frequencies and the document frequency is
    the MAX member df (SynonymWeight's blended TermStatistics), so a doc
    saying "car car automobile" saturates tf exactly like "car car car".
    This is what query-time SynonymGraphFilter emits for single-token
    synonyms; multi-token alternatives become an OR with a Phrase (see
    :func:`apply_synonyms`)."""

    members: tuple[str, ...]
    boost: float = 1.0
    field: str | None = None
    #: explicit blended docFreq (BlendedTermQuery: the TOP_TERMS_BLENDED
    #: rewrite computes max df over the whole expansion set and applies
    #: it to every member clause); None = max over own members
    blend_df: int | None = None

    def terms(self) -> list[str]:
        return sorted(set(self.members))

    def neg_terms(self) -> list[str]:
        return []


@dataclass(frozen=True)
class Phrase(Query):
    """Exact PhraseQuery: slots of (position offset, term).

    Offsets carry Lucene's StopFilter position-increment gaps: analyzing
    "fast the key" yields slots ((0, 'fast'), (2, 'key')) — a doc matches
    when some base position has term_i at base+offset_i for every slot.
    Scored with tf = phrase frequency and idf = sum of slot-term idfs
    (PhraseWeight/BM25Similarity public behavior).
    """

    slots: tuple[tuple[int, str], ...]
    #: 0 = exact adjacency. slop > 0 enables proximity matching with this
    #: engine's pinned spec (documented in scorer._sloppy_scores): for
    #: each slot-0 anchor, every other slot contributes its nearest
    #: position's displacement; total displacement D <= slop matches with
    #: weight 2^-D (dyadic, so cross-engine sums are exact; Lucene uses
    #: 1/(1+d), whose sums are rounding-order-dependent).
    slop: int = 0
    #: non-default indexed field (requires store_positions on that field)
    field: str | None = None
    #: BoostQuery-around-PhraseQuery semantics (u8:lucene/core/.../search/
    #: BoostQuery.java): phrase weight = boost * summed slot idf — one f64
    #: multiply folded into the weight before the tf/norm factor, the same
    #: fold Term.boost uses (bm25.score_f64's ``boost * idf``).
    boost: float = 1.0

    def terms(self) -> list[str]:
        return sorted({t for _, t in self.slots})


@dataclass(frozen=True)
class Within(Query):
    """Minimal interval query — the engine's slice of Lucene's intervals
    surface (``u8:lucene/queries/.../intervals/``: ``Intervals.ordered`` /
    ``Intervals.unordered`` wrapped in ``Intervals.maxwidth``): docs where
    all ``members`` co-occur inside a token window of at most ``window``
    positions.

    Pinned matching spec (documented here because it is the oracle
    contract, like the sloppy-phrase spec):

      * every position p0 of ``members[0]`` is an ANCHOR;
      * ordered: greedily chase p1 = min position of members[1] > p0,
        p2 = min position of members[2] > p1, ... — the anchor matches
        when the chase completes and last - p0 + 1 <= window;
      * unordered: each other member contributes its position nearest to
        p0 (ties -> the smaller position); the anchor matches when
        max - min + 1 <= window over the chosen positions;
      * freq = number of matching anchors, scored with the summed-idf
        phrase weight (same float path as Phrase).
    """

    members: tuple[str, ...]
    window: int
    ordered: bool = False
    #: non-default indexed field (requires store_positions on that field)
    field: str | None = None

    def terms(self) -> list[str]:
        return sorted(set(self.members))


@dataclass(frozen=True)
class SpanFirst(Query):
    """Minimal SpanFirstQuery slice — Lucene's
    ``u8:lucene/core/.../search/spans/SpanFirstQuery.java`` wrapping a
    SpanTermQuery (the dominant public use: "term appears near the start
    of the document", e.g. title-ish matching over a single body field).

    Pinned matching spec: a doc matches when ``match`` occurs at a token
    position ``< end`` (positions index the pre-stop stream, like
    Phrase); freq = the number of qualifying positions, scored with the
    single-term summed-idf phrase weight (same float path as Phrase).
    """

    match: str
    end: int
    #: non-default indexed field (requires store_positions on that field)
    field: str | None = None

    def terms(self) -> list[str]:
        return [self.match]


@dataclass(frozen=True)
class Span(Query):
    """Composable span-algebra query — Lucene's nested span family
    (``u8:lucene/core/.../search/spans/``): a tree of
    ``spans.SpanTerm`` / ``SpanNearNode`` / ``SpanOrNode`` /
    ``SpanNotNode`` evaluated to per-doc span sets. The pinned matching
    spec lives in :mod:`sparklucene.spans` (the oracle contract); freq =
    number of root spans, scored with the summed-idf phrase weight over
    the include-side leaf terms (pre-order dedup — SpanWeight builds its
    similarity from positive terms only; SpanNot's exclude side matches
    but never weighs)."""

    root: object  # spans.SpanNode
    #: non-default indexed field (requires store_positions on that field)
    field: str | None = None

    def terms(self) -> list[str]:
        # ALL leaf terms (exclude side included): the scorer needs every
        # leaf's postings to evaluate the tree
        from sparklucene.spans import leaf_terms
        return sorted(leaf_terms(self.root))

    def weight_terms(self) -> list[str]:
        """Include-side leaves, pre-order, first-occurrence dedup — the
        pinned idf summation order."""
        from sparklucene.spans import leaf_terms
        return leaf_terms(self.root, include_only=True)


@dataclass(frozen=True)
class PayloadCheck(Query):
    """SpanPayloadCheckQuery over a span term — Lucene's
    ``u8:lucene/queries/.../payloads/SpanPayloadCheckQuery.java``
    wrapping a SpanTermQuery: an occurrence MATCHES only when its
    stored payload byte equals ``payload`` (the reference checks a
    payload list against the span's collected payloads; the single-term
    wrap checks exactly one byte).

    Pinned scoring spec: freq = matching-occurrence count; scored with
    the single-term summed-idf phrase weight (the wrapped span's
    scoring — same float path as SpanFirst). Ties break by doc_id."""

    term: str
    payload: int
    #: non-default indexed field (payloads are per-field streams)
    field: str | None = None

    def __post_init__(self):
        if not (0 <= int(self.payload) <= 255):
            raise ValueError("payload byte must be in [0, 255]")

    def terms(self) -> list[str]:
        return [self.term]


#: PayloadScore aggregation functions (Lucene's Max/Min/Average/Sum
#: PayloadFunction classes — ``u8:lucene/queries/.../payloads/``)
PAYLOAD_FNS = ("max", "min", "avg", "sum")


@dataclass(frozen=True)
class PayloadScore(Query):
    """PayloadScoreQuery over a span term — Lucene's
    ``u8:lucene/queries/.../payloads/PayloadScoreQuery.java`` wrapping a
    SpanTermQuery (the dominant public use: per-occurrence boost bytes
    written at index time, e.g. term importance / part-of-speech weights).

    Pinned scoring spec (the oracle contract): the index stores one
    payload byte per stored position (``build_index(payloads=...)``);
    for each doc containing ``term``, ``factor = fn`` (max | min | avg |
    sum) over that doc's payload bytes for the term; score = factor *
    BM25(term, doc) when ``include_span_score`` (Lucene's default mode),
    else the raw factor (constant-score payload ranking). Ties break by
    doc_id ascending, like every other query."""

    term: str
    fn: str = "max"
    include_span_score: bool = True
    #: non-default indexed field (payloads are per-field streams)
    field: str | None = None

    def __post_init__(self):
        if self.fn not in PAYLOAD_FNS:
            raise ValueError(f"payload fn must be one of {PAYLOAD_FNS}, "
                             f"got {self.fn!r}")

    def terms(self) -> list[str]:
        return [self.term]


@dataclass
class MatchNoDocs(Query):
    _ignored: int = field(default=0)

    def terms(self) -> list[str]:
        return []


@dataclass(frozen=True)
class MatchAllDocs(Query):
    """MatchAllDocsQuery: every live doc matches with score = boost
    (public Lucene behavior). Supported standalone, as the positive side
    of Not/Filtered, and inside And (where it contributes its constant
    boost); inside Or it would require doc-universe iteration per range
    and is rejected at rewrite."""

    boost: float = 1.0

    def terms(self) -> list[str]:
        return []


@dataclass(frozen=True)
class Filtered(Query):
    """BooleanQuery FILTER occur (Solr ``fq=``): docs must match
    ``filter``, but only ``positive`` contributes score — Lucene's
    non-scoring filter context / FilterScorer."""

    positive: Query
    filter: Query

    def terms(self) -> list[str]:
        return sorted(set(self.positive.terms()) | set(self.filter.terms()))

    def neg_terms(self) -> list[str]:
        return sorted(set(self.positive.neg_terms())
                      | set(self.filter.neg_terms()))


@dataclass(frozen=True)
class ConstantScore(Query):
    """ConstantScoreQuery: docs matching ``child`` score exactly
    ``boost`` (the scoring shape MultiTermQuery rewrites into)."""

    child: Query
    boost: float = 1.0

    def terms(self) -> list[str]:
        return self.child.terms()

    def neg_terms(self) -> list[str]:
        return self.child.neg_terms()


class MultiTermQuery(Query):
    """Base for term-dictionary-expanded queries (PrefixQuery,
    WildcardQuery, RegexpQuery, FuzzyQuery, TermRangeQuery,
    TermInSetQuery). ``search()`` expands each node against the termstats
    dictionary (NOT the postings table) and rewrites it into
    ``ConstantScore(Or(expanded terms))`` — Lucene's
    CONSTANT_SCORE_REWRITE — so these compose inside any boolean.
    ``terms()`` is empty until expansion."""

    def terms(self) -> list[str]:
        return []


@dataclass(frozen=True)
class Prefix(MultiTermQuery):
    prefix: str
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class Wildcard(MultiTermQuery):
    """``*`` = any run, ``?`` = one char (Lucene WildcardQuery)."""

    pattern: str
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class Regexp(MultiTermQuery):
    """Full-term-anchored regexp (Lucene RegexpQuery semantics)."""

    pattern: str
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class Fuzzy(MultiTermQuery):
    """FuzzyQuery. ``transpositions=True`` (Lucene's default) counts an
    adjacent-character swap as ONE edit; the engine pins the published
    unrestricted Damerau-Levenshtein distance (Damerau 1964 /
    Wagner-Fischer extension) for that mode — Lucene's transposition
    automaton agrees on real vocabularies; split-transposition corner
    pairs (a later edit landing between two swapped characters) cannot
    be verified against the reference offline and are documented as the
    pinned variant choice."""

    term: str
    max_edits: int = 1
    boost: float = 1.0
    field: str | None = None
    transpositions: bool = False
    #: FuzzyQuery prefixLength: the first N characters must match
    #: EXACTLY and never count as edits — distance applies to the
    #: suffixes only (Lucene computes the automaton over the suffix).
    #: Also the dictionary-scan prune: candidates prefix-seek.
    prefix_length: int = 0


@dataclass(frozen=True)
class TermRange(MultiTermQuery):
    lo: str | None = None
    hi: str | None = None
    include_lo: bool = True
    include_hi: bool = True
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class TermInSet(MultiTermQuery):
    in_terms: tuple[str, ...] = ()
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class TopTerms(Query):
    """TOP_TERMS scoring rewrite for a multi-term query — Lucene's
    ``MultiTermQuery.TopTermsScoringBooleanQueryRewrite(n)``
    (``u8:lucene/core/.../search/MultiTermQuery.java``): instead of
    CONSTANT_SCORE, expand to the best ``n`` matching terms and keep
    per-term BM25 scores, so fuzzy/wildcard users get real ranking.

    Pinned selection spec (this engine's deterministic order — Lucene's
    queue compares boost then raw term bytes; we pin a fully documented
    tiebreak): candidate boost = ``1 - edit_distance /
    min(len(query_term), len(candidate))`` for Fuzzy (FuzzyTermsEnum's
    published formula), 1.0 for every other MultiTermQuery; keep the top
    ``n`` by (boost desc, df desc, term asc); rewrite to
    ``Or(Term(t, boost * self_boost) ...)`` in term-ascending clause
    order (the scorer's deterministic f64 summation order)."""

    query: MultiTermQuery
    n: int = 10
    boost: float = 1.0
    #: TOP_TERMS_BLENDED_FREQ_SCORING rewrite (Lucene's DEFAULT for
    #: FuzzyQuery — u8:lucene/core/.../search/
    #: BlendedTermQuery.java + FuzzyQuery.defaultRewrite): same top-n
    #: selection, but every kept term scores with the BLENDED docFreq
    #: (max df over the kept set) and the clauses combine via
    #: DisjunctionMax with tiebreak 0.01
    #: (BlendedTermQuery.DisjunctionMaxRewrite's published constant)
    blended: bool = False

    def terms(self) -> list[str]:
        return []  # empty until expansion, like MultiTermQuery


@dataclass(frozen=True)
class MultiPhrase(Query):
    """MultiPhraseQuery: each slot holds ALTERNATIVE terms at one
    position offset — a doc matches when some base position carries any
    alternative of slot i at base+offset_i for every slot. Scored like
    Phrase with idf summed over every alternative of every slot
    (MultiPhraseWeight collects all TermStatistics — public Lucene
    behavior). Exact matching only (slop unsupported)."""

    slots: tuple[tuple[int, tuple[str, ...]], ...]
    field: str | None = None

    def terms(self) -> list[str]:
        return sorted({t for _, alts in self.slots for t in alts})


def qualify(q: Query) -> Query:
    """Resolve user-facing ``field`` attributes into internal term keys
    (``field\\x1fterm``); the default field stays bare. Applied once by
    ``search()`` before stats gathering — the scorer only ever sees keys."""
    if isinstance(q, Term):
        if q.field is None:
            return q
        return Term(field_key(q.field, q.term), q.boost)
    if isinstance(q, Phrase):
        if q.field is None:
            return q
        return Phrase(tuple((off, field_key(q.field, t))
                            for off, t in q.slots), q.slop, boost=q.boost)
    if isinstance(q, MultiPhrase):
        if q.field is None:
            return q
        return MultiPhrase(tuple(
            (off, tuple(field_key(q.field, t) for t in alts))
            for off, alts in q.slots))
    if isinstance(q, Synonym):
        if q.field is None:
            return q
        return Synonym(tuple(field_key(q.field, t) for t in q.members),
                       q.boost, blend_df=q.blend_df)
    if isinstance(q, Within):
        if q.field is None:
            return q
        return Within(tuple(field_key(q.field, t) for t in q.members),
                      q.window, q.ordered)
    if isinstance(q, SpanFirst):
        if q.field is None:
            return q
        return SpanFirst(field_key(q.field, q.match), q.end)
    if isinstance(q, Span):
        if q.field is None:
            return q
        from sparklucene.spans import map_terms
        return Span(map_terms(q.root, lambda t: field_key(q.field, t)))
    if isinstance(q, PayloadScore):
        if q.field is None:
            return q
        return PayloadScore(field_key(q.field, q.term), q.fn,
                            q.include_span_score)
    if isinstance(q, PayloadCheck):
        if q.field is None:
            return q
        return PayloadCheck(field_key(q.field, q.term), q.payload)
    if isinstance(q, (And, Or)):
        clauses = tuple(qualify(c) for c in q.clauses)
        return (And(clauses) if isinstance(q, And)
                else Or(clauses, q.min_should_match))
    if isinstance(q, DisMax):
        return DisMax(tuple(qualify(c) for c in q.clauses), q.tiebreak)
    if isinstance(q, Not):
        return Not(qualify(q.positive), qualify(q.negative))
    if isinstance(q, Filtered):
        return Filtered(qualify(q.positive), qualify(q.filter))
    if isinstance(q, ConstantScore):
        return ConstantScore(qualify(q.child), q.boost)
    return q


def rewrite(q: Query) -> Query:
    """BooleanQuery.rewrite-style simplification (public Lucene behavior)."""
    if isinstance(q, (Term, MatchNoDocs, MatchAllDocs, MultiTermQuery)):
        return q
    if isinstance(q, ConstantScore):
        child = rewrite(q.child)
        if isinstance(child, MatchNoDocs):
            return MatchNoDocs()
        if isinstance(child, MatchAllDocs):
            return MatchAllDocs(q.boost)
        if isinstance(child, ConstantScore):  # outer boost wins (Lucene)
            child = child.child
        return ConstantScore(child, q.boost)
    if isinstance(q, Filtered):
        pos = rewrite(q.positive)
        flt = rewrite(q.filter)
        if isinstance(pos, MatchNoDocs) or isinstance(flt, MatchNoDocs):
            return MatchNoDocs()
        if isinstance(flt, MatchAllDocs):
            return pos
        if isinstance(pos, MatchAllDocs):
            # every filter doc matches with the constant MatchAll score
            return ConstantScore(flt, pos.boost)
        return Filtered(pos, flt)
    if isinstance(q, MultiPhrase):
        if not q.slots or any(not alts for _, alts in q.slots):
            return MatchNoDocs()
        if all(len(alts) == 1 for _, alts in q.slots):
            return rewrite(Phrase(tuple((off, alts[0])
                                        for off, alts in q.slots),
                                  field=q.field))
        return MultiPhrase(tuple((off, tuple(sorted(set(alts))))
                                 for off, alts in q.slots), q.field)
    if isinstance(q, Phrase):
        if not q.slots:
            return MatchNoDocs()
        if len(q.slots) == 1:  # single-term phrase == TermQuery (Lucene rewrite)
            return Term(q.slots[0][1], q.boost, field=q.field)
        return q
    if isinstance(q, Synonym):
        members = tuple(sorted(set(q.members)))
        if not members:
            return MatchNoDocs()
        if len(members) == 1 and q.blend_df is None:
            # degenerate synonym == TermQuery (same blended stats by
            # construction) — re-enables block-max; an explicit blend_df
            # must survive (BlendedTermQuery single-term clause)
            return Term(members[0], q.boost, field=q.field)
        return Synonym(members, q.boost, q.field, q.blend_df)
    if isinstance(q, Within):
        if not q.members or q.window <= 0:
            return MatchNoDocs()
        if len(q.members) == 1:  # degenerate interval == TermQuery
            return Term(q.members[0], field=q.field)
        return q
    if isinstance(q, SpanFirst):
        return MatchNoDocs() if q.end <= 0 else q
    if isinstance(q, PayloadScore):
        return q
    if isinstance(q, PayloadCheck):
        return q
    if isinstance(q, Span):
        from sparklucene.spans import SpanTerm, simplify
        root = simplify(q.root)
        if root is None:
            return MatchNoDocs()
        if isinstance(root, SpanTerm):  # degenerate tree == TermQuery
            return Term(root.term, field=q.field)
        return Span(root, q.field)
    if isinstance(q, DisMax):
        flat = [rewrite(c) for c in q.clauses]
        flat = [c for c in flat if not isinstance(c, MatchNoDocs)]
        if any(isinstance(c, MatchAllDocs) for c in flat):
            raise ValueError(
                "MatchAllDocs inside DisMax requires doc-universe "
                "iteration per range — use it standalone, under Not, "
                "or as an And/Filtered clause")
        if not flat:
            return MatchNoDocs()
        if len(flat) == 1:
            return flat[0]
        return DisMax(tuple(flat), q.tiebreak)
    if isinstance(q, Not):
        pos = rewrite(q.positive)
        neg = rewrite(q.negative)
        if isinstance(pos, MatchNoDocs) or isinstance(neg, MatchAllDocs):
            # excluding every doc (MUST_NOT MatchAll) is semantically empty
            return MatchNoDocs()
        if isinstance(neg, MatchNoDocs):
            return pos
        return Not(pos, neg)
    if isinstance(q, (And, Or)):
        kind = type(q)
        flat: list[Query] = []
        seen: set = set()
        for c in q.clauses:
            c = rewrite(c)
            sub = c.clauses if isinstance(c, kind) and not (
                isinstance(c, Or) and c.min_should_match > 1) else (c,)
            for s in sub:
                key = repr(s)
                if key not in seen:
                    seen.add(key)
                    flat.append(s)
        if isinstance(q, And):
            if any(isinstance(c, MatchNoDocs) for c in flat):
                return MatchNoDocs()
            if all(isinstance(c, MatchAllDocs) for c in flat):
                return MatchAllDocs(sum(c.boost for c in flat))
        else:
            flat = [c for c in flat if not isinstance(c, MatchNoDocs)]
            if any(isinstance(c, MatchAllDocs) for c in flat):
                raise ValueError(
                    "MatchAllDocs inside OR requires doc-universe "
                    "iteration per range — use it standalone, under Not, "
                    "or as an And/Filtered clause")
        if not flat:
            return MatchNoDocs()
        if len(flat) == 1 and (not isinstance(q, Or) or q.min_should_match <= 1):
            return flat[0]
        if isinstance(q, Or):
            return Or(tuple(flat), q.min_should_match)
        return And(tuple(flat))
    return q


def prune_missing(q: Query, present: set[str]) -> Query:
    """Replace terms absent from the index with MatchNoDocs, then rewrite.

    Mirrors Lucene's behavior where a TermQuery on an unindexed term yields
    an empty scorer: an AND containing it matches nothing, an OR simply
    drops it, a MUST_NOT on it is a no-op (BooleanWeight null-scorer
    handling — public Lucene behavior).
    """
    if isinstance(q, Term):
        return q if q.term in present else MatchNoDocs()
    if isinstance(q, Phrase):
        return q if all(t in present for _, t in q.slots) else MatchNoDocs()
    if isinstance(q, Synonym):
        # missing members simply contribute nothing (a SynonymQuery over
        # one absent spelling still matches the others)
        return rewrite(Synonym(tuple(t for t in q.members
                                     if t in present), q.boost, q.field,
                               q.blend_df))
    if isinstance(q, Within):
        # every member is required (conjunctive), like a phrase
        return q if all(t in present for t in q.members) else MatchNoDocs()
    if isinstance(q, SpanFirst):
        return q if q.match in present else MatchNoDocs()
    if isinstance(q, PayloadScore):
        return q if q.term in present else MatchNoDocs()
    if isinstance(q, PayloadCheck):
        return q if q.term in present else MatchNoDocs()
    if isinstance(q, Span):
        from sparklucene.spans import prune as span_prune
        root = span_prune(q.root, present)
        return MatchNoDocs() if root is None else rewrite(Span(root, q.field))
    if isinstance(q, MultiPhrase):
        slots = tuple((off, tuple(t for t in alts if t in present))
                      for off, alts in q.slots)
        # a slot with no surviving alternative kills the phrase (rewrite)
        return rewrite(MultiPhrase(slots))
    if isinstance(q, ConstantScore):
        return rewrite(ConstantScore(prune_missing(q.child, present),
                                     q.boost))
    if isinstance(q, Filtered):
        return rewrite(Filtered(prune_missing(q.positive, present),
                                prune_missing(q.filter, present)))
    if isinstance(q, Not):
        return rewrite(Not(prune_missing(q.positive, present),
                           prune_missing(q.negative, present)))
    if isinstance(q, DisMax):
        return rewrite(DisMax(tuple(prune_missing(c, present)
                                    for c in q.clauses), q.tiebreak))
    if isinstance(q, (And, Or)):
        clauses = tuple(prune_missing(c, present) for c in q.clauses)
        node = And(clauses) if isinstance(q, And) else Or(clauses, q.min_should_match)
        return rewrite(node)
    return q


def analyze_phrase(text: str, stopwords=ENGLISH_STOP_WORDS) -> Query:
    """Analyze quoted text into a Phrase with stopword position gaps
    (QueryParser-through-analyzer behavior)."""
    import re as _re

    toks = _re.findall(r"[a-z0-9_]+", text.lower())
    slots = tuple((i, t) for i, t in enumerate(toks) if t not in stopwords)
    return rewrite(Phrase(slots))


_PART_RE = None
_QUOTED_RE = None
_RANGE_RE = None
_FUZZY_RE = None
_BOOST_RE = None


def _parse_simple_token(tok: str, field: str | None, boost: float,
                        stopwords) -> list[Query]:
    """One unquoted, unranged token -> query node(s). Pinned spec
    (classic QueryParser through-analyzer behavior):

    * ``term~`` / ``term~N`` -> Fuzzy (bare ``~`` = 2 edits, Lucene's
      FuzzyQuery.defaultMaxEdits); pattern lowercased only (Lucene's
      lowercaseExpandedTerms — multi-term patterns bypass the analyzer).
    * ``*``/``?`` anywhere -> Wildcard; a pure trailing-star pattern
      becomes Prefix (PrefixQuery is the rewrite Lucene picks there).
    * otherwise the token runs through the full analysis chain
      (lowercase + stop filter) and may yield 0..n Terms. Field-
      qualified terms are lowercased but NOT stop-filtered: the parser
      cannot know a non-default field's analyzer, and the engine's
      extra fields are keyword-style (documented pin).
    """
    global _FUZZY_RE
    import re as _re
    if _FUZZY_RE is None:
        _FUZZY_RE = _re.compile(r"^([^~]+)~(\d)?$")
    fm = _FUZZY_RE.match(tok)
    if fm:
        edits = int(fm.group(2)) if fm.group(2) is not None else 2
        return [Fuzzy(fm.group(1).lower(), max_edits=edits, boost=boost,
                      field=field)]
    if "*" in tok or "?" in tok:
        low = tok.lower()
        if low.endswith("*") and "?" not in low and "*" not in low[:-1] \
                and len(low) > 1:
            return [Prefix(low[:-1], boost=boost, field=field)]
        return [Wildcard(low, boost=boost, field=field)]
    if field is not None:
        return [Term(tok.lower(), boost=boost, field=field)]
    return [Term(t, boost=boost)
            for t in tokenize_text(tok, stopwords)]


def parse(query: str, stopwords=ENGLISH_STOP_WORDS) -> Query:
    """Parse a classic-syntax query string into the AST (the Lucene
    classic QueryParser surface, ``u8:lucene/queryparser/.../classic/
    QueryParser.jj``, flat form — no parenthesized sub-clauses).

    Supported: ``+``/``-``/bare occurs, ``AND``/``OR``/``NOT`` rewrite,
    quoted phrases (``"a b"``, ``"a b"~N`` slop) with stop-gap offsets,
    ``field:token`` / ``field:"a b"`` qualification, trailing-``*``
    prefixes, ``*``/``?`` wildcards, ``term~``/``term~N`` fuzzy,
    ``[a TO b]`` / ``{a TO b}`` term ranges (``*`` = open endpoint,
    mixed brackets allowed), and ``token^2.5`` boosts. Terms pass
    through the same analysis chain as documents (lowercase + stop
    filter); terms that analyze to nothing vanish, exactly like
    Lucene's analyzer-in-the-query-parser behavior; multi-term patterns
    (prefix/wildcard/fuzzy/range) are lowercased only.
    """
    import re as _re

    global _PART_RE, _QUOTED_RE, _RANGE_RE, _BOOST_RE
    if _PART_RE is None:
        _PART_RE = _re.compile(
            r'([+-]?)(?:(\w+):)?"([^"]*)"(~(\d+))?'
            r'|([+-]?)(?:(\w+):)?([\[{][^\]}]*[\]}])'
            r'|(\S+)')
        _QUOTED_RE = _re.compile(
            r'([+-]?(?:\w+:)?"[^"]*"(?:~\d+)?'
            r'|[+-]?(?:\w+:)?[\[{][^\]}]*[\]}])')
        _RANGE_RE = _re.compile(
            r'^([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])$')
        _BOOST_RE = _re.compile(r'^(.+)\^(\d+(?:\.\d+)?)$')
    # operator rewrites must never touch quoted/range segments:
    # '"fast AND key"' must keep its stopword gap ((0,'fast'),(2,'key')),
    # and '[a TO b]' must keep its TO — split those spans out first and
    # rewrite only the plain remainder
    parts = _QUOTED_RE.split(query)
    raw = "".join(
        p if i % 2 else
        p.replace(" AND ", " +").replace(" NOT ", " -").replace(" OR ", " ")
        for i, p in enumerate(parts))
    must: list[Query] = []
    should: list[Query] = []
    neg: list[Query] = []
    for m in _PART_RE.finditer(raw):
        (qpre, qfield, quoted, _tilde, slop,
         rpre, rfield, rng, tok) = m.groups()
        if quoted is not None:
            bucket = {"+": must, "-": neg}.get(qpre, should)
            ph = analyze_phrase(quoted, stopwords)
            if isinstance(ph, Phrase):
                if slop:
                    ph = Phrase(ph.slots, slop=int(slop))
                if qfield:
                    ph = Phrase(ph.slots, slop=ph.slop, field=qfield)
            if not isinstance(ph, MatchNoDocs):
                bucket.append(ph)
            continue
        if rng is not None:
            bucket = {"+": must, "-": neg}.get(rpre, should)
            rm = _RANGE_RE.match(rng)
            if rm is None:
                raise ValueError(f"malformed range clause {rng!r}")
            op, lo, hi, cl = rm.groups()
            bucket.append(TermRange(
                lo=None if lo == "*" else lo.lower(),
                hi=None if hi == "*" else hi.lower(),
                include_lo=(op == "["), include_hi=(cl == "]"),
                field=rfield))
            continue
        bucket = should
        if tok.startswith("+"):
            bucket, tok = must, tok[1:]
        elif tok.startswith("-"):
            bucket, tok = neg, tok[1:]
        boost = 1.0
        bm = _BOOST_RE.match(tok)
        if bm:
            tok, boost = bm.group(1), float(bm.group(2))
        field = None
        if ":" in tok:
            head, _, rest = tok.partition(":")
            if rest and _re.fullmatch(r"\w+", head):
                field, tok = head, rest
        bucket.extend(_parse_simple_token(tok, field, boost, stopwords))
    if must and should:
        # classic semantics: required clauses dominate; SHOULD become optional
        pos: Query = And(tuple(must) + tuple(should))
    elif must:
        pos = And(tuple(must))
    elif should:
        pos = Or(tuple(should))
    else:
        pos = MatchNoDocs()
    if neg:
        pos = Not(pos, Or(tuple(neg)))
    return rewrite(pos)


def reverse_wildcards(q: Query, rev_field: str) -> Query:
    """ReversedWildcardFilter query-side rewrite (public knowledge:
    ``u8:solr/core/.../analysis/ReversedWildcardFilterFactory.java`` +
    the SolrQueryParserBase.getWildcardQuery hook): a Wildcard or Prefix
    pattern that STARTS with a wildcard is re-targeted at ``rev_field``
    (a field indexed with ``AnalyzerConfig(reverse_tokens=True)``) with
    the pattern reversed — the reversed pattern leads with literal
    characters, so the dictionary expansion becomes a sorted-term PREFIX
    seek instead of a full vocabulary scan. Patterns whose reversal
    still leads with a wildcard (e.g. ``*mid*``) are left unchanged.
    Composable: booleans/DisMax/Not/Filtered/ConstantScore recurse.
    """
    if isinstance(q, Wildcard) and q.pattern[:1] in ("*", "?"):
        rp = q.pattern[::-1]
        if rp[:1] not in ("*", "?"):
            if rp.endswith("*") and "?" not in rp[:-1] \
                    and "*" not in rp[:-1] and len(rp) > 1:
                return Prefix(rp[:-1], boost=q.boost, field=rev_field)
            return Wildcard(rp, boost=q.boost, field=rev_field)
        return q
    if isinstance(q, (And, Or, DisMax)):
        clauses = tuple(reverse_wildcards(c, rev_field) for c in q.clauses)
        if isinstance(q, Or):
            return Or(clauses, q.min_should_match)
        if isinstance(q, DisMax):
            return DisMax(clauses, q.tiebreak)
        return And(clauses)
    if isinstance(q, Not):
        return Not(reverse_wildcards(q.positive, rev_field),
                   reverse_wildcards(q.negative, rev_field))
    if isinstance(q, Filtered):
        return Filtered(reverse_wildcards(q.positive, rev_field),
                        reverse_wildcards(q.filter, rev_field))
    if isinstance(q, ConstantScore):
        return ConstantScore(reverse_wildcards(q.child, rev_field), q.boost)
    return q


def apply_synonyms(q: Query,
                   rules: "dict[str, tuple]") -> Query:
    """Query-time synonym-graph expansion (public knowledge:
    u8:lucene/analysis/common/.../synonym/SynonymGraphFilter.java as
    consumed by QueryBuilder.analyzeGraphBoolean — Solr's recommended
    query-time sow=false path): rewrite every Term leaf whose term has a
    rule into the boolean shape Lucene builds from the token graph:

      * single-token alternatives merge with the original term into ONE
        :class:`Synonym` node (blended df, summed tf);
      * multi-token alternatives become exact :class:`Phrase` clauses,
        OR-ed with the single-token node (each branch scores normally —
        analyzeGraphBoolean's per-path queries).

    ``rules`` maps analyzed term -> tuple of alternatives, each either a
    single analyzed term (str) or a multi-token phrase (tuple of str).
    Recurses through boolean composition; Phrase/Within/Span leaves are
    left alone (Lucene expands synonyms on the analyzed token graph,
    and this engine pins expansion at the TERM level).
    """
    if isinstance(q, Term) and q.term in rules:
        singles = [q.term] + [a for a in rules[q.term]
                              if isinstance(a, str)]
        phrases = [tuple(a) for a in rules[q.term]
                   if not isinstance(a, str)]
        node: Query = (Synonym(tuple(singles), q.boost, q.field)
                       if len(singles) > 1 else q)
        if not phrases:
            return rewrite(node)
        clauses: tuple[Query, ...] = (node,) + tuple(
            Phrase(tuple(enumerate(p)), field=q.field) for p in phrases)
        return rewrite(Or(clauses, 1))
    if isinstance(q, (And, Or)):
        clauses = tuple(apply_synonyms(c, rules) for c in q.clauses)
        return (And(clauses) if isinstance(q, And)
                else Or(clauses, q.min_should_match))
    if isinstance(q, DisMax):
        return DisMax(tuple(apply_synonyms(c, rules) for c in q.clauses),
                      q.tiebreak)
    if isinstance(q, Not):
        return Not(apply_synonyms(q.positive, rules),
                   apply_synonyms(q.negative, rules))
    if isinstance(q, Filtered):
        return Filtered(apply_synonyms(q.positive, rules),
                        apply_synonyms(q.filter, rules))
    if isinstance(q, ConstantScore):
        return ConstantScore(apply_synonyms(q.child, rules), q.boost)
    return q


def parse_min_should_match(spec: str, n_optional: int) -> int:
    """Solr's ``mm`` specification parser (public behavior:
    u8:solr/core/.../util/SolrPluginUtils.java calculateMinShouldMatch):

    * ``"3"``    — absolute count
    * ``"-2"``   — all but 2 (``n - 2``)
    * ``"75%"``  — integer-truncated percentage of the optional clauses
    * ``"-25%"`` — all but that percentage
    * conditionals ``"k<spec"`` space-separated (``"2<-25% 9<-3"``):
      the segment with the LARGEST k strictly below ``n_optional``
      applies; when ``n_optional`` <= every k, ALL clauses are required
      (mm = n) — the reference's exact rule.

    Percentage arithmetic is Java's ``n * p / 100`` integer truncation.
    The result is clamped to [0, n_optional] like the reference (a
    negative spec larger than n yields 0 → pure OR).
    """
    spec = spec.strip()

    def _simple(s: str) -> int:
        s = s.strip()
        if s.endswith("%"):
            p = int(s[:-1])
            calc = n_optional * abs(p) // 100
            v = n_optional - calc if p < 0 else calc
        else:
            v = int(s)
            if v < 0:
                v = n_optional + v
        return max(0, min(n_optional, v))

    if "<" not in spec:
        return _simple(spec)
    best_k, best_v = None, None
    for seg in spec.split():
        k_s, _, v_s = seg.partition("<")
        k = int(k_s)
        if k < n_optional and (best_k is None or k > best_k):
            best_k, best_v = k, v_s
    if best_k is None:
        return n_optional          # n <= every k: all required
    return _simple(best_v)


def parse_simple(query: str, stopwords=ENGLISH_STOP_WORDS,
                 default_op: str = "or") -> Query:
    """Lucene SimpleQueryParser surface (public behavior:
    u8:lucene/queryparser/.../simple/SimpleQueryParser.java — the
    end-user grammar Elasticsearch exposes as simple_query_string):
    ``+`` AND, ``|`` OR, ``-`` negation, ``"..."`` phrases (``~N``
    slop), trailing ``*`` prefix, ``term~N`` fuzzy, ``( )`` grouping —
    and TOTAL leniency: malformed input never raises. Pinned leniency
    rules (the reference's spec pins the operator set and that errors
    are tolerated, not each recovery): an unbalanced quote swallows to
    end-of-string as a phrase, an unmatched ``)`` is ignored, an
    unclosed ``(`` groups to end-of-string, dangling operators drop,
    an empty group vanishes.

    Pinned structure rules: ``+`` binds tighter than ``|``; adjacency
    uses ``default_op``; a ``-`` clause attaches to the CURRENT
    and-group as MUST_NOT regardless of the pending connective (a
    pure-negative group gets a MatchAllDocs base — Lucene's
    pure-negative boolean behavior).
    """
    import re as _re

    toks: list[tuple[str, object]] = []
    i, n = 0, len(query)
    while i < n:
        ch = query[i]
        if ch.isspace():
            i += 1
            continue
        if ch in "+|()-":
            toks.append((ch, None))
            i += 1
            continue
        if ch == '"':
            j = query.find('"', i + 1)
            body, i = ((query[i + 1:], n) if j == -1
                       else (query[i + 1:j], j + 1))
            slop = 0
            sm = _re.match(r"~(\d+)", query[i:])
            if sm:
                slop, i = int(sm.group(1)), i + sm.end()
            toks.append(("PHRASE", (body, slop)))
            continue
        j = i
        while j < n and not query[j].isspace() and query[j] not in '+|()-"':
            j += 1
        toks.append(("TERM", query[i:j]))
        i = j

    def expr(i: int, depth: int) -> tuple[Query | None, int]:
        clauses: list[tuple[str, bool, Query]] = []  # (conn, neg, q)
        pending: str | None = None
        neg_next = False
        while i < len(toks):
            kind, val = toks[i]
            if kind == ")":
                if depth:
                    i += 1
                    break
                i += 1            # leniency: stray ')' ignored
                continue
            if kind in ("+", "|"):
                pending = "and" if kind == "+" else "or"
                i += 1
                continue
            if kind == "-":
                neg_next = True
                i += 1
                continue
            if kind == "(":
                sub, i = expr(i + 1, depth + 1)
                q = sub
            elif kind == "PHRASE":
                body, slop = val
                ph = analyze_phrase(body, stopwords)
                if isinstance(ph, Phrase) and slop:
                    ph = Phrase(ph.slots, slop=slop)
                q = None if isinstance(ph, MatchNoDocs) else ph
                i += 1
            else:
                got = _parse_simple_token(val, None, 1.0, stopwords)
                q = got[0] if got else None
                i += 1
            if q is not None:
                clauses.append((pending or default_op, neg_next, q))
            pending, neg_next = None, False
        # assemble: '-' joins the current and-group as MUST_NOT; '+'
        # extends it; '|'/adjacency-or starts a new or-item
        groups: list[tuple[list[Query], list[Query]]] = []
        for conn, neg, q in clauses:
            if not groups or (not neg and conn == "or"):
                groups.append(([], []))
            (groups[-1][1] if neg else groups[-1][0]).append(q)
        items: list[Query] = []
        for pos, negs in groups:
            base: Query = (And(tuple(pos)) if len(pos) > 1
                           else pos[0] if pos else MatchAllDocs())
            if negs:
                base = Not(base, Or(tuple(negs)) if len(negs) > 1
                           else negs[0])
            items.append(base)
        if not items:
            return None, i
        return (Or(tuple(items)) if len(items) > 1 else items[0]), i

    q, _ = expr(0, 0)
    return rewrite(q) if q is not None else MatchNoDocs()
