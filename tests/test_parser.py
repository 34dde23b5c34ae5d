"""Classic QueryParser surface: field prefixes, wildcards, fuzzy,
ranges, boosts — pure-AST tests (no Spark)."""

from __future__ import annotations

import pytest

from sparklucene.query import (And, Fuzzy, MatchNoDocs, Not, Or, Phrase,
                               Prefix, Term, TermRange, Wildcard, parse)


def test_existing_surface_unchanged():
    assert parse("+spark +merge") == And((Term("spark"), Term("merge")))
    assert parse("spark merge") == Or((Term("spark"), Term("merge")))
    q = parse("spark -merge")
    assert isinstance(q, Not) and q.negative == Term("merge")
    assert isinstance(parse("the and of"), MatchNoDocs)
    ph = parse('"fast the key"')
    assert isinstance(ph, Phrase) and ph.slots == ((0, "fast"), (2, "key"))


def test_field_qualification():
    assert parse("lang:EN") == Term("en", field="lang")
    q = parse('+repo:Alpha merge')
    assert isinstance(q, And)
    assert Term("alpha", field="repo") in q.clauses
    ph = parse('title:"merge join"')
    assert isinstance(ph, Phrase) and ph.field == "title"
    assert ph.slots == ((0, "merge"), (1, "join"))


def test_wildcard_prefix_fuzzy():
    assert parse("jo*") == Prefix("jo")
    assert parse("j*n") == Wildcard("j*n")
    assert parse("?oin") == Wildcard("?oin")
    assert parse("merg~1") == Fuzzy("merg", max_edits=1)
    # bare ~ = Lucene's default 2 edits; lowercased, not stop-filtered
    assert parse("MERG~") == Fuzzy("merg", max_edits=2)
    assert parse("lang:e?") == Wildcard("e?", field="lang")


def test_ranges():
    assert parse("[alpha TO beta]") == TermRange(lo="alpha", hi="beta")
    q = parse("lang:{aa TO zz]")
    assert q == TermRange(lo="aa", hi="zz", include_lo=False,
                          field="lang")
    assert parse("[merge TO *]") == TermRange(lo="merge", hi=None)
    # range + required occur + another clause
    q2 = parse("+[a TO c] +merge")
    assert isinstance(q2, And) and TermRange(lo="a", hi="c") in q2.clauses
    with pytest.raises(ValueError, match="malformed range"):
        parse("[a b c]")


def test_boosts():
    assert parse("merge^2") == Term("merge", boost=2.0)
    assert parse("jo*^1.5") == Prefix("jo", boost=1.5)
    q = parse("+merge^3 +join")
    assert isinstance(q, And)
    assert Term("merge", boost=3.0) in q.clauses


def test_mixed_query():
    q = parse('+lang:en +merge jo* -slow~1 "hash join"~2')
    assert isinstance(q, Not)
    assert q.negative == Fuzzy("slow", max_edits=1)
    pos = q.positive
    assert isinstance(pos, And)
    assert Term("en", field="lang") in pos.clauses
    assert Term("merge") in pos.clauses
    assert Prefix("jo") in pos.clauses
    assert any(isinstance(c, Phrase) and c.slop == 2 for c in pos.clauses)


def test_reverse_wildcards_rewrite():
    from sparklucene.query import reverse_wildcards

    # leading wildcard -> prefix on the reversed field
    assert reverse_wildcards(Wildcard("*ing"), "rev") == \
        Prefix("gni", field="rev")
    # leading ? -> reversed wildcard
    assert reverse_wildcards(Wildcard("?bc"), "rev") == \
        Wildcard("cb?", field="rev")
    # both-ended wildcard stays on the forward field
    assert reverse_wildcards(Wildcard("*mid*"), "rev") == Wildcard("*mid*")
    # non-leading untouched; boost preserved; booleans recurse
    assert reverse_wildcards(Wildcard("ab*"), "rev") == Wildcard("ab*")
    q = reverse_wildcards(
        Or((Wildcard("*ing", boost=2.0), Term("merge"))), "rev")
    assert q == Or((Prefix("gni", boost=2.0, field="rev"), Term("merge")))


def test_min_should_match_spec_pinned_cases():
    """SolrPluginUtils.calculateMinShouldMatch grammar (round 4)."""
    from sparklucene.query import parse_min_should_match as mm
    assert mm("3", 5) == 3
    assert mm("-2", 5) == 3
    assert mm("75%", 10) == 7          # Java integer truncation
    assert mm("-25%", 9) == 7
    assert mm("3<90%", 3) == 3         # n <= k: all required
    assert mm("3<90%", 10) == 9
    assert mm("2<-25% 9<-3", 8) == 6   # k=2 segment applies
    assert mm("2<-25% 9<-3", 20) == 17 # k=9 segment applies
    assert mm("2<-25% 9<-3", 2) == 2
    assert mm("-10", 4) == 0           # clamped at 0


def test_simple_query_parser_structure_and_leniency():
    """SimpleQueryParser grammar (round 4): operators, grouping,
    precedence pins, and total leniency — malformed input never raises."""
    from sparklucene.query import (And, Fuzzy, MatchAllDocs, MatchNoDocs,
                                   Not, Or, Phrase, Prefix, Term,
                                   parse_simple)
    q = parse_simple('merge +(join | "fast merge") -slow')
    assert isinstance(q, Not) and isinstance(q.positive, And)
    inner = q.positive.clauses
    assert inner[0] == Term("merge") and isinstance(inner[1], Or)
    assert q.negative == Term("slow")
    # '+' binds tighter than '|'
    q2 = parse_simple("merge +join | slow")
    assert isinstance(q2, Or) and isinstance(q2.clauses[0], And)
    assert q2.clauses[1] == Term("slow")
    # pure negative gets a MatchAll base
    q3 = parse_simple("-zebra")
    assert isinstance(q3, Not) and isinstance(q3.positive, MatchAllDocs)
    # prefix + fuzzy postfixes
    q4 = parse_simple("spar* name~1")
    assert isinstance(q4.clauses[0], Prefix)
    assert isinstance(q4.clauses[1], Fuzzy)
    # leniency: unbalanced quote -> phrase to end; stray ')'/dangling
    # ops vanish; empty -> MatchNoDocs
    assert isinstance(parse_simple('"unclosed ph'), Phrase)
    assert isinstance(parse_simple(") | +"), MatchNoDocs)
    assert isinstance(parse_simple("(merge"), Term)  # unclosed group
    assert isinstance(parse_simple(""), MatchNoDocs)
    # phrase slop
    q5 = parse_simple('"fast merge"~2')
    assert isinstance(q5, Phrase) and q5.slop == 2
