"""ComplexPhrase (wildcard/prefix/fuzzy inside a phrase): rewrite into
MultiPhrase must be exact, empty expansions must yield MatchNoDocs."""

from __future__ import annotations

import pandas as pd
import pytest

from sparklucene.query import Fuzzy, MatchNoDocs, MultiPhrase, Prefix, Wildcard
from sparklucene.search import complex_phrase, search

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def idx(spark):
    from sparklucene.driver_queries import index_for
    return index_for(spark, SF)


def test_prefix_slot_equals_expanded_multiphrase(spark, idx):
    q = complex_phrase(idx, ("fast", Prefix("jo")))
    assert isinstance(q, MultiPhrase)
    exp = tuple(sorted(idx.expand_terms(Prefix("jo"))))
    assert q.slots == ((0, ("fast",)), (1, exp))
    got = search(idx, q, k=10, mode="f64").toPandas()
    want = search(idx, MultiPhrase(((0, ("fast",)), (1, exp))),
                  k=10, mode="f64").toPandas()
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0  # "fast join" exists in the corpus


def test_wildcard_and_fuzzy_slots(spark, idx):
    q = complex_phrase(idx, (Wildcard("f?st"), Fuzzy("jon", max_edits=1)))
    assert isinstance(q, MultiPhrase)
    got = search(idx, q, k=10, mode="f64").toPandas()
    assert len(got) > 0


def test_empty_expansion_is_matchnodocs(spark, idx):
    q = complex_phrase(idx, ("fast", Prefix("zzzzqqqq")))
    assert isinstance(q, MatchNoDocs)
    assert search(idx, q, k=10).count() == 0


def test_bad_slot_type_raises(idx):
    with pytest.raises(TypeError):
        complex_phrase(idx, ("fast", 42))


def test_max_expansions_cap(spark, idx):
    q = complex_phrase(idx, ("fast", Prefix("j")), max_expansions=2)
    assert isinstance(q, MultiPhrase)
    assert len(q.slots[1][1]) <= 2
