"""Porter stemmer (published test vectors) + shingle/ngram/edge-ngram
analyzer filters (vocabulary-vectorized expansion paths)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from sparklucene.analysis import AnalyzerConfig, analyze_flat, analyze_text
from sparklucene.stem import porter_stem, stem_vocab

# classic examples from Porter 1980 / the reference voc.txt behavior
PORTER_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "sized": "size", "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit", "valenci": "valenc",
    "hesitanci": "hesit", "digitizer": "digit", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
}


def test_porter_published_vectors():
    bad = {w: (porter_stem(w), want) for w, want in PORTER_VECTORS.items()
           if porter_stem(w) != want}
    assert not bad, bad


def test_stem_vocab_matches_scalar():
    toks = np.array(["running", "runs", "running", "jumped"], dtype=object)
    out = stem_vocab(toks)
    assert out.tolist() == [porter_stem(t) for t in toks]


def test_analyzer_stem_chain_order():
    # stop filter runs BEFORE the stemmer (EnglishAnalyzer order): 'this'
    # is removed as a stopword, not stemmed to 'thi'
    cfg = AnalyzerConfig(stem="porter")
    assert analyze_text("this merges tables", cfg) == ["merg", "tabl"]


def test_shingle_filter_unigrams_plus_bigrams():
    cfg = AnalyzerConfig(shingle=(2, 2), stopwords=frozenset())
    toks, docs, pos = analyze_flat(
        pd.Series(["fast merge join", "solo"]), np.array([7, 9]), cfg)
    by_doc = {}
    for t, d, p in zip(toks, docs, pos):
        by_doc.setdefault(int(d), []).append((int(p), t))
    assert sorted(by_doc[7]) == [(0, "fast"), (0, "fast merge"),
                                 (1, "merge"), (1, "merge join"),
                                 (2, "join")]
    assert sorted(by_doc[9]) == [(0, "solo")]  # no cross-doc shingle


def test_shingle_never_crosses_docs():
    cfg = AnalyzerConfig(shingle=(2, 3), stopwords=frozenset())
    toks, docs, pos = analyze_flat(
        pd.Series(["a b", "c d"]), np.array([1, 2]), cfg)
    shingles = [t for t in toks if " " in t]
    assert "b c" not in shingles
    assert set(shingles) == {"a b", "c d"}


def test_edge_ngram_filter():
    cfg = AnalyzerConfig(edge_ngram=(2, 3), stopwords=frozenset())
    assert analyze_text("spark io x", cfg) == ["sp", "spa", "io"]
    # 'x' (len 1 < min gram) emits nothing


def test_char_ngram_filter():
    cfg = AnalyzerConfig(ngram=(2, 2), stopwords=frozenset())
    assert analyze_text("abc", cfg) == ["ab", "bc"]


def test_ngram_positions_inherit_source_token():
    cfg = AnalyzerConfig(ngram=(2, 2), stopwords=frozenset())
    toks, docs, pos = analyze_flat(pd.Series(["ab cd"]), np.array([0]), cfg)
    assert toks.tolist() == ["ab", "cd"]
    assert pos.tolist() == [0, 1]


def test_chain_stem_then_shingle():
    # pipeline order: stop -> stem -> shingle (shingles are built from
    # STEMMED unigrams)
    cfg = AnalyzerConfig(stem="porter", shingle=(2, 2))
    out = analyze_text("the merges tables", cfg)
    assert sorted(out) == ["merg", "merg tabl", "tabl"]


def test_chain_worddelims_stem():
    cfg = AnalyzerConfig(split_word_delims=True, stem="porter")
    # camelCase splits first, then each part stems
    assert analyze_text("mergeTables runningJobs", cfg) == \
        ["merg", "tabl", "run", "job"]


def test_chain_edge_ngram_after_stop():
    cfg = AnalyzerConfig(edge_ngram=(2, 3))
    # 'the' is stop-filtered before gram expansion
    assert analyze_text("the spark", cfg) == ["sp", "spa"]


def test_minimal_stemmers():
    from sparklucene.stem import (english_minimal_stem, french_minimal_stem,
                                  register_stemmer, resolve_stemmer, s_stem,
                                  stem_vocab)
    import numpy as np

    # Lucene EnglishMinimalStemFilter semantics: plural-s only
    assert english_minimal_stem("cats") == "cat"
    assert english_minimal_stem("queries") == "querie"
    assert english_minimal_stem("bus") == "bus"
    assert english_minimal_stem("class") == "class"
    assert english_minimal_stem("as") == "as"
    # Harman S-stemmer
    assert s_stem("flies") == "fly"
    # exception terminates: "eies"/"goes" are protected, not cascaded
    assert s_stem("eies") == "eies"
    assert s_stem("bashes") == "bashe"
    assert s_stem("goes") == "goes"
    assert s_stem("cats") == "cat"
    assert s_stem("bus") == "bus"
    # Savoy French minimal (paper examples: chevaux->cheval)
    assert french_minimal_stem("chevaux") == "cheval"
    assert french_minimal_stem("fraises") == "frais"
    assert french_minimal_stem("merge") == "merge"  # len < 6 unchanged
    assert french_minimal_stem("customer") == "custom"
    # registry: custom stemmer via name
    register_stemmer("upper3", lambda w: w[:3].upper())
    out = stem_vocab(np.array(["alpha", "beta", "alpha"], dtype=object),
                     "upper3")
    assert list(out) == ["ALP", "BET", "ALP"]
    assert resolve_stemmer("porter")("running") == "run"
    import pytest
    with pytest.raises(ValueError):
        resolve_stemmer("nope")


# published Soundex vectors (U.S. National Archives spec + the
# commons-codec test suite behind Solr's PhoneticFilterFactory);
# engine emits lowercase per the term-dictionary contract
SOUNDEX_VECTORS = {
    "robert": "r163", "rupert": "r163", "ashcraft": "a261",
    "ashcroft": "a261", "tymczak": "t522", "pfister": "p236",
    "honeyman": "h555", "washington": "w252", "lee": "l000",
    "gutierrez": "g362", "jackson": "j250", "vandeusen": "v532",
}


def test_soundex_published_vectors():
    from sparklucene.stem import soundex
    bad = {w: (soundex(w), want) for w, want in SOUNDEX_VECTORS.items()
           if soundex(w) != want}
    assert not bad, bad


def test_soundex_passthrough_non_alpha():
    from sparklucene.stem import soundex
    # tokens the 1918 algorithm does not define pass through unencoded
    assert soundex("x86") == "x86"
    assert soundex("") == ""
    assert soundex("café") == "café"


def test_phonetic_filter_inject():
    # Solr default inject=true: original + code at the SAME position
    cfg = AnalyzerConfig(phonetic="soundex", stopwords=frozenset())
    toks, docs, pos = analyze_flat(
        pd.Series(["robert merge"]), np.array([0]), cfg)
    got = sorted(zip(pos.tolist(), toks.tolist()))
    assert got == [(0, "r163"), (0, "robert"), (1, "m620"), (1, "merge")]


def test_phonetic_filter_replace():
    cfg = AnalyzerConfig(phonetic="soundex", phonetic_inject=False,
                         stopwords=frozenset())
    assert analyze_text("robert rupert x86", cfg) == ["r163", "r163", "x86"]


def test_phonetic_after_stop_unknown_encoder():
    import pytest
    from sparklucene.stem import resolve_phonetic
    cfg = AnalyzerConfig(phonetic="soundex")
    # 'the' stop-filtered before encoding
    assert analyze_text("the robert", cfg) == ["robert", "r163"]
    with pytest.raises(ValueError):
        resolve_phonetic("metaphone")


def test_keyword_repeat_inject():
    # KeywordRepeat + stemmer + RemoveDuplicates: surface form AND stem
    # at the same position; unchanged stems emit once
    cfg = AnalyzerConfig(stem="porter", stem_inject=True,
                         stopwords=frozenset())
    toks, docs, pos = analyze_flat(
        pd.Series(["merges sky"]), np.array([0]), cfg)
    got = sorted(zip(pos.tolist(), toks.tolist()))
    assert got == [(0, "merg"), (0, "merges"), (1, "sky")]


def test_keyword_repeat_then_shingle_flattened_stream():
    # ShingleFilter consumes the FLATTENED token stream (Lucene parity:
    # ShingleFilter over an unflattened graph / FlattenGraphFilter output
    # shingles adjacent stream tokens, including same-position variants —
    # the documented Lucene behavior for graph filters before shingles)
    cfg = AnalyzerConfig(stem="porter", stem_inject=True,
                         shingle=(2, 2), stopwords=frozenset())
    out = analyze_text("merges tables", cfg)
    assert out == ["merges", "merg", "tables", "tabl",
                   "merges merg", "merg tables", "tables tabl"]
