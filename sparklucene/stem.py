"""Porter stemming — the classic 1980 algorithm, vocabulary-vectorized.

Public knowledge: M.F. Porter, "An algorithm for suffix stripping",
Program 14(3) 1980 (the algorithm Lucene's PorterStemFilter implements).
This is an independent from-scratch implementation of the published rules.

Engine integration follows SURVEY.md §2.2's stem-the-dictionary design:
the per-token path never runs Python per token — ``stem_vocab`` factorizes
the token stream, stems only the DISTINCT vocabulary (V << tokens), and
broadcasts the mapping back through the codes array.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m in [C](VC)^m[V] — the count of vowel->consonant transitions."""
    m = 0
    prev_vowel = False
    for i in range(len(w)):
        if _is_cons(w, i):
            if prev_vowel:
                m += 1
            prev_vowel = False
        else:
            prev_vowel = True
    return m


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _ends_double_cons(w: str) -> bool:
    return (len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1))


def _ends_cvc(w: str) -> bool:
    """*o: stem ends consonant-vowel-consonant, final not w/x/y."""
    if len(w) < 3:
        return False
    return (_is_cons(w, len(w) - 3) and not _is_cons(w, len(w) - 2)
            and _is_cons(w, len(w) - 1) and w[-1] not in "wxy")


#: (suffix, replacement) pairs for steps 2-4; within a step the LONGEST
#: matching suffix wins and its condition decides — no fallback (Porter's
#: published behavior).
_STEP2 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
          ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
          ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
          ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
          ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
          ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
          ("biliti", "ble")]
_STEP3 = [("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
          ("ical", "ic"), ("ful", ""), ("ness", "")]
_STEP4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
          "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive",
          "ize"]


def _longest(w: str, pairs) -> tuple[str, str] | None:
    best = None
    for suf, rep in pairs:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    return best


def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    fired = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            fired = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            fired = True
    if fired:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    m2 = _longest(w, _STEP2)
    if m2 is not None:
        suf, rep = m2
        stem = w[: len(w) - len(suf)]
        if _measure(stem) > 0:
            w = stem + rep

    # step 3
    m3 = _longest(w, _STEP3)
    if m3 is not None:
        suf, rep = m3
        stem = w[: len(w) - len(suf)]
        if _measure(stem) > 0:
            w = stem + rep

    # step 4
    m4 = _longest(w, [(s, "") for s in _STEP4])
    if m4 is not None:
        suf, _ = m4
        stem = w[: len(w) - len(suf)]
        if _measure(stem) > 1:
            if suf == "ion":
                if stem and stem[-1] in "st":
                    w = stem
            else:
                w = stem

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


def english_minimal_stem(word: str) -> str:
    """Minimal English plural stemmer (public knowledge: the algorithm of
    Lucene's EnglishMinimalStemFilter — strip a final 's' unless preceded
    by 'u' or 's'; words shorter than 3 chars unchanged)."""
    if len(word) < 3 or not word.endswith("s") or word[-2] in ("u", "s"):
        return word
    return word[:-1]


def s_stem(word: str) -> str:
    """Harman's S-stemmer (D. Harman, "How effective is suffixing?",
    JASIS 42(1), 1991): three plural rules dispatched on the LONGEST
    matching suffix; a rule's exception terminates the procedure (so
    "goes"/"eies" stay unchanged — the reading under which the published
    exceptions actually protect those words):
    ies→y (not aies/eies), es→e (not aes/ees/oes), s→∅ (not us/ss)."""
    if len(word) > 3 and word.endswith("ies"):
        return word if word[-4] in ("a", "e") else word[:-3] + "y"
    if len(word) > 2 and word.endswith("es"):
        return word if word[-3] in ("a", "e", "o") else word[:-1]
    if len(word) > 2 and word.endswith("s"):
        return word if word[-2] in ("u", "s") else word[:-1]
    return word


def french_minimal_stem(word: str) -> str:
    """Minimal French stemmer (public knowledge: J. Savoy, "Light
    stemming approaches for the French, Portuguese, German and Hungarian
    languages", ACM SAC 2006 — the algorithm of Lucene's
    FrenchMinimalStemFilter). Words shorter than 6 chars unchanged;
    'aux'→'al'; otherwise strip final s, r, e, é in that order, then a
    doubled final letter."""
    if len(word) < 6:
        return word
    if word[-1] == "x":
        if word.endswith("aux"):
            return word[:-3] + "al"
        return word[:-1]
    if word[-1] == "s":
        word = word[:-1]
    if word[-1] == "r":
        word = word[:-1]
    if word[-1] == "e":
        word = word[:-1]
    if word[-1] == "é":  # é
        word = word[:-1]
    if len(word) >= 2 and word[-1] == word[-2]:
        word = word[:-1]
    return word


#: stemmer registry — built-ins plus user registrations
#: (plugins.register_stemmer re-exports _register for the unified surface)
_STEMMERS: dict[str, "object"] = {
    "porter": porter_stem,
    "english_minimal": english_minimal_stem,
    "s_stem": s_stem,
    "french_minimal": french_minimal_stem,
}


def register_stemmer(name: str, fn) -> None:
    """Register a custom per-word stemmer callable(str) -> str under a
    name usable in ``AnalyzerConfig(stem=name)`` — the engine always
    applies it vocabulary-vectorized (O(V) calls, never per token)."""
    if not callable(fn):
        raise TypeError("stemmer must be callable(word) -> word")
    _STEMMERS[name] = fn


def resolve_stemmer(algorithm: str):
    fn = _STEMMERS.get(algorithm)
    if fn is None:
        raise ValueError(f"unknown stemmer {algorithm!r}: not one of "
                         f"{sorted(_STEMMERS)} and not registered via "
                         "stem.register_stemmer")
    return fn


def stem_vocab(tokens: np.ndarray, algorithm: str = "porter") -> np.ndarray:
    """Stem a flat object-dtype token array via its DISTINCT vocabulary:
    O(V) Python stem calls, O(n) numpy take — never per-token Python over
    the stream (SURVEY §2.2 term-dictionary-join design)."""
    fn = resolve_stemmer(algorithm)
    if tokens.size == 0:
        return tokens
    codes, uniques = pd.factorize(pd.Series(tokens))
    mapped = np.array([fn(u) for u in uniques], dtype=object)
    return mapped[codes]


# --------------------------------------------------------------------------
# Phonetic encoders (u8:lucene/analysis/phonetic/.../PhoneticFilter.java,
# which delegates to commons-codec — the algorithm itself is the public
# 1918 American Soundex as specified by the U.S. National Archives).
# --------------------------------------------------------------------------
_SOUNDEX_CODES = {c: d for letters, d in
                  (("bfpv", "1"), ("cgjkqsxz", "2"), ("dt", "3"),
                   ("l", "4"), ("mn", "5"), ("r", "6"))
                  for c in letters}


def soundex(word: str) -> str:
    """American Soundex, commons-codec semantics (the encoder behind
    Solr's PhoneticFilterFactory): first letter kept, consonants coded
    1-6, adjacent equal codes collapsed, h/w transparent (codes separated
    only by h/w still collapse), vowels reset, padded/truncated to 4.
    Tokens with any non-ASCII-letter char pass through unencoded (the
    filter's clean-up step drops them; this engine's token set includes
    digits/underscores which Soundex does not define). Output lowercase,
    matching the engine's term-dictionary contract."""
    if not word or not (word.isascii() and word.isalpha()):
        return word
    w = word.lower()
    out = [w[0]]
    prev = _SOUNDEX_CODES.get(w[0], "")
    for ch in w[1:]:
        code = _SOUNDEX_CODES.get(ch, "")
        if code and code != prev:
            out.append(code)
            if len(out) == 4:
                break
        if ch in "hw":
            continue
        prev = code
    return ("".join(out) + "000")[:4]


_PHONETICS: dict[str, "object"] = {"soundex": soundex}


def resolve_phonetic(algorithm: str):
    fn = _PHONETICS.get(algorithm)
    if fn is None:
        raise ValueError(f"unknown phonetic encoder {algorithm!r}: not "
                         f"one of {sorted(_PHONETICS)}")
    return fn
