"""Plugin registry — named extension points (SURVEY.md §2.13).

The reference exposes plugin registries (similarity factories, analyzer
factories, QParser plugins — public Solr solrconfig.xml surface). The
Spark-native equivalent is a process-local name -> implementation map that
the engine consults wherever a mode/analyzer string appears:

  * ``register_similarity("mysim", fn)`` then ``search(..., mode="mysim")``
    — fn(tf, dl, df, cf, doc_count, sum_dl) -> scores (see
    scorer.RangeScorer._score_arrays; pruning is auto-disabled since an
    opaque callable carries no monotone upper bound).
  * ``register_analyzer("code", AnalyzerConfig(...))`` then
    ``build_index(..., analyzer=resolve_analyzer("code"))``.
  * ``register_qparser("myql", fn)`` then ``parse_with("myql", text)`` —
    fn(text) -> Query AST (the QParserPlugin surface).
"""

from __future__ import annotations

from collections.abc import Callable

from sparklucene.analysis import AnalyzerConfig
from sparklucene.query import Query

#: built-in similarity mode names (scorer.RangeScorer)
BUILTIN_MODES = frozenset({"lucene8", "f64", "classic", "boolean"})

_SIMILARITIES: dict[str, Callable] = {}
_ANALYZERS: dict[str, AnalyzerConfig] = {}
_QPARSERS: dict[str, Callable[[str], Query]] = {}


def register_similarity(name: str, fn: Callable) -> None:
    if name in BUILTIN_MODES:
        raise ValueError(f"{name!r} is a built-in similarity mode")
    if not callable(fn):
        raise TypeError("similarity must be callable(tf, dl, df, cf, "
                        "doc_count, sum_dl)")
    _SIMILARITIES[name] = fn


def resolve_mode(mode):
    """Similarity-mode indirection used by search(): built-in names pass
    through, registered names resolve to their callable."""
    if isinstance(mode, str) and mode not in BUILTIN_MODES:
        if mode in _SIMILARITIES:
            return _SIMILARITIES[mode]
        raise ValueError(
            f"unknown similarity mode {mode!r}: not one of "
            f"{sorted(BUILTIN_MODES)} and not registered via "
            "plugins.register_similarity")
    return mode


def register_analyzer(name: str, cfg: AnalyzerConfig) -> None:
    if not isinstance(cfg, AnalyzerConfig):
        raise TypeError("analyzer must be an AnalyzerConfig")
    _ANALYZERS[name] = cfg


def resolve_analyzer(name: str | AnalyzerConfig | None):
    if name is None or isinstance(name, AnalyzerConfig):
        return name
    if name in _ANALYZERS:
        return _ANALYZERS[name]
    raise ValueError(f"unknown analyzer {name!r} (register via "
                     "plugins.register_analyzer)")


def register_stemmer(name: str, fn: Callable[[str], str]) -> None:
    """Custom language stemmer usable as ``AnalyzerConfig(stem=name)``
    (applied vocabulary-vectorized — see stem.stem_vocab)."""
    from sparklucene.stem import register_stemmer as _reg
    _reg(name, fn)


def register_qparser(name: str, fn: Callable[[str], Query]) -> None:
    if not callable(fn):
        raise TypeError("qparser must be callable(text) -> Query")
    _QPARSERS[name] = fn


def parse_with(name: str, text: str) -> Query:
    if name not in _QPARSERS:
        # built-in defTypes resolve lazily (Solr's lucene/simple/
        # surround parser plugins)
        if name == "lucene":
            from sparklucene.query import parse as _p
            _QPARSERS[name] = _p
        elif name == "simple":
            from sparklucene.query import parse_simple as _p
            _QPARSERS[name] = _p
        elif name == "surround":
            from sparklucene.spans import parse_surround as _p
            _QPARSERS[name] = _p
    if name not in _QPARSERS:
        raise ValueError(f"unknown qparser {name!r} (register via "
                         "plugins.register_qparser)")
    return _QPARSERS[name](text)
