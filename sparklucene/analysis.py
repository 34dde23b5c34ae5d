"""Analysis chain — StandardAnalyzer-equivalent, fully vectorized.

Mirrors the capability of Lucene's StandardAnalyzer (public knowledge:
lucene/core/.../analysis/standard/StandardAnalyzer.java = StandardTokenizer
+ LowerCaseFilter + StopFilter with the classic 33-word English list).

Pinned tokenizer spec (the engine's own oracle-checked contract, SURVEY.md
§2.2): lowercase, then tokens are maximal runs of ``[a-z0-9_]`` — a
UAX#29-approximation appropriate for source code (underscore joins, like
UAX#29 ExtendNumLet, so ``snake_case`` stays one token). The identical
spec is expressible in DuckDB as
``regexp_extract_all(lower(text), '[a-z0-9_]+')`` which is what the
driver oracle uses — parity is exact (verified test_analysis.py).

Exposed both as plain-Python helpers (for the brute-force oracle) and as
an Arrow-vectorized pandas UDF factory for DataFrame pipelines.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = re.compile(r"[a-z0-9_]+")
TOKEN_RE_SQL = "[a-z0-9_]+"

#: Lucene's classic English stop set (EnglishAnalyzer.ENGLISH_STOP_WORDS_SET,
#: 33 words — public knowledge).
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)


#: U+0130 (İ) is the one char whose Python ``str.lower`` is multi-codepoint
#: ('i' + combining dot — a delimiter) while utf8proc (Arrow AND DuckDB,
#: i.e. both the engine fast path and the oracle) maps it 1:1 to 'i'.
#: The pinned contract follows utf8proc; pandas paths pre-map it.
_LOWER_SPECIAL = str.maketrans({"İ": "I"})


# --------------------------------------------------------------------------
# HTMLStripCharFilter (u8:lucene/analysis/common/.../charfilter/
# HTMLStripCharFilter.java). Pinned engine spec — a pre-tokenization char
# filter, not an HTML parser:
#   1. strip comments  <!-- ... -->            (content dropped)
#   2. strip <script>/<style> ELEMENTS          (content dropped)
#   3. replace every remaining tag <...> with a single space (so adjacent
#      words never merge — matches the reference's offset-preserving gap)
#   4. decode character entities: the 6 XML/HTML named entities plus
#      numeric &#NN; / &#xHH;. Decoding happens AFTER tag removal, so
#      "&lt;b&gt;" becomes literal text "<b>", never a tag (same as the
#      reference's single-pass scanner).
# The identical chain is expressible in DuckDB (regexp_replace with 'gs'
# flags + chained replace), which is what the driver oracle uses.
# --------------------------------------------------------------------------
_HTML_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_HTML_SCRIPT_RE = re.compile(r"<script\b[^>]*>.*?</script\s*>", re.S | re.I)
_HTML_STYLE_RE = re.compile(r"<style\b[^>]*>.*?</style\s*>", re.S | re.I)
_HTML_TAG_RE = re.compile(r"<[^>]*>")
#: Entities decode in ONE combined pass (a regexp scan of the original
#: string never re-reads its own replacements), so decoding can never
#: cascade in either direction: "&amp;lt;" -> literal "&lt;",
#: "&amp;#65;" -> literal "&#65;", "&#38;amp;" -> literal "&amp;".
#: No sequential per-entity replace ordering has this property.
_HTML_NAMED = {"lt": "<", "gt": ">", "quot": '"',
               "apos": "'", "nbsp": " ", "amp": "&"}
_HTML_ENTITY_RE = re.compile(
    r"&(?:#x([0-9a-fA-F]+)|#([0-9]+)|(lt|gt|quot|apos|nbsp|amp));")


def _decode_entity(m: re.Match) -> str:
    if m.group(3):
        return _HTML_NAMED[m.group(3)]
    code = int(m.group(1), 16) if m.group(1) else int(m.group(2))
    return chr(code) if 0 < code <= 0x10FFFF else " "


def strip_html(s: pd.Series) -> pd.Series:
    """Vectorized HTMLStripCharFilter over a string Series."""
    s = s.str.replace(_HTML_COMMENT_RE, " ", regex=True)
    s = s.str.replace(_HTML_SCRIPT_RE, " ", regex=True)
    s = s.str.replace(_HTML_STYLE_RE, " ", regex=True)
    s = s.str.replace(_HTML_TAG_RE, " ", regex=True)
    return s.str.replace(_HTML_ENTITY_RE, _decode_entity, regex=True)


def tokenize_text(text: str, stopwords: frozenset[str] = ENGLISH_STOP_WORDS) -> list[str]:
    """Reference tokenizer: lowercase -> [a-z0-9_]+ runs -> stop filter."""
    return [t for t in TOKEN_RE.findall(text.translate(_LOWER_SPECIAL).lower())
            if t not in stopwords]


def tokenize_series(texts: pd.Series,
                    stopwords: frozenset[str] = ENGLISH_STOP_WORDS) -> pd.Series:
    """Vectorized tokenization of a string Series -> Series of list[str].

    Uses pandas' C-implemented str accessor for lower/findall; the stop
    filter runs as a numpy membership test over the flattened token array
    (no per-token Python hash-set probing in a Python loop).
    """
    lowered = texts.fillna("").str.translate(_LOWER_SPECIAL).str.lower()
    token_lists = lowered.str.findall(TOKEN_RE)
    lengths = token_lists.str.len().to_numpy(dtype=np.int64)
    if lengths.sum() == 0:
        return pd.Series([[] for _ in range(len(texts))], index=texts.index)
    flat = np.concatenate([np.asarray(t, dtype=object) for t in token_lists.to_numpy()])
    stop_arr = np.array(sorted(stopwords), dtype=object)
    keep = ~np.isin(flat, stop_arr)
    doc_idx = np.repeat(np.arange(len(texts)), lengths)
    kept_tokens = flat[keep]
    kept_doc = doc_idx[keep]
    # split back into per-doc lists
    counts = np.bincount(kept_doc, minlength=len(texts))
    splits = np.cumsum(counts)[:-1]
    per_doc = np.split(kept_tokens, splits)
    return pd.Series([list(x) for x in per_doc], index=texts.index)


def flat_tokens(texts: pd.Series, doc_ids: np.ndarray,
                stopwords: frozenset[str] = ENGLISH_STOP_WORDS,
                ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize a batch and return flat (token, doc_id, position) arrays.

    This is the invert-stage fast path: no per-doc list materialization.
    Positions are 0-based indexes in the PRE-stop-filter token stream —
    Lucene's StopFilter position-increment semantics (a removed stopword
    leaves a gap), so phrase queries see the same adjacency as Lucene.
    """
    lowered = texts.fillna("").str.translate(_LOWER_SPECIAL).str.lower()
    token_lists = lowered.str.findall(TOKEN_RE)
    lengths = token_lists.str.len().to_numpy(dtype=np.int64)
    if lengths.sum() == 0:
        return (np.empty(0, dtype=object), np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64))
    flat = np.concatenate([np.asarray(t, dtype=object) for t in token_lists.to_numpy()])
    docs = np.repeat(np.asarray(doc_ids, dtype=np.int64), lengths)
    # position within each doc's token stream (before stop filtering)
    ends = np.cumsum(lengths)
    pos = np.arange(ends[-1], dtype=np.int64) - np.repeat(ends - lengths, lengths)
    stop_arr = np.array(sorted(stopwords), dtype=object)
    keep = ~np.isin(flat, stop_arr)
    return flat[keep], docs[keep], pos[keep]


#: the complement of TOKEN_RE — Arrow/RE2 splits delimiter runs so that
#: split("a--b") == findall tokens (plus empty edge artifacts we mask out)
DELIM_RE = "[^a-z0-9_]+"

_EMPTY_CODES = (np.empty(0, dtype=np.int64), np.empty(0, dtype=object),
                np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))


def flat_token_codes(content, doc_ids: np.ndarray,
                     stopwords: frozenset[str] = ENGLISH_STOP_WORDS,
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Arrow-native invert-stage tokenizer: ``content`` is a pyarrow
    string Array/ChunkedArray; returns ``(term_codes, uniques, tdocs,
    tpos)`` bit-identical to ``pd.factorize(pd.Series(flat_tokens(...)
    [0]), sort=True)`` + the flat doc/pos arrays (parity asserted in
    tests/test_analysis.py, incl. unicode fuzz).

    Why this exists (the 100 TB invert hot path): the pandas path
    materializes every token as a Python object (``str.findall`` loops
    re.findall per row; ``np.isin`` compares object strings), which is
    memory-bandwidth-bound — measured 2-3x slower than this path, which
    keeps tokenization inside Arrow's C kernels (utf8_lower →
    split_pattern_regex → is_in → dictionary_encode) and only ever
    materializes the DISTINCT vocabulary as Python strings. Python/numpy
    touches int code/doc/pos arrays, never token strings.
    """
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    if len(content) == 0:
        return _EMPTY_CODES
    low = pc.utf8_lower(pc.fill_null(content, ""))
    tok = pc.split_pattern_regex(low, DELIM_RE)
    values = tok.values
    if len(values) == 0:
        return _EMPTY_CODES
    offsets = tok.offsets.to_numpy().astype(np.int64)
    lengths = np.diff(offsets)
    # split artifacts: a leading/trailing delimiter run yields an empty
    # string at the doc edge (and [""] for an empty doc) — mask them so
    # positions count real tokens only, matching findall
    nonempty = pc.greater(pc.binary_length(values), 0)
    ne = nonempty.to_numpy(zero_copy_only=False)
    cs = np.cumsum(ne, dtype=np.int64)
    pre = cs - ne  # nonempty tokens strictly before each flat index
    pos_all = pre - np.repeat(pre[offsets[:-1]], lengths)
    docs_rep = np.repeat(np.asarray(doc_ids, dtype=np.int64), lengths)
    if stopwords:
        stop = pa.array(sorted(stopwords), type=pa.string())
        keep_pa = pc.and_(nonempty, pc.invert(pc.is_in(values, value_set=stop)))
    else:
        keep_pa = nonempty
    kept = pc.filter(values, keep_pa)
    if len(kept) == 0:
        return _EMPTY_CODES
    keep = keep_pa.to_numpy(zero_copy_only=False)
    dict_arr = pc.dictionary_encode(kept)
    codes = np.asarray(dict_arr.indices).astype(np.int64)
    uniq = dict_arr.dictionary
    # factorize(sort=True) parity: sort the (small) dictionary, remap codes
    order = pc.sort_indices(uniq).to_numpy().astype(np.int64)
    inv = np.empty(order.size, dtype=np.int64)
    inv[order] = np.arange(order.size)
    uniques = np.asarray(uniq.take(pa.array(order)).to_pylist(), dtype=object)
    return inv[codes], uniques, docs_rep[keep], pos_all[keep]


from dataclasses import dataclass, field


@dataclass(frozen=True)
class AnalyzerConfig:
    """Pluggable analysis chain (SURVEY.md §2.2 v2 operators).

    Mirrors the reference's configurable analyzer stack as a small config:
      tokenizer: 'standard' ([a-z0-9_]+ runs), 'whitespace', 'keyword',
                 or 'pattern' (custom regex via ``pattern``)
      split_word_delims: WordDelimiterGraphFilter-style camelCase /
                 snake_case splitting (key for code corpora)
      ascii_fold: ASCIIFoldingFilter (NFKD strip diacritics)
      lowercase / stopwords / min_len: LowerCaseFilter, StopFilter,
                 LengthFilter equivalents.
    All steps are vectorized pandas/numpy string ops — no per-token Python.
    """

    tokenizer: str = "standard"
    pattern: str | None = None
    #: HTMLStripCharFilter: runs FIRST (char filters precede tokenization
    #: in the reference's analyzer stack) — see :func:`strip_html`.
    html_strip: bool = False
    #: PatternReplaceCharFilter (u8:lucene/analysis/common/.../pattern/
    #: PatternReplaceCharFilter.java): (regex, replacement) rewrites of
    #: the RAW character stream, applied in declaration order AFTER
    #: html_strip and BEFORE every tokenizer/filter stage — like the
    #: reference, the filter sees original case. Patterns must stay in
    #: the Java∩RE2∩Python-compatible subset so engine and oracle agree.
    char_pattern_replace: tuple[tuple[str, str], ...] = ()
    #: delimiter for tokenizer="path_hierarchy" (PathHierarchyTokenizer:
    #: every ancestor prefix of the path is a token at position 0).
    path_delimiter: str = "/"
    lowercase: bool = True
    ascii_fold: bool = False
    split_word_delims: bool = False
    stopwords: frozenset = field(default=ENGLISH_STOP_WORDS)
    min_len: int = 1
    #: token -> token normalization applied after tokenization (the
    #: SynonymFilter / dictionary-stemmer slot: e.g. {"joins": "join"}).
    #: Applied to the DISTINCT vocabulary then broadcast back — never
    #: per-token Python (SURVEY §2.2's term-dictionary-join design).
    term_map: tuple[tuple[str, str], ...] = ()
    #: algorithmic stemmer applied AFTER the stop filter (Lucene's
    #: EnglishAnalyzer order: LowerCase -> Stop -> PorterStemFilter);
    #: 'porter' is the classic 1980 algorithm (sparklucene.stem),
    #: vocabulary-vectorized.
    stem: str | None = None
    #: KeywordRepeatFilter + stemmer + RemoveDuplicatesTokenFilter
    #: (u8:lucene/analysis/common/.../miscellaneous/KeywordRepeatFilter.java,
    #: RemoveDuplicatesTokenFilter.java — the classic "index both the
    #: surface form and the stem at the same position" chain): with
    #: ``stem_inject=True`` the original token is kept ALONGSIDE its stem
    #: (same position); tokens the stemmer leaves unchanged emit once
    #: (the RemoveDuplicates step). Requires ``stem`` to be set.
    stem_inject: bool = False
    #: PhoneticFilter (Lucene analysis-phonetic): encode tokens with the
    #: named encoder ('soundex'). With phonetic_inject=True (Solr's
    #: default) the original token AND its code are both emitted at the
    #: same position; False replaces the token. Applied after stemming,
    #: before ngram/shingle — vocabulary-vectorized like every filter.
    phonetic: str | None = None
    phonetic_inject: bool = True
    #: CommonGramsFilter (u8:lucene/analysis/common/.../commongrams/
    #: CommonGramsFilter.java): for each adjacent token pair where EITHER
    #: member is in this set, ALSO emit the combined token "a_b" at the
    #: first member's position. Runs on the pre-stop stream (the classic
    #: chain: tokenizer -> CommonGrams -> StopFilter, so common-word
    #: unigrams drop but the bigrams survive — phrase-speed indexing for
    #: stopword-heavy phrases like "the who"). "_" is a tokenizer-legal
    #: char, so bigrams live in the ordinary term dictionary.
    common_grams: frozenset[str] | None = None
    #: NGramTokenFilter (min, max): each token is REPLACED by its char
    #: n-grams, all at the source token's position.
    ngram: tuple[int, int] | None = None
    #: EdgeNGramTokenFilter (min, max): each token is replaced by its
    #: leading-edge grams (search-as-you-type prefixes).
    edge_ngram: tuple[int, int] | None = None
    #: ShingleFilter (min, max): emit unigrams PLUS space-joined word
    #: shingles of consecutive kept tokens (pinned spec: no filler tokens
    #: for stop-word holes; shingle position = first word's position).
    shingle: tuple[int, int] | None = None
    #: ReversedWildcardFilter (u8:solr/core/.../analysis/
    #: ReversedWildcardFilterFactory.java, withOriginal=false form):
    #: every token is REPLACED by its character reversal. Index a
    #: reversed EXTRA field and rewrite leading-wildcard queries onto it
    #: (query.reverse_wildcards) — a leading wildcard then becomes a
    #: PREFIX seek on the reversed sorted dictionary instead of a full
    #: dictionary scan (the reference's leading-wildcard acceleration;
    #: at 100 TB the difference is row-group pruning vs a full
    #: term-dictionary pass). Runs LAST in the chain.
    reverse_tokens: bool = False

    def token_regex(self) -> re.Pattern:
        if self.tokenizer == "standard":
            return TOKEN_RE if self.lowercase else re.compile(r"[A-Za-z0-9_]+")
        if self.tokenizer == "whitespace":
            return re.compile(r"\S+")
        if self.tokenizer == "pattern":
            if not self.pattern:
                raise ValueError("pattern tokenizer needs a pattern")
            return re.compile(self.pattern)
        raise ValueError(f"unknown tokenizer {self.tokenizer}")


STANDARD_ANALYZER = AnalyzerConfig()


def _pretransform(texts: pd.Series, cfg: AnalyzerConfig) -> pd.Series:
    s = texts.fillna("")
    if cfg.html_strip:
        s = strip_html(s)
    for pat, rep in cfg.char_pattern_replace:
        s = s.str.replace(pat, rep, regex=True)
    if cfg.split_word_delims:
        # camelCase / digit boundaries become spaces; underscores split
        s = (s.str.replace(r"([a-z0-9])([A-Z])", r"\1 \2", regex=True)
             .str.replace(r"([A-Za-z])([0-9])", r"\1 \2", regex=True)
             .str.replace("_", " ", regex=False))
    if cfg.ascii_fold:
        s = (s.str.normalize("NFKD")
             .str.encode("ascii", "ignore").str.decode("ascii"))
    if cfg.lowercase:
        s = s.str.translate(_LOWER_SPECIAL).str.lower()
    return s


def _reject_filter_stages(cfg: AnalyzerConfig) -> None:
    """The keyword / path_hierarchy branches emit their tokens directly
    and never reach the post-tokenization filter stages, so a config
    combining them with those stages must fail LOUDLY instead of
    silently ignoring the filters (round-4 advisory). Char-filter
    stages (html_strip / char_pattern_replace / ascii_fold / lowercase
    / split_word_delims) still apply — they run in _pretransform.

    The inherited class-default stop set does NOT count as a requested
    stage: ``AnalyzerConfig(tokenizer="keyword")`` must work without
    ``stopwords=frozenset()`` boilerplate (KeywordTokenizer in the
    reference has no implicit StopFilter either) — only an explicitly
    DIFFERENT stop set marks user intent and fails loudly."""
    active = [name for name, on in (
        ("stopwords", bool(cfg.stopwords)
         and cfg.stopwords != ENGLISH_STOP_WORDS),
        ("min_len", cfg.min_len > 1),
        ("term_map", bool(cfg.term_map)),
        ("stem", bool(cfg.stem)),
        ("common_grams", bool(cfg.common_grams)),
        ("ngram", cfg.ngram is not None),
        ("edge_ngram", cfg.edge_ngram is not None),
        ("shingle", cfg.shingle is not None),
        ("reverse_tokens", cfg.reverse_tokens),
    ) if on]
    if active:
        raise ValueError(
            f"tokenizer={cfg.tokenizer!r} emits terminal tokens and does "
            f"not run the post-tokenization filter chain; drop {active} "
            "from the AnalyzerConfig (e.g. stopwords=frozenset())")


def analyze_flat(texts: pd.Series, doc_ids: np.ndarray, cfg: AnalyzerConfig
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Configurable-analyzer version of :func:`flat_tokens` (same position
    semantics: pre-stop-filter indexes, stop/length gaps preserved)."""
    if cfg.tokenizer == "keyword":
        _reject_filter_stages(cfg)
        s = _pretransform(texts, cfg)
        toks = s.to_numpy(dtype=object)
        docs = np.asarray(doc_ids, dtype=np.int64)
        pos = np.zeros(docs.size, dtype=np.int64)
        keep = np.array([bool(t) for t in toks])
        return toks[keep], docs[keep], pos[keep]
    if cfg.tokenizer == "path_hierarchy":
        _reject_filter_stages(cfg)
        # PathHierarchyTokenizer (u8:lucene/analysis/common/.../path/
        # PathHierarchyTokenizer.java): 'a/b/c' emits 'a', 'a/b',
        # 'a/b/c' — every ancestor prefix, all with position increment
        # 0 after the first (pinned: position 0 for every token), so
        # prefix faceting / drill-down on paths is one term lookup.
        s = _pretransform(texts, cfg)
        delim = cfg.path_delimiter
        out_t: list = []
        out_d: list = []
        for did, val in zip(np.asarray(doc_ids, dtype=np.int64),
                            s.to_numpy(dtype=object)):
            if not val:
                continue
            parts = [p for p in str(val).split(delim) if p]
            acc = None
            for p in parts:
                acc = p if acc is None else acc + delim + p
                out_t.append(acc)
                out_d.append(did)
        toks = np.asarray(out_t, dtype=object)
        docs = np.asarray(out_d, dtype=np.int64)
        return toks, docs, np.zeros(docs.size, dtype=np.int64)
    s = _pretransform(texts, cfg)
    token_lists = s.str.findall(cfg.token_regex())
    lengths = token_lists.str.len().to_numpy(dtype=np.int64)
    if lengths.sum() == 0:
        return (np.empty(0, dtype=object), np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64))
    flat = np.concatenate([np.asarray(t, dtype=object)
                           for t in token_lists.to_numpy()])
    docs = np.repeat(np.asarray(doc_ids, dtype=np.int64), lengths)
    ends = np.cumsum(lengths)
    pos = np.arange(ends[-1], dtype=np.int64) - np.repeat(ends - lengths, lengths)
    if cfg.term_map:
        # map the distinct vocabulary once, then take[] back — O(V) dict
        # probes instead of O(tokens)
        codes, uniques = pd.factorize(pd.Series(flat))
        tm = dict(cfg.term_map)
        mapped = np.array([tm.get(u, u) for u in uniques], dtype=object)
        flat = mapped[codes]
    if cfg.common_grams:
        flat, docs, pos = _with_common_grams(flat, docs, pos,
                                             cfg.common_grams)
    keep = np.ones(flat.size, dtype=bool)
    if cfg.stopwords:
        stop_arr = np.array(sorted(cfg.stopwords), dtype=object)
        keep &= ~np.isin(flat, stop_arr)
    if cfg.min_len > 1:
        keep &= np.array([len(t) >= cfg.min_len for t in flat])
    flat, docs, pos = flat[keep], docs[keep], pos[keep]
    if cfg.stem:
        from sparklucene.stem import resolve_stemmer, stem_vocab
        if cfg.stem_inject:
            st = resolve_stemmer(cfg.stem)
            flat, docs, pos = _vocab_expand(
                flat, docs, pos,
                lambda t: [t, st(t)] if st(t) != t else [t])
        else:
            flat = stem_vocab(flat, cfg.stem)
    if cfg.phonetic:
        from sparklucene.stem import resolve_phonetic
        enc = resolve_phonetic(cfg.phonetic)
        if cfg.phonetic_inject:
            flat, docs, pos = _vocab_expand(
                flat, docs, pos,
                lambda t: [t, enc(t)] if enc(t) != t else [t])
        else:
            flat, docs, pos = _vocab_expand(flat, docs, pos,
                                            lambda t: [enc(t)])
    if cfg.ngram:
        flat, docs, pos = _vocab_expand(
            flat, docs, pos,
            lambda t: _char_ngrams(t, *cfg.ngram))
    if cfg.edge_ngram:
        flat, docs, pos = _vocab_expand(
            flat, docs, pos,
            lambda t: _edge_ngrams(t, *cfg.edge_ngram))
    if cfg.shingle:
        flat, docs, pos = _with_shingles(flat, docs, pos, *cfg.shingle)
    if cfg.reverse_tokens:
        # per-token substitution over the DISTINCT vocabulary — stream
        # (doc, pos) order is untouched, so stream_sorted stays valid
        codes, uniques = pd.factorize(pd.Series(flat))
        rev = np.array([u[::-1] for u in uniques], dtype=object)
        flat = rev[codes]
    return flat, docs, pos


def _char_ngrams(t: str, lo: int, hi: int) -> list[str]:
    return [t[i:i + n] for n in range(lo, hi + 1)
            for i in range(0, len(t) - n + 1)]


def _edge_ngrams(t: str, lo: int, hi: int) -> list[str]:
    return [t[:n] for n in range(lo, min(hi, len(t)) + 1)]


def _vocab_expand(flat: np.ndarray, docs: np.ndarray, pos: np.ndarray,
                  fn) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Replace each token by fn(token) grams — fn runs only on the
    DISTINCT vocabulary; the stream expansion is a pure numpy gather."""
    if flat.size == 0:
        return flat, docs, pos
    codes, uniques = pd.factorize(pd.Series(flat))
    gram_lists = [fn(u) for u in uniques]
    gram_flat = np.array([g for gl in gram_lists for g in gl], dtype=object)
    lens = np.array([len(gl) for gl in gram_lists], dtype=np.int64)
    goff = np.concatenate(([0], np.cumsum(lens)[:-1]))
    counts = lens[codes]
    total = int(counts.sum())
    if total == 0:
        return (np.empty(0, dtype=object), np.empty(0, np.int64),
                np.empty(0, np.int64))
    run_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    within = np.arange(total, dtype=np.int64) - np.repeat(run_starts, counts)
    idx = np.repeat(goff[codes], counts) + within
    return gram_flat[idx], np.repeat(docs, counts), np.repeat(pos, counts)


def _with_shingles(flat: np.ndarray, docs: np.ndarray, pos: np.ndarray,
                   lo: int, hi: int
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unigrams + space-joined shingles of lo..hi consecutive kept tokens
    (same-doc windows; the stream arrives in (doc, pos) order)."""
    out_t, out_d, out_p = [flat], [docs], [pos]
    s = flat.astype(str)  # numpy str dtype enables vectorized concat
    for n in range(max(2, lo), hi + 1):
        if flat.size < n:
            break
        joined = s[: flat.size - n + 1]
        for j in range(1, n):
            joined = np.char.add(np.char.add(joined, " "),
                                 s[j: flat.size - n + 1 + j])
        same_doc = docs[: flat.size - n + 1] == docs[n - 1:]
        out_t.append(joined[same_doc].astype(object))
        out_d.append(docs[: flat.size - n + 1][same_doc])
        out_p.append(pos[: flat.size - n + 1][same_doc])
    return (np.concatenate(out_t), np.concatenate(out_d),
            np.concatenate(out_p))


def _with_common_grams(flat: np.ndarray, docs: np.ndarray, pos: np.ndarray,
                       common: frozenset[str]
                       ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unigrams + "a_b" bigrams for same-doc adjacent pairs where either
    member is a common word (bigram at the first member's position)."""
    if flat.size < 2:
        return flat, docs, pos
    is_c = np.isin(flat, np.array(sorted(common), dtype=object))
    pair_ok = (docs[:-1] == docs[1:]) & (is_c[:-1] | is_c[1:])
    if not pair_ok.any():
        return flat, docs, pos
    s = flat.astype(str)
    joined = np.char.add(np.char.add(s[:-1], "_"), s[1:])[pair_ok]
    return (np.concatenate((flat, joined.astype(object))),
            np.concatenate((docs, docs[:-1][pair_ok])),
            np.concatenate((pos, pos[:-1][pair_ok])))


def analyze_text(text: str, cfg: AnalyzerConfig) -> list[str]:
    """Single-string convenience (query-side analysis)."""
    toks, _, _ = analyze_flat(pd.Series([text]), np.array([0]), cfg)
    return list(toks)


def token_stream_df(df, text_col: str, id_col: str = "doc_id",
                    cfg: AnalyzerConfig | None = None):
    """Analysis introspection as a TABLE — Solr's field-analysis handler
    (public knowledge: ``u8:solr/core/.../handler/
    FieldAnalysisRequestHandler.java``, the admin/analysis screen) run
    distributed: every document's post-filter token stream with its
    position (pre-stop indexes, gaps preserved — exactly what the
    indexer sees). Returns DataFrame(doc_id, pos, term).

    Scale shape: one Arrow-batched pass (``mapInPandas``) over the text
    column — narrow, no shuffle; downstream aggregations see a
    long-format stream they can partial-aggregate.
    """
    import pandas as _pd

    cfg = cfg or AnalyzerConfig()
    sdf = df.select(id_col, text_col)

    def gen(batches):
        for pdf in batches:
            flat, docs, pos = analyze_flat(
                pdf[text_col].fillna("").astype(str),
                pdf[id_col].to_numpy(dtype=np.int64), cfg)
            yield _pd.DataFrame({"doc_id": docs, "pos": pos,
                                 "term": flat})

    return sdf.mapInPandas(gen, "doc_id long, pos long, term string")


def make_tokenize_udf(stopwords: frozenset[str] = ENGLISH_STOP_WORDS):
    """pandas_udf: content string -> array<string> of analyzed tokens."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def tokenize(content: pd.Series) -> pd.Series:
        return tokenize_series(content, stopwords)

    return tokenize


def tokenize_sql(col: str, stop: frozenset[str] = ENGLISH_STOP_WORDS) -> str:
    """DuckDB lateral-unnest-ready expression pieces used by oracle SQL."""
    return f"regexp_extract_all(lower({col}), '{TOKEN_RE_SQL}')"


def stoplist_sql(stop: frozenset[str] = ENGLISH_STOP_WORDS) -> str:
    return "(" + ", ".join(f"'{w}'" for w in sorted(stop)) + ")"
