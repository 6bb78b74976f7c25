"""Tokenizer / analysis chain (SURVEY.md §2.2, F1–F7).

Reproduces the reference's two asymmetric analyzers exactly, plus a `code`
profile extending the index analyzer with camelCase/snake_case identifier
splitting for source-code corpora (BASELINE.json north_star).

Reference semantics being reproduced (citations into /root/reference):

* F1 index-side split — ``content.split("[^\\\\s\\w\\u0600-\\u06FF]|[\\\\]")``
  (src/indexer/Indexer.java:418 body, :389 title). Net effect: a delimiter is
  every char NOT in ``[A-Za-z0-9_] ∪ [U+0600–U+06FF]`` (the literal backslash
  and ``s`` the class shields are re-added / subsumed). Empty tokens are
  removed *in place*, so positions are ordinals in the filtered stream
  (Indexer.java:439-447).
* F2 query-side split — ``text.split("[\\s\\W]")`` with Java ASCII ``\\w``
  (query_processor/.../utils/Stemmer.java:34): only ``[A-Za-z0-9_]`` runs
  survive; Arabic is split away on the query side.
* F3 Arabic detection — any codepoint in ``[0x0600, 0x06E0]`` → token is
  neither lowercased nor stemmed (Indexer.java:56-64; note the detection
  range top 0x06E0 is narrower than the split range top 0x06FF — a faithful
  quirk).
* F4/F5 — non-Arabic tokens: body truncates to 30 chars BEFORE lowercase+stem
  (Indexer.java:441); title lowercases then truncates to 500 then stems
  (Indexer.java:396-397); query filters stopwords on the RAW pre-lowercase
  token (Stemmer.java:41), then lowercases, truncates to 500, stems
  (Stemmer.java:47-51).
* F6 — Snowball English (Porter2) stemming, see porter2.py.
* F7 — stopword filtering is query-side ONLY (index-side call commented out,
  Indexer.java:442).

All functions here are plain Python over Arrow-batched pandas Series — they
are wrapped into vectorized pandas UDFs by ``spark_udfs()`` so executors never
run per-row Python UDF dispatch. The Porter2 memo dict makes the per-token
cost a dict hit for hot vocabularies (code corpora: ~1e5 distinct terms vs
1e12 files, so the memo hit-rate approaches 1 at scale).
"""

from __future__ import annotations

import re
from typing import Callable, Iterable

import pandas as pd

from .porter2 import MemoStemmer
from .stopwords import STOPWORDS_EN

# F1: net delimiter = anything outside word chars + Arabic block.
_INDEX_SPLIT = re.compile(r"[^A-Za-z0-9_؀-ۿ]+")
# F2: Java ASCII \w — Arabic splits away at query time.
_QUERY_SPLIT = re.compile(r"[^A-Za-z0-9_]+")
# F3: detection range (narrower than the split range; faithful quirk).
_ARABIC = re.compile(r"[؀-۠]")
# Identifier sub-token parts: acronym runs, Capitalized runs, lowercase runs,
# digit runs. ``HTTPServer2`` → HTTP, Server, 2; ``parse_json`` → parse, json.
_IDENT_PART = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z]*|[a-z]+|[0-9]+")

_stemmer = MemoStemmer()


def _stem_token(raw: str, trunc: int) -> str:
    """Truncate→(lowercase→stem | Arabic passthrough) for one body token."""
    tok = raw[:trunc]
    if _ARABIC.search(tok):
        return tok
    return _stemmer(tok.lower())


def tokenize_body(text: str) -> list[str]:
    """Index-side body analyzer (F1,F3,F4,F5@30,F6; no stopwords)."""
    if not text:
        return []
    return [_stem_token(t, 30) for t in _INDEX_SPLIT.split(text) if t]


def tokenize_title(text: str) -> list[str]:
    """Index-side title/path analyzer: lowercase→truncate 500→stem
    (Indexer.java:396-400); Arabic passthrough."""
    if not text:
        return []
    out = []
    for t in _INDEX_SPLIT.split(text):
        if not t:
            continue
        if _ARABIC.search(t):
            out.append(t)
        else:
            out.append(_stemmer(t.lower()[:500]))
    return out


def tokenize_query(text: str) -> list[str]:
    """Query-side analyzer (F2,F7,F4,F5@500,F6).

    Stopwords are checked on the RAW pre-lowercase token — ``The`` survives
    (not in the lowercase list), ``the`` is dropped: a faithful reference
    asymmetry (Stemmer.java:41)."""
    if not text:
        return []
    out = []
    for t in _QUERY_SPLIT.split(text):
        if not t or t in STOPWORDS_EN:
            continue
        out.append(_stemmer(t.lower()[:500]))
    return out


def split_identifier(token: str) -> list[str]:
    """camelCase / snake_case / digit-boundary sub-tokens of one identifier.

    snake_case parts arrive pre-split only at ``_``? No — ``_`` is a word
    char in F1, so snake_case survives as one raw token; this function is
    where it splits. Arabic tokens pass through unsplit."""
    if _ARABIC.search(token):
        return [token]
    parts = _IDENT_PART.findall(token)
    return parts if parts else [token]


# raw identifier → analyzed sub-token list, memoized whole (split +
# truncate + lower + stem collapse to ONE dict hit for repeated tokens —
# code corpora repeat identifiers constantly, so the hit rate → 1 and the
# hot path cost is a hash lookup instead of ~2.4µs of regex+stem dispatch)
_CODE_MEMO: dict[str, list[str]] = {}


def tokenize_code(text: str) -> list[str]:
    """`code` profile: F1 split, then identifier sub-token split, then the
    body truncate/lower/stem chain per sub-token. Positions are ordinals in
    this final stream."""
    if not text:
        return []
    out = []
    memo = _CODE_MEMO
    for raw in _INDEX_SPLIT.split(text):
        if not raw:
            continue
        cached = memo.get(raw)
        if cached is None:
            cached = [_stem_token(part, 30) for part in split_identifier(raw)]
            if len(memo) < 1_000_000:
                memo[raw] = cached
        out.extend(cached)
    return out


def tokenize_code_raw(text: str) -> list[str]:
    """`code` profile without stemming/lowercasing — the snippet token
    stream (reference keeps the unstemmed stream in txt_docs/<id>.txt,
    Indexer.java:426-435)."""
    if not text:
        return []
    out = []
    for raw in _INDEX_SPLIT.split(text):
        if not raw:
            continue
        out.extend(split_identifier(raw))
    return out


# Simple lowercase-split profile: SQL-expressible (DuckDB oracle parity for
# the driver's correctness gate — no stemmer exists in the oracle engine).
def tokenize_simple(text: str) -> list[str]:
    if not text:
        return []
    return [t for t in _QUERY_SPLIT.split(text.lower()) if t]


PROFILES: dict[str, Callable[[str], list[str]]] = {
    "body": tokenize_body,
    "title": tokenize_title,
    "query": tokenize_query,
    "code": tokenize_code,
    "code_raw": tokenize_code_raw,
    "simple": tokenize_simple,
}


def tokenize_series(texts: pd.Series, profile: str = "code") -> pd.Series:
    """Arrow-batch tokenization: Series[str] → Series[list[str]]."""
    fn = PROFILES[profile]
    return texts.map(lambda t: fn(t) if isinstance(t, str) else [])


def analyze_query(text: str) -> tuple[list[str], list[list[str]]]:
    """F9 quote-aware parse + F2 analysis → (bag_terms, phrases).

    Reference pads quotes then splits outside quotes
    (ApiController.java:84-109); quoted runs become phrase term-lists, the
    rest the free bag of words."""
    text = text.replace('"', ' " ')
    parts = re.split(r'"', text)
    words: list[str] = []
    phrases: list[list[str]] = []
    for i, chunk in enumerate(parts):
        toks = tokenize_query(chunk)
        if i % 2 == 1:  # inside quotes
            if toks:
                phrases.append(toks)
        else:
            words.extend(toks)
    return words, phrases


class TokenIdEncoder:
    """Worker-local analyzed-token interner: text → np.int64 token-id array.

    The per-token hot path is ONE dict hit on the raw token (the whole
    analysis chain — identifier split, truncate, lowercase, Porter2 — is
    memoized as a tuple of interned ids) + a C-level list.extend. Everything
    downstream of this (tf, positions, grouping) runs as numpy kernels over
    the id arrays in build_partials, so no per-token python survives
    anywhere in the build. Code corpora repeat identifiers constantly, so
    the memo hit rate → 1 (same argument as _CODE_MEMO above).

    Ids are assigned per worker process; they never leave the worker —
    partial rows carry term STRINGS (via ``term_of``), so cross-worker
    agreement is never needed.
    """

    _MAX_MEMO = 1_000_000

    def __init__(self, profile: str = "code"):
        if profile == "code":
            self._split = _INDEX_SPLIT
            self._pre = None
            self._analyze = lambda raw: [
                _stem_token(p, 30) for p in split_identifier(raw)]
        elif profile == "body":
            self._split = _INDEX_SPLIT
            self._pre = None
            self._analyze = lambda raw: [_stem_token(raw, 30)]
        elif profile == "simple":
            self._split = _QUERY_SPLIT
            self._pre = str.lower
            self._analyze = lambda raw: [raw]
        elif profile == "title":
            # lowercase→truncate 500→stem; Arabic passthrough
            # (Indexer.java:396-400 — order differs from body's 30-truncate)
            self._split = _INDEX_SPLIT
            self._pre = None
            self._analyze = lambda raw: (
                [raw] if _ARABIC.search(raw)
                else [_stemmer(raw.lower()[:500])])
        elif profile == "code_raw":
            # unstemmed snippet stream (Indexer.java:426-435)
            self._split = _INDEX_SPLIT
            self._pre = None
            self._analyze = split_identifier
        elif profile == "query":
            # raw-pre-lowercase stopword check (Stemmer.java:41), then
            # lowercase→truncate 500→stem
            self._split = _QUERY_SPLIT
            self._pre = None
            self._analyze = lambda raw: (
                [] if raw in STOPWORDS_EN
                else [_stemmer(raw.lower()[:500])])
        else:
            raise ValueError(f"no id-encoder for profile {profile!r}"
                             f" (known: {sorted(PROFILES)})")
        self.vocab: dict[str, int] = {}
        self.rev: list[str] = []
        self._memo: dict[str, tuple[int, ...]] = {}

    def _intern(self, term: str) -> int:
        tid = self.vocab.get(term)
        if tid is None:
            tid = len(self.rev)
            self.vocab[term] = tid
            self.rev.append(term)
        return tid

    def _ids_of_raw(self, raw: str) -> tuple[int, ...]:
        got = self._memo.get(raw)
        if got is None:
            got = tuple(self._intern(t) for t in self._analyze(raw) if t)
            if len(self._memo) < self._MAX_MEMO:
                self._memo[raw] = got
        return got

    def encode(self, text: str):
        """text → np.int64 array of analyzed-token ids (position order)."""
        import numpy as np
        if not isinstance(text, str) or not text:
            return np.empty(0, dtype=np.int64)
        if self._pre is not None:
            text = self._pre(text)
        out: list[int] = []
        ext = out.extend
        memo_get = self._memo.get
        ids_of = self._ids_of_raw
        for raw in self._split.split(text):
            if raw:
                got = memo_get(raw)
                ext(got if got is not None else ids_of(raw))
        return np.array(out, dtype=np.int64)

    def encode_terms(self, terms: Iterable[str]):
        """Analyzed token strings → id array (for title/important sets)."""
        import numpy as np
        return np.array([self._intern(t) for t in terms], dtype=np.int64)

    def term_of(self, tid: int) -> str:
        return self.rev[tid]


def spark_udfs():
    """Vectorized pandas UDF factory (imported lazily so pure-Python tests
    don't need a JVM). Returns {profile: pandas_udf} each mapping a string
    column to array<string> of analyzed tokens."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    udfs = {}
    for name in PROFILES:
        def make(profile: str):
            @pandas_udf(ArrayType(StringType()))
            def _udf(s: pd.Series) -> pd.Series:
                return tokenize_series(s, profile)

            return _udf

        udfs[name] = make(name)
    return udfs
