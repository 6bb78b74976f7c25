"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Input shape mandated by BASELINE.json input_hint: an Iceberg-style table of
source-code repositories with columns
``(repo:string, path:string, commit:string, lang:string, content:string)``.
No external data — everything is generated from ``seed`` with numpy's
PCG64, so the same (seed, n_docs) always yields byte-identical content (the
per-row ``content_sha256`` invariant is testable).

Content properties engineered to exercise the analysis chain (SURVEY.md §2.2)
and the skew handling (SURVEY.md §4 custom #1):

* identifiers in camelCase and snake_case (code-profile splitting),
* language keywords (``import``, ``return``, ``def``, ``class``, ``for``)
  drawn at Zipf-like frequency → real hot-term skew,
* a few docs embed the reference query phrases verbatim (``merge sort``,
  ``sorting algorithms`` — the reference's manual-harness query,
  QueryResultsFetcher.java:46-106),
* sprinkled Arabic comment tokens (codepoints 0x0600–0x06E0 → passthrough),
* occasional >30-char tokens (body-profile truncation).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

LANGS = ("java", "py", "ts", "c", "go")

_KEYWORDS = np.array(
    ["import", "return", "def", "class", "for", "if", "else", "while",
     "break", "continue", "public", "static", "void", "int", "string",
     "func", "var", "let", "const", "new"])
# Zipf-ish keyword weights (rank^-1 normalized)
_KW_W = (1.0 / np.arange(1, len(_KEYWORDS) + 1))
_KW_W /= _KW_W.sum()

_NOUNS = ["sort", "merge", "search", "tree", "hash", "map", "list", "array",
          "node", "graph", "queue", "stack", "heap", "index", "token",
          "parser", "buffer", "stream", "cache", "batch", "shard", "block",
          "page", "rank", "score", "term", "doc", "file", "path", "edge"]
_VERBS = ["get", "set", "build", "parse", "read", "write", "find", "insert",
          "delete", "update", "scan", "split", "join", "encode", "decode",
          "compress", "flush", "load", "store", "walk"]

_ARABIC_TOKENS = ["كتاب", "بحث", "فهرس", "نص"]

_PHRASE_SNIPPETS = [
    "merge sort implementation notes",
    "sorting algorithms benchmark suite",
    "binary search over sorted arrays",
    "hash map lookup fast path",
]

_LONG_TOKEN = "extraordinarilyLongIdentifierNameThatExceedsThirtyChars"


def _identifier(rng: np.random.Generator, style: str) -> str:
    v = _VERBS[int(rng.integers(len(_VERBS)))]
    n1 = _NOUNS[int(rng.integers(len(_NOUNS)))]
    n2 = _NOUNS[int(rng.integers(len(_NOUNS)))]
    if style == "camel":
        return v + n1.capitalize() + n2.capitalize()
    return f"{v}_{n1}_{n2}"


def link_targets(doc_idx: int, n_docs: int) -> list[int]:
    """Deterministic cross-doc import targets of doc `doc_idx` (S7 link
    graph analog for code: `import` statements referencing other files).
    Self-references are generated occasionally ON PURPOSE — the extractor
    must drop them (Indexer.java:357 excludes self-links)."""
    if n_docs <= 1:
        return []
    k = doc_idx % 4
    return [(doc_idx * 7 + 31 * j + 1) % n_docs for j in range(k)]


def _doc_content(rng: np.random.Generator, doc_idx: int, lang: str,
                 n_docs: int = 0) -> str:
    n_tokens = int(rng.integers(50, 201))
    style = "snake" if lang in ("py", "c") else "camel"
    parts: list[str] = []
    # deterministic specials
    if doc_idx % 37 == 0:
        parts.append("// " + _PHRASE_SNIPPETS[doc_idx % len(_PHRASE_SNIPPETS)])
    if doc_idx % 53 == 0:
        parts.append("// تعليق " + _ARABIC_TOKENS[doc_idx % len(_ARABIC_TOKENS)])
    if doc_idx % 97 == 0:
        parts.append(_LONG_TOKEN + " = 1;")
    for t in link_targets(doc_idx, n_docs):
        parts.append(f"import mod{t % 11}.file{t}")
    while sum(len(p.split()) for p in parts) < n_tokens:
        r = rng.random()
        if r < 0.35:
            kw = str(rng.choice(_KEYWORDS, p=_KW_W))
            parts.append(kw)
        elif r < 0.75:
            parts.append(_identifier(rng, style))
        elif r < 0.9:
            parts.append(f"{_identifier(rng, style)}({_NOUNS[int(rng.integers(len(_NOUNS)))]})")
        else:
            parts.append(f"x{int(rng.integers(1000))} = {int(rng.integers(100))};")
    return " ".join(parts)


def generate_corpus_pdf(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Generate the corpus as a pandas DataFrame (driver-side for tests;
    see generate_corpus_df for the distributed path)."""
    rows = []
    for i in range(n_docs):
        rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + i))
        repo = f"org{i % 7}/repo{i % 23}"
        lang = LANGS[i % len(LANGS)]
        path = f"src/mod{i % 11}/File{i}.{lang}"
        commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
        content = _doc_content(rng, i, lang, n_docs)
        rows.append((repo, path, commit, lang, content))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def generate_corpus_df(spark, n_docs: int, seed: int = 42, partitions: int = 32,
                       with_doc_id: bool = False):
    """Distributed generation: each partition generates its id-range with a
    per-doc seeded RNG (identical rows regardless of partitioning) via
    mapInPandas — scales to any n_docs without driver materialization.
    with_doc_id=True adds the dense doc_id (= generation index) so builds
    can skip assign_doc_ids; rows then arrive doc-range partitioned, the
    layout the segment build wants."""
    from pyspark.sql.types import StructType, StructField, StringType, LongType

    fields = [
        StructField("repo", StringType()), StructField("path", StringType()),
        StructField("commit", StringType()), StructField("lang", StringType()),
        StructField("content", StringType()),
    ]
    if with_doc_id:
        fields = [StructField("doc_id", LongType())] + fields
    schema = StructType(fields)

    def gen(iterator):
        for pdf in iterator:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                out_rows = []
                for i in range(lo, hi):
                    rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + i))
                    repo = f"org{i % 7}/repo{i % 23}"
                    lang = LANGS[i % len(LANGS)]
                    path = f"src/mod{i % 11}/File{i}.{lang}"
                    commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
                    row = (repo, path, commit, lang,
                           _doc_content(rng, i, lang, n_docs))
                    out_rows.append((i, *row) if with_doc_id else row)
                yield pd.DataFrame(out_rows, columns=schema.fieldNames())

    step = max(1, n_docs // partitions)
    ranges = [(lo, min(lo + step, n_docs)) for lo in range(0, n_docs, step)]
    rdf = spark.createDataFrame(ranges, "lo long, hi long").repartition(len(ranges))
    return rdf.mapInPandas(gen, schema=schema)
