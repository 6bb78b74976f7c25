"""PII redaction for training-corpus preparation (SURVEY §2.8 P20).

The reference engine stores crawled page text verbatim (spidey
``Indexer.java`` writes raw ``txt_docs/<id>.txt``); redaction is one of the
mandated beyond-reference training-data operators. The whole pass is a
chain of JVM ``regexp_replace`` column expressions plus ``regexp_count``
per type — one scan over the corpus, whole-stage codegen, no Python, no
shuffle — so at 100 TB it rides the same parquet scan as tokenization.

Dialect note: every pattern sticks to the regex subset with identical
semantics in Java (Spark) and RE2 (the DuckDB oracle): character classes,
bounded/unbounded repetition, ``\\b`` word boundaries, plain groups — no
backreferences, no lookaround. Parity is pinned by the ``pii_redact_docs``
oracle entry and tests/test_pipeline_ops.py.

Match counts are computed per type on the ORIGINAL text (independent
regexp_count per pattern), while redaction applies the patterns
sequentially in ``PII_PATTERNS`` order — a string that two patterns both
match (e.g. a 32-hex-char email local part) is rewritten by the earlier
one; both engines apply the same order, so the oracle still pins the
behavior exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in this order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+\d{1,2}-\d{3}-\d{4}-\d{4}", "<PHONE>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IPV4>"),
    ("secret", r"\b[0-9a-f]{32,}\b", "<SECRET>"),
]


def redact_pii(col: Column | str) -> Column:
    """Text with every PII_PATTERNS occurrence replaced by its tag."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_counts(col: Column | str) -> list[Column]:
    """One ``n_<type>`` int column per PII type, counted on the raw text."""
    c = F.col(col) if isinstance(col, str) else col
    return [F.regexp_count(c, F.lit(pat)).alias(f"n_{name}")
            for name, pat, _ in PII_PATTERNS]


def redact_pii_df(df: DataFrame, text_col: str = "content",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, redacted text, per-type counts) — the corpus-cleaning shape."""
    return df.select(id_col,
                     redact_pii(text_col).alias(text_col),
                     *pii_counts(text_col))
