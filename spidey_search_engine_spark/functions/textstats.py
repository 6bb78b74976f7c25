"""Text-analysis functions for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All are single-pass column expressions or Arrow-batched pandas UDFs —
designed to run as cheap projections inside the same scan that feeds the
index build (no extra shuffle)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType

# tiny per-language marker vocabularies (top function words) — a pragmatic
# n-gram-free heuristic; deterministic and fully column-expressible
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "it", "with"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "una", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"],
}

STOPWORD_SAMPLE = LANG_MARKERS["en"]


def _tokens(text_col):
    return F.filter(F.split(F.lower(text_col), "[^a-z0-9_]+"),
                    lambda x: x != F.lit(""))


def with_token_count(df: DataFrame, text_col: str = "content",
                     out: str = "n_tokens") -> DataFrame:
    """Whitespace/punct token count (the BPE-ish regex variant is
    bpe_token_estimate below)."""
    return df.withColumn(out, F.size(_tokens(F.col(text_col))).cast("long"))


def with_bpe_token_estimate(df: DataFrame, text_col: str = "content",
                            out: str = "n_bpe_est") -> DataFrame:
    """BPE-ish subword count estimate: split on whitespace AND intra-word
    transitions (letter/digit/punct boundaries, camelCase humps), the
    classic GPT-2-style pre-tokenizer shape, via one regexp count. The
    pattern is lookahead-free so RE2-based oracles (DuckDB) can mirror it."""
    pat = r"[A-Z]?[a-z]+|[A-Z]+|[0-9]{1,3}|[^A-Za-z0-9\s]"
    return df.withColumn(
        out, F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        .cast("long"))


def with_quality_score(df: DataFrame, text_col: str = "content") -> DataFrame:
    """Length/punct/stopword-ratio quality features + a composite [0,1]
    score (monotone, documented weights — not learned)."""
    toks = _tokens(F.col(text_col))
    n_tok = F.size(toks)
    text_len = F.length(F.col(text_col))
    alpha = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]", ""))
    punct = F.length(F.regexp_replace(F.col(text_col), "[^!-/:-@\\[-`{-~]", ""))
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(STOPWORD_SAMPLE)))
    d = (df.withColumn("n_tokens", n_tok.cast("long"))
         .withColumn("alpha_ratio", alpha / F.greatest(text_len, F.lit(1)))
         .withColumn("punct_ratio", punct / F.greatest(text_len, F.lit(1)))
         .withColumn("stopword_ratio",
                     stop_hits / F.greatest(n_tok, F.lit(1)).cast("double"))
         .withColumn("avg_token_len",
                     (alpha / F.greatest(n_tok, F.lit(1)).cast("double"))))
    quality = (
        F.least(F.col("n_tokens") / 50.0, F.lit(1.0)) * 0.3
        + F.col("alpha_ratio") * 0.3
        + (1 - F.least(F.col("punct_ratio") * 4, F.lit(1.0))) * 0.2
        + F.least(F.col("stopword_ratio") * 5, F.lit(1.0)) * 0.2)
    return d.withColumn("quality_score", quality)


def with_lang_id(df: DataFrame, text_col: str = "content",
                 out: str = "lang_pred") -> DataFrame:
    """Marker-word language ID: argmax of per-language hit counts; 'und'
    when no marker hits."""
    toks = _tokens(F.col(text_col))

    def hits(ws):
        # NB: a default-arg lambda would look two-arity to F.filter (which
        # then passes the element index as the second arg) — use a closure
        return F.size(F.filter(toks, lambda x: x.isin(ws)))

    hit_cols = [hits(ws).alias(f"_hits_{lang}")
                for lang, ws in LANG_MARKERS.items()]
    d = df.select("*", *hit_cols)
    best = F.greatest(*[F.col(f"_hits_{lang}") for lang in LANG_MARKERS])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in LANG_MARKERS:
        pred = pred.when(F.col(f"_hits_{lang}") == best, F.lit(lang))
    d = d.withColumn(out, pred)
    return d.drop(*[f"_hits_{lang}" for lang in LANG_MARKERS])


def with_fingerprint(df: DataFrame, text_col: str = "content",
                     out: str = "fingerprint", window: int = 5,
                     hash_expr=None) -> DataFrame:
    """Winnowing-style document fingerprint: min hash over token
    `window`-grams (a 1-permutation MinHash — stable under whitespace
    normalization, cheap enough to compute inline). `hash_expr` defaults to
    JVM xxhash64; the oracle profile injects the SQL-expressible polynomial
    hash (functions/hashing.py) so DuckDB verifies the same math."""
    h = hash_expr or F.xxhash64
    toks = _tokens(F.col(text_col))
    grams = F.transform(F.sequence(F.lit(0), F.greatest(F.size(toks) - window,
                                                        F.lit(0))),
                        lambda i: h(F.concat_ws(" ",
                                                F.slice(toks, i + 1, window))))
    return df.withColumn(out, F.array_min(grams))
