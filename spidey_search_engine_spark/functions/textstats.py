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
    # array_remove, not filter(lambda): HOF lambdas evaluate interpreted
    # per element (CodegenFallback) — measured 2.1x slower for this
    # identical-semantics empty-string strip
    return F.array_remove(F.split(F.lower(text_col), "[^a-z0-9_]+"), "")


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


# ---------------------------------------------------------------------------
# P39 — Gopher-style repetition signals (Rae et al. 2021, §A1.1)
# ---------------------------------------------------------------------------

def _token_ngrams(toks, n: int):
    """Space-joined token n-grams, built by folding n-1 zip_with steps
    against argument-level shifted slices of `toks` (incomplete tail
    grams null out through concat's NULL propagation and are filtered).

    WHY NOT transform(sequence(...), i -> array_join(slice(toks, i, n)))?
    An outer expression CAPTURED inside a higher-order-function lambda is
    re-evaluated on EVERY element invocation — that formulation re-splits
    the whole document once per gram, O(L^2) per doc (measured: the
    expression-eval blowup froze a 500-doc batch for minutes). zip_with
    takes its arrays as ARGUMENTS, evaluated once per row; the lambda
    below touches only its own element variables."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    grams = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1,
                          F.greatest(F.size(toks) - k, F.lit(0)))
        grams = F.zip_with(grams, shifted,
                           lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(grams, lambda x: x.isNotNull())


def _run_stats_init():
    # built lazily: F.lit needs an active SparkContext, which module
    # import time doesn't have
    return F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("c"),
        F.lit(0).cast("long").alias("n"),
        F.lit(0).cast("long").alias("n_runs"),
        F.lit(0).cast("long").alias("tot_chars"),
        F.lit(0).cast("long").alias("dup_occ_chars"),
        F.lit(0).cast("long").alias("dup_run_chars"),
        F.lit(0).cast("long").alias("best_c"),
        F.lit(0).cast("long").alias("best_chars"),
    )


def _close_run(acc):
    """Fold the just-finished run (acc.prev repeated acc.c times) into the
    best-run maximum: lexicographic (count, count x char-length), so count
    ties resolve to the longest value."""
    cand = acc["c"] * F.length(acc["prev"])
    better = (acc["c"] > acc["best_c"]) | (
        (acc["c"] == acc["best_c"]) & (cand > acc["best_chars"]))
    take = acc["prev"].isNotNull() & better
    return (F.when(take, acc["c"]).otherwise(acc["best_c"]),
            F.when(take, cand).otherwise(acc["best_chars"]))


def _run_stats(arr):
    """struct<n, n_runs, tot_chars, dup_occ_chars, dup_run_chars, best_c,
    best_chars> — every repetition statistic of `arr` from ONE O(len)
    fold over its sorted copy (equal values are adjacent, so runs close
    at inequality boundaries):

      n              total elements          tot_chars  sum of lengths
      n_runs         distinct values
      dup_occ_chars  chars in occurrences beyond each value's first
      dup_run_chars  sum count*len over values occurring >= 2 times
      best_c/chars   most frequent value's count and count*len
                     (ties on count -> longest value)

    Same lambda-capture discipline as _token_ngrams: the array is an
    aggregate ARGUMENT; merge/finish touch only (acc, x). Shuffle-free —
    a pure projection, per-doc state bounded by the doc itself."""
    def merge(acc, x):
        same = x.eqNullSafe(acc["prev"])
        xlen = F.length(x).cast("long")
        nb_c, nb_chars = _close_run(acc)
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["c"] + 1).otherwise(F.lit(1).cast("long"))
            .alias("c"),
            (acc["n"] + 1).alias("n"),
            F.when(same, acc["n_runs"]).otherwise(acc["n_runs"] + 1)
            .alias("n_runs"),
            (acc["tot_chars"] + xlen).alias("tot_chars"),
            F.when(same, acc["dup_occ_chars"] + xlen)
            .otherwise(acc["dup_occ_chars"]).alias("dup_occ_chars"),
            # a run contributes count*len to dup_run_chars once it holds
            # >= 2 occurrences: +2*len when the second arrives, +len after
            F.when(same & (acc["c"] == 1),
                   acc["dup_run_chars"] + 2 * xlen)
            .when(same, acc["dup_run_chars"] + xlen)
            .otherwise(acc["dup_run_chars"]).alias("dup_run_chars"),
            F.when(same, acc["best_c"]).otherwise(nb_c).alias("best_c"),
            F.when(same, acc["best_chars"]).otherwise(nb_chars)
            .alias("best_chars"),
        )

    def finish(acc):
        fb_c, fb_chars = _close_run(acc)
        return F.struct(acc["n"].alias("n"),
                        acc["n_runs"].alias("n_runs"),
                        acc["tot_chars"].alias("tot_chars"),
                        acc["dup_occ_chars"].alias("dup_occ_chars"),
                        acc["dup_run_chars"].alias("dup_run_chars"),
                        fb_c.alias("best_c"),
                        fb_chars.alias("best_chars"))

    return F.aggregate(F.array_sort(arr), _run_stats_init(), merge,
                       finish)


# --- Arrow kernels for the gram-heavy operators ---------------------------
#
# Spark higher-order functions (filter/transform/zip_with lambdas) are
# CodegenFallback: the lambda body is INTERPRETED per element, with
# per-element boxing — measured ~30µs/element on this host, which put the
# pure-expression repetition/decontam/DSIR paths at ~400 docs/s while a
# literal-regex projection does 40k docs/s on the same corpus
# (BENCH_PIPELINE.json). The gram CONSTRUCTION therefore runs in an
# Arrow-batched python kernel (same decision as the index build's
# tokenizer); everything downstream — explode, hash, broadcast join,
# aggregation — stays JVM/codegen. _tokens/_token_ngrams remain the
# column-expression forms for oracle parity and light uses; the kernels
# below are pinned token-for-token equal to them by test.

from .analysis import tokenize_simple as _py_tokens  # noqa: E402
# _py_tokens IS analysis.tokenize_simple — the index's own "simple"
# profile — not a re-implementation: the dictionary's df and these
# kernels' tf must come from the same tokenizer or keyword/gram scores
# silently skew (the drift this module's consumers were warned about).


def with_token_grams(df: DataFrame, text_col: str = "content",
                     out: str = "grams", ns: "tuple" = (1,),
                     distinct: bool = False) -> DataFrame:
    """`out` = array<string> of space-joined token n-grams (simple
    profile) for every n in `ns`, concatenated in ns order — the Arrow
    twin of concat(_token_ngrams(_tokens(col), n) for n in ns), with
    optional per-document dedup (order preserved: first occurrence).
    NULL text -> NULL array (matching the expression form)."""
    for n in ns:
        if n < 1:
            raise ValueError(f"n must be >= 1, got {n}")
    if out in df.columns:
        raise ValueError(f"output column {out!r} already exists")
    from .bpe import _passthrough_schema
    schema = _passthrough_schema(df, f"`{out}` array<string>")
    ns_t = tuple(ns)

    def kernel(batches):
        for pdf in batches:
            col = []
            for text in pdf[text_col]:
                if text is None:
                    col.append(None)
                    continue
                toks = _py_tokens(text)
                grams = []
                for n in ns_t:
                    if n == 1:
                        grams.extend(toks)
                    else:
                        grams.extend(
                            " ".join(toks[i:i + n])
                            for i in range(len(toks) - n + 1))
                if distinct:
                    grams = list(dict.fromkeys(grams))
                col.append(grams)
            pdf = pdf.copy()
            pdf[out] = col
            yield pdf

    return df.mapInPandas(kernel, schema)


def with_repetition_features(df: DataFrame, text_col: str = "content",
                             top_ns: tuple = (2, 3, 4),
                             dup_ns: tuple = (5, 10)) -> DataFrame:
    """Gopher repetition quality signals (Rae et al. 2021 §A1.1), the
    standard pre-training corpus filters the reference engine has no
    analog for:

    - dup_line_frac      — fraction of lines that are repeats of another
                           line in the SAME document (1 - distinct/total).
    - dup_line_char_frac — fraction of line characters sitting in repeat
                           occurrences (beyond each line's first).
    - top_{n}gram_char_frac — characters covered by the most frequent
                           token n-gram (count x gram length, space-joined)
                           over the doc's normalized character mass; ties
                           on count resolve to the LONGEST such gram.
    - dup_{n}gram_char_frac — characters covered by all n-grams occurring
                           >= 2 times (count x length summed). Overlapping
                           occurrences are multi-counted (the standard
                           cheap variant, cf. Dolma/NeMo Curator), so the
                           value is clamped to 1.0.

    Char denominators: line fractions use the sum of line lengths; n-gram
    fractions use the whitespace-normalized token mass
    len(" ".join(tokens)) — both invariant to how the raw text spells its
    separators. Docs with no lines/tokens get NULL fractions, never a
    fabricated 0. A doc with tokens but shorter than n gets top_{n}gram
    NULL (no n-gram exists to be 'top') and dup_{n}gram 0.0 (its
    duplicated-gram char mass is genuinely zero). NULL text -> all NULL.

    ONE Arrow kernel over the corpus scan — no explode, no shuffle; the
    original pure-expression formulation (_run_stats folds over sorted
    gram arrays) is semantically identical but runs interpreted
    (higher-order-function lambdas are CodegenFallback) at ~100x the
    cost — see the kernel-block comment above. The DuckDB oracle
    (gopher_repetition) recomputes every fraction from per-(doc, value)
    counts, so the kernel is value-checked against an independent
    formulation, not against itself. Gopher's thresholds (drop at
    dup_line_frac > 0.30, top_2gram > 0.20, dup_5gram > 0.15, ...) are
    the caller's policy; this computes the signals."""
    from collections import Counter

    from .bpe import _passthrough_schema
    all_ns = sorted(set(top_ns) | set(dup_ns))
    new_cols = ["dup_line_frac", "dup_line_char_frac"]
    for n in all_ns:
        if n in top_ns:
            new_cols.append(f"top_{n}gram_char_frac")
        if n in dup_ns:
            new_cols.append(f"dup_{n}gram_char_frac")
    schema = _passthrough_schema(
        df, ", ".join(f"`{c}` double" for c in new_cols))
    top_set, dup_set = set(top_ns), set(dup_ns)

    def kernel(batches):
        for pdf in batches:
            out = {c: [] for c in new_cols}
            for text in pdf[text_col]:
                if text is None:
                    for c in new_cols:
                        out[c].append(None)
                    continue
                lines = text.split("\n")
                lc = Counter(lines)
                n_l = len(lines)
                out["dup_line_frac"].append((n_l - len(lc)) / n_l)
                tot = sum(c * len(ln) for ln, c in lc.items())
                dup = sum((c - 1) * len(ln) for ln, c in lc.items())
                out["dup_line_char_frac"].append(
                    dup / tot if tot else None)
                toks = _py_tokens(text)
                tok_chars = len(toks) - 1 + sum(map(len, toks)) \
                    if toks else 0
                for n in all_ns:
                    if len(toks) >= n:
                        gc = Counter(
                            zip(*(toks[i:] for i in range(n))))
                        if n in top_set:
                            mc = max(gc.values())
                            best = max(
                                c * (sum(map(len, g)) + n - 1)
                                for g, c in gc.items() if c == mc)
                            out[f"top_{n}gram_char_frac"].append(
                                best / tok_chars)
                        if n in dup_set:
                            d = sum(c * (sum(map(len, g)) + n - 1)
                                    for g, c in gc.items() if c >= 2)
                            out[f"dup_{n}gram_char_frac"].append(
                                min(1.0, d / tok_chars))
                    else:
                        if n in top_set:
                            out[f"top_{n}gram_char_frac"].append(None)
                        if n in dup_set:
                            out[f"dup_{n}gram_char_frac"].append(
                                0.0 if toks else None)
            pdf = pdf.copy()
            for c in new_cols:
                # nullable Float64: plain float64 would ship None as NaN,
                # not SQL NULL, through Arrow
                pdf[c] = pd.array(out[c], dtype="Float64")
            yield pdf

    return df.mapInPandas(kernel, schema)


def repetition_filter(df: DataFrame, text_col: str = "content",
                      max_dup_line_frac: float | None = None,
                      max_dup_line_char_frac: float | None = None,
                      max_top_ngram: dict[int, float] | None = None,
                      max_dup_ngram: dict[int, float] | None = None
                      ) -> DataFrame:
    """Keep documents whose repetition signals are all within bounds
    (Gopher §A1.1 policy over with_repetition_features). Only the
    requested signals are computed; a NULL signal (doc too short to
    evaluate) PASSES that bound — emptiness is min-length policy, not
    repetition. Returns the input columns unchanged."""
    max_top_ngram = max_top_ngram or {}
    max_dup_ngram = max_dup_ngram or {}
    if (max_dup_line_frac is None and max_dup_line_char_frac is None
            and not max_top_ngram and not max_dup_ngram):
        return df
    feats = with_repetition_features(
        df, text_col,
        top_ns=tuple(sorted(max_top_ngram)),
        dup_ns=tuple(sorted(max_dup_ngram)))
    cond = F.lit(True)

    def bound(col, t):
        return F.col(col).isNull() | (F.col(col) <= F.lit(float(t)))

    if max_dup_line_frac is not None:
        cond = cond & bound("dup_line_frac", max_dup_line_frac)
    if max_dup_line_char_frac is not None:
        cond = cond & bound("dup_line_char_frac", max_dup_line_char_frac)
    for n, t in max_top_ngram.items():
        cond = cond & bound(f"top_{n}gram_char_frac", t)
    for n, t in max_dup_ngram.items():
        cond = cond & bound(f"dup_{n}gram_char_frac", t)
    return feats.filter(cond).select(*df.columns)
