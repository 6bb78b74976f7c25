"""P40 — benchmark decontamination: flag / drop training documents that
share a token n-gram with an evaluation set (the GPT-3 appendix-C /
Gopher / PaLM procedure: 13-gram overlap against benchmark text). The
reference engine has no analog — its only cross-corpus set operation is
the exact-URL recrawl delta — but no corpus shipped to a trainer today
goes out without this pass.

Scale shape (the whole point):
- The benchmark side is SMALL by construction (eval suites are measured
  in MBs) — its distinct n-grams are computed once and broadcast.
- The corpus side builds each document's deduped n-gram array in an
  Arrow kernel (textstats.with_token_grams — the expression form's
  higher-order lambdas evaluate interpreted per element, ~100x slower;
  see the kernel-block comment in textstats) and explodes it map-side:
  explode is a flatMap, the broadcast-hash inner join filters in the
  SAME stage, so the ~L n-grams per document are created and discarded
  WITHIN a task — no shuffle of corpus n-grams ever happens. Only the
  (rare) surviving hits shuffle, into a per-doc count whose cardinality
  is bounded by the contaminated subset.
- Per-document dedup means `n_hit` counts DISTINCT shared grams and a
  pathological repetition can't inflate the hit rows.

Tokenization is the simple profile (lowercase alnum runs, the python
twin of textstats._tokens — pinned equal by test) so contamination is
invariant to case/punctuation spelling — the same normalization both
sides of the comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import _token_ngrams, _tokens, with_token_grams


def benchmark_ngrams(bench: DataFrame, n: int,
                     text_col: str = "text") -> DataFrame:
    """Distinct token n-grams of the evaluation set: one column `gram`.
    Fragments shorter than n tokens contribute nothing (standard: a
    benchmark item too short to have an n-gram can't be matched at n)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    return (bench
            .select(F.explode(_token_ngrams(_tokens(F.col(text_col)), n))
                    .alias("gram"))
            .distinct())


def contamination_hits(docs: DataFrame, bench: DataFrame, n: int = 13,
                       id_col: str = "doc_id", text_col: str = "content",
                       bench_text_col: str = "text") -> DataFrame:
    """(id_col, n_hit, first_gram) — training documents sharing >= 1
    token n-gram with the benchmark set; n_hit counts the DISTINCT shared
    grams, first_gram is the lexicographically smallest (deterministic
    audit sample). Documents with no overlap are absent."""
    grams = F.broadcast(benchmark_ngrams(bench, n, bench_text_col))
    doc_grams = (with_token_grams(docs.select(id_col, text_col),
                                  text_col, "_grams", ns=(n,),
                                  distinct=True)
                 .select(F.col(id_col),
                         F.explode("_grams").alias("gram")))
    return (doc_grams.join(grams, "gram")
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_hit"),
                 F.min("gram").alias("first_gram")))


def decontaminate(docs: DataFrame, bench: DataFrame, n: int = 13,
                  id_col: str = "doc_id", text_col: str = "content",
                  bench_text_col: str = "text") -> DataFrame:
    """`docs` minus every document flagged by `contamination_hits` —
    a left-anti join on the (small) contaminated id set, which AQE
    broadcasts; the corpus itself never shuffles."""
    hits = contamination_hits(docs, bench, n, id_col, text_col,
                              bench_text_col).select(id_col)
    return docs.join(hits, id_col, "left_anti")


def benchmark_coverage(docs: DataFrame, bench: DataFrame, n: int = 13,
                       bench_id_col: str = "bench_id",
                       text_col: str = "content",
                       bench_text_col: str = "text") -> DataFrame:
    """The reverse audit: per benchmark item, how many of ITS n-grams
    appear anywhere in the corpus — (bench_id_col, n_grams, n_leaked,
    leak_frac). An item with leak_frac near 1 is memorizable even after
    doc-level dropping (e.g. its text is spread across many documents);
    report it to the eval owner.

    The corpus side reduces to the DISTINCT set of grams that match any
    benchmark gram (semi-join, broadcast of the small side) before the
    per-item count — corpus-sized data collapses map-side here too."""
    # explode_outer: an item too short for any n-gram still reports
    # (n_grams=0, leak_frac=NULL) instead of vanishing from the audit
    bgrams = (bench
              .select(F.col(bench_id_col),
                      F.explode_outer(F.array_distinct(
                          _token_ngrams(_tokens(F.col(bench_text_col)), n)))
                      .alias("gram")))
    probe = bgrams.filter(F.col("gram").isNotNull())
    corpus_grams = (with_token_grams(docs.select(text_col), text_col,
                                     "_grams", ns=(n,), distinct=True)
                    .select(F.explode("_grams").alias("gram"))
                    .join(F.broadcast(probe.select("gram").distinct()),
                          "gram", "left_semi")
                    .distinct()
                    .withColumn("leaked", F.lit(1)))
    return (bgrams.join(corpus_grams, "gram", "left")
            .groupBy(bench_id_col)
            .agg(F.count("gram").cast("long").alias("n_grams"),
                 F.coalesce(F.sum("leaked"), F.lit(0)).cast("long")
                 .alias("n_leaked"))
            .withColumn("leak_frac",
                        F.try_divide(F.col("n_leaked").cast("double"),
                                     F.col("n_grams").cast("double"))))
