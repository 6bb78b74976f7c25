"""Unigram language-model perplexity scoring — the CCNet-style quality
stage: train token log-probabilities on a REFERENCE slice (the "good"
corpus — wiki-grade text), score every candidate document's perplexity
under it, and keep the low-perplexity (reference-like) half.

Everything is JVM column expressions + one broadcastable vocab table:

* train: one pass over the reference slice — token explode, hash-agg
  counts, add-alpha smoothing, log-probability column. The vocab table
  is index METADATA (like the dictionary head / quality weights), sized
  by `max_vocab`; rarer tokens fold into the OOV mass.
* score: token explode on the candidate corpus, broadcast join to the
  vocab (OOV -> the smoothed unseen log-prob), per-doc avg log-prob,
  perplexity = exp(-avg). One scan, one broadcast join, one groupBy(id)
  — the same shape as the hashed quality classifier (P22), but with
  probabilities a user can train on any slice in one line.

Deterministic and SQL-expressible end-to-end (counts, log, exp), so the
entry is value-hash oracle-paired in DuckDB — unlike real KenLM-style
n-gram LMs, the unigram model needs no backoff state.

Reference parity: beyond-reference training-data family (SURVEY §2.8);
the reference engine has no notion of corpus quality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str):
    return F.array_remove(
        F.split(F.lower(F.col(text_col)), r"\s+"), "")


def train_unigram_lm(ref: DataFrame, text_col: str = "text",
                     max_vocab: int = 1 << 20,
                     alpha: float = 1.0) -> "tuple[DataFrame, float]":
    """(vocab_df(token, logp), oov_logp) — add-alpha-smoothed unigram LM
    over the reference slice.

    p(tok) = (count + alpha) / (N + alpha * (V + 1)); the +1 is the OOV
    bucket, whose probability (count 0) is returned as the scalar
    ``oov_logp``. The vocab keeps the `max_vocab` most frequent tokens
    (ties to token asc — deterministic); everything rarer scores as OOV.
    N and V are computed over the KEPT vocab so probabilities stay a
    proper distribution over vocab ∪ {OOV}.
    """
    import math

    spark = ref.sparkSession
    # ONE evaluation of the reference lineage: the count head is bounded
    # by max_vocab, so collect it and rebuild the vocab as a local table
    # — otherwise every consumer of the returned vocab (the scoring join,
    # a keep-side semi-join, the final write) replays the whole upstream
    # lineage to recompute the same counts (measured 3-4x in the clean
    # CLI with a self-referential reference)
    rows = (ref.select(F.explode(_tokens(text_col)).alias("token"))
            .groupBy("token").agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), F.asc("token")).limit(max_vocab)
            .collect())
    n = sum(int(r["c"]) for r in rows)
    v = len(rows)
    if n == 0:
        raise ValueError("reference slice has no tokens — the LM would "
                         "score every document identically")
    denom = n + alpha * (v + 1)
    oov_logp = math.log(alpha / denom)
    vocab = spark.createDataFrame(
        [(r["token"], math.log((int(r["c"]) + alpha) / denom))
         for r in rows], "token string, logp double")
    return vocab, oov_logp


def lm_perplexity(df: DataFrame, vocab: DataFrame, oov_logp: float,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(id, n_tokens, avg_logp, ppl) per document — perplexity under the
    trained unigram LM. Empty documents score NULL ppl (no tokens to
    judge; route them to a length filter, not a quality one)."""
    toks = df.select(F.col(id_col).alias("id"),
                     F.posexplode_outer(_tokens(text_col))
                     .alias("pos", "token"))
    scored = (toks.join(F.broadcast(vocab), "token", "left")
              .groupBy("id")
              .agg(F.count("token").alias("n_tokens"),
                   F.avg(F.coalesce(F.col("logp"), F.lit(oov_logp)))
                   .alias("_al")))
    # guard BOTH outputs on n_tokens: posexplode_outer emits one
    # NULL-token row for an empty doc, whose coalesce would otherwise
    # fabricate avg_logp = oov_logp for a doc that was never scored
    al = F.when(F.col("n_tokens") > 0, F.col("_al"))
    return scored.select(
        "id", "n_tokens", al.alias("avg_logp"),
        F.exp(-al).alias("ppl"))


def perplexity_filter(df: DataFrame, vocab: DataFrame, oov_logp: float,
                      max_ppl: float, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Keep documents with ppl <= max_ppl (reference-like text). Empty
    docs (NULL ppl) are dropped — they carry no trainable signal."""
    ppl = lm_perplexity(df, vocab, oov_logp, id_col, text_col)
    keep = ppl.filter(F.col("ppl") <= max_ppl) \
        .select(F.col("id").alias(id_col))
    return df.join(keep, id_col, "left_semi")
