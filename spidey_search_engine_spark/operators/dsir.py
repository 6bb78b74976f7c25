"""DSIR data selection — importance resampling toward a target corpus.

Implements Xie et al., *Data Selection for Language Models via Importance
Resampling* (NeurIPS 2023): represent documents as bags of hashed token
n-grams (unigrams+bigrams by default), fit add-α-smoothed bag-of-buckets
models of a small TARGET corpus and the big RAW corpus, score every raw
document with the log importance weight

    log w(d) = Σ_{g ∈ grams(d)} [ ln p_target(bucket(g)) − ln p_raw(bucket(g)) ]

and select k documents without replacement via the Gumbel-top-k trick
(key = log w / temperature + Gumbel noise; the noise is DETERMINISTIC,
derived from a seeded hash of the document id, so runs are reproducible
and the DuckDB oracle can replay selection exactly).

The reference engine has no data-selection stage (this is pipeline
surplus, like the dedup family); the design reuses its hashing discipline:
`hash_fn` defaults to JVM xxhash64 and the oracle profile injects the
SQL-expressible polynomial hash (functions/hashing.py).

Scale shape (the 100-TB contract):
- bucket counting is ONE explode + hash aggregate per corpus; the result
  is ≤ `n_buckets` rows (bounded metadata, like a vocabulary);
- the log-ratio table enumerates ALL `n_buckets` buckets (spark.range) so
  scoring never needs a default-ratio branch, and is broadcast into the
  scoring join — nothing corpus-sized shuffles on the bucket key;
- scoring is explode → broadcast join → groupBy(doc): the partial
  aggregate collapses to ~one row per document per partition before the
  shuffle (documents are not split across partitions), so the only
  corpus-scale exchange carries doc-count rows, not gram-count rows;
- selection is orderBy(key).limit(k) = TakeOrderedAndProject (per-
  partition top-k, never a global sort of the corpus).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import with_token_grams

HashFn = Callable[[Column], Column]

# Gumbel noise resolution: u is quantized to 1/2^20 steps (offset by half
# a step so u is never 0 or 1). Plenty for corpus-selection purposes and
# exactly reproducible as BIGINT arithmetic in DuckDB.
_GUMBEL_DENOM = 1 << 20


def _with_grams(df: DataFrame, text_col: str,
                ns: Sequence[int]) -> DataFrame:
    """+ `_grams` array of all token n-grams for every n in `ns` — the
    Arrow kernel (the expression form's higher-order lambdas run
    interpreted per element, ~100x slower; see textstats)."""
    return with_token_grams(df, text_col, "_grams", ns=tuple(ns))


def gram_bucket_counts(df: DataFrame, text_col: str = "content",
                       n_buckets: int = 8192,
                       ns: Sequence[int] = (1, 2),
                       hash_fn: HashFn | None = None) -> DataFrame:
    """(bucket, cnt) hashed-n-gram counts over a corpus — the bag-of-
    hashed-grams sufficient statistic. Output is ≤ n_buckets rows."""
    hash_fn = hash_fn or F.xxhash64
    g = _with_grams(df.select(text_col), text_col, ns) \
        .select(F.explode("_grams").alias("gram"))
    return (g.select(F.pmod(hash_fn(F.col("gram")),
                            F.lit(n_buckets)).alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("cnt")))


def dsir_logratios(target_counts: DataFrame, raw_counts: DataFrame,
                   n_buckets: int, smoothing: float = 1.0) -> DataFrame:
    """(bucket, log_ratio) over ALL buckets 0..n_buckets-1.

    log_ratio(b) = ln((ct_b+α)/(T+α·B)) − ln((cr_b+α)/(R+α·B)) — add-α
    smoothing keeps unseen buckets finite and gives absent-from-target
    buckets their proper negative weight. Everything here is bounded by
    n_buckets; totals ride along via a broadcast 1-row cross join."""
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    spark = target_counts.sparkSession
    a = float(smoothing)

    def _norm(counts: DataFrame, cname: str) -> DataFrame:
        tot = counts.agg(F.coalesce(F.sum("cnt"), F.lit(0))
                         .cast("double").alias(f"_tot_{cname}"))
        return (spark.range(n_buckets).withColumnRenamed("id", "bucket")
                .join(counts, "bucket", "left")
                .crossJoin(F.broadcast(tot))
                .select("bucket",
                        ((F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(a))
                         / (F.col(f"_tot_{cname}") + F.lit(a * n_buckets))
                         ).alias(cname)))

    t = _norm(target_counts, "pt")
    r = _norm(raw_counts, "pr")
    return t.join(r, "bucket").select(
        "bucket", (F.log("pt") - F.log("pr")).alias("log_ratio"))


def dsir_scores(df: DataFrame, logratios: DataFrame,
                text_col: str = "content", id_col: str = "doc_id",
                n_buckets: int = 8192, ns: Sequence[int] = (1, 2),
                hash_fn: HashFn | None = None,
                out: str = "log_w") -> DataFrame:
    """Input rows + `out` = log importance weight. Documents with no
    grams score 0.0 (empty sum), not NULL and not dropped — explode_outer
    keeps them through the aggregate."""
    hash_fn = hash_fn or F.xxhash64
    g = _with_grams(df.select(id_col, text_col), text_col, ns).select(
        id_col, F.explode_outer("_grams").alias("gram"))
    g = g.select(id_col, F.when(
        F.col("gram").isNotNull(),
        F.pmod(hash_fn(F.col("gram")), F.lit(n_buckets))).alias("bucket"))
    s = (g.join(F.broadcast(logratios), "bucket", "left")
         .groupBy(id_col)
         .agg(F.sum(F.coalesce(F.col("log_ratio"), F.lit(0.0)))
              .cast("double").alias(out)))
    return df.join(s, id_col)


def gumbel_key(id_col: Column, seed: int = 0,
               hash_fn: HashFn | None = None) -> Column:
    """Deterministic standard-Gumbel draw per id: u = (h mod D + ½)/D,
    g = −ln(−ln u). Seed changes every draw; same (seed, id) → same g."""
    hash_fn = hash_fn or F.xxhash64
    h = hash_fn(F.concat(F.lit(f"{seed}:"), id_col.cast("string")))
    u = ((F.pmod(h, F.lit(_GUMBEL_DENOM)).cast("double") + F.lit(0.5))
         / F.lit(float(_GUMBEL_DENOM)))
    return -F.log(-F.log(u))


def dsir_select(df: DataFrame, logratios: DataFrame, k: int,
                text_col: str = "content", id_col: str = "doc_id",
                n_buckets: int = 8192, ns: Sequence[int] = (1, 2),
                seed: int = 0, temperature: float = 1.0,
                hash_fn: HashFn | None = None) -> DataFrame:
    """Gumbel-top-k importance resampling WITHOUT replacement: the k rows
    with the largest log w/τ + Gumbel(seed, id) keys are a sample from
    the softmax(log w/τ) distribution (Vieira 2014 / Kool et al. 2019).
    τ→0 degenerates to deterministic top-k by weight; τ=1 is DSIR's
    sampled variant. Returns the selected input rows + log_w + sel_key,
    via per-partition top-k (TakeOrderedAndProject), never a global sort."""
    if k <= 0:
        raise ValueError(f"k must be >= 1, got {k}")
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    scored = dsir_scores(df, logratios, text_col, id_col, n_buckets, ns,
                         hash_fn)
    key = (F.col("log_w") / F.lit(float(temperature))
           + gumbel_key(F.col(id_col), seed, hash_fn))
    return (scored.withColumn("sel_key", key)
            .orderBy(F.col("sel_key").desc(), F.col(id_col))
            .limit(k))
