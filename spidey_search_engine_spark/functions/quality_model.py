"""Hashed linear quality classifier (SURVEY §2.8 P22).

The model-based quality gate real training-data pipelines run (CCNet's
fastText language/quality filter, RefinedWeb's classifier pass): score =
sigmoid(mean of per-token weights), tokens mapped to a D-bucket weight
table by the hashing trick. The reference engine has no model inference;
this is a mandated beyond-reference operator.

The WEIGHTS are an input (a real deployment loads a trained fastText /
logistic-regression table); the operator is the Spark plumbing that makes
inference scale: token explode (same volume as the index build's map
stage), bucket = pmod(hash(token), D), broadcast hash-join against the
D-row weight table (D ~ 10^5-10^6 rows — always broadcast-sized), one
groupBy on doc id (uniform key). No Python in the hot path, no literal
weight arrays in codegen (a 10^5-element literal LUT measured ~0.8 s of
per-query codegen in the PQ/ADC work — the broadcast join avoids it).

``hash_expr`` is injectable like every hashing operator here, so the
DuckDB oracle (entry ``quality_model_docs``) runs the SAME bucket math
via the SQL-expressible polynomial hash and a formula-generated weight
table both engines derive independently.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import tokens_col

# deterministic weight formula: w(b) = ((b * A) % M) / 1e6 - 1  ∈ [-1, 1]
WEIGHT_A = 2654435761
WEIGHT_M = 2000001


def deterministic_weights(spark: SparkSession, dim: int) -> DataFrame:
    """(bucket, w) — formula weights both engines can regenerate exactly
    (integer multiply/mod, one double division). Stand-in for a trained
    table; any (bucket int, w double) DataFrame plugs in."""
    return spark.range(dim).select(
        F.col("id").cast("int").alias("bucket"),
        ((F.col("id") * F.lit(WEIGHT_A)) % F.lit(WEIGHT_M)
         / F.lit(1000000.0) - F.lit(1.0)).alias("w"))


def linear_quality_scores(df: DataFrame, weights: DataFrame, dim: int,
                          id_col: str = "doc_id",
                          text_col: str = "content",
                          hash_expr: Callable[[Column], Column]
                          = F.xxhash64) -> DataFrame:
    """(id, n_tokens, q_score) — sigmoid(mean token weight) per document.

    Docs with zero tokens produce no row (nothing to score; the upstream
    quality gate drops empty docs regardless). SPARSE weight tables are
    fine: buckets absent from the table contribute weight 0.0 (the
    standard hashing-trick OOV treatment, via left join + coalesce), and
    n_tokens always counts every token of the doc.
    """
    toks = df.select(F.col(id_col).alias("id"),
                     F.explode(tokens_col(text_col)).alias("tok"))
    bucketed = toks.select(
        "id", F.pmod(hash_expr(F.col("tok")), F.lit(dim))
                .cast("int").alias("bucket"))
    scored = (bucketed.join(F.broadcast(weights), "bucket", "left")
              .groupBy("id")
              .agg(F.avg(F.coalesce(F.col("w"), F.lit(0.0))).alias("s_raw"),
                   F.count("*").alias("n_tokens")))
    sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("s_raw")))
    return scored.select(F.col("id").alias(id_col), "n_tokens",
                         sig.alias("q_score"))


def quality_filter(df: DataFrame, weights: DataFrame, dim: int,
                   threshold: float = 0.5, id_col: str = "doc_id",
                   text_col: str = "content",
                   hash_expr: Callable[[Column], Column]
                   = F.xxhash64) -> DataFrame:
    """Documents whose model score clears ``threshold`` — the keep set."""
    scores = linear_quality_scores(df, weights, dim, id_col, text_col,
                                   hash_expr)
    keep = scores.filter(F.col("q_score") >= threshold).select(id_col)
    return df.join(keep, id_col, "left_semi")
