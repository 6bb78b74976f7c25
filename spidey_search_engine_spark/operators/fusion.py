"""Hybrid retrieval fusion: combine lexical (BM25) and vector (ANN)
rankings into one result list.

The reference engine ranks by one scorer at a time (relevance OR
popularity, QueryResultsFetcher.java); a training-data / modern-search
user wants both retrieval families fused. Reciprocal-rank fusion
(Cormack et al., SIGIR 2009 — public algorithm) is the standard
score-free method: rrf(d) = Σ_lists 1/(kc + rank_list(d)), robust to
incomparable score scales.

Scale shape: each input list is already a top-N (bounded by
construction — BM25 top-k, ANN top-k), so the union is ≤ Σ N rows
regardless of corpus size; the groupBy is a broadcast-scale aggregation
and the whole fuse adds one tiny shuffle after the per-family queries.
All arithmetic is JVM column expressions.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rrf_fuse(ranked: Sequence[DataFrame], k: int = 10,
             kc: int = 60) -> DataFrame:
    """Fuse ranked lists by reciprocal-rank fusion.

    Each input must be (id, rank) with rank 1-based under that list's OWN
    deterministic order (compute it with row_number over an explicit
    orderBy — fusion never re-derives ranks, so the caller controls
    tie-breaking). A document missing from a list simply contributes
    nothing for it. Returns (id, rrf, n_lists) — top-k by rrf DESC,
    ties to the lowest id; n_lists = how many input lists contained the
    id (useful as a consensus filter)."""
    if not ranked:
        raise ValueError("need at least one ranked list")
    u = ranked[0].select("id", "rank")
    for r in ranked[1:]:
        u = u.unionByName(r.select("id", "rank"))
    scored = (u.groupBy("id")
              .agg(F.sum(F.lit(1.0) / (F.lit(float(kc)) + F.col("rank")))
                   .alias("rrf"),
                   F.count("*").cast("int").alias("n_lists")))
    return scored.orderBy(F.desc("rrf"), F.asc("id")).limit(k)
