"""Similarity search over embedding columns (array<float>).

* brute_force_cosine_topk — the exact baseline: JVM-side zip_with/aggregate
  dot product against a broadcast query vector literal; one scan + one
  TakeOrderedAndProject. At 100 TB this is the correctness oracle and the
  fallback for low-selectivity filters.
* rhp_signatures / ann_topk_lsh — the scale path: random-hyperplane LSH.
  Vectors hash to an H-bit sign signature (one matrix multiply per row via a
  vectorized pandas UDF); a query probes its own bucket plus all buckets
  within Hamming distance `probe_hamming` (multiprobe), exact-scores only
  those candidates, and returns top-k. Bucket ids are uniform-ish, so the
  candidate scan is partition-prunable when the table is written partitioned
  by `bucket`.
* embedding_cosine_dedup_pairs — near-dup pairs (cos ≥ τ) via bucket
  self-join + exact verify: same-bucket pairs only, so the quadratic blowup
  is bounded per bucket.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType


def _dot_expr(vec_col, qlit):
    return F.aggregate(F.zip_with(vec_col, qlit, lambda a, b: a.cast("double") * b),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm_expr(vec_col):
    return F.sqrt(F.aggregate(
        F.transform(vec_col, lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def brute_force_cosine_topk(emb: DataFrame, query_vec: Sequence[float],
                            k: int = 10, id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))
    qlit = F.array(*[F.lit(float(v)) for v in q])
    cos = _dot_expr(F.col(vec_col), qlit) / (_norm_expr(F.col(vec_col)) * qn)
    return (emb.select(F.col(id_col).alias("id"), cos.alias("cos"))
            .orderBy(F.desc("cos"), F.asc("id")).limit(k))


def _planes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((dim, n_bits))


def rhp_signatures(emb: DataFrame, dim: int, n_bits: int = 8, seed: int = 5,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """(id, bucket:int) — sign signature vs `n_bits` random hyperplanes.
    One Arrow batch = one (B×dim)·(dim×bits) matmul; no per-row Python."""
    planes = _planes(dim, n_bits, seed)
    weights = (1 << np.arange(n_bits)).astype(np.int64)

    @F.pandas_udf(IntegerType())
    def bucket_of(vs: pd.Series) -> pd.Series:
        mat = np.vstack(vs.to_numpy())
        signs = (mat @ planes) > 0
        return pd.Series((signs @ weights).astype(np.int32))

    return emb.select(F.col(id_col).alias("id"),
                      bucket_of(F.col(vec_col)).alias("bucket"))


def query_buckets(query_vec: Sequence[float], planes: np.ndarray,
                  probe_hamming: int = 1) -> list[int]:
    q = np.asarray(query_vec, dtype=np.float64)
    n_bits = planes.shape[1]
    base = int(((q @ planes) > 0) @ (1 << np.arange(n_bits)))
    buckets = {base}
    if probe_hamming >= 1:
        for i in range(n_bits):
            buckets.add(base ^ (1 << i))
    if probe_hamming >= 2:
        for i in range(n_bits):
            for j in range(i + 1, n_bits):
                buckets.add(base ^ (1 << i) ^ (1 << j))
    return sorted(buckets)


def ann_topk_lsh(emb: DataFrame, query_vec: Sequence[float], dim: int,
                 k: int = 10, n_bits: int = 8, seed: int = 5,
                 probe_hamming: int = 1, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: exact-score only vectors whose bucket is within
    `probe_hamming` bits of the query's bucket."""
    planes = _planes(dim, n_bits, seed)
    sig = rhp_signatures(emb, dim, n_bits, seed, id_col, vec_col)
    probes = query_buckets(query_vec, planes, probe_hamming)
    cand_ids = sig.filter(F.col("bucket").isin(probes)).select("id")
    cand = emb.join(cand_ids.withColumnRenamed("id", id_col), id_col, "left_semi")
    return brute_force_cosine_topk(cand, query_vec, k, id_col, vec_col)


def ivf_assignments(emb: DataFrame, centroids: np.ndarray,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """(id, cluster) — IVF coarse quantizer assignment: nearest centroid by
    squared euclidean distance, ties to the lowest centroid index.

    The distance is computed in the DIRECT form Σ(v−c)² — the same
    arithmetic the DuckDB oracle's ``list_distance`` evaluates (sqrt of
    that sum; sqrt is monotone so argmin is unaffected) — NOT the expanded
    ||v||²−2v·c+||c||² matmul, whose cancellation error is orders of
    magnitude larger and can flip assignment on near-tie distances
    (round-2 advice). Residual risk is only summation-order rounding
    (~1 ulp), which would need an exact distance tie to matter. Row
    chunking bounds the (chunk×C×dim) temporary. Centroids ship in the UDF
    closure — the broadcastable small side. Writing the assigned table
    partitioned by `cluster` makes query-time probing partition-prunable
    (classic IVF inverted lists). Centroid *training* is pluggable; the
    deterministic default used by the entry is sampled-centroids (the
    first C vectors), which keeps the quantizer SQL-expressible for the
    DuckDB oracle."""
    cent = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf(IntegerType())
    def cluster_of(vs: pd.Series) -> pd.Series:
        mat = np.vstack(vs.to_numpy()).astype(np.float64)
        out = np.empty(mat.shape[0], dtype=np.int32)
        step = max(1, (1 << 22) // max(1, cent.shape[0] * cent.shape[1]))
        for s in range(0, mat.shape[0], step):
            d2 = np.square(mat[s:s + step, None, :]
                           - cent[None, :, :]).sum(axis=2)
            out[s:s + step] = np.argmin(d2, axis=1).astype(np.int32)
        return pd.Series(out)

    return emb.select(F.col(id_col).alias("id"),
                      cluster_of(F.col(vec_col)).alias("cluster"))


def ivf_topk(emb: DataFrame, centroids: np.ndarray,
             query_vec: Sequence[float], k: int = 10, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             assignments: DataFrame | None = None) -> DataFrame:
    """IVF-flat approximate top-k: probe the `n_probe` clusters whose
    centroids are nearest the query, exact-rescore only their members.
    `assignments` may be a pre-materialized (id, cluster) table (the
    on-disk inverted-list layout); otherwise it is derived inline."""
    cent = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    d2 = ((cent - q[None, :]) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(d2, kind="stable")[:n_probe]]
    asg = assignments if assignments is not None \
        else ivf_assignments(emb, cent, id_col, vec_col)
    cand_ids = asg.filter(F.col("cluster").isin(probes)).select("id")
    cand = emb.join(cand_ids.withColumnRenamed("id", id_col), id_col,
                    "left_semi")
    return brute_force_cosine_topk(cand, query_vec, k, id_col, vec_col)


def embedding_cosine_dedup_pairs(emb: DataFrame, dim: int,
                                 threshold: float = 0.95, n_bits: int = 8,
                                 seed: int = 5, id_col: str = "vec_id",
                                 vec_col: str = "embedding") -> DataFrame:
    """Near-dup pairs with cos ≥ threshold among same-bucket vectors."""
    sig = rhp_signatures(emb, dim, n_bits, seed, id_col, vec_col)
    tagged = emb.join(sig.withColumnRenamed("id", id_col), id_col)
    a = tagged.alias("a")
    b = tagged.alias("b")
    pairs = a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
    dot = F.aggregate(F.zip_with(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"),
                                 lambda x, y: x.cast("double") * y.cast("double")),
                      F.lit(0.0), lambda acc, x: acc + x)
    cos = dot / (_norm_expr(F.col(f"a.{vec_col}")) * _norm_expr(F.col(f"b.{vec_col}")))
    return (pairs.select(F.col(f"a.{id_col}").alias("id_a"),
                         F.col(f"b.{id_col}").alias("id_b"), cos.alias("cos"))
            .filter(F.col("cos") >= threshold))
