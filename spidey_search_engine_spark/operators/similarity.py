"""Similarity search over embedding columns (array<float>).

* brute_force_cosine_topk — the exact baseline: one scan through the
  Arrow matmul kernel (the `_batch` variant at Q=1) + local top-k +
  global rank. At 100 TB this is the correctness oracle and the
  fallback for low-selectivity filters; it is also the exact-rescore
  tail of every materialized-index probe below. The `_batch` variant
  scores MANY query vectors in one scan (per-Arrow-batch matmul + local
  top-k + per-query window rank — the eval-workload shape).
* rhp_signatures / write_lsh_index / ann_topk_lsh — the scale path:
  random-hyperplane LSH. Vectors hash to an H-bit sign signature (one
  matrix multiply per row via a vectorized pandas UDF); the signature table
  with vectors co-located is MATERIALIZED once, partitioned by `bucket`
  (write_lsh_index — the vector analog of the persistent `word_image`
  index). A query probes its own bucket plus all buckets within Hamming
  distance `probe_hamming` (multiprobe) through partition pruning, exact-
  scores only those candidates, and returns top-k — the per-query cost is
  the probe partitions' bytes, independent of table size.
* ivf_assignments / write_ivf_index / ivf_topk — IVF-flat: nearest-centroid
  coarse quantizer, inverted lists materialized as `cluster` partitions
  with vectors co-located; a query reads exactly n_probe lists.
* pq_encode / pq_train_kmeans / write_pq_index / pq_adc_topk — product
  quantization: m-subspace codebooks compress each vector to m small ints;
  the ADC scan scores Σ_j LUT[j][code[j]] over the codes table
  (~dim·4/m× smaller than the vectors) — the memory-bound ANN path at
  100 TB.
* ivf_residuals / write_ivfpq_index / ivfpq_adc_topk — canonical IVF-PQ:
  codes quantize the RESIDUAL against the assigned coarse centroid, the
  codes table is partitioned by cluster, and a query ADC-scans only its
  n_probe partitions with per-cluster lookup tables; partition pruning ×
  compression compose. (Flat PQ collapses clustered data onto one
  codeword per cluster — measured in scripts/bench_ann.py.)
* embedding_cosine_dedup_pairs — near-dup pairs (cos ≥ τ) via bucket
  self-join + exact verify: same-bucket pairs only, so the quadratic blowup
  is bounded per bucket.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType


def _dot_expr(vec_col, qlit):
    return F.aggregate(F.zip_with(vec_col, qlit, lambda a, b: a.cast("double") * b),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm_expr(vec_col):
    return F.sqrt(F.aggregate(
        F.transform(vec_col, lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def _topk_per_query(local: DataFrame, k: int) -> DataFrame:
    """Shared batch-scoring tail: per-query global rank over the kernels'
    local top-k rows (desc cos, ties to the lowest id), truncated to k.
    Spark turns this into WindowGroupLimit partial+final — no full sort."""
    wnd = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("id"))
    return (local.withColumn("rank", F.row_number().over(wnd))
            .filter(F.col("rank") <= k))


def brute_force_cosine_topk(emb: DataFrame, query_vec: Sequence[float],
                            k: int = 10, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            use_kernel: bool = True) -> DataFrame:
    """Exact cosine top-k for ONE query vector.

    Default path: the batch Arrow-matmul kernel at Q=1 (one
    (B×dim)·(dim×1) product per Arrow batch, local top-k, tiny global
    rank), shared with the `_batch` variant — at corpus scale it beats
    the interpreted HOF fold (1M×64 vectors: p50 1.06→0.72–0.84 s,
    BENCH_ANN r4 refresh, two runs).

    ``use_kernel=False`` keeps the round-3 JVM zip_with/aggregate fold —
    kept as an escape hatch and for A/B: an order-controlled interleaved
    comparison on the 1M LSH probe (Hamming<=2, ~55k candidate rows)
    measured the two at parity (kernel p50 0.834 s vs fold 0.846 s, 15
    samples each, one session — the apparent fold advantage in separate
    bench runs was host drift), so the kernel is the default everywhere
    including the index-probe rescore tails. Both paths pin zero-norm
    vectors to cos=0 (the kernel's clamped denominator;
    try_divide+coalesce under ANSI on the fold) and return identical
    top-k."""
    from pyspark.sql.types import ByteType, IntegerType as _IT, LongType, ShortType
    integral_id = isinstance(emb.schema[id_col].dataType,
                             (ByteType, ShortType, _IT, LongType))
    if use_kernel and integral_id:
        # the kernel's output contract is `id long`; non-integral ids
        # (string/uuid keys) keep the fold path, whose id passes through
        # untyped — same top-k either way
        r = brute_force_cosine_topk_batch(emb, {"q": query_vec}, k,
                                          id_col, vec_col)
        return (r.select("id", "cos")
                .orderBy(F.desc("cos"), F.asc("id")).limit(k))
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))
    qlit = F.array(*[F.lit(float(v)) for v in q])
    cos = F.nanvl(F.coalesce(
        F.try_divide(_dot_expr(F.col(vec_col), qlit),
                     _norm_expr(F.col(vec_col)) * qn),
        F.lit(0.0)), F.lit(0.0))
    return (emb.select(F.col(id_col).alias("id"), cos.alias("cos"))
            .orderBy(F.desc("cos"), F.asc("id")).limit(k))


def brute_force_cosine_topk_batch(emb: DataFrame,
                                  queries: "dict[str, Sequence[float]]",
                                  k: int = 10, id_col: str = "vec_id",
                                  vec_col: str = "embedding") -> DataFrame:
    """(query_id, id, cos, rank) — exact cosine top-k for MANY query
    vectors in ONE job. Each Arrow batch does a single (B×dim)·(dim×Q)
    matmul and emits only its LOCAL top-k rows per query (≤ batches·Q·k
    rows total — the distributed-top-k shape), then one per-query window
    rank finishes globally. The eval-workload shape: at Q=10³ the scan
    happens once, not Q times. Ties to the lowest id."""
    if not queries:
        raise ValueError("queries must be non-empty")
    qids = sorted(queries)
    qmat = np.stack([np.asarray(queries[q], dtype=np.float64)
                     for q in qids])             # (Q, dim)
    qnorm = np.linalg.norm(qmat, axis=1)         # (Q,)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy(np.int64)
            norms = np.linalg.norm(mat, axis=1)
            cos = (mat @ qmat.T) / np.maximum(norms[:, None] * qnorm[None, :],
                                              1e-300)
            out_q, out_i, out_c = [], [], []
            for qi, qid in enumerate(qids):
                col = cos[:, qi]
                take = min(k, len(ids))
                # local top-k: value desc, id asc (lexsort keys reversed)
                top = np.lexsort((ids, -col))[:take]
                out_q.append(np.repeat(qid, take))
                out_i.append(ids[top])
                out_c.append(col[top])
            yield pd.DataFrame({
                "query_id": np.concatenate(out_q) if out_q
                else np.array([], dtype=object),
                "id": np.concatenate(out_i) if out_i
                else np.array([], dtype=np.int64),
                "cos": np.concatenate(out_c) if out_c
                else np.array([], dtype=np.float64)})

    local = emb.select(id_col, vec_col).mapInPandas(
        gen, "query_id string, id long, cos double")
    return _topk_per_query(local, k)


def _planes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((dim, n_bits))


def rhp_signatures(emb: DataFrame, dim: int, n_bits: int = 8, seed: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   keep_vec: bool = False) -> DataFrame:
    """(id, bucket:int[, embedding]) — sign signature vs `n_bits` random
    hyperplanes. One Arrow batch = one (B×dim)·(dim×bits) matmul; no
    per-row Python. ``keep_vec=True`` carries the vector along — the
    materialized-index layout (write_lsh_index), where co-locating vectors
    with their bucket lets a probe scan ONLY the probe-bucket partitions
    and never join back to the base table."""
    planes = _planes(dim, n_bits, seed)
    weights = (1 << np.arange(n_bits)).astype(np.int64)

    @F.pandas_udf(IntegerType())
    def bucket_of(vs: pd.Series) -> pd.Series:
        mat = np.vstack(vs.to_numpy())
        signs = (mat @ planes) > 0
        return pd.Series((signs @ weights).astype(np.int32))

    cols = [F.col(id_col).alias("id"),
            bucket_of(F.col(vec_col)).alias("bucket")]
    if keep_vec:
        cols.insert(1, F.col(vec_col).alias("embedding"))
    return emb.select(*cols)


def write_lsh_index(emb: DataFrame, out_dir: str, dim: int, n_bits: int = 8,
                    seed: int = 5, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> None:
    """Materialize the RHP-LSH ANN index: (id, embedding, bucket) written
    ``partitionBy("bucket")`` — the vector analog of the reference's
    persistent `word_image` parallel index (create_database.sql:100-124)
    and of this repo's bucket-partitioned postings (Q1). Query-time probes
    then reach the data through partition pruning (`bucket IN (...)` shows
    up as PartitionFilters in the probe scan — PLANS.md) instead of
    re-hashing the whole embedding table per query. 2^n_bits partitions,
    uniform-ish by construction (random hyperplanes), each holding
    ~N/2^n_bits vectors — at 100 TB pick n_bits so one partition is a few
    GB and writes stay wide."""
    sig = rhp_signatures(emb, dim, n_bits, seed, id_col, vec_col,
                         keep_vec=True)
    # repartition on the partition column first: without it every input
    # partition writes a file into every bucket dir (n_input x 2^n_bits
    # small files - measured 64x file explosion and a 60s write at 100k
    # rows); with it, one file per bucket
    (sig.repartition("bucket")
     .write.mode("overwrite").partitionBy("bucket").parquet(out_dir))


def load_lsh_index(spark, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)


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


def ann_topk_lsh(emb: DataFrame | None, query_vec: Sequence[float], dim: int,
                 k: int = 10, n_bits: int = 8, seed: int = 5,
                 probe_hamming: int = 1, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 signatures: DataFrame | None = None) -> DataFrame:
    """Approximate top-k: exact-score only vectors whose bucket is within
    `probe_hamming` bits of the query's bucket.

    ``signatures`` is the materialized index (load_lsh_index — same
    n_bits/seed as at write time; (id, bucket) or (id, embedding, bucket)).
    With vectors co-located (the write_lsh_index layout) the query is ONE
    partition-pruned scan of the probe buckets + exact rescore — no join,
    no full-table hash. A vector-less (id, bucket) table falls back to a
    semi-join against `emb`. With no signatures at all the whole table is
    hashed inline — the one-off/exploratory path, an unpruned full scan
    per query (round-2 verdict #1: never the serving default)."""
    planes = _planes(dim, n_bits, seed)
    probes = query_buckets(query_vec, planes, probe_hamming)
    if signatures is not None:
        pruned = signatures.filter(F.col("bucket").isin(probes))
        if "embedding" in signatures.columns:
            return brute_force_cosine_topk(pruned, query_vec, k,
                                           "id", "embedding")
        cand_ids = pruned.select("id")
    else:
        if emb is None:
            raise ValueError("need emb when no signatures table is given")
        sig = rhp_signatures(emb, dim, n_bits, seed, id_col, vec_col)
        cand_ids = sig.filter(F.col("bucket").isin(probes)).select("id")
    if emb is None:
        raise ValueError("need emb to rescore: the signatures table has no "
                         "embedding column (write it with write_lsh_index)")
    cand = emb.join(cand_ids.withColumnRenamed("id", id_col), id_col, "left_semi")
    return brute_force_cosine_topk(cand, query_vec, k, id_col, vec_col)


def ann_topk_lsh_batch(signatures: DataFrame,
                       queries: "dict[str, Sequence[float]]", dim: int,
                       k: int = 10, n_bits: int = 8, seed: int = 5,
                       probe_hamming: int = 1) -> DataFrame:
    """(query_id, id, cos, rank) — MANY ANN queries against the
    MATERIALIZED LSH index in ONE partition-pruned scan.

    The union of every query's probe buckets drives a single
    ``bucket IN (...)`` scan (PartitionFilters — same pruning as the
    single-query path); the tiny bucket→probing-queries map rides into
    the Arrow kernel as a plain dict, so each candidate row is scored
    ONLY against the queries that actually probe its bucket, and each
    batch emits just its local top-k rows per query. One per-query
    window rank finishes globally. The eval-workload shape on the
    SERVING path: Q queries cost one pruned scan of the union buckets,
    not Q scans — and the per-row work stays bounded by the number of
    queries probing that row's bucket, not Q. Requires the
    ``write_lsh_index`` layout (vectors co-located with buckets)."""
    if not queries:
        raise ValueError("queries must be non-empty")
    planes = _planes(dim, n_bits, seed)
    probing: dict[int, list[str]] = {}           # bucket -> probing qids
    for qid in queries:
        for b in query_buckets(queries[qid], planes, probe_hamming):
            probing.setdefault(int(b), []).append(qid)
    return _batch_pruned_probe(signatures, "bucket", probing, queries, k)


def _batch_pruned_probe(index: DataFrame, part_col: str,
                        probing: "dict[int, list[str]]",
                        queries: "dict[str, Sequence[float]]",
                        k: int) -> DataFrame:
    """Shared batch-ANN probe: ONE partition-pruned scan of the union of
    every query's probe partitions (`part_col IN (...)`), per-partition
    query routing inside the Arrow kernel (probing: part value → QUERY
    IDS probing it — keyed by id, not position, so callers owe no
    ordering contract), local top-k per (batch, query), one global
    per-query window rank. Used by ann_topk_lsh_batch (bucket) and
    ivf_topk_batch (cluster)."""
    if "embedding" not in index.columns:
        raise ValueError(
            "batch probe needs vectors co-located with the partition "
            "column (the write_lsh_index / write_ivf_index layout)")
    qids = sorted(queries)
    qpos = {qid: i for i, qid in enumerate(qids)}
    qmat = np.stack([np.asarray(queries[q], dtype=np.float64)
                     for q in qids])             # (Q, dim)
    qnorm = np.linalg.norm(qmat, axis=1)
    union_parts = sorted(probing)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            ids = pdf["id"].to_numpy(np.int64)
            prt = pdf[part_col].to_numpy(np.int64)
            norms = np.linalg.norm(mat, axis=1)
            # per-query accumulators across this batch's partitions: a
            # batch usually covers ONE partition, so the routing dict is
            # hit once and per-row work is bounded by the queries that
            # probe that partition, not Q
            acc: dict[int, list[tuple[np.ndarray, np.ndarray]]] = {}
            for b in np.unique(prt):
                probe_qids = probing.get(int(b))
                if not probe_qids:
                    continue
                qis = [qpos[q] for q in probe_qids]
                rows = np.nonzero(prt == b)[0]
                sub, sub_ids = mat[rows], ids[rows]
                cos = (sub @ qmat[qis].T) / np.maximum(
                    norms[rows][:, None] * qnorm[qis][None, :], 1e-300)
                for j, qi in enumerate(qis):
                    acc.setdefault(qi, []).append((sub_ids, cos[:, j]))
            out = []
            for qi, pieces in acc.items():
                a_ids = np.concatenate([p[0] for p in pieces])
                a_cos = np.concatenate([p[1] for p in pieces])
                top = np.lexsort((a_ids, -a_cos))[:min(k, len(a_ids))]
                out.append(pd.DataFrame({"query_id": qids[qi],
                                         "id": a_ids[top],
                                         "cos": a_cos[top]}))
            if out:
                yield pd.concat(out, ignore_index=True)

    pruned = (index.filter(F.col(part_col).isin(union_parts))
              .select("id", "embedding", part_col))
    local = pruned.mapInPandas(gen, "query_id string, id long, cos double")
    return _topk_per_query(local, k)


def ivf_topk_batch(assignments: DataFrame, centroids: np.ndarray,
                   queries: "dict[str, Sequence[float]]", k: int = 10,
                   n_probe: int = 4) -> DataFrame:
    """(query_id, id, cos, rank) — MANY IVF queries against the
    materialized cluster-partitioned inverted lists in ONE partition-
    pruned scan. Each query probes its own n_probe nearest clusters
    (squared-distance argsort, ties to the lowest centroid index — same
    rule as ivf_topk); the union of probe clusters drives the scan and
    the shared kernel routes rows to the queries probing their cluster."""
    if not queries:
        raise ValueError("queries must be non-empty")
    cent = np.asarray(centroids, dtype=np.float64)
    probing: dict[int, list[str]] = {}
    for qid in queries:
        q = np.asarray(queries[qid], dtype=np.float64)
        d2 = ((cent - q[None, :]) ** 2).sum(axis=1)
        for c in np.argsort(d2, kind="stable")[:n_probe]:
            probing.setdefault(int(c), []).append(qid)
    return _batch_pruned_probe(assignments, "cluster", probing, queries, k)


def ivf_assignments(emb: DataFrame, centroids: np.ndarray,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    keep_vec: bool = False) -> DataFrame:
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

    cols = [F.col(id_col).alias("id"),
            cluster_of(F.col(vec_col)).alias("cluster")]
    if keep_vec:
        cols.insert(1, F.col(vec_col).alias("embedding"))
    return emb.select(*cols)


def ivf_train_kmeans(emb: DataFrame, k: int, n_iters: int = 5,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> np.ndarray:
    """Train the IVF coarse quantizer with Lloyd's k-means, Spark-native.

    Init: the k vectors with the lowest ids (deterministic — no RNG, so
    the same table always trains the same quantizer; at 100 TB pass a
    pre-shuffled sample). Each iteration is one distributed pass: assign
    via the vectorized nearest-centroid pandas UDF (ivf_assignments),
    then new centroid = per-cluster mean via posexplode + hash agg —
    a (cluster, dim-position) keyed avg, so no vector ever aggregates
    through the driver; only the k×dim centroid matrix (index METADATA,
    like the dictionary) is collected per iteration. Empty clusters keep
    their previous centroid. Returns float64 (k, dim) centroids.

    The oracle-paired entries keep the sampled-centroid quantizer
    (SQL-expressible); this trainer is for real deployments and is pinned
    against a pure-numpy Lloyd reference in tests instead."""
    init_rows = (emb.select(id_col, vec_col)
                 .orderBy(F.col(id_col).asc()).limit(k).collect())
    if len(init_rows) < k:
        raise ValueError(f"need >= {k} vectors to train k={k} centroids")
    if len({len(r[vec_col]) for r in init_rows}) != 1:
        raise ValueError("ragged embedding lengths in the init sample")
    cent = np.array([[float(x) for x in r[vec_col]] for r in init_rows],
                    dtype=np.float64)
    for _ in range(n_iters):
        asg = ivf_assignments(emb, cent, id_col, vec_col, keep_vec=True)
        # k*dim means land driver-side through ONE Arrow batch (toPandas),
        # not k*dim Row objects — at k=4096, dim=1024 that is the
        # difference between a pivot over 4.2M ndarray cells and tens of
        # seconds of per-Row python.
        means = (asg.select("cluster",
                            F.posexplode("embedding").alias("pos", "v"))
                 .groupBy("cluster", "pos")
                 .agg(F.avg(F.col("v").cast("double")).alias("m"))
                 .toPandas())
        new = cent.copy()  # empty clusters keep their previous centroid
        new[means["cluster"].to_numpy(np.int64),
            means["pos"].to_numpy(np.int64)] = means["m"].to_numpy(np.float64)
        if np.allclose(new, cent, rtol=0, atol=1e-12):
            cent = new
            break
        cent = new
    return cent


def write_ivf_index(emb: DataFrame, centroids: np.ndarray, out_dir: str,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> None:
    """Materialize the IVF inverted lists: (id, embedding, cluster) written
    ``partitionBy("cluster")`` — each partition dir IS one inverted list
    holding its members' vectors, so an n_probe query reads exactly n_probe
    partitions (PartitionFilters `cluster IN (...)`) and rescans nothing
    else. Centroids are index metadata the caller persists alongside
    (np.save / a tiny parquet) — they must be byte-identical at query
    time."""
    asg = ivf_assignments(emb, centroids, id_col, vec_col, keep_vec=True)
    # repartition on the partition column first (see write_lsh_index)
    (asg.repartition("cluster")
     .write.mode("overwrite").partitionBy("cluster").parquet(out_dir))


def load_ivf_index(spark, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)


def ivf_topk(emb: DataFrame | None, centroids: np.ndarray,
             query_vec: Sequence[float], k: int = 10, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             assignments: DataFrame | None = None) -> DataFrame:
    """IVF-flat approximate top-k: probe the `n_probe` clusters whose
    centroids are nearest the query, exact-rescore only their members.

    `assignments` is the materialized index (load_ivf_index). With vectors
    co-located ((id, embedding, cluster) — the write_ivf_index layout) the
    query is one partition-pruned scan of the n_probe inverted lists; a
    vector-less (id, cluster) table semi-joins back to `emb`; with neither,
    assignment is derived inline (full scan per query — exploratory only)."""
    cent = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    d2 = ((cent - q[None, :]) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(d2, kind="stable")[:n_probe]]
    if assignments is not None:
        pruned = assignments.filter(F.col("cluster").isin(probes))
        if "embedding" in assignments.columns:
            return brute_force_cosine_topk(pruned, query_vec, k,
                                           "id", "embedding")
        cand_ids = pruned.select("id")
    else:
        if emb is None:
            raise ValueError("need emb when no assignments table is given")
        cand_ids = ivf_assignments(emb, cent, id_col, vec_col) \
            .filter(F.col("cluster").isin(probes)).select("id")
    if emb is None:
        raise ValueError("need emb to rescore: the assignments table has no "
                         "embedding column (write it with write_ivf_index)")
    cand = emb.join(cand_ids.withColumnRenamed("id", id_col), id_col,
                    "left_semi")
    return brute_force_cosine_topk(cand, query_vec, k, id_col, vec_col)


def pq_codebooks_sampled(emb: DataFrame, m: int, ksub: int,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> np.ndarray:
    """Deterministic sampled PQ codebooks: codeword c of subspace j is the
    j-th slice of the vector with the (c+1)-lowest id — the PQ analog of
    the sampled-centroid IVF quantizer, kept SQL-expressible so the DuckDB
    oracle can reproduce encoding exactly. Returns float64
    (m, ksub, dim//m). Real deployments use pq_train_kmeans."""
    rows = (emb.select(id_col, vec_col)
            .orderBy(F.col(id_col).asc()).limit(ksub).collect())
    if len(rows) < ksub:
        raise ValueError(f"need >= {ksub} vectors to sample {ksub} codewords")
    mat = np.array([[float(x) for x in r[vec_col]] for r in rows],
                   dtype=np.float64)
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return np.stack([mat[:, j * dsub:(j + 1) * dsub] for j in range(m)])


def pq_encode(emb: DataFrame, codebooks: np.ndarray,
              id_col: str = "vec_id", vec_col: str = "embedding",
              keep_vec: bool = False,
              carry: Sequence[str] = ()) -> DataFrame:
    """(id, code: array<int>) — product-quantization encode: split each
    vector into m subvectors, store the index of the nearest codeword per
    subspace (squared euclidean, direct form Σ(v−c)², ties to the lowest
    code — same argmin discipline as ivf_assignments). m codes of ≤256
    codewords compress a dim-float vector to m bytes: at 100 TB of
    embeddings the codes table is the only thing the ADC scan reads
    (~dim·4/m× smaller than the vectors), and it lives column-pruned in
    parquet. One vectorized pandas batch = m small (B×ksub×dsub)
    broadcasts, no per-row Python."""
    cb = np.asarray(codebooks, dtype=np.float64)  # (m, ksub, dsub)
    m, _ksub, dsub = cb.shape

    @F.pandas_udf("array<int>")
    def code_of(vs: pd.Series) -> pd.Series:
        mat = np.vstack(vs.to_numpy()).astype(np.float64)
        codes = np.empty((mat.shape[0], m), dtype=np.int32)
        for j in range(m):
            sub = mat[:, j * dsub:(j + 1) * dsub]
            d2 = np.square(sub[:, None, :] - cb[j][None, :, :]).sum(axis=2)
            codes[:, j] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    cols = [F.col(id_col).alias("id"), code_of(F.col(vec_col)).alias("code")]
    if keep_vec:
        cols.insert(1, F.col(vec_col).alias("embedding"))
    cols += [F.col(c) for c in carry]  # pass-through (e.g. IVF cluster)
    return emb.select(*cols)


def pq_train_kmeans(emb: DataFrame, m: int, ksub: int, n_iters: int = 5,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> np.ndarray:
    """Train PQ codebooks with per-subspace Lloyd's k-means, Spark-native
    (the PQ analog of ivf_train_kmeans): init = sampled codebooks; each
    iteration assigns ALL m subspaces in one distributed pass (pq_encode)
    and recomputes every (subspace, code, position) mean through one
    posexplode hash agg — only the m·ksub·dsub codebook tensor (index
    metadata) ever lands on the driver, as a single Arrow batch. Empty
    codes keep their previous codeword. Returns float64 (m, ksub, dsub)."""
    cb = pq_codebooks_sampled(emb, m, ksub, id_col, vec_col)
    dsub = cb.shape[2]
    for _ in range(n_iters):
        enc = pq_encode(emb, cb, id_col, vec_col, keep_vec=True)
        means = (enc.select(F.posexplode("embedding").alias("pos", "v"),
                            "code")
                 .select((F.col("pos") / dsub).cast("int").alias("sub"),
                         (F.col("pos") % dsub).alias("spos"),
                         F.col("code"), F.col("v"))
                 .withColumn("c", F.element_at(F.col("code"),
                                               F.col("sub") + 1))
                 .groupBy("sub", "c", "spos")
                 .agg(F.avg(F.col("v").cast("double")).alias("mval"))
                 .toPandas())
        new = cb.copy()  # empty codes keep their previous codeword
        new[means["sub"].to_numpy(np.int64),
            means["c"].to_numpy(np.int64),
            means["spos"].to_numpy(np.int64)] = \
            means["mval"].to_numpy(np.float64)
        if np.allclose(new, cb, rtol=0, atol=1e-12):
            cb = new
            break
        cb = new
    return cb


def write_pq_index(emb: DataFrame, codebooks: np.ndarray, out_dir: str,
                   coarse_centroids: np.ndarray | None = None,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> None:
    """Materialize the PQ codes table: (id, code[, cluster]) — m ints per
    vector, no raw vectors. With `coarse_centroids` the layout is IVF-PQ:
    codes partitioned by coarse cluster, so an n_probe query ADC-scans only
    its probe partitions; without, a flat codes table (the ADC scan is
    already ~dim·4/m× cheaper than scanning vectors). Codebooks (and
    centroids) are index metadata the caller persists alongside, exactly
    like write_ivf_index."""
    enc = pq_encode(emb, codebooks, id_col, vec_col)
    if coarse_centroids is None:
        enc.write.mode("overwrite").parquet(out_dir)
        return
    asg = ivf_assignments(emb, coarse_centroids, id_col, vec_col) \
        .withColumnRenamed("id", "aid")
    (enc.join(asg, enc["id"] == F.col("aid")).drop("aid")
     .repartition("cluster")
     .write.mode("overwrite").partitionBy("cluster").parquet(out_dir))


def _adc_topk_or_rescore(scored: DataFrame, query_vec: Sequence[float],
                         k: int, rescore_emb: DataFrame | None,
                         rescore_c: int | None, id_col: str,
                         vec_col: str) -> DataFrame:
    """Shared ADC tail (pq_adc_topk / ivfpq_adc_topk): top-k by ADC
    distance, ties to the lowest id; or narrow to the top rescore_c
    (default 4k) and exact-rescore by true cosine — the tiny candidate
    set is the broadcast side of the semi-join into the vector table."""
    if rescore_emb is None:
        return scored.orderBy(F.asc("adc"), F.asc("id")).limit(k)
    c = rescore_c if rescore_c is not None else 4 * k
    cand = scored.orderBy(F.asc("adc"), F.asc("id")).limit(c).select("id")
    sel = rescore_emb.join(
        F.broadcast(cand.withColumnRenamed("id", id_col)), id_col,
        "left_semi")
    return brute_force_cosine_topk(sel, query_vec, k, id_col, vec_col)


def ivf_residuals(emb: DataFrame, centroids: np.ndarray,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """(id, cluster, residual) — assign each vector to its nearest coarse
    centroid (direct-form squared distance, ties to the lowest index —
    identical discipline to ivf_assignments) and subtract it. This is the
    IVF-PQ transform: PQ codes quantize the RESIDUAL, whose spread is the
    intra-cluster structure. Flat PQ on clustered data collapses every
    cluster member onto the same codeword — measured recall@10 = 0.02 on
    the 256-gaussian bench corpus (scripts/bench_ann.py) — while residual
    PQ resolves the within-cluster ordering. One Arrow pass, centroids in
    the closure (index metadata)."""
    cent = np.asarray(centroids, dtype=np.float64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            out_c = np.empty(mat.shape[0], dtype=np.int32)
            res = np.empty_like(mat, dtype=np.float32)
            step = max(1, (1 << 22) // max(1, cent.shape[0]
                                           * cent.shape[1]))
            for s in range(0, mat.shape[0], step):
                d2 = np.square(mat[s:s + step, None, :]
                               - cent[None, :, :]).sum(axis=2)
                asg = np.argmin(d2, axis=1)
                out_c[s:s + step] = asg.astype(np.int32)
                res[s:s + step] = (mat[s:s + step] - cent[asg]) \
                    .astype(np.float32)
            yield pd.DataFrame({"id": pdf[id_col].astype(np.int64),
                                "cluster": out_c, "residual": list(res)})

    return emb.select(id_col, vec_col).mapInPandas(
        gen, "id long, cluster int, residual array<float>")


def write_ivfpq_index(emb: DataFrame, centroids: np.ndarray,
                      codebooks: np.ndarray, out_dir: str,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> None:
    """Materialize the IVF-PQ index: (id, code) partitioned by coarse
    `cluster`, codes over RESIDUALS (ivf_residuals). A query then reads
    only its n_probe partitions AND each partition holds m small ints per
    vector — the two scale levers (partition pruning × ~dim·4/m
    compression) compose. Codebooks must be trained/sampled on the same
    residual distribution (pq_codebooks_sampled / pq_train_kmeans over
    ivf_residuals output)."""
    res = ivf_residuals(emb, centroids, id_col, vec_col)
    # carry the cluster through the encode: one pass, no re-derivation of
    # the residual lineage and no id-shuffle join
    enc = pq_encode(res, codebooks, id_col="id", vec_col="residual",
                    carry=("cluster",))
    (enc.repartition("cluster")
     .write.mode("overwrite").partitionBy("cluster").parquet(out_dir))


def ivfpq_adc_topk(codes: DataFrame, centroids: np.ndarray,
                   codebooks: np.ndarray, query_vec: Sequence[float],
                   k: int = 10, n_probe: int = 8,
                   rescore_emb: DataFrame | None = None,
                   rescore_c: int | None = None,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ approximate top-k: probe the n_probe nearest coarse
    clusters; inside each, score codes by ADC against a PER-CLUSTER
    lookup table built from the query's residual (q − centroid_c) — the
    canonical IVF-PQ query. The probe is a partition-pruned scan of the
    codes table (`cluster IN (...)`); scoring is one Arrow-batched numpy
    gather over (cluster, code); top-k by ADC, ties to the lowest id;
    optional exact rescore of the top rescore_c (default 4k) via
    semi-join into the vector table."""
    cent = np.asarray(centroids, dtype=np.float64)
    cb = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = cb.shape
    q = np.asarray(query_vec, dtype=np.float64)
    d2c = ((cent - q[None, :]) ** 2).sum(axis=1)
    probes = sorted(int(i) for i in
                    np.argsort(d2c, kind="stable")[:n_probe])
    luts = np.stack([np.square((q - cent[c]).reshape(m, 1, dsub)
                               - cb).sum(axis=2) for c in probes])
    probe_arr = np.asarray(probes, dtype=np.int64)

    @F.pandas_udf("double")
    def adc_of(cl: pd.Series, cs: pd.Series) -> pd.Series:
        mat = np.vstack(cs.to_numpy()).astype(np.int64)
        rows = np.searchsorted(probe_arr, cl.to_numpy().astype(np.int64))
        return pd.Series(luts[rows[:, None], np.arange(m)[None, :],
                              mat].sum(axis=1))

    pruned = codes.filter(F.col("cluster").isin(probes))
    scored = pruned.select(F.col("id"),
                           adc_of(F.col("cluster"),
                                  F.col("code")).alias("adc"))
    return _adc_topk_or_rescore(scored, query_vec, k, rescore_emb,
                                rescore_c, id_col, vec_col)


def pq_adc_topk(codes: DataFrame, codebooks: np.ndarray,
                query_vec: Sequence[float], k: int = 10,
                rescore_emb: DataFrame | None = None,
                rescore_c: int | None = None,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Asymmetric-distance (ADC) approximate top-k over a PQ codes table.

    The query builds an m×ksub lookup table of squared distances from its
    subvectors to every codeword (driver-side numpy, index metadata
    sized); the scan then scores each row as Σ_j LUT[j][code[j]]. Small
    LUTs (m·ksub ≤ 512) stay pure JVM column expressions (element_at into
    the LUT literal, whole-stage codegen, no Python in the scan —
    PLANS.md); larger LUTs switch to an Arrow-batched numpy gather
    (lut[j, codes[:, j]].sum) — measured: at m=8, ksub=256 the 2048-deep
    literal expression tree costs ~0.8 s of per-query codegen, far more
    than the vectorized gather. Top-k by ADC distance, ties to the lowest
    id. With `rescore_emb`, the top `rescore_c` (default 4k) ADC
    candidates are exact-rescored by true cosine (semi-join into the
    vector table — the candidate set is the broadcast side) and the final
    top-k is exact over them."""
    cb = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = cb.shape
    q = np.asarray(query_vec, dtype=np.float64)
    if q.shape[0] != m * dsub:
        raise ValueError(f"query dim {q.shape[0]} != m*dsub {m * dsub}")
    lut = np.square(q.reshape(m, 1, dsub) - cb).sum(axis=2)  # (m, ksub)
    if m * ksub <= 512:
        lut_lit = F.array(*[F.array(*[F.lit(float(x)) for x in row])
                            for row in lut])
        adc = None
        for j in range(m):
            term = F.element_at(F.element_at(lut_lit, j + 1),
                                F.col("code").getItem(j) + 1)
            adc = term if adc is None else adc + term
    else:
        @F.pandas_udf("double")
        def adc_of(cs: pd.Series) -> pd.Series:
            mat = np.vstack(cs.to_numpy()).astype(np.int64)  # (B, m)
            return pd.Series(lut[np.arange(m)[None, :], mat].sum(axis=1))
        adc = adc_of(F.col("code"))
    scored = codes.select(F.col("id"), adc.alias("adc"))
    return _adc_topk_or_rescore(scored, query_vec, k, rescore_emb,
                                rescore_c, id_col, vec_col)


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


def semdedup_survivors(emb: DataFrame, centroids: np.ndarray,
                       threshold: float = 0.95,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       max_cluster_size: int | None = None) -> DataFrame:
    """Semantic dedup (SemDeDup, Abbas et al. 2023): k-means-cluster the
    embeddings, call same-cluster pairs with cosine ≥ threshold semantic
    duplicates, and within every duplicate pair KEEP the member farther
    from its cluster centroid (lower centroid-cosine — the paper's
    keep-rule: "far" examples preserve diversity; prototypical ones are
    redundant). Returns the survivor table (id, cluster, ccos).

    Scale shape: one assignment pass (vectorized pandas UDF, the IVF
    coarse quantizer), one broadcast join to the k×dim centroid table for
    centroid-cosines, then a cluster-keyed self-join — the quadratic
    verify is bounded per cluster exactly like the LSH-bucket verify in
    embedding_cosine_dedup_pairs, and cluster sizes are ~n/k by k-means
    construction (train with ivf_train_kmeans; pick k so n/k pairs fit an
    executor). All cosines are sequential-fold JVM expressions (zip_with/
    aggregate), matching DuckDB's list arithmetic for the oracle.

    Drop rule per pair: the higher-ccos member loses; exact ccos ties
    (e.g. planted identical vectors) drop the higher id. Pairwise-drop
    keeps at least one member of every duplicate clique — the clique's
    min-ccos member never loses a comparison. Deterministic end-to-end:
    re-runs reproduce the identical keep-set.

    ``max_cluster_size`` is the skew guard: a degenerate corpus (or a
    too-small k) can concentrate a huge fraction of rows in one cluster
    and make its quadratic verify the straggler. When set, any cluster
    larger than the cap is deterministically SUB-SPLIT into
    ceil(size/cap) hash buckets and pairs are compared within
    (cluster, sub-bucket) only — per-task pair count stays ≤ ~cap²/2 at
    the cost of missing dup pairs that straddle sub-buckets of an
    oversize cluster (the standard recall trade; tighten by raising k on
    the quantizer instead of relying on the cap). Default None compares
    every same-cluster pair (the oracle-paired mode).

    Reference parity: beyond-reference training-data family (SURVEY
    §2.8); the reference's nearest analog is the image binary index
    dedupe-by-equality (Indexer.java), which has no semantic notion."""
    if max_cluster_size is not None and max_cluster_size <= 1:
        raise ValueError("max_cluster_size must be > 1 "
                         f"(got {max_cluster_size})")
    spark = emb.sparkSession
    cent = np.asarray(centroids, dtype=np.float64)
    cdf = spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cent)],
        "cluster int, _cv array<double>")
    asg = ivf_assignments(emb, cent, id_col, vec_col, keep_vec=True)
    dotc = F.aggregate(
        F.zip_with("embedding", "_cv",
                   lambda x, y: x.cast("double") * y),
        F.lit(0.0), lambda acc, x: acc + x)
    # persist: the scored table (whose lineage embeds the assignment UDF
    # over every vector) feeds BOTH self-join branches and the final
    # anti-join — without it the assignment pass runs 3x (measured 100k
    # vectors: ~74s -> see BENCH_SEMDEDUP.json). Release via the
    # result._persisted hook after the final action (same contract — and
    # same transformation-drops-the-attribute caveat — as
    # dedup.incremental_lsh_pairs).
    scored = (asg.join(F.broadcast(cdf), "cluster")
              .select("id", "cluster", "embedding",
                      (dotc / (_norm_expr(F.col("embedding"))
                               * _norm_expr(F.col("_cv")))).alias("ccos"))
              .persist())
    scored_handle = scored          # the persisted object (unpersist this;
    # the sub-split reassignment below builds ON it, it doesn't replace it)
    pair_keys = ["cluster"]
    if max_cluster_size is not None:
        sizes = scored.groupBy("cluster").agg(F.count("*").alias("_csz"))
        nsub = F.ceil(F.col("_csz") / F.lit(max_cluster_size))
        scored = (scored.join(F.broadcast(sizes), "cluster")
                  .withColumn("_sub",
                              F.pmod(F.xxhash64(F.col("id"), F.lit(1733)),
                                     nsub).cast("int"))
                  .drop("_csz"))
        pair_keys = ["cluster", "_sub"]
    a, b = scored.alias("a"), scored.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.embedding"), F.col("b.embedding"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    cos = dot / (_norm_expr(F.col("a.embedding"))
                 * _norm_expr(F.col("b.embedding")))
    join_cond = F.col("a.id") < F.col("b.id")
    for kcol in pair_keys:
        join_cond = (F.col(f"a.{kcol}") == F.col(f"b.{kcol}")) & join_cond
    pairs = a.join(b, join_cond).filter(cos >= F.lit(threshold))
    loser = F.when(
        (F.col("a.ccos") > F.col("b.ccos"))
        | ((F.col("a.ccos") == F.col("b.ccos"))
           & (F.col("a.id") > F.col("b.id"))),
        F.col("a.id")).otherwise(F.col("b.id"))
    losers = pairs.select(loser.alias("id")).distinct()
    out = (scored.join(losers, "id", "left_anti")
           .select("id", "cluster", "ccos"))
    out._persisted = [scored_handle]
    return out
