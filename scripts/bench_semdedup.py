"""SemDeDup-at-scale benchmark: cluster-then-pairwise semantic dedup.

The per-cluster quadratic verify is the operator's scale risk; this
script measures it on a corpus with REAL duplicate structure: N vectors
from a 256-gaussian mixture (neighbor structure), plus PLANTED exact
copies (0.5% of N) that a correct run must drop. Clusters come from the
k lowest-id vectors (the deterministic sampled quantizer the entries
use) — at k=1024 a cluster holds ~N/1024 vectors, so the verify cost is
~N/1024 * N/2 pair-cosines total, linear in N for fixed cluster size.

Prints ONE JSON line and writes BENCH_SEMDEDUP.json.
Env: SPARK_GRAFT_SEMDEDUP_VECS (default 100000), SPARK_GRAFT_CPUS (16).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 64
N_CENTERS = 256
NOISE = 0.35
K_CLUSTERS = 1024


def main() -> None:
    from pyspark.sql import functions as F

    from spidey_search_engine_spark.operators.similarity import (
        semdedup_survivors)
    from spidey_search_engine_spark.session import get_spark

    n = int(os.environ.get("SPARK_GRAFT_SEMDEDUP_VECS", "100000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    parts = cpus * 2
    spark = get_spark(app="bench_semdedup", master=f"local[{cpus}]",
                      shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")

    centers = np.random.Generator(np.random.PCG64(99)) \
        .standard_normal((N_CENTERS, DIM))

    def gen(pid_rows):
        pid, lo, hi = pid_rows
        rng = np.random.Generator(np.random.PCG64(1000 + pid))
        ids = np.arange(lo, hi)
        c = ids % N_CENTERS
        vecs = centers[c] + NOISE * rng.standard_normal((len(ids), DIM))
        for i, v in zip(ids, vecs):
            yield int(i), [float(x) for x in v.astype(np.float32)]

    bounds = np.linspace(0, n, parts + 1, dtype=np.int64)
    emb = spark.sparkContext.parallelize(
        [(p, int(bounds[p]), int(bounds[p + 1])) for p in range(parts)],
        parts).flatMap(gen).toDF("vec_id long, embedding array<float>")
    n_plant = n // 200
    planted = emb.unionByName(
        emb.filter(F.col("vec_id") < n_plant)
        .select((F.col("vec_id") + 10 * n).alias("vec_id"), "embedding"))
    planted = planted.localCheckpoint()   # freeze: one generator pass
    n_total = planted.count()

    head = (planted.filter(F.col("vec_id") < K_CLUSTERS)
            .orderBy("vec_id").collect())
    cent = np.array([r["embedding"] for r in head], dtype=np.float64)

    best = float("inf")
    leaked = None
    for _ in range(2):                    # best-of-2: host noise
        t0 = time.monotonic()
        survivors = semdedup_survivors(planted, cent, threshold=0.999)
        got = survivors.count()
        best = min(best, time.monotonic() - t0)
        # correctness proxy: every planted exact copy (cos=1, ccos tie ->
        # higher id) must be gone
        leaked = survivors.filter(F.col("id") >= 10 * n).count()
        for h in getattr(survivors, "_persisted", []):
            h.unpersist()
    dropped = n_total - got

    out = {
        "n_vecs": n_total, "dim": DIM, "k_clusters": K_CLUSTERS,
        "planted_copies": n_plant,
        "semdedup_sec": round(best, 2),
        "vecs_per_sec": round(n_total / best, 1),
        "dropped": int(dropped),
        "planted_leaked": int(leaked),
        "threshold": 0.999,
        "timestamp": time.time(),
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH_SEMDEDUP.json"), "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
