"""Dedup-at-scale benchmark: MinHash-LSH near-dup detection + cluster
resolution over a 100k-doc corpus with planted duplicates.

The dedup family's design claims (banded LSH self-join on uniform keys,
candidate-first Jaccard verify, O(diameter) cluster propagation) are about
scale; this measures them. Generates the deterministic synthetic corpus
distributed (sources/corpus.py), plants exact copies (1%) and near-dup
suffix edits (2%), then times:

* fingerprint+band+candidate+verify (minhash_lsh_dedup, production
  xxhash64 path, threshold 0.5),
* cluster resolution + canonical pick (dedup_clusters),
* exact sha dedup for reference (exact_dedup).

Prints ONE JSON line and writes BENCH_DEDUP.json:
  {"n_docs": N, "exact_sec": ..., "lsh_sec": ..., "cluster_sec": ...,
   "docs_per_sec_lsh": ..., "pairs": ..., "clusters_gt1": ...,
   "planted_recovered_pct": ...}

Env: SPARK_GRAFT_DEDUP_DOCS (default 100000), SPARK_GRAFT_CPUS (16).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from spidey_search_engine_spark.operators.dedup import (
        dedup_clusters, exact_dedup, minhash_lsh_dedup)
    from spidey_search_engine_spark.session import get_spark
    from spidey_search_engine_spark.sources.corpus import generate_corpus_df

    n = int(os.environ.get("SPARK_GRAFT_DEDUP_DOCS", "100000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark(app="bench-dedup", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")

    path = f"/tmp/spidey_dedup_{n}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        base = generate_corpus_df(spark, n, seed=13, partitions=64,
                                  with_doc_id=True) \
            .withColumn("doc_id", F.col("doc_id").cast("long"))
        exact = (base.filter(F.col("doc_id") % 100 == 0)
                 .withColumn("doc_id", F.col("doc_id") + 10_000_000))
        near = (base.filter(F.col("doc_id") % 50 == 1)
                .withColumn("doc_id", F.col("doc_id") + 20_000_000)
                .withColumn("content",
                            F.concat(F.col("content"),
                                     F.lit(" trailing edit marker xyz"))))
        base.unionByName(exact).unionByName(near) \
            .write.mode("overwrite").parquet(path)
    corpus = spark.read.parquet(path)
    n_total = corpus.count()
    n_exact = n // 100
    n_near = n // 50

    t0 = time.monotonic()
    n_kept = exact_dedup(corpus).filter(F.col("keep")).count()
    exact_sec = time.monotonic() - t0

    t0 = time.monotonic()
    pairs = minhash_lsh_dedup(corpus, num_hashes=32, bands=8,
                              threshold=0.5).localCheckpoint()
    n_pairs = pairs.count()
    lsh_sec = time.monotonic() - t0

    t0 = time.monotonic()
    clusters = dedup_clusters(corpus, pairs).localCheckpoint()
    n_dropped = clusters.filter(F.col("canon") == 0).count()
    cluster_sec = time.monotonic() - t0

    # recovery: every planted duplicate (exact AND near) should be dropped
    planted = clusters.filter(F.col("doc_id") >= 10_000_000)
    recovered = planted.filter(F.col("canon") == 0).count()

    out = {
        "n_docs": n_total,
        "planted_exact": n_exact, "planted_near": n_near,
        "exact_dedup_sec": round(exact_sec, 2),
        "lsh_pairs_sec": round(lsh_sec, 2),
        "cluster_sec": round(cluster_sec, 2),
        "docs_per_sec_lsh": round(n_total / lsh_sec, 1),
        "docs_per_sec_total": round(
            n_total / (lsh_sec + cluster_sec), 1),
        "pairs": n_pairs, "dropped_as_dup": n_dropped,
        "exact_kept": n_kept,
        "planted_recovered_pct": round(
            100.0 * recovered / (n_exact + n_near), 1),
        "params": "minhash 32 hashes x 8 bands, jaccard >= 0.5, "
                  "xxhash64 production path",
        "timestamp": time.time(),
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH_DEDUP.json"), "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
