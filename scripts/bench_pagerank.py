"""Incremental-PageRank bench: warm-start vs cold power iteration at a
600k-node link graph (the sf0.1-scale graph the round-4 verdict named).

Deterministic graph: node i links to (i*7+j) % N for j in 1..8 plus a
hub edge i -> i % 1000 (power-law-ish in-degree on the first 1000
nodes). Delta: 1% of nodes (i % 100 == 7) get one rewired edge. Measures
iterations + wall for (a) cold from-scratch on the base graph, (b) cold
from-scratch on the perturbed graph, (c) warm-start on the perturbed
graph from (a)'s ranks, and pins max|warm - cold| < 10*tol.

Writes BENCH_PAGERANK.json. Env: SPIDEY_PR_NODES (default 600_000),
SPARK_GRAFT_CPUS (default 16).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(os.environ.get("SPIDEY_PR_NODES", "600000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
TOL = 1e-4


def main() -> None:
    from pyspark.sql import functions as F

    from spidey_search_engine_spark.operators.pagerank import (
        pagerank, pagerank_incremental)
    from spidey_search_engine_spark.session import get_spark

    spark = get_spark(app="bench-pagerank", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS * 2)
    spark.sparkContext.setLogLevel("ERROR")

    ids = spark.range(N).select(F.col("id").alias("doc_id"))
    base_edges = None
    for j in range(1, 9):
        part = ids.select(F.col("doc_id").alias("src_doc_id"),
                          ((F.col("doc_id") * 7 + j) % N)
                          .alias("dst_doc_id"))
        base_edges = part if base_edges is None else base_edges.union(part)
    base_edges = base_edges.union(
        ids.select(F.col("doc_id").alias("src_doc_id"),
                   (F.col("doc_id") % 1000).alias("dst_doc_id")))
    base_edges = base_edges.repartition(CPUS * 2).localCheckpoint()

    # 1% delta: nodes with i % 100 == 7 swap their hub edge for i -> i+13
    delta_nodes = F.col("src_doc_id") % 100 == 7
    hub = F.col("dst_doc_id") == F.col("src_doc_id") % 1000
    pert_edges = (base_edges
                  .withColumn("dst_doc_id",
                              F.when(delta_nodes & hub,
                                     (F.col("src_doc_id") + 13) % N)
                              .otherwise(F.col("dst_doc_id")))
                  ).repartition(CPUS * 2).localCheckpoint()

    out = {"n_nodes": N, "tol": TOL, "mode": "reference"}

    info = {}
    t0 = time.monotonic()
    base_ranks = pagerank(spark, base_edges, N, tol=TOL,
                          all_doc_ids=ids, iter_info=info)
    base_ranks = base_ranks.localCheckpoint()
    base_ranks.count()
    out["cold_base"] = {"wall_sec": round(time.monotonic() - t0, 2),
                        "iterations": info["iterations"]}
    print(f"cold base: {out['cold_base']}", file=sys.stderr)

    info = {}
    t0 = time.monotonic()
    cold = pagerank(spark, pert_edges, N, tol=TOL,
                    all_doc_ids=ids, iter_info=info).localCheckpoint()
    cold.count()
    out["cold_perturbed"] = {"wall_sec": round(time.monotonic() - t0, 2),
                             "iterations": info["iterations"]}
    print(f"cold perturbed: {out['cold_perturbed']}", file=sys.stderr)

    info = {}
    t0 = time.monotonic()
    warm = pagerank_incremental(spark, pert_edges, N, base_ranks,
                                tol=TOL, all_doc_ids=ids,
                                iter_info=info).localCheckpoint()
    warm.count()
    out["warm_perturbed"] = {"wall_sec": round(time.monotonic() - t0, 2),
                             "iterations": info["iterations"]}
    print(f"warm perturbed: {out['warm_perturbed']}", file=sys.stderr)

    diff = (cold.withColumnRenamed("page_rank", "pc")
            .join(warm.withColumnRenamed("page_rank", "pw"), "doc_id")
            .agg(F.max(F.abs(F.col("pc") - F.col("pw")))).collect()[0][0])
    out["max_abs_diff_warm_vs_cold"] = float(diff)
    out["identical_at_tolerance"] = bool(diff < 10 * TOL)
    out["iteration_reduction"] = round(
        out["cold_perturbed"]["iterations"]
        / max(1, out["warm_perturbed"]["iterations"]), 2)
    out["wall_reduction"] = round(
        out["cold_perturbed"]["wall_sec"]
        / max(1e-9, out["warm_perturbed"]["wall_sec"]), 2)

    with open(os.path.join(REPO, "BENCH_PAGERANK.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()
    if not out["identical_at_tolerance"]:
        raise SystemExit("warm-start diverged from the cold solve — "
                         "numbers above measure a BROKEN warm start")


if __name__ == "__main__":
    main()
