"""Compaction benchmark: K-chunk postings tree vs compacted snapshot.

Measures what `plans/snapshot.compact_postings` buys at query time. A
stream of appends leaves the incremental layout
``postings/chunk=<c>/bucket=<b>/part-*`` — every query-term probe then
opens K× the parquet files and term-sorted locality holds only within one
chunk. Compaction rewrites the same rows into one range-laid-out,
term-sorted file set per bucket (snapshot v2, copy-on-write).

This script builds a many-chunk index with `build_index_resumable`
(identical on-disk shape to streaming appends), times a warm BM25 query
set against snapshot v1 (chunked) and v2 (compacted), and reports:

  {"n_docs": ..., "n_chunks": K, "files_before": ..., "files_after": ...,
   "compaction_sec": ..., "queries_chunked": {...}, "queries_compacted":
   {...}, "median_chunked_sec": ..., "median_compacted_sec": ...,
   "speedup_median": ...}

Env knobs: SPARK_GRAFT_COMPACT_DOCS (default 120000),
SPARK_GRAFT_CPUS (default 8), repeats per query = best of
SPARK_GRAFT_COMPACT_REPEATS (default 2; host wall-times swing 2.5×).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = {
    "bm25_q1": "merge sort table",
    "bm25_q2": "fast data scan filter",
    "bm25_q3": "hash join group window",
    "bm25_q4": "query row batch value",
    "bm25_q5": "customer line order key",
}


def _parquet_files(root: str) -> int:
    from spidey_search_engine_spark.plans.snapshot import parquet_file_count
    return parquet_file_count(root)


def _run_queries(spark, idx) -> dict[str, float]:
    from spidey_search_engine_spark.operators.search import bm25_topk
    repeats = int(os.environ.get("SPARK_GRAFT_COMPACT_REPEATS", "2"))
    bm25_topk(spark, idx, "warm up pass", k=10).collect()
    out: dict[str, float] = {}
    for name, q in QUERIES.items():
        best = float("inf")
        for _ in range(repeats):
            t0 = time.monotonic()
            bm25_topk(spark, idx, q, k=10).collect()
            best = min(best, time.monotonic() - t0)
        out[name] = round(best, 4)
    return out


def main() -> None:
    n_docs = int(os.environ.get("SPARK_GRAFT_COMPACT_DOCS", "120000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    from spidey_search_engine_spark.operators.search import bm25_topk
    from spidey_search_engine_spark.plans.lineage import build_index_resumable
    from spidey_search_engine_spark.plans.snapshot import (compact_postings,
                                                           init_snapshots,
                                                           load_snapshot)
    from spidey_search_engine_spark.session import get_spark
    from spidey_search_engine_spark.sources.corpus import generate_corpus_df

    spark = get_spark(app="bench-compaction", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = f"/tmp/spidey_compact_bench_{n_docs}"
    shutil.rmtree(out_dir, ignore_errors=True)
    corpus = generate_corpus_df(spark, n_docs, seed=42, partitions=64,
                                with_doc_id=True).localCheckpoint()
    # seg_bits=10, chunk_segments=4 → 4096-doc chunks → ~n_docs/4096 chunks
    build_index_resumable(spark, corpus, out_dir, profile="code",
                          seg_bits=10, chunk_segments=4, n_buckets=32)
    init_snapshots(out_dir)
    n_chunks = len([d for d in os.listdir(os.path.join(out_dir, "postings"))
                    if d.startswith("chunk=")])
    files_before = _parquet_files(os.path.join(out_dir, "postings"))

    s1 = load_snapshot(spark, out_dir)
    q_chunked = _run_queries(spark, s1)

    t0 = time.monotonic()
    m2 = compact_postings(spark, out_dir, files_per_bucket=1)
    compaction_sec = round(time.monotonic() - t0, 3)
    files_after = _parquet_files(os.path.join(out_dir, m2["postings"]))

    s2 = load_snapshot(spark, out_dir)
    q_compacted = _run_queries(spark, s2)

    # rank identity: compaction must not change any result
    for q in QUERIES.values():
        a = [(r["doc_id"], round(r["score"], 9)) for r in
             bm25_topk(spark, s1, q, k=10).collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in
             bm25_topk(spark, s2, q, k=10).collect()]
        assert a == b, f"compaction changed results for {q!r}"

    med_b = statistics.median(q_chunked.values())
    med_a = statistics.median(q_compacted.values())
    result = {
        "n_docs": n_docs,
        "n_chunks": n_chunks,
        "files_before": files_before,
        "files_after": files_after,
        "compaction_sec": compaction_sec,
        "queries_chunked": q_chunked,
        "queries_compacted": q_compacted,
        "median_chunked_sec": round(med_b, 4),
        "median_compacted_sec": round(med_a, 4),
        "speedup_median": round(med_b / med_a, 3) if med_a else None,
        "rank_identical": True,
        "timestamp": time.time(),
    }
    with open(os.path.join(REPO, "BENCH_COMPACTION.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
