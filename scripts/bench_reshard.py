"""Reshard wall-clock at 2.4M docs → BENCH_RESHARD.json.

The claim to measure: re-layout is a bytes-only operation, so changing
shard topology costs a small fraction of the rebuild it replaces (the
same corpus' fresh build measured 160-220 s in BENCH_SERVE's build_sec).
Uses the serve bench's cached 2.4M monolithic index; reshards it into 4
shards and verifies the federated top-10 equals the monolithic ranking
raw-float for a probe query.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from spidey_search_engine_spark.operators.build import load_index
    from spidey_search_engine_spark.operators.federate import \
        federated_bm25_topk
    from spidey_search_engine_spark.operators.reshard import reshard_index
    from spidey_search_engine_spark.operators.search import bm25_topk
    from spidey_search_engine_spark.session import get_spark

    n_docs = int(os.environ.get("SPIDEY_SERVE_DOCS", "2400000"))
    mono_dir = f"/tmp/spidey_serve_idx_{n_docs}"
    if not os.path.isdir(os.path.join(mono_dir, "stats")):
        raise SystemExit(f"{mono_dir} not built — run scripts/"
                         "bench_serve.py first (its build is the "
                         "rebuild-cost reference)")
    master = os.environ.get("SPARK_GRAFT_MASTER", "local[16]")
    spark = get_spark(app="bench-reshard", master=master)
    spark.sparkContext.setLogLevel("ERROR")

    out = f"/tmp/spidey_reshard_{n_docs}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.monotonic()
    stats = reshard_index(spark, [mono_dir], out, 4)
    reshard_sec = round(time.monotonic() - t0, 2)

    mono = load_index(spark, mono_dir)
    shards = [load_index(spark, os.path.join(out, f"shard_{k}"))
              for k in range(4)]
    q = "merge sort"
    mono_top = [(r["doc_id"], r["score"]) for r in
                bm25_topk(spark, mono, q, k=10).collect()]
    fed_top = [(r["doc_id"], r["score"]) for r in
               federated_bm25_topk(spark, shards, q, k=10).collect()]
    if fed_top != mono_top:
        raise SystemExit(f"RESHARD MISMATCH: {fed_top[:3]} vs "
                         f"{mono_top[:3]}")
    payload = {
        "n_docs": n_docs,
        "master": master,
        "shards": 4,
        "reshard_sec": reshard_sec,
        "shard_n_docs": [s["n_docs"] for s in stats],
        "rebuild_sec_reference":
            "BENCH_SERVE build_sec for the same corpus: 162.7 s "
            "(mono), 196-221 s (half-size shards) — reshard moves "
            "compressed bytes only, no tokenize/stem/content read",
        "federated_matches_monolithic_top10_raw_float": True,
    }
    print(json.dumps(payload))
    with open(os.path.join(REPO, "BENCH_RESHARD.json"), "w") as f:
        json.dump(payload, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
