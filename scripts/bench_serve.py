"""Serving-at-scale probe: the FULL warm query surface at 2.4M docs,
including the federated-sharding overhead.

Builds (once, cached in /tmp) a 2.4M-doc index plus a 2-shard federated
split of the SAME corpus (doc_id parity, different bucket counts), then
measures the warm latency of each query family on a Searcher-warmed
monolithic index and the federated path over plain (cold-dictionary)
shard indexes:

* bm25_hot / bm25_mid   — exhaustive BM25, hot-term and mid-df bags
* boolean_full          — must + must-not + wildcard in one plan
                          (Searcher.boolean; wildcard expands off the
                          prefix projection)
* wildcard_only         — bm25 over `mer*` expansion
* batch10               — 10 queries in ONE job (bm25_topk_batch)
* federated_hot         — the bm25_hot bag across the two shards with
                          global stats (operators/federate.py)

Each family runs once to warm, then REPEATS timed samples; the JSON
carries every sample (host noise is 2.5×; never trust one number). The
federated block also asserts rank-and-score equality with the
monolithic top-20 at this scale — the invariant test at 2.4M, not 400
docs — and reports federated_overhead = fed_p50 / mono_p50 (expected
≈1: two half-size pruned probes read the same bytes as one full probe;
the extra cost is one df-lookup job per shard, which a warmed
FederatedSearcher-style cache would also absorb).

Writes BENCH_SERVE.json. Env: SPIDEY_SERVE_DOCS (default 2_400_000),
SPARK_GRAFT_MASTER (default local[16]).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPEATS = 3


def _ensure_indexes(spark, n_docs: int):
    from pyspark.sql import functions as F

    from spidey_search_engine_spark.operators.build import build_index
    from spidey_search_engine_spark.sources.corpus import generate_corpus_df

    mono = f"/tmp/spidey_serve_idx_{n_docs}"
    fed_a = f"/tmp/spidey_serve_idx_{n_docs}_fed_a"
    fed_b = f"/tmp/spidey_serve_idx_{n_docs}_fed_b"
    corpus_dir = f"/tmp/spidey_serve_corpus_{n_docs}"
    built = {}
    need = [d for d in (mono, fed_a, fed_b)
            if not os.path.exists(os.path.join(d, "stats"))]
    if need:
        if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
            # materialize once: generation is pure python and would
            # otherwise re-run for every pass over each build lineage
            generate_corpus_df(spark, n_docs, seed=7, partitions=32,
                               with_doc_id=True) \
                .write.mode("overwrite").parquet(corpus_dir)
        corpus = spark.read.parquet(corpus_dir)
        for out, flt, nb in ((mono, None, 64),
                             (fed_a, F.col("doc_id") % 2 == 0, 32),
                             (fed_b, F.col("doc_id") % 2 == 1, 64)):
            if out not in need:
                continue
            src = corpus if flt is None else corpus.filter(flt)
            t0 = time.monotonic()
            build_index(spark, src, out, profile="code", seg_bits=16,
                        n_buckets=nb)
            built[os.path.basename(out)] = round(time.monotonic() - t0, 2)
            print(f"built {out} in {built[os.path.basename(out)]}s",
                  file=sys.stderr)
    return mono, [fed_a, fed_b], built


def _timed(fn, label: str, out: dict):
    fn()  # warm
    samples = []
    for _ in range(REPEATS):
        t0 = time.monotonic()
        fn()
        samples.append(round(time.monotonic() - t0, 4))
    out[label] = {"p50_sec": sorted(samples)[len(samples) // 2],
                  "samples": samples}
    print(f"{label}: {out[label]}", file=sys.stderr)


def main() -> None:
    from spidey_search_engine_spark.operators.build import load_index
    from spidey_search_engine_spark.operators.federate import (
        FederatedSearcher, federated_bm25_topk_tokens)
    from spidey_search_engine_spark.operators.search import (
        Searcher, bm25_topk_batch, bm25_topk_tokens)
    from spidey_search_engine_spark.session import get_spark

    n_docs = int(os.environ.get("SPIDEY_SERVE_DOCS", "2400000"))
    master = os.environ.get("SPARK_GRAFT_MASTER", "local[16]")
    spark = get_spark(app="bench-serve", master=master)
    spark.sparkContext.setLogLevel("ERROR")

    mono_dir, shard_dirs, built = _ensure_indexes(spark, n_docs)
    mono = load_index(spark, mono_dir)
    shards = [load_index(spark, d) for d in shard_dirs]

    HOT = ["merge", "sort"]
    MID = ["binary", "search", "tree", "node"]
    BATCH = {f"q{i}": q for i, q in enumerate([
        "merge sort", "import return", "binary search tree node",
        "sort search heap", "return value index", "merge table scan",
        "exceed identifier", "thirty char name", "import file path",
        "extraordinarily long name"])}

    results: dict = {}
    with Searcher(spark, mono) as s:
        # route="plain" pins the row-join baseline rows (round-3/4
        # continuity); the auto row below is what Searcher.bm25 now
        # serves by default at this scale (colocated, routed by the
        # stored doc count)
        _timed(lambda: s.bm25(" ".join(HOT), k=10,
                              route="plain").collect(),
               "bm25_hot", results)
        _timed(lambda: s.bm25(" ".join(MID), k=10,
                              route="plain").collect(),
               "bm25_mid", results)
        _timed(lambda: s.bm25(" ".join(HOT), k=10).collect(),
               "bm25_hot_auto", results)
        _timed(lambda: s.boolean(HOT, must=["tree"], exclude=["heap"],
                                 wildcards=["mer*"], k=10).collect(),
               "boolean_full", results)
        _timed(lambda: s.boolean(["plan"], wildcards=["mer*"],
                                 k=10).collect(),
               "wildcard_only", results)
        _timed(lambda: bm25_topk_batch(spark, s.index, BATCH,
                                       k=10).collect(),
               "batch10", results)
        # round-5 segment-colocated SOLO ranker: per-doc aggregation
        # folded into the decode partition — must be rank-identical to
        # bm25_hot/bm25_mid (asserted) and is expected to undercut them
        # (no decoded-row exchange)
        hot_plain = [(r["doc_id"], round(r["score"], 9)) for r in
                     s.bm25(" ".join(HOT), k=10,
                            route="plain").collect()]
        hot_colo = [(r["doc_id"], round(r["score"], 9)) for r in
                    s.bm25_colocated(" ".join(HOT), k=10).collect()]
        if hot_colo != hot_plain:
            raise SystemExit(f"COLOCATED MISMATCH: {hot_colo[:3]} "
                             f"vs {hot_plain[:3]}")
        _timed(lambda: s.bm25_colocated(" ".join(HOT), k=10).collect(),
               "bm25_hot_colocated", results)
        _timed(lambda: s.bm25_colocated(" ".join(MID), k=10).collect(),
               "bm25_mid_colocated", results)
        mono_top = [(r["doc_id"], round(r["score"], 9)) for r in
                    bm25_topk_tokens(spark, mono, HOT, k=20).collect()]

    fed_top = [(r["doc_id"], round(r["score"], 9)) for r in
               federated_bm25_topk_tokens(spark, shards, HOT,
                                          k=20).collect()]
    if fed_top != mono_top:
        raise SystemExit(f"FEDERATED MISMATCH at {n_docs} docs: "
                         f"{fed_top[:3]} vs {mono_top[:3]}")
    # warm tier on BOTH sides (bm25_hot ran inside Searcher with cached
    # postings + dict-hit idf): federated_hot must go through
    # FederatedSearcher or the ratio conflates caching with federation
    # overhead
    with FederatedSearcher(spark, shards) as fs:
        _timed(lambda: fs.bm25_tokens(HOT, k=10).collect(),
               "federated_hot", results)

    payload = {
        "n_docs": n_docs,
        "master": master,
        "repeats": REPEATS,
        "build_sec": built or "cached",
        "queries": results,
        "federated_matches_monolithic_top20": True,
        "federated_overhead":
            round(results["federated_hot"]["p50_sec"]
                  / results["bm25_hot"]["p50_sec"], 3),
    }
    with open(os.path.join(REPO, "BENCH_SERVE.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
