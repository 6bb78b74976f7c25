"""Impact-ordered early termination on the score shape block-max range
pruning is blind to: hot docs in EVERY doc range.

Corpus: 2.4M docs (generate_corpus_df), every 256th doc repeats
'merge sort' 25x. Spacing 256 < 2^range_bits doc-ranges means every
range holds heavy docs, so every range's UB clears theta, the surviving
fraction is ~1 and wand's fraction fallback correctly punts to
exhaustive — the measured-vacuous case from the round-3 crossover
study. The tf-saturation BANDS split the same corpus cleanly (the 9.4k
heavy docs land in band 0), so the impact path terminates after one
prefix round and rescored candidates only.

Measures per query (interleaved best-of-REPEATS on a warm Searcher,
rank identity asserted every pass):
  * exhaustive  (search.bm25_topk via Searcher)
  * pruned      (wand.bm25_topk_pruned — expected to fall back here)
  * impact      (impact.bm25_impact_topk_tokens + route taken)

Writes BENCH_IMPACT.json. Env: SPIDEY_IMPACT_DOCS (default 2_400_000),
REPEATS (default 2), SPARK_GRAFT_CPUS (default 16).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("SPIDEY_IMPACT_DOCS", "2400000"))
REPEATS = int(os.environ.get("REPEATS", "2"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
IDX = f"/tmp/spidey_impact_idx_{N_DOCS}"

QUERIES = [
    "merge sort",               # both heavy-skewed: the impact showcase
    "merge sort file",          # heavy pair + plain hot term
    "import return",            # hot but UNIFORM tf: impact must fall
                                # back (coverage fraction) and still match
]


def _ensure(spark):
    from pyspark.sql import functions as F

    from spidey_search_engine_spark.operators.build import build_index, \
        load_index
    from spidey_search_engine_spark.operators.impact import (
        load_impact_index, write_impact_index)
    from spidey_search_engine_spark.sources.corpus import generate_corpus_df

    if not os.path.exists(os.path.join(IDX, "stats")):
        print(f"building skewed {N_DOCS}-doc index at {IDX}...",
              file=sys.stderr, flush=True)
        corpus = generate_corpus_df(spark, N_DOCS, seed=7, partitions=32,
                                    with_doc_id=True)
        hot = " ".join(["merge sort"] * 25)
        corpus = corpus.withColumn(
            "content",
            F.when(F.col("doc_id") % 256 == 0,
                   F.concat_ws(" ", F.col("content"), F.lit(hot)))
            .otherwise(F.col("content")))
        build_index(spark, corpus, IDX, profile="code", seg_bits=16,
                    n_buckets=32)
    idx = load_index(spark, IDX)
    imp_dir = os.path.join(IDX, "impact")
    if not os.path.exists(os.path.join(imp_dir, "meta.json")):
        t0 = time.monotonic()
        write_impact_index(spark, idx, imp_dir)
        print(f"impact projection built in "
              f"{time.monotonic() - t0:.1f}s", file=sys.stderr)
    return idx, load_impact_index(spark, imp_dir)


def main() -> None:
    from spidey_search_engine_spark.operators.impact import (
        bm25_impact_topk_tokens)
    from spidey_search_engine_spark.operators.search import Searcher
    from spidey_search_engine_spark.functions.analysis import analyze_query
    from spidey_search_engine_spark.session import get_spark

    spark = get_spark(app="bench-impact", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    idx, imp = _ensure(spark)

    s = Searcher(spark, idx, cache_postings=True, coalesce_to=8)
    s.bm25("warm up pass", k=10).collect()
    # warm the impact rows' file listing too (a Searcher for the bands)
    bm25_impact_topk_tokens(spark, s.index, imp,
                            analyze_query("merge")[0], k=10).collect()

    out = {"n_docs": N_DOCS, "repeats": REPEATS, "hot_spacing": 256,
           "queries": {}}
    for q in QUERIES:
        bag = analyze_query(q)[0]
        ex_t, pr_t, im_t, route = [], [], [], None
        for _ in range(REPEATS):
            t0 = time.monotonic()
            a = [(r["doc_id"], round(r["score"], 9)) for r in
                 s.bm25(q, k=10).collect()]
            ex_t.append(time.monotonic() - t0)
            t0 = time.monotonic()
            b = [(r["doc_id"], round(r["score"], 9)) for r in
                 s.bm25_pruned(q, k=10, range_bits=8,
                               probe_ranges=32).collect()]
            pr_t.append(time.monotonic() - t0)
            info = {}
            t0 = time.monotonic()
            c = [(r["doc_id"], round(r["score"], 9)) for r in
                 bm25_impact_topk_tokens(spark, s.index, imp, bag, k=10,
                                         route_info=info).collect()]
            im_t.append(time.monotonic() - t0)
            route = info
            if a != b or a != c:
                raise SystemExit(f"RANK MISMATCH for {q!r}: "
                                 f"ex={a[:3]} pr={b[:3]} im={c[:3]}")
        out["queries"][q] = {
            "exhaustive_sec": round(min(ex_t), 4),
            "pruned_sec": round(min(pr_t), 4),
            "impact_sec": round(min(im_t), 4),
            "impact_route": route,
            "speedup_vs_exhaustive": round(min(ex_t) / min(im_t), 2),
        }
        print(f"{q!r}: {out['queries'][q]}", file=sys.stderr, flush=True)

    s.close()
    with open(os.path.join(REPO, "BENCH_IMPACT.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
