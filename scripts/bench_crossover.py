"""Measure the block-max pruning crossover on the 2.4M-doc corpus.

Runs the SAME 10-query set exhaustively and pruned (range_bits=8,
probe_ranges=32) on a warm Searcher at local[16], asserts rank-identical
top-k per query, and prints p50/p95 for both paths plus per-query times.
Index: /tmp/spidey_crossover_idx (built by round 2's crossover run; rebuild
with build_index over a 2.4M-doc generate_corpus_df if absent).

Queries mix hot terms (df ≈ n_docs: import/return/sort/merg), mid-df and
selective terms — the shapes that bracket the pruning win.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "import return",            # two hottest terms — worst case
    "merge sort",               # hot + hot
    "import file path",         # three hot
    "sort search heap",         # hot trio
    "return value index",       # hot + mid
    "merge sort table scan",    # hot + mid mix
    "exceed identifier",        # mid + mid
    "extraordinarily long name",  # mid, selective-ish
    "thirty char name",         # mid
    "binary search tree node",  # mixed
]


def build_skewed(spark, n_docs: int, idx_dir: str):
    """Build an index over a tf-SKEWED corpus: every 4096th doc repeats
    'merge sort' 25×. Real corpora have exactly this shape (a file that IS
    about merge sort vs files that mention it once); block-max pruning can
    only pay off when block UBs differ — the uniform generator's flat
    tf/dl make every range bound alike and the fraction fallback correctly
    refuses to prune there. The 4096 spacing keeps hot docs SPARSER than a
    2^RANGE_BITS-doc range, so most ranges contain no hot doc and fall
    under θ (spacing 251 < 256 was measured vacuous: every range held a
    hot doc and the fraction stayed ~1)."""
    from pyspark.sql import functions as F

    from spidey_search_engine_spark.operators.build import build_index
    from spidey_search_engine_spark.sources.corpus import generate_corpus_df

    base = os.environ.get("SKEW_BASE_CORPUS")
    if base and os.path.exists(base):
        # reuse a materialized corpus parquet (generation is pure-python
        # and would otherwise re-run for every pass over the lineage);
        # doc_id filter, NOT limit() — a global limit is a 1-task plan
        corpus = spark.read.parquet(base).filter(F.col("doc_id") < n_docs)
    else:
        corpus = generate_corpus_df(spark, n_docs, seed=7, partitions=32,
                                    with_doc_id=True)
    hot = " ".join(["merge sort"] * 25)
    corpus = corpus.withColumn(
        "content",
        F.when(F.col("doc_id") % 4096 == 0,
               F.concat_ws(" ", F.col("content"), F.lit(hot)))
        .otherwise(F.col("content")))
    # CLUSTERED mid-df term: one contiguous 25k-doc id span (the shape a
    # real repo gives, since doc ids are assigned by (repo, path) order —
    # a repo-local identifier lives in one doc-id neighborhood). This is
    # what makes range pruning bite: ranges outside the span lack the
    # term entirely, so their UB collapses to the hot term's ~zero idf.
    lo, hi = n_docs // 2, n_docs // 2 + 25_000
    corpus = corpus.withColumn(
        "content",
        F.when((F.col("doc_id") >= lo) & (F.col("doc_id") < hi),
               F.concat_ws(" ", F.col("content"),
                           F.lit("zetaclustermodule zetaclustermodule")))
        .otherwise(F.col("content")))
    build_index(spark, corpus, idx_dir, profile="code", seg_bits=10,
                n_buckets=32)


def main() -> None:
    from spidey_search_engine_spark.operators.build import load_index
    from spidey_search_engine_spark.operators.search import Searcher
    from spidey_search_engine_spark.session import get_spark

    skew = os.environ.get("SKEW") == "1"
    if skew:
        idx_dir = os.environ.get("CROSSOVER_IDX", "/tmp/spidey_skew_idx")
        # hot + clustered-term mixes: the query shapes WAND exists for
        QUERIES.extend(["import zetaclustermodule",
                        "zetaclustermodule merge sort",
                        "zetaclustermodule return file"])
    else:
        idx_dir = os.environ.get("CROSSOVER_IDX", "/tmp/spidey_crossover_idx")
    rb = int(os.environ.get("RANGE_BITS", "8"))
    spark = get_spark(app="crossover", master="local[16]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    if skew and not os.path.exists(os.path.join(idx_dir, "stats")):
        n = int(os.environ.get("SKEW_DOCS", "600000"))
        print(f"building skewed {n}-doc index at {idx_dir} ...", flush=True)
        build_skewed(spark, n, idx_dir)
    index = load_index(spark, idx_dir)
    s = Searcher(spark, index, cache_postings=True, coalesce_to=8)
    s.bm25("warm up pass", k=10).collect()
    s.bm25_pruned("warm up pass", k=10, range_bits=rb).collect()

    reps = int(os.environ.get("REPEATS", "2"))
    ex, pr = {}, {}
    for q in QUERIES:
        ea, pa = [], []
        for _ in range(reps):  # interleaved best-of-N: host noise is 2.5×
            t0 = time.monotonic()
            a = [(r["doc_id"], round(r["score"], 9)) for r in
                 s.bm25(q, k=10).collect()]
            ea.append(time.monotonic() - t0)
            t0 = time.monotonic()
            b = [(r["doc_id"], round(r["score"], 9)) for r in
                 s.bm25_pruned(q, k=10, range_bits=rb,
                               probe_ranges=32).collect()]
            pa.append(time.monotonic() - t0)
            assert a == b, f"rank mismatch for {q!r}"
        ex[q], pr[q] = min(ea), min(pa)
        print(f"{q!r}: exhaustive {ex[q]:.2f}s pruned {pr[q]:.2f}s",
              flush=True)

    def pct(d, p):
        v = sorted(d.values())
        return v[min(len(v) - 1, int(p * len(v)))]

    print(f"exhaustive p50 {pct(ex, 0.5):.2f}s p95 {pct(ex, 0.95):.2f}s")
    print(f"pruned     p50 {pct(pr, 0.5):.2f}s p95 {pct(pr, 0.95):.2f}s")
    s.close()
    spark.stop()


if __name__ == "__main__":
    main()
