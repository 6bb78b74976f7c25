"""P37 fuzzy-correction benchmark at a 2.4M-term vocabulary.

Measures the claim the operator's design rests on: a partition-pruned
delete-neighborhood probe answers a typo query WITHOUT scanning the
vocabulary, so its latency is bucket-sized, not |V|-sized. Compares
against the naive alternative (full-vocab `levenshtein(q, term) <= 1`
scan) and asserts both return the SAME candidate set per query.

Vocabulary: the terms table of the 2.4M-doc crossover index if present
(/tmp/spidey_crossover_idx — 2.4M distinct stemmed terms), else the
sf0.1 entry index. Queries: deterministic deletion typos of sampled
long terms (guaranteed within distance 1 of their source).

Prints ONE JSON line:
  {"n_terms": N, "n_variants": M, "build_sec": s,
   "probe_p50_sec": s, "brute_p50_sec": s, "speedup": x,
   "identical_results": bool}

Latencies best-of-2 per query (host wall swings 2.5x).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
IDX_DIR = "/tmp/spidey_crossover_idx"
FUZZY_DIR = "/tmp/spidey_fuzzy_bench_idx"
N_QUERIES = int(os.environ.get("SPARK_GRAFT_FUZZY_QUERIES", "5"))
# >0: benchmark over a synthetic vocabulary of this many terms instead of
# the crossover index's — the probe is flat in |V| while brute-force is
# linear, so this is how the crossover point is demonstrated
SYNTH = int(os.environ.get("SPARK_GRAFT_FUZZY_SYNTH", "0"))


def main() -> None:
    from pyspark.sql import functions as F

    from spidey_search_engine_spark.operators.fuzzy import (
        fuzzy_lookup, load_deletion_index, write_deletion_index)
    from spidey_search_engine_spark.session import get_spark

    spark = get_spark(app="bench-fuzzy", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS * 2)
    spark.sparkContext.setLogLevel("ERROR")

    if SYNTH > 0:
        # deterministic distributed vocabulary: base-36 of two id hashes
        # gives 7-26 lowercase+digit chars, realistic term lengths
        terms = (spark.range(SYNTH).repartition(CPUS * 2)
                 .select(F.lower(F.concat(
                     F.conv(F.abs(F.xxhash64("id")) % 10**12, 10, 36),
                     F.conv(F.abs(F.xxhash64("id", F.lit(1))) % 10**4,
                            10, 36))).alias("term"),
                     (F.pmod(F.xxhash64("id"), F.lit(1000)) + 1)
                     .alias("df"))
                 .dropDuplicates(["term"]))
    elif os.path.exists(os.path.join(IDX_DIR, "terms")):
        terms = spark.read.parquet(os.path.join(IDX_DIR, "terms"))
    else:
        from spidey_search_engine_spark import entry_queries as EQ
        terms = EQ.entry_index(
            spark, os.environ.get("SPARK_GRAFT_SF_DIR",
                                  "/root/testdata/sf0.1"))["terms"]
    # pin the vocabulary (a production dictionary is a materialized
    # parquet table) — without this every brute probe re-pays the
    # synthetic generator's dropDuplicates shuffle, measuring corpus
    # generation instead of the dictionary scan
    terms = terms.select("term", "df").localCheckpoint()
    n_terms = terms.count()

    # deterministic query typos: hash-sample long terms, delete char 3
    src = [r["term"] for r in terms
           .filter(F.length("term") >= 8)
           .orderBy(F.pmod(F.xxhash64("term"), F.lit(100_000)), "term")
           .limit(N_QUERIES).collect()]
    typos = [t[:3] + t[4:] for t in src]
    if not typos:
        raise SystemExit(f"no terms of length >= 8 in the {n_terms}-term "
                         "vocabulary — nothing to build typo queries from")

    t0 = time.monotonic()
    write_deletion_index(terms, FUZZY_DIR, max_del=1, n_buckets=64)
    build_sec = round(time.monotonic() - t0, 4)
    fz = load_deletion_index(spark, FUZZY_DIR)
    n_variants = fz["variants"].count()

    from spidey_search_engine_spark.operators.fuzzy import (
        fuzzy_lookup_brute, route_fuzzy)

    identical = True
    probe_times, brute_times = [], []
    for q in typos:
        got, took = None, []
        for _ in range(2):
            t0 = time.monotonic()
            got = {(r["term"], r["dist"]) for r in fuzzy_lookup(
                fz["variants"], [q], n_buckets=fz["n_buckets"],
                index_max_del=fz["max_del"], k=1_000_000).collect()}
            took.append(time.monotonic() - t0)
        probe_times.append(min(took))

        # the brute side IS the production brute path (the router's
        # below-crossover choice), not an ad-hoc scan — so these numbers
        # are exactly the two routes fuzzy_lookup_auto picks between
        want, took = None, []
        for _ in range(2):
            t0 = time.monotonic()
            want = {(r["term"], r["dist"]) for r in fuzzy_lookup_brute(
                terms, [q], max_d=1, k=1_000_000).collect()}
            took.append(time.monotonic() - t0)
        brute_times.append(min(took))
        if got != want:
            identical = False
            print(f"MISMATCH for {q!r}: probe={len(got)} "
                  f"brute={len(want)}", file=sys.stderr)

    probe_times.sort()
    brute_times.sort()
    p50_probe = probe_times[len(probe_times) // 2]
    p50_brute = brute_times[len(brute_times) // 2]
    routed = route_fuzzy(n_terms)
    routed_won = ((routed == "probe" and p50_probe <= p50_brute)
                  or (routed == "brute" and p50_brute <= p50_probe))
    print(json.dumps({
        "n_terms": n_terms, "n_variants": n_variants,
        "n_queries": len(typos), "build_sec": build_sec,
        "probe_p50_sec": round(p50_probe, 4),
        "brute_p50_sec": round(p50_brute, 4),
        "speedup": round(p50_brute / p50_probe, 2),
        "routed": routed,
        "routed_path_was_faster": routed_won,
        "identical_results": identical,
    }))
    spark.stop()
    if not identical:
        raise SystemExit("probe/brute candidate sets differ — the bench "
                         "asserts completeness; numbers above measure a "
                         "BROKEN probe")


if __name__ == "__main__":
    main()
