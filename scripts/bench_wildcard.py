"""Wildcard-expansion benchmark over large synthetic vocabularies.

Measures the claim the three dictionary projections rest on: a
partition-pruned probe answers `term*` / `*term` / `*x*` expansion
WITHOUT scanning the vocabulary, so its latency is pattern-bounded, not
|V|-bounded — while the fallback dictionary scan (the r3 behavior, and
the only option for infix without the n-gram table) is linear in |V|.
Runs the SAME query set at each vocabulary size in
$SPARK_GRAFT_WILDCARD_SIZES (default "2400000,9600000"), asserts the
probe and the scan return the IDENTICAL expansion (terms and order),
and reports best-of-2 p50 latencies per family.

Prints ONE JSON line:
  {"runs": [{"n_terms": N,
             "build_sec": {"prefix": s, "suffix": s, "ngram": s},
             "prefix": {"probe_p50_sec": s, "scan_p50_sec": s,
                        "speedup": x},
             "suffix": {...}, "infix": {...},
             "identical_results": bool}, ...]}

Vocabulary: deterministic base-36 hash terms (7-26 lowercase+digit
chars — the bench_fuzzy generator). Queries: patterns derived from
hash-sampled terms, so every pattern has at least one guaranteed match.
Latencies best-of-2 per query (host wall swings 2.5x run-to-run).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
SIZES = [int(s) for s in os.environ.get(
    "SPARK_GRAFT_WILDCARD_SIZES", "2400000,9600000").split(",")]
N_QUERIES = int(os.environ.get("SPARK_GRAFT_WILDCARD_QUERIES", "5"))
BENCH_DIR = "/tmp/spidey_wildcard_bench_idx"
MAX_TERMS = 64


def main() -> None:
    from pyspark.sql import functions as F

    from spidey_search_engine_spark.operators.search import expand_wildcard
    from spidey_search_engine_spark.operators.wildcard import (
        load_ngram_terms, load_prefix_terms, load_suffix_terms,
        write_ngram_terms, write_prefix_terms, write_suffix_terms)
    from spidey_search_engine_spark.session import get_spark

    spark = get_spark(app="bench-wildcard", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS * 2)
    spark.sparkContext.setLogLevel("ERROR")

    runs = []
    for n in SIZES:
        terms = (spark.range(n).repartition(CPUS * 2)
                 .select(F.lower(F.concat(
                     F.conv(F.abs(F.xxhash64("id")) % 10**12, 10, 36),
                     F.conv(F.abs(F.xxhash64("id", F.lit(1))) % 10**4,
                            10, 36))).alias("term"),
                     (F.pmod(F.xxhash64("id"), F.lit(1000)) + 1)
                     .alias("df"))
                 .dropDuplicates(["term"]))
        # one persisted parquet per size: BOTH sides (probe and scan)
        # read the same on-disk dictionary, as a real index would
        terms_dir = os.path.join(BENCH_DIR, "terms")
        if os.path.isdir(BENCH_DIR):
            shutil.rmtree(BENCH_DIR)
        terms.write.parquet(terms_dir)
        terms = spark.read.parquet(terms_dir)
        n_terms = terms.count()

        build_sec = {}
        for name, write in (("prefix", write_prefix_terms),
                            ("suffix", write_suffix_terms),
                            ("ngram", write_ngram_terms)):
            t0 = time.monotonic()
            write(terms, BENCH_DIR)
            build_sec[name] = round(time.monotonic() - t0, 2)

        probe_idx = {"terms": terms,
                     "prefix_terms": load_prefix_terms(spark, BENCH_DIR),
                     "suffix_terms": load_suffix_terms(spark, BENCH_DIR)}
        probe_idx["ngram_terms"], probe_idx["ngram_n"] = \
            load_ngram_terms(spark, BENCH_DIR)
        scan_idx = {"terms": terms}  # no projections: the r3 fallback

        # deterministic sampled source terms -> one pattern per family
        src = [r["term"] for r in terms
               .filter(F.length("term") >= 10)
               .orderBy(F.pmod(F.xxhash64("term"), F.lit(100_000)),
                        "term")
               .limit(N_QUERIES).collect()]
        families = {
            "prefix": [t[:5] + "*" for t in src],
            "suffix": ["*" + t[-5:] for t in src],
            "infix": ["*" + t[3:8] + "*" for t in src],
        }

        def scan_infix(pattern: str) -> list[str]:
            # expand_wildcard deliberately refuses a |V| scan for infix;
            # the bench implements the honest linear baseline directly
            import re as _re
            regex = "^" + ".*".join(_re.escape(p)
                                    for p in pattern.split("*")) + "$"
            rows = (terms.filter(F.col("term").rlike(regex))
                    .select("term", "df")
                    .orderBy(F.col("df").desc(), "term")
                    .limit(MAX_TERMS).collect())
            return [r["term"] for r in rows]

        identical = True
        result = {"n_terms": n_terms, "build_sec": build_sec}
        for fam, patterns in families.items():
            probe_times, scan_times = [], []
            for pat in patterns:
                got, took = None, []
                for _ in range(2):
                    t0 = time.monotonic()
                    got = expand_wildcard(probe_idx, pat, MAX_TERMS)
                    took.append(time.monotonic() - t0)
                probe_times.append(min(took))
                want, took = None, []
                for _ in range(2):
                    t0 = time.monotonic()
                    want = (scan_infix(pat) if fam == "infix"
                            else expand_wildcard(scan_idx, pat,
                                                 MAX_TERMS))
                    took.append(time.monotonic() - t0)
                scan_times.append(min(took))
                if got != want:
                    identical = False
                    print(f"MISMATCH {fam} {pat!r}: probe="
                          f"{len(got)} scan={len(want)}",
                          file=sys.stderr)
                elif not got:
                    # empty-but-equal means the pattern generator is
                    # probing nothing — the p50s would then measure
                    # empty scans and publish a fake "flat in |V|"
                    identical = False
                    print(f"EMPTY EXPANSION {fam} {pat!r}: the bench "
                          f"pattern matched no terms on either path",
                          file=sys.stderr)
            probe_times.sort()
            scan_times.sort()
            p_probe = probe_times[len(probe_times) // 2]
            p_scan = scan_times[len(scan_times) // 2]
            result[fam] = {"probe_p50_sec": round(p_probe, 4),
                           "scan_p50_sec": round(p_scan, 4),
                           "speedup": round(p_scan / p_probe, 2)}
        result["identical_results"] = identical
        runs.append(result)

    print(json.dumps({"runs": runs}))
    spark.stop()
    if not all(r["identical_results"] for r in runs):
        raise SystemExit("probe/scan expansions differ — the bench "
                         "asserts equality; numbers above measure a "
                         "BROKEN probe")


if __name__ == "__main__":
    main()
