"""Throughput bench for the round-3 pipeline operators (P39-P45, the
composed clean CLI, and the optional 2.4M scale probe) -> BENCH_PIPELINE.json.

Reuses the cached 103k dedup corpus (/tmp/spidey_dedup_100000 — the
generator corpus with planted near-dups) or regenerates it. Each op is
timed as ONE action that cannot be short-circuited by Catalyst pruning
(aggregates over the op's real output columns — the bench_dedup lesson:
.count() lets the optimizer drop the expensive projection).

Single-run numbers on a noisy shared host (up to 2.5x run-to-run):
treat as order-of-magnitude throughput evidence, not comparisons.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS = "/tmp/spidey_dedup_100000"
N_DOCS = 103_000


def main() -> None:
    from pyspark.sql import functions as F

    from spidey_search_engine_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark(app="bench-pipeline", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(CORPUS):
        from spidey_search_engine_spark.sources.corpus import (
            generate_corpus_df)
        generate_corpus_df(spark, N_DOCS, seed=11, partitions=cpus * 2,
                           with_doc_id=True) \
            .write.mode("overwrite").parquet(CORPUS)
    docs = spark.read.parquet(CORPUS).select("doc_id", "repo", "lang",
                                             "content")
    n = docs.count()

    results: dict[str, dict] = {}

    def timed(name: str, action, extra=None):
        t0 = time.monotonic()
        out = action()
        dt = time.monotonic() - t0
        results[name] = {"sec": round(dt, 3),
                         "docs_per_sec": round(n / dt, 1)}
        if extra:
            results[name].update(extra(out))
        print(f"{name}: {dt:.2f}s  ({n / dt:,.0f} docs/s)", flush=True)
        return out

    # P39 repetition signals: consume every fraction so nothing prunes
    from spidey_search_engine_spark.functions.textstats import (
        with_repetition_features)
    timed("gopher_repetition", lambda: with_repetition_features(
        docs, top_ns=(2,), dup_ns=(5,)).agg(
        F.sum("dup_line_frac"), F.sum("dup_line_char_frac"),
        F.sum("top_2gram_char_frac"), F.sum("dup_5gram_char_frac"))
        .collect())

    # P40 decontamination: bench = a 1% corpus slice (guaranteed hits)
    from spidey_search_engine_spark.operators.decontaminate import (
        contamination_hits)
    bench = docs.filter(F.col("doc_id") % 100 == 7).select(
        F.array_join(F.slice(F.split("content", " "), 3, 11), " ")
        .alias("text"))
    hits = timed("decontam_hits", lambda: contamination_hits(
        docs, bench, n=8).agg(F.count("*"), F.sum("n_hit")).collect(),
        extra=lambda r: {"hit_docs": int(r[0][0] or 0)})

    # P41 DSIR: target = 5% slice, select 10k of 103k
    from spidey_search_engine_spark.operators.dsir import (
        dsir_logratios, dsir_select, gram_bucket_counts)

    def run_dsir():
        target = docs.filter(F.col("doc_id") % 20 == 3)
        lr = dsir_logratios(gram_bucket_counts(target, n_buckets=8192),
                            gram_bucket_counts(docs, n_buckets=8192),
                            n_buckets=8192)
        sel = dsir_select(docs, lr, k=10_000, n_buckets=8192, seed=3)
        return sel.agg(F.count("*"), F.sum("log_w")).collect()
    timed("dsir_select_10k", run_dsir)

    # P43 comment stripping, whole-corpus java profile (force via length)
    from spidey_search_engine_spark.functions.codeclean import (
        with_comments_stripped)
    timed("strip_comments", lambda: with_comments_stripped(
        docs, lang="java").agg(F.sum(F.length("content"))).collect())

    # P44 fork detection over the generator's repo column (LSH path)
    from spidey_search_engine_spark.operators.forks import fork_pairs
    timed("fork_pairs_lsh", lambda: fork_pairs(
        docs, threshold=0.2).agg(F.count("*"), F.sum("jaccard")).collect(),
        extra=lambda r: {"pairs": int(r[0][0] or 0)})

    # P45 keywords against a dictionary derived on the fly (df per term)
    from spidey_search_engine_spark.operators.report import doc_keywords
    from spidey_search_engine_spark.functions.textstats import _tokens
    terms = (docs.select(F.explode(F.array_distinct(
        _tokens(F.col("content")))).alias("term"))
        .groupBy("term").agg(F.count("*").alias("df")))
    timed("doc_keywords_top5", lambda: doc_keywords(
        docs, terms, n_docs=n, k=5).agg(
        F.count("*"), F.sum("score")).collect())

    # composed clean CLI pipeline end-to-end (the user-facing number):
    # repetition gate + exact dedup + decontam + DSIR selection
    import subprocess
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        bench_dir, tgt_dir, out_dir = (os.path.join(td, d)
                                       for d in ("bench", "tgt", "out"))
        bench.write.parquet(bench_dir)
        docs.filter(F.col("doc_id") % 20 == 3) \
            .select("doc_id", "content").write.parquet(tgt_dir)
        env = dict(os.environ, SPARK_GRAFT_MASTER=f"local[{cpus}]")
        t0 = time.monotonic()
        r = subprocess.run(
            [sys.executable, "-m", "spidey_search_engine_spark.cli",
             "clean", "--input", CORPUS, "--output", out_dir,
             "--max-dup-ngram", "5:0.15", "--exact-dedup",
             "--decontam-bench", bench_dir, "--decontam-n", "8",
             "--dsir-target", tgt_dir, "--dsir-k", "50000"],
            env=env, capture_output=True, text=True, cwd=REPO)
        dt = time.monotonic() - t0
        if r.returncode != 0:
            print(r.stderr[-2000:], file=sys.stderr)
            raise SystemExit("clean pipeline failed")
        stats = json.loads(r.stdout.strip().splitlines()[-1])
        results["clean_pipeline_e2e"] = {
            "sec": round(dt, 3), "docs_per_sec": round(n / dt, 1),
            "docs_out": stats["docs_out"],
            "note": "cold JVM incl. session boot; repetition+exact-dedup"
                    "+decontam+DSIR-50k via the CLI"}
        print(f"clean_pipeline_e2e: {dt:.2f}s ({n / dt:,.0f} docs/s)",
              flush=True)

    out = {"n_docs": n, "cpus": cpus, "ops": results}

    # 2.4M corpus-linearity probe: runs when the crossover corpus exists
    # AND SPIDEY_SCALE_PROBE=1 (several minutes); otherwise the PREVIOUS
    # probe section is carried over so regeneration never silently
    # deletes the scale evidence (the PLANS.md lesson: evidence must
    # live in the script that writes the file)
    bench_path = os.path.join(REPO, "BENCH_PIPELINE.json")
    big = "/tmp/spidey_crossover_corpus_2400000"
    if os.environ.get("SPIDEY_SCALE_PROBE") == "1" and os.path.exists(big):
        bd = spark.read.parquet(big).select("doc_id", "content")
        bn = 2_400_000
        probe = {"n_docs": bn,
                 "note": "same ops on the 24x corpus (identical doc "
                         "shape): throughput RISES versus the 103k runs "
                         "because per-task and session fixed costs "
                         "amortize - the kernels are corpus-linear"}
        t0 = time.monotonic()
        with_repetition_features(bd, top_ns=(2,), dup_ns=(5,)).agg(
            F.sum("dup_line_frac"), F.sum("top_2gram_char_frac"),
            F.sum("dup_5gram_char_frac")).collect()
        dt = time.monotonic() - t0
        probe["gopher_repetition"] = {"sec": round(dt, 1),
                                      "docs_per_sec": round(bn / dt, 1)}
        t0 = time.monotonic()
        bt = bd.filter(F.col("doc_id") % 20 == 3)
        blr = dsir_logratios(gram_bucket_counts(bt, n_buckets=8192),
                             gram_bucket_counts(bd, n_buckets=8192),
                             n_buckets=8192)
        dsir_select(bd, blr, k=100_000, n_buckets=8192, seed=3).agg(
            F.count("*"), F.sum("log_w")).collect()
        dt = time.monotonic() - t0
        probe["dsir_select_100k"] = {"sec": round(dt, 1),
                                     "docs_per_sec": round(bn / dt, 1)}
        out["scale_probe_2p4M"] = probe
        print(f"scale_probe_2p4M: {json.dumps(probe)}", flush=True)
    elif os.path.exists(bench_path):
        try:
            prev = json.load(open(bench_path))
            if "scale_probe_2p4M" in prev:
                out["scale_probe_2p4M"] = prev["scale_probe_2p4M"]
        except (OSError, ValueError):
            pass

    with open(bench_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
