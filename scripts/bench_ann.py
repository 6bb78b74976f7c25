"""ANN-at-scale benchmark: brute vs LSH vs IVF vs PQ over 1M vectors.

The similarity module's design claims are about scale (partition-pruned
probes, codes ~dim·4/m× smaller than vectors); this script measures them
instead of asserting them. It generates a deterministic N×DIM float
corpus distributed (seeded PCG64 per partition — no driver-side
materialization), materializes each index once (write_lsh_index /
write_ivf_index / write_pq_index), then times warm top-10 queries per
path and computes recall@10 against the exact brute-force baseline.

Prints ONE JSON line:
  {"n_vecs": N, "dim": D, "build_sec": {path: sec},
   "query_p50_sec": {path: sec}, "recall_at_10": {path: r},
   "bytes_scanned_hint": {...}}

Env knobs: SPARK_GRAFT_ANN_VECS (default 1000000), SPARK_GRAFT_CPUS
(default 16), SPARK_GRAFT_ANN_QUERIES (default 5).
Latencies are best-of-2 per query (host wall-times swing 2.5×).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 64


N_CENTERS = 256
NOISE = 0.35


def _centers() -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(99))
    return rng.standard_normal((N_CENTERS, DIM))


def gen_vectors(spark, n: int, parts: int):
    """Deterministic distributed corpus with REAL neighbor structure
    (mixture of 256 gaussians, σ=0.35 — uniform random vectors have no
    near neighbors, which makes every recall number meaningless).
    Partition p generates its rows from PCG64(seed=p) — reproducible,
    never on the driver."""
    import pandas as pd

    per, rem = divmod(n, parts)  # first `rem` partitions take 1 extra row
    centers = _centers()

    def gen(batches):
        for pdf in batches:
            for p in pdf["id"]:
                p = int(p)
                rng = np.random.Generator(np.random.PCG64(1000 + p))
                start = p * per + min(p, rem)
                count = per + (1 if p < rem else 0)
                ids = np.arange(start, start + count, dtype=np.int64)
                mat = (centers[ids % N_CENTERS]
                       + NOISE * rng.standard_normal((count, DIM))) \
                    .astype(np.float32)
                yield pd.DataFrame({"vec_id": ids,
                                    "embedding": list(mat)})

    return (spark.range(parts).repartition(parts)
            .mapInPandas(gen, "vec_id long, embedding array<float>"))


def main() -> None:
    from spidey_search_engine_spark.operators.similarity import (
        brute_force_cosine_topk, ann_topk_lsh, ann_topk_lsh_batch,
        ivf_residuals, ivf_topk, ivfpq_adc_topk, load_ivf_index,
        load_lsh_index, pq_adc_topk, pq_codebooks_sampled,
        write_ivf_index, write_ivfpq_index, write_lsh_index,
        write_pq_index)
    from spidey_search_engine_spark.session import get_spark

    n = int(os.environ.get("SPARK_GRAFT_ANN_VECS", "1000000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    n_queries = int(os.environ.get("SPARK_GRAFT_ANN_QUERIES", "5"))
    spark = get_spark(app="bench-ann", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    base = f"/tmp/spidey_ann_{n}"
    if not os.path.exists(os.path.join(base, "vecs", "_SUCCESS")):
        shutil.rmtree(base, ignore_errors=True)
        gen_vectors(spark, n, parts=64).write.mode("overwrite") \
            .parquet(os.path.join(base, "vecs"))
    emb = spark.read.parquet(os.path.join(base, "vecs"))

    qrng = np.random.Generator(np.random.PCG64(7))
    centers = _centers()
    queries = [(centers[int(qrng.integers(N_CENTERS))]
                + NOISE * qrng.standard_normal(DIM)).astype(np.float64)
               for _ in range(n_queries)]

    build_sec: dict[str, float] = {}

    def built(path: str, fn):
        marker = os.path.join(base, path, "_SUCCESS")
        if not os.path.exists(marker):
            t0 = time.monotonic()
            fn(os.path.join(base, path))
            build_sec[path] = round(time.monotonic() - t0, 3)

    built("lsh", lambda d: write_lsh_index(emb, d, dim=DIM, n_bits=10))
    # IVF coarse quantizer: sampled centroids (deterministic, cheap);
    # k-means training is benched separately in tests
    cent_rows = (emb.orderBy("vec_id").limit(128).collect())
    centroids = np.array([r["embedding"] for r in cent_rows],
                         dtype=np.float64)
    built("ivf", lambda d: write_ivf_index(emb, centroids, d))
    cb = pq_codebooks_sampled(emb, m=8, ksub=256)
    built("pq", lambda d: write_pq_index(emb, cb, d))
    # IVF-PQ: codebooks sampled over RESIDUALS (flat PQ collapses
    # clustered data onto one codeword per cluster — recall@10 0.02)
    rcb = pq_codebooks_sampled(ivf_residuals(emb, centroids),
                               m=8, ksub=256, id_col="id",
                               vec_col="residual")
    built("ivfpq", lambda d: write_ivfpq_index(emb, centroids, rcb, d))

    lsh = load_lsh_index(spark, os.path.join(base, "lsh"))
    ivf = load_ivf_index(spark, os.path.join(base, "ivf"))
    codes = spark.read.parquet(os.path.join(base, "pq"))
    rcodes = spark.read.parquet(os.path.join(base, "ivfpq"))

    # rescore budget: 0.5% of the corpus (min 1000) — the ADC scan
    # narrows, the exact pass resolves; recall tracks this knob
    resc = max(1000, n // 200)
    paths = {
        "brute": lambda q: brute_force_cosine_topk(emb, q, k=10),
        "lsh": lambda q: ann_topk_lsh(None, q, dim=DIM, k=10, n_bits=10,
                                      probe_hamming=2, signatures=lsh),
        "ivf": lambda q: ivf_topk(None, centroids, q, k=10, n_probe=8,
                                  assignments=ivf),
        "pq_adc": lambda q: pq_adc_topk(codes, cb, q, k=10),
        "pq_rescore": lambda q: pq_adc_topk(codes, cb, q, k=10,
                                            rescore_emb=emb,
                                            rescore_c=resc),
        "ivfpq_adc": lambda q: ivfpq_adc_topk(rcodes, centroids, rcb, q,
                                              k=10, n_probe=8),
        "ivfpq_rescore": lambda q: ivfpq_adc_topk(rcodes, centroids, rcb,
                                                  q, k=10, n_probe=8,
                                                  rescore_emb=emb,
                                                  rescore_c=resc),
    }

    truth: dict[int, list[int]] = {}
    lat: dict[str, list[float]] = {p: [] for p in paths}
    hits: dict[str, int] = {p: 0 for p in paths}
    for p, fn in paths.items():
        fn(queries[0]).collect()  # warm-up: codegen + listing
        for qi, q in enumerate(queries):
            best, rows = float("inf"), None
            for _ in range(2):
                t0 = time.monotonic()
                rows = fn(q).collect()
                best = min(best, time.monotonic() - t0)
            lat[p].append(best)
            ids = [int(r["id"]) for r in rows]
            if p == "brute":
                truth[qi] = ids
            else:
                hits[p] += len(set(ids) & set(truth[qi]))

    # batch serving shape: ALL queries in ONE pruned union scan of the
    # materialized index (per-bucket query routing in the kernel)
    qd = {f"q{i:03d}": q for i, q in enumerate(queries)}
    ann_topk_lsh_batch(lsh, {"w": queries[0]}, dim=DIM, k=10, n_bits=10,
                       probe_hamming=2).collect()  # warm
    bbest, brows = float("inf"), None
    for _ in range(2):
        t0 = time.monotonic()
        brows = ann_topk_lsh_batch(lsh, qd, dim=DIM, k=10, n_bits=10,
                                   probe_hamming=2).collect()
        bbest = min(bbest, time.monotonic() - t0)
    bids: dict[str, list[int]] = {}
    for r in brows:
        bids.setdefault(r["query_id"], []).append(int(r["id"]))
    bhits = sum(len(set(bids.get(f"q{qi:03d}", [])) & set(truth[qi]))
                for qi in range(n_queries))
    batch_out = {"n_queries": n_queries, "total_sec": round(bbest, 4),
                 "per_query_sec": round(bbest / n_queries, 4),
                 "recall_at_10": round(bhits / (10 * n_queries), 3)}

    out = {
        "n_vecs": n, "dim": DIM,
        "lsh_batch": batch_out,
        "build_sec": build_sec,
        "query_p50_sec": {p: round(statistics.median(v), 4)
                          for p, v in lat.items()},
        "recall_at_10": {p: round(hits[p] / (10 * n_queries), 3)
                         for p in paths if p != "brute"},
        "params": {"lsh": "n_bits=10, hamming<=2 multiprobe",
                   "ivf": "128 sampled centroids, n_probe=8",
                   "pq": "m=8, ksub=256 (8 bytes/vec vs 256)",
                   "pq_rescore": f"ADC top-{resc} -> exact cosine",
                   "ivfpq": "residual PQ m=8 ksub=256, n_probe=8",
                   "ivfpq_rescore": f"IVF-PQ ADC top-{resc} -> exact cosine"},
        "timestamp": time.time(),
    }
    path = os.path.join(REPO, "BENCH_ANN.json")
    # a warm rerun (indexes cached under /tmp) measures no builds — keep
    # the previously recorded build timings instead of clobbering them
    if os.path.exists(path):
        try:
            with open(path) as f:
                prev = json.load(f)
        except (OSError, json.JSONDecodeError):
            prev = {}
        if prev.get("n_vecs") == n:
            merged = dict(prev.get("build_sec", {}))
            merged.update(out["build_sec"])
            out["build_sec"] = merged
    print(json.dumps(out))
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
