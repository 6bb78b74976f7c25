"""Two-parallelism scaling run (north_rule evidence, sandbox stand-in for
N vs 4N executors — per driver instruction).

Generates ONE deterministic source-code corpus parquet, then runs the
identical index-build job at local[8] and local[32] in separate JVMs
(subprocesses — one Spark master per process), reporting throughput at both
plus scaling efficiency = (T_32 / T_8) / 4. Writes BENCH_SCALING.json and a
markdown row for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from spidey_search_engine_spark.session import get_spark
from spidey_search_engine_spark.operators.build import build_index

cpus = int(sys.argv[1])
corpus_path = sys.argv[2]
out = f"/tmp/spidey_scaling_idx_{{cpus}}"
shutil.rmtree(out, ignore_errors=True)
spark = get_spark(app=f"scaling-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(cpus, 8))
spark.sparkContext.setLogLevel("ERROR")
corpus = spark.read.parquet(corpus_path)
n = corpus.count()
t0 = time.monotonic()
build_index(spark, corpus, out, profile="code", seg_bits=10, n_buckets=32)
dt = time.monotonic() - t0
print(json.dumps({{"cpus": cpus, "n_docs": n, "wall_sec": round(dt, 3),
                   "files_per_sec": round(n / dt, 2)}}))
spark.stop()
"""


def run_child(cpus: int, corpus_path: str) -> dict:
    script = CHILD.format(repo=REPO)
    out = subprocess.run([sys.executable, "-c", script, str(cpus), corpus_path],
                         capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines()[::-1]:
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"child failed (cpus={cpus}):\n{out.stderr[-3000:]}")


def main() -> None:
    n_docs = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "20000"))
    corpus_path = f"/tmp/spidey_scaling_corpus_{n_docs}"
    if not os.path.exists(corpus_path):
        gen = (
            "import sys; sys.path.insert(0, %r);"
            "from spidey_search_engine_spark.session import get_spark;"
            "from spidey_search_engine_spark.sources.corpus import generate_corpus_df;"
            "s = get_spark(app='gen', master='local[32]');"
            "s.sparkContext.setLogLevel('ERROR');"
            "generate_corpus_df(s, %d, seed=42, partitions=64)"
            ".write.mode('overwrite').parquet(%r); s.stop()"
            % (REPO, n_docs, corpus_path))
        subprocess.run([sys.executable, "-c", gen], check=True, timeout=1800)

    lo = run_child(8, corpus_path)
    hi = run_child(32, corpus_path)
    speedup = hi["files_per_sec"] / lo["files_per_sec"]
    eff = speedup / 4.0
    result = {"low": lo, "high": hi,
              "speedup_8_to_32": round(speedup, 3),
              "scaling_efficiency": round(eff, 3),
              "n_docs": n_docs}
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
