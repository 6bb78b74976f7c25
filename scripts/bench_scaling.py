"""Two-parallelism scaling run (north_rule evidence, sandbox stand-in for
N vs 4N executors — per driver instruction).

Generates ONE deterministic source-code corpus parquet (doc_ids
pre-assigned), then runs the IDENTICAL index-build job — same input, same
fixed 64-task doc-range decomposition, same plan — at local[8] and
local[32] in separate JVMs, reporting throughput at both plus scaling
efficiency = (T_32 / T_8) / 4. Writes BENCH_SCALING.json.

Methodology notes (mirrors how you'd A/B two cluster sizes):
* doc-range partitioning is pinned with repartitionByRange(64, doc_id) +
  localCheckpoint BEFORE the timed region, so both levels execute the same
  64 map tasks and only concurrency differs (round-robin repartition would
  scatter doc ranges and ~10× the (term, segment, task) partial-row count —
  measured, not hypothetical);
* the timed region is the full build: tokenize → partial postings →
  salted merge → compressed postings write → terms/stats publish;
* corpus generation and JVM/session startup are excluded (cluster-size
  independent).
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
                  shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
corpus = (spark.read.parquet(corpus_path)
          .repartitionByRange(64, "doc_id").sortWithinPartitions("doc_id")
          .localCheckpoint())
n = corpus.count()  # materialize outside the timed region
t0 = time.monotonic()
build_index(spark, corpus, out, profile="code", seg_bits=12, n_buckets=32)
dt = time.monotonic() - t0
print(json.dumps({{"cpus": cpus, "n_docs": n, "wall_sec": round(dt, 3),
                   "files_per_sec": round(n / dt, 2)}}))
spark.stop()
"""


def run_child(cpus: int, corpus_path: str) -> dict:
    script = CHILD.format(repo=REPO)
    out = subprocess.run([sys.executable, "-c", script, str(cpus), corpus_path],
                         capture_output=True, text=True, timeout=3000)
    for line in out.stdout.splitlines()[::-1]:
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"child failed (cpus={cpus}):\n{out.stderr[-3000:]}")


def main() -> None:
    n_docs = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "300000"))
    corpus_path = f"/tmp/spidey_scaling_corpus_v2_{n_docs}"
    if not os.path.exists(corpus_path):
        gen = (
            "import sys; sys.path.insert(0, %r);"
            "from spidey_search_engine_spark.session import get_spark;"
            "from spidey_search_engine_spark.sources.corpus import generate_corpus_df;"
            "s = get_spark(app='gen', master='local[32]');"
            "s.sparkContext.setLogLevel('ERROR');"
            "generate_corpus_df(s, %d, seed=42, partitions=64, with_doc_id=True)"
            ".write.mode('overwrite').parquet(%r); s.stop()"
            % (REPO, n_docs, corpus_path))
        subprocess.run([sys.executable, "-c", gen], check=True, timeout=3000)

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
