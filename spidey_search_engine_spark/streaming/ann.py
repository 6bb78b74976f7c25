"""Streaming ANN-index ingest: continuous embedding arrival → LSH
signature append.

The text side appends postings chunks per micro-batch
(streaming/incremental.py — chunked because postings need a merge); the
vector side is simpler: an RHP-LSH signature is STATELESS per row, so
ingest is a pure bucket-partitioned append with no merge, no stats
republish, and no chunk bookkeeping. A query planned after the append's
file listing sees the new vectors; readers pinned to an earlier listing
are unaffected (immutable files). Small-file accumulation under a bucket
dir is the same shape postings compaction solves — `compact_postings`'s
re-layout applies unchanged if a deployment ever needs it.

At 100 TB the append is one Arrow matmul pass (rhp_signatures) plus one
small per-micro-batch shuffle on `bucket` — that exchange is the price of
writing exactly one file per touched bucket per batch instead of
n_input_partitions × buckets small files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.similarity import rhp_signatures


def append_ann_stream(spark: SparkSession, emb_stream: DataFrame,
                      out_dir: str, dim: int, n_bits: int = 8,
                      seed: int = 5, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      checkpoint: str | None = None):
    """Start a foreachBatch stream appending signed vectors into the
    bucket-partitioned LSH index, laid out
    ``out_dir/batch=<id>/bucket=<b>/`` (same n_bits/seed MUST be used at
    query time). Each batch OVERWRITES its own ``batch=<id>`` dir — the
    same idempotence discipline as the text append's chunk dirs
    (incremental.py): foreachBatch is at-least-once, and a replay after a
    post-commit crash must rewrite identical files, never append
    duplicates that would shrink a probe's effective top-k. emb_stream
    provides (id_col, vec_col). Returns the StreamingQuery."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        sig = rhp_signatures(batch_df, dim, n_bits, seed, id_col, vec_col,
                             keep_vec=True)
        (sig.repartition("bucket").write.mode("overwrite")
         .partitionBy("bucket")
         .parquet(os.path.join(out_dir, f"batch={batch_id}")))

    writer = emb_stream.writeStream.foreachBatch(process) \
        .trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
