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

At 100 TB the append is embarrassingly parallel: each micro-batch is one
Arrow matmul pass (rhp_signatures) plus a shuffle-free write into
2^n_bits dirs; the `repartition("bucket")` keeps it to one file per
touched bucket per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.similarity import rhp_signatures


def append_ann_stream(spark: SparkSession, emb_stream: DataFrame,
                      out_dir: str, dim: int, n_bits: int = 8,
                      seed: int = 5, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      checkpoint: str | None = None):
    """Start a foreachBatch stream appending signed vectors into the
    bucket-partitioned LSH index (write_lsh_index layout — same
    n_bits/seed MUST be used at query time). emb_stream provides
    (id_col, vec_col). Returns the StreamingQuery."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        sig = rhp_signatures(batch_df, dim, n_bits, seed, id_col, vec_col,
                             keep_vec=True)
        (sig.repartition("bucket").write.mode("append")
         .partitionBy("bucket").parquet(out_dir))

    writer = emb_stream.writeStream.foreachBatch(process) \
        .trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
