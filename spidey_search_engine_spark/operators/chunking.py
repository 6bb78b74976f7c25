"""Document chunking for training-data pipelines.

LLM pretraining consumes fixed-length sequences, not documents: long
documents are split into overlapping token windows and short ones pass
through whole. This operator produces that chunk table as a pure
column-expression pipeline — split, per-row window explode, slice,
rejoin — so it runs entirely inside the scan stage (one pass over the
corpus, NO shuffle, whole-stage codegen) and scales linearly: at 100 TB
the chunk table is written straight back out partitioned however the
trainer shards it (see sampling.assign_shards).

Window semantics (the standard stride layout, e.g. Lee et al. 2022 /
GPT-style packing pre-pass):

* tokens = whitespace-split words (the cheap proxy count; pair with
  textstats.with_bpe_token_estimate when budgeting by BPE tokens).
* a doc with n <= chunk_tokens tokens yields exactly one chunk;
* otherwise chunks start at 0, stride, 2*stride, ... with
  stride = chunk_tokens - overlap, and the last chunk is the first one
  whose window reaches the end of the doc (it may be short; every token
  appears in at least one chunk, consecutive chunks share `overlap`
  tokens).

Chunk ids are (doc_id, chunk_id) with chunk_id dense from 0 — stable and
deterministic, so re-running the pipeline reproduces identical chunks and
downstream dedup/sampling keyed on them is reproducible.

Reference parity note: the reference engine has no chunking (it indexes
whole pages — Indexer.java tokenizes full documents); this operator is
part of the mandated beyond-reference training-data family (SURVEY §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", chunk_tokens: int = 128,
                    overlap: int = 16) -> DataFrame:
    """(id, chunk_id, chunk_text, n_tokens) — overlapping token windows.

    Pure JVM expressions end-to-end: split -> sequence/explode -> slice ->
    concat_ws. Rows explode by ~n/stride per doc but never shuffle; the
    output order within a partition is the input order, so a downstream
    `repartition` (or assign_shards) decides the layout exactly once.
    Docs with zero tokens produce no chunks.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap ({overlap}) < chunk_tokens "
                         f"({chunk_tokens})")
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), r"\s+"),
                    lambda x: x != F.lit(""))
    n = F.size("_t")
    n_chunks = (F.when(n <= chunk_tokens, F.lit(1))
                .otherwise(F.ceil((n - F.lit(chunk_tokens))
                                  / F.lit(stride)) + 1)).cast("int")
    start = F.col("chunk_id") * stride  # 0-based token offset
    return (df.withColumn("_t", toks)
            .filter(F.size("_t") > 0)
            .withColumn("chunk_id",
                        F.explode(F.sequence(F.lit(0), n_chunks - 1)))
            .select(F.col(id_col),
                    F.col("chunk_id").cast("int").alias("chunk_id"),
                    F.concat_ws(" ", F.slice("_t", start + 1, chunk_tokens))
                    .alias("chunk_text"),
                    F.least(F.lit(chunk_tokens), F.size("_t") - start)
                    .cast("int").alias("n_tokens")))
