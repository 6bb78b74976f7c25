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

import numpy as np
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
    toks = F.array_remove(F.split(F.col(text_col), r"\s+"), "")
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


def pack_sequences(chunks: DataFrame, budget: int, n_shards: int,
                   id_col: str = "doc_id", chunk_col: str = "chunk_id",
                   tokens_col: str = "n_tokens", seed: int = 17,
                   hash_expr=None) -> DataFrame:
    """Pack chunks into fixed-budget training sequences: adds
    (shard, seq, pos) where each (shard, seq) groups consecutive chunks
    whose token counts sum to ≤ budget.

    Trainers consume fixed-length contexts; after chunking, the packing
    step decides which chunks share a context. The scalable layout is the
    same two-level trick as assign_shards: shard = pmod(hash(doc:chunk,
    seed), n_shards) — computed in the scan, uniform, no global sort —
    then NEXT-FIT greedy within the shard in salted-hash order (the
    train-time shuffle for free): walk the shard's chunks, keep a running
    token total, start a new sequence whenever the next chunk would
    overflow the budget. A chunk longer than the budget gets a sequence
    of its own (the trainer truncates; it is never silently dropped).
    Sequence ids are dense from 0 per shard; `pos` is the chunk's 0-based
    slot within its sequence.

    Next-fit is inherently sequential PER SHARD, so the kernel is an
    applyInPandas over the shard groups — one shuffle on a uniform key,
    each group a few hundred MB at sensible n_shards (pick n_shards so a
    shard's (id, tokens) columns fit an executor core; the TEXT never
    rides through the kernel, only ids + counts — join the payload back
    afterwards). Deterministic: a pure function of (ids, seed), so re-runs
    and resumes reproduce byte-identical packing. Waste is bounded by the
    classic next-fit guarantee (each sealed sequence is > budget/2 full
    when chunk sizes ≤ budget/2, as chunk_documents emits).

    Reference parity: beyond-reference training-data family (SURVEY §2.8);
    composes with chunk_documents (P24) and write_training_shards (P25).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive (got {budget})")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive (got {n_shards})")
    from .sampling import _sample_key
    key = _sample_key("_pk", seed, hash_expr)
    keyed = (chunks
             .withColumn("_pk", F.concat_ws(":", F.col(id_col).cast("string"),
                                            F.col(chunk_col).cast("string")))
             .withColumn("_skey", key)
             .withColumn("shard",
                         F.pmod(F.col("_skey"), F.lit(n_shards)).cast("int"))
             .select(id_col, chunk_col, tokens_col, "shard", "_skey"))

    def pack(pdf):
        pdf = pdf.sort_values(["_skey", id_col, chunk_col],
                              kind="mergesort", ignore_index=True)
        toks = pdf[tokens_col].to_numpy()
        seq = np.empty(len(pdf), dtype=np.int64)
        pos = np.empty(len(pdf), dtype=np.int64)
        s, p, acc = 0, 0, 0
        for i, t in enumerate(toks):
            t = int(t)
            if p > 0 and acc + t > budget:
                s, p, acc = s + 1, 0, 0
            seq[i], pos[i] = s, p
            acc += t
            p += 1
        out = pdf[[id_col, chunk_col, tokens_col, "shard"]].copy()
        out["seq"], out["pos"] = seq, pos
        return out

    # carry the caller's actual column types through (id_col may be a
    # string url, tokens a bigint — hardcoding long/int/int would fail
    # inside every pandas group at runtime, or overflow on coercion)
    in_types = {f.name: f.dataType.simpleString()
                for f in chunks.schema.fields}
    missing = [c for c in (id_col, chunk_col, tokens_col)
               if c not in in_types]
    if missing:
        raise ValueError(f"chunks table lacks column(s) {missing}; have "
                         f"{sorted(in_types)}")
    schema = (f"{id_col} {in_types[id_col]}, "
              f"{chunk_col} {in_types[chunk_col]}, "
              f"{tokens_col} {in_types[tokens_col]}, "
              "shard int, seq long, pos long")
    return keyed.groupBy("shard").applyInPandas(pack, schema)
