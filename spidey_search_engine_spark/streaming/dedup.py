"""Streaming exact dedup — the ingest-time guard of the batch dedup family
(SURVEY §2.8 P1/P16).

A 10^12-file corpus isn't loaded once, it ARRIVES; dropping exact
re-crawls/re-uploads at ingest is cheaper than ever storing them. Two
Spark-native shapes, both keyed on sha256(content) so state holds a
32-byte key, never document text:

* unbounded ``dropDuplicates`` — exact forever, state grows with the
  distinct-document count (one hash per doc; fine when the key store fits
  the state backend, e.g. RocksDB state store).
* ``dropDuplicatesWithinWatermark`` — state bounded by the event-time
  watermark: a duplicate arriving within the watermark horizon of its
  first copy is dropped, and state for keys older than the watermark is
  evicted (a copy arriving AFTER eviction is emitted again — the standard
  bounded-state trade; the batch exact_dedup pass downstream catches
  those stragglers).

Deterministic under replay like the other streaming ops: which copy is
"first" is decided by arrival order within the checkpointed micro-batch
sequence, which checkpoint recovery reproduces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(docs: DataFrame, text_col: str = "content",
                 ts_col: str = "ts",
                 watermark: str | None = None) -> DataFrame:
    """First copy of each distinct ``text_col`` passes, later copies drop.

    ``watermark=None`` → unbounded exact state; a duration string (e.g.
    ``"1 hour"``) → watermarked bounded state via
    dropDuplicatesWithinWatermark on ``ts_col``.
    """
    keyed = docs.withColumn("content_sha", F.sha2(F.col(text_col), 256))
    if watermark is None:
        return keyed.dropDuplicates(["content_sha"])
    return (keyed.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["content_sha"]))


# ---------------------------------------------------------------------------
# Near-dup dedup at ingest: per-batch MinHash probe + index append (P26/P16)
# ---------------------------------------------------------------------------

def _committed_batch_dirs(root: str, before_batch: int) -> "list[str]":
    """batch=<id> dirs with id < before_batch — the replay-safe base set.

    foreachBatch is at-least-once: when batch N replays after a
    post-commit crash, ``root`` already holds batch=N's own output, and
    reading it back as "base corpus" would make every replayed doc a
    perfect duplicate of itself. Listing only ids < N keeps the batch's
    input invisible to its own probe, so a replay reproduces identical
    keep decisions."""
    import os
    if not os.path.isdir(root):
        return []
    out = []
    for d in sorted(os.listdir(root)):
        if d.startswith("batch="):
            try:
                if int(d.split("=", 1)[1]) < before_batch:
                    out.append(os.path.join(root, d))
            except ValueError:
                continue
    return out


def near_dedup_ingest_stream(docs_stream: DataFrame, store_dir: str,
                             id_col: str = "doc_id",
                             text_col: str = "content",
                             n: int = 3, num_hashes: int = 32,
                             bands: int = 8, threshold: float = 0.7,
                             seed: int = 7, n_buckets: int = 64,
                             verify: str = "exact",
                             hash_expr=None, band_hash_expr=None,
                             checkpoint: str | None = None):
    """Continuous NEAR-duplicate dedup at ingest: each micro-batch is
    LSH-probed against everything kept so far, survivors are appended to
    the doc store AND to the bucket-partitioned MinHash band index — the
    streaming composition of dedup.write_minhash_index +
    incremental_lsh_pairs (P26), so the kept corpus is never re-minhashed.

    Per batch:
    1. within-batch pairs via minhash_lsh_dedup; the higher id of each
       verified pair drops (keep-first-by-id — the greedy batch policy;
       run dedup_clusters downstream when transitive canonical picks
       matter).
    2. cross-corpus pairs via incremental_lsh_pairs against the
       PARTITION-PRUNED band index of previously committed batches; any
       batch doc matching a kept doc drops.
    3. survivors append under ``store_dir/docs/batch=<id>/`` and their
       band rows under ``store_dir/minhash/batch=<id>/`` (bucket-
       partitioned). Each batch OVERWRITES its own dirs and probes only
       ids < its own (the incremental.py idempotence discipline), so
       at-least-once replays rewrite identical files and identical keep
       decisions.

    State lives entirely in the store layout — no streaming state store;
    the watermarkless shape is exact w.r.t. everything kept so far, at
    the cost of probe work per batch (bounded: batch bands × pruned
    partitions). Returns the StreamingQuery.
    """
    import os

    from ..operators.dedup import (banded_signatures, incremental_lsh_pairs,
                                   minhash_lsh_dedup, minhash_signatures,
                                   shingles_df)

    docs_root = os.path.join(store_dir, "docs")
    idx_root = os.path.join(store_dir, "minhash")
    mh = dict(n=n, num_hashes=num_hashes, bands=bands, seed=seed)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        # 1. within-batch greedy keep-first
        pairs_in = minhash_lsh_dedup(batch_df, id_col, text_col,
                                     threshold=threshold,
                                     hash_expr=hash_expr,
                                     band_hash_expr=band_hash_expr, **mh)
        drop_in = pairs_in.select(F.col("id_b").alias(id_col)).distinct()
        kept = batch_df.join(drop_in, id_col, "left_anti")
        # 2. vs previously committed batches (replay-safe listing);
        # verify="minhash" skips the base-text read entirely — the
        # committed band index carries the signatures
        base_dirs = _committed_batch_dirs(docs_root, int(batch_id))
        if base_dirs:
            base = None
            if verify == "exact":
                base = spark.read.option("basePath", docs_root) \
                    .parquet(*base_dirs).select(id_col, text_col)
            # mergeSchema: a store restarted with verify='minhash' may mix
            # pre-signature batch dirs (no `sig` column) with new ones —
            # merging surfaces the column everywhere (NULL on old rows),
            # and the probe's assert_true turns those NULLs into a loud
            # rebuild-the-index error instead of silently keeping dups
            idx = (spark.read.option("basePath", idx_root)
                   .option("mergeSchema", "true")
                   .parquet(*_committed_batch_dirs(idx_root,
                                                   int(batch_id))))
            cross = incremental_lsh_pairs(
                kept, base, idx, id_col=id_col, text_col=text_col,
                threshold=threshold, n_buckets=n_buckets, verify=verify,
                hash_expr=hash_expr, band_hash_expr=band_hash_expr, **mh)
            drop_x = (cross.select(F.col("id_b").alias(id_col)).distinct()
                      .localCheckpoint())  # cut the lineage so the probe's
            # persisted intermediates can be released before the writes
            for h in getattr(cross, "_persisted", []):
                h.unpersist()
            kept = kept.join(drop_x, id_col, "left_anti")
        kept = kept.persist()
        # 3. commit survivors: docs + band rows, idempotent per-batch dirs
        (kept.coalesce(1).write.mode("overwrite")
         .parquet(os.path.join(docs_root, f"batch={batch_id}")))
        sh = shingles_df(kept, id_col, text_col, n)
        sig = minhash_signatures(sh, num_hashes, seed, hash_expr)
        banded = banded_signatures(sig, bands, num_hashes, band_hash_expr,
                                   keep_sig=True)  # later batches may
        # probe this index with the join-free signature verify
        (banded.withColumn("bucket", F.pmod(F.col("bh"), F.lit(n_buckets)))
         .repartition("bucket").write.mode("overwrite")
         .partitionBy("bucket")
         .parquet(os.path.join(idx_root, f"batch={batch_id}")))
        kept.unpersist()
        batch_df.unpersist()

    writer = docs_stream.writeStream.foreachBatch(process) \
        .trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


# ---------------------------------------------------------------------------
# Decontamination at ingest: per-batch n-gram flag vs a static benchmark
# ---------------------------------------------------------------------------

def decontam_ingest_stream(docs_stream: DataFrame, bench: DataFrame,
                           n: int = 13, text_col: str = "content",
                           bench_text_col: str = "text",
                           flag_only: bool = False) -> DataFrame:
    """Ingest-time benchmark decontamination (P40's streaming twin):
    documents sharing a token n-gram with the (STATIC) benchmark set are
    dropped — or flagged (`flag_only=True`, adds `n_hit`) — as they
    arrive.

    The batch operator's broadcast-join shape doesn't stream (per-doc
    ANY-gram-hits needs an aggregation, which would force watermarked
    state for what is a stateless per-row decision), so the benchmark
    grams ride INSIDE the Arrow kernel as a python set: one driver-side
    collect, bounded by construction — eval suites are MBs, the same
    smallness argument the batch path uses to broadcast. Each micro-batch
    row then pays one tokenize + set-probe pass; no state, no join, no
    shuffle, deterministic under replay. Matches the batch
    `contamination_hits` count exactly (DISTINCT shared grams), pinned
    by test."""
    from ..functions.bpe import _passthrough_schema
    from ..functions.textstats import _py_tokens
    from ..operators.decontaminate import benchmark_ngrams
    if "n_hit" in docs_stream.columns:
        raise ValueError("docs_stream already has an n_hit column "
                         "(re-ingesting flagged output? drop it first)")
    grams = {r["gram"] for r in
             benchmark_ngrams(bench, n, bench_text_col).collect()}

    schema = _passthrough_schema(docs_stream, "`n_hit` int")

    def kernel(batches):
        for pdf in batches:
            hits = []
            for text in pdf[text_col]:
                if text is None:
                    hits.append(0)
                    continue
                toks = _py_tokens(text)
                hits.append(len({g for g in (
                    " ".join(toks[i:i + n])
                    for i in range(len(toks) - n + 1)) if g in grams}))
            pdf = pdf.copy()
            pdf["n_hit"] = hits
            yield pdf

    out = docs_stream.mapInPandas(kernel, schema)
    if flag_only:
        return out
    return out.filter(F.col("n_hit") == 0).drop("n_hit")
