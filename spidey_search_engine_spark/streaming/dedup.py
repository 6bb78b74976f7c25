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
