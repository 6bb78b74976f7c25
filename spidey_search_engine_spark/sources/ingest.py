"""Raw-ingest sources for training-data pipelines.

Real corpora arrive as JSONL dumps (one document object per line, often
hand-assembled, often partially malformed). The ingest reader enforces a
schema and QUARANTINES bad rows instead of silently nulling or aborting:

* syntactically corrupt lines are captured by Spark's PERMISSIVE
  columnNameOfCorruptRecord channel;
* syntactically valid lines missing a REQUIRED field (e.g. null content)
  are quarantined too — downstream operators (tokenize, sha, dedup)
  assume those fields non-null.

Both halves return as DataFrames so the caller can write the quarantine
aside for inspection (the standard audit trail) while the clean half
flows into the corpus pipeline. Scale shape: one pass, scan-local
filters, no shuffle; JSONL splits by line so the read parallelizes like
any text source.

Reference parity: the reference ingests via its crawler (Crawler.java
fetch -> html_docs/<id>.html); file-dump ingest is part of the mandated
beyond-reference training-data family (SURVEY §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CORRUPT = "_corrupt_record"


def _top_level_fields(schema_ddl: str) -> "list[str]":
    """Top-level field names from a DDL string, splitting only on commas
    at nesting depth 0 (decimal(p,s), struct<...>, map<...> carry commas
    of their own)."""
    fields, depth, start = [], 0, 0
    for i, ch in enumerate(schema_ddl):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            fields.append(schema_ddl[start:i])
            start = i + 1
    fields.append(schema_ddl[start:])
    names = []
    for f in fields:
        parts = f.strip().split()
        if not parts:
            raise ValueError(f"empty field in schema DDL {schema_ddl!r}")
        names.append(parts[0])
    return names


def _valid_predicate(schema_ddl: str, required: "tuple[str, ...]"):
    """Shared batch/streaming contract: validate `required` against the
    top-level schema fields and return the row-is-valid Column."""
    names = _top_level_fields(schema_ddl)
    missing = [c for c in required if c not in names]
    if missing:
        raise ValueError(f"required fields {missing} not in schema "
                         f"({schema_ddl!r})")
    ok = F.col(_CORRUPT).isNull()
    for c in required:
        ok = ok & F.col(c).isNotNull()
    return ok


def read_jsonl_docs(spark: SparkSession, path: str, schema_ddl: str,
                    required: tuple[str, ...] = ("doc_id", "text"),
                    ) -> "tuple[DataFrame, DataFrame]":
    """(valid, quarantined) from a JSONL dump at ``path``.

    ``schema_ddl`` is the expected document schema as a DDL string (the
    read NEVER infers — inference is a full extra pass and schema drift
    should fail loudly, not reshape the table). ``required`` fields must
    be non-null for a row to count as valid. The quarantine half carries
    the raw offending line in `_corrupt_record` for corrupt rows (null
    for required-field violations, whose parsed columns are intact).
    """
    ok = _valid_predicate(schema_ddl, required)
    raw = (spark.read
           .schema(f"{schema_ddl}, {_CORRUPT} string")
           .option("mode", "PERMISSIVE")
           .option("columnNameOfCorruptRecord", _CORRUPT)
           .json(path))
    valid = raw.filter(ok).drop(_CORRUPT)
    quarantined = raw.filter(~ok)
    return valid, quarantined


def jsonl_ingest_stream(spark: SparkSession, src_dir: str, store_dir: str,
                        schema_ddl: str,
                        required: tuple[str, ...] = ("doc_id", "text"),
                        checkpoint: str | None = None,
                        max_files_per_trigger: int | None = None):
    """Continuous JSONL ingest with the same quarantine contract as
    read_jsonl_docs, over a directory where dump files keep ARRIVING:
    valid rows append to <store_dir>/docs (parquet), rejects to
    <store_dir>/quarantine with the micro-batch id attached (the audit
    trail that tells which delivery brought the damage).

    One readStream feeds both sinks through foreachBatch — the file is
    parsed once per trigger, not once per sink, and the checkpoint makes
    delivery exactly-once per batch dir. Compose with
    streaming.dedup.near_dedup_ingest_stream by pointing it at the clean
    docs output. Availability triggers (processAll semantics in tests)
    terminate when the directory is drained.
    """
    import os

    ok = _valid_predicate(schema_ddl, required)
    reader = (spark.readStream
              .schema(f"{schema_ddl}, {_CORRUPT} string")
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", _CORRUPT))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    raw = reader.json(src_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            (batch_df.filter(ok).drop(_CORRUPT)
             .write.mode("overwrite")
             .parquet(os.path.join(store_dir, "docs",
                                   f"batch={batch_id}")))
            (batch_df.filter(~ok)
             .withColumn("_batch_id", F.lit(int(batch_id)))
             .write.mode("overwrite")
             .parquet(os.path.join(store_dir, "quarantine",
                                   f"batch={batch_id}")))
        finally:
            batch_df.unpersist()

    writer = raw.writeStream.foreachBatch(process) \
        .trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
