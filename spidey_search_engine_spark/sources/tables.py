"""Source/sink table access (SURVEY.md §2.1 S3/S10/S11).

The reference reads HTML files + MySQL tables; here every SOURCE table
(the north-rule corpus input and the testdata tables) is a columnar scan
whose storage format is a runtime switch: ``SPARK_GRAFT_TABLE_FORMAT``
(default ``parquet``; ``iceberg`` with an Iceberg runtime jar on the
classpath, e.g. ``--packages org.apache.iceberg:iceberg-spark-runtime-
...``). ``load_table``/``write_table`` own the format-dependent on-disk
naming (``<dir>/<name>.parquet`` vs path-based ``<dir>/<name>`` Iceberg),
so a write_table → load_table round trip works under either format.

Scope: this switch governs the corpus/source tables read through this
module. The INDEX store (postings/terms/docs/lineage under an index dir)
is deliberately its own layout — bucket-partitioned parquet plus the
snapshot manifest (plans/snapshot.py), which gives readers an immutable
file-list pin exactly like an Iceberg snapshot — and does not flip with
the env var. The sandbox ships no Iceberg jar, so requesting iceberg
raises the documented RuntimeError (pinned by test).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = ("region", "nation", "customer", "supplier", "part",
                   "orders", "lineitem", "events", "documents", "embeddings")

_ICEBERG_SOURCE = "org.apache.iceberg.spark.source.IcebergSource"


def table_format() -> str:
    """Storage format for source tables — read per call so tests and
    spark-submit launches can flip it without re-importing."""
    return os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet")


def table_path(sf_dir: str, name: str, fmt: str | None = None) -> str:
    """Format-owned naming: parquet tables live at <dir>/<name>.parquet
    (the driver's testdata convention), other formats at <dir>/<name>."""
    fmt = fmt or table_format()
    suffix = ".parquet" if fmt == "parquet" else ""
    return os.path.join(sf_dir, f"{name}{suffix}")


def format_available(spark: SparkSession, fmt: str) -> bool:
    """True when the DataSource for ``fmt`` is loadable in this JVM.

    On sessions without a JVM handle (Spark Connect), the classpath can't
    be probed from the client — report available and let Spark itself
    raise at use time rather than emitting a false 'jar missing' error.
    """
    if fmt == "parquet":
        return True
    if fmt == "iceberg":
        jvm = getattr(spark, "_jvm", None)  # noqa: SLF001
        if jvm is None:
            return True
        try:
            jvm.java.lang.Class.forName(_ICEBERG_SOURCE)
            return True
        except Exception:
            return False
    return True  # unknown formats: let Spark resolve (and error) itself


def _require(spark: SparkSession, fmt: str) -> None:
    if not format_available(spark, fmt):
        raise RuntimeError(
            f"table format {fmt!r} requested via SPARK_GRAFT_TABLE_FORMAT "
            "but its DataSource is not on the classpath — launch with "
            "--packages org.apache.iceberg:iceberg-spark-runtime-"
            "<spark-ver>_<scala-ver>:<iceberg-ver> (or unset the variable "
            "to use the parquet layout)")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    fmt = table_format()
    path = table_path(sf_dir, name, fmt)
    if fmt == "parquet":
        return spark.read.parquet(path)
    _require(spark, fmt)
    return spark.read.format(fmt).load(path)


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's `documents(doc_id,text,lang,source,n_chars)` table
    to the corpus shape (repo,path,commit,lang,content) + a pre-assigned
    dense doc_id (the table's own)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id"),
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.sha2(F.concat_ws("/", "source", "doc_id"), 256).substr(1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def write_table(df: DataFrame, sf_dir: str, name: str,
                partition_by: list[str] | None = None,
                mode: str = "overwrite") -> str:
    """Write a source-shaped table under the format-owned path for
    ``name`` and return that path (so write → load round-trips under
    either format)."""
    fmt = table_format()
    path = table_path(sf_dir, name, fmt)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "parquet":
        w.parquet(path)
    else:
        _require(df.sparkSession, fmt)
        w.format(fmt).save(path)
    return path


def write_parquet(df: DataFrame, path: str,
                  partition_by: list[str] | None = None,
                  mode: str = "overwrite") -> None:
    """Raw-path parquet write (format-independent legacy helper)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
