"""Source/sink table access (SURVEY.md §2.1 S3/S10/S11).

The reference reads HTML files + MySQL tables; here every source is a
columnar table scan. The storage format is a runtime switch
(``SPARK_GRAFT_TABLE_FORMAT``, default ``parquet``): with an Iceberg
runtime jar on the classpath (``--packages org.apache.iceberg:
iceberg-spark-runtime-...``), ``iceberg`` reads/writes path-based
(hadoop-catalog) Iceberg tables through the exact same call sites — the
north-rule input shape. The sandbox ships no Iceberg jar, so requesting
it raises the documented RuntimeError (checked by test), and the default
layout stays Iceberg-SHAPED parquet: partition column `bucket` on
postings, snapshot ids in the lineage manifest (plans/snapshot.py) giving
readers an immutable file-list pin exactly like an Iceberg snapshot.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = ("region", "nation", "customer", "supplier", "part",
                   "orders", "lineitem", "events", "documents", "embeddings")

_ICEBERG_SOURCE = "org.apache.iceberg.spark.source.IcebergSource"


def table_format() -> str:
    """Storage format for engine tables — read per call so tests and
    spark-submit launches can flip it without re-importing."""
    return os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet")


def format_available(spark: SparkSession, fmt: str) -> bool:
    """True when the DataSource for ``fmt`` is loadable in this JVM."""
    if fmt == "parquet":
        return True
    if fmt == "iceberg":
        try:
            spark._jvm.java.lang.Class.forName(_ICEBERG_SOURCE)  # noqa: SLF001
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
    if fmt == "parquet":
        return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    _require(spark, fmt)
    return spark.read.format(fmt).load(os.path.join(sf_dir, name))


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


def write_table(df: DataFrame, path: str,
                partition_by: list[str] | None = None,
                mode: str = "overwrite") -> None:
    fmt = table_format()
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "parquet":
        w.parquet(path)
    else:
        _require(df.sparkSession, fmt)
        w.format(fmt).save(path)


def write_parquet(df: DataFrame, path: str,
                  partition_by: list[str] | None = None,
                  mode: str = "overwrite") -> None:
    """Backwards-compatible alias for write_table (parquet-era name)."""
    write_table(df, path, partition_by, mode)
