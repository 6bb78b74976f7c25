"""Source/sink table access (SURVEY.md §2.1 S3/S10/S11).

The reference reads HTML files + MySQL tables; here every source is a
columnar table scan (Parquet in the sandbox; the layout is Iceberg-shaped —
partition column `bucket` on postings, snapshot ids in the lineage table —
so swapping `format("parquet")` for `format("iceberg")` is a one-line
change, isolated here per SURVEY.md §7 risk 6).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = ("region", "nation", "customer", "supplier", "part",
                   "orders", "lineitem", "events", "documents", "embeddings")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


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


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None,
                  mode: str = "overwrite") -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
