"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (engine-built inverted index → BM25
top-10) on sf0.001; ``queries``/``oracle_sql`` pair every implemented
operator (SURVEY.md §2) with a DuckDB-runnable ANSI-SQL oracle. Engine code
lives in spidey_search_engine_spark/; this file is only the contract glue.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spidey_search_engine_spark import entry_queries as EQ


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the inverted index over /root/testdata/sf0.001
    documents (simple profile), score BM25 for a fixed multi-term query via
    compressed-posting decode, return top-10 (doc_id, score_r)."""
    return EQ.bm25_topk_fixed(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(EQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(EQ.ORACLE_SQL)
