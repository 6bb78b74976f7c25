"""Percolation — reverse search: which STORED queries match each incoming
document (the Elasticsearch percolator / Lucene MemoryIndex pattern).

A serving engine answers "which docs match this query"; an alerting or
routing tier needs the transpose — saved searches ("alert me when a doc
mentions X and Y") evaluated against every NEW document as it arrives.
The reference has no analog (its pipeline is crawl→index→query); this is
the standard operational complement of the streaming ingest path.

Scale shape: the stored-query table is small (thousands of alerts) and
BROADCASTS into the document token stream — the corpus side is one
tokenize pass (the index's own Arrow analyzer) + a map-side join + one
(doc, query) aggregation whose cardinality is bounded by actual term
hits, never |docs| × |queries|. No index required: percolation runs on
raw documents (pre-index alerting), batch or per-micro-batch in
foreachBatch (stateless — no watermark state to manage).

Stored-query semantics mirror the engine's boolean path: ``mode="any"``
matches a doc containing ANY query term (OR), ``mode="all"`` requires
EVERY distinct term (the +term / Lucene MUST conjunction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analysis import spark_udfs


def percolate(docs: DataFrame, queries: DataFrame,
              profile: str = "simple", id_col: str = "doc_id",
              text_col: str = "content") -> DataFrame:
    """(doc_id, query_id) rows: stored query `query_id` matches document
    `doc_id`.

    `queries` carries (query_id string, terms array<string>,
    mode string∈{any,all}); terms should be pre-analyzed with the SAME
    profile (store what the analyzer emits — exactly like the CLI
    analyzes user queries before touching the dictionary). Duplicate
    stored terms count once (distinct-term conjunction, matching the
    boolean path's count-distinct semantics)."""
    qn = (queries
          .withColumn("_terms", F.array_distinct("terms"))
          .withColumn("n_req", F.size("_terms"))
          .filter(F.col("n_req") > 0)
          .select("query_id", "mode", "n_req",
                  F.explode("_terms").alias("term")))
    tok = spark_udfs()[profile]
    doc_terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tok(F.col(text_col)))).alias("term"))
    hits = doc_terms.join(F.broadcast(qn), "term")
    agg = (hits.groupBy("doc_id", "query_id", "mode", "n_req")
           .agg(F.count_distinct("term").alias("n_hit")))
    return (agg.filter((F.col("mode") == "any")
                       | (F.col("n_hit") == F.col("n_req")))
            .select("doc_id", "query_id"))


def validate_stored_queries(queries: DataFrame) -> None:
    """Fail fast on malformed stored queries (one tiny aggregation):
    modes outside {any, all} would silently never match in `percolate`'s
    filter — an alerting tier must reject them at registration time."""
    bad = (queries.filter(~F.col("mode").isin("any", "all"))
           .select("query_id", "mode").limit(5).collect())
    if bad:
        pairs = ", ".join(f"{r['query_id']}={r['mode']!r}" for r in bad)
        raise ValueError(f"stored queries with unknown mode: {pairs} "
                         "(expected 'any' or 'all')")
