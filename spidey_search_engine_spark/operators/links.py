"""S7/G1 — link extraction + link graph for a source-code corpus.

The reference harvests ``<a href>`` targets, normalizes them, resolves them
against the URL→id map and stores the edge list, excluding self-links
(Indexer.java:353-367, page_connections in create_database.sql:32-38). The
code-corpus analog: harvest ``import <module>`` references from `content`,
resolve the module's file stem against the corpus paths, and emit the
(src_doc_id, dst_doc_id) edge list — the input to PageRank (G1→G3).

Plan shape (all built-in, codegen'd): regexp_extract_all → explode →
normalize (last module component, lowercase) → equi-join against the
path-derived module dimension → distinct. The join key is a short string;
at 10^12 files both sides shuffle on it hash-partitioned, and Catalyst
pushes the column pruning into both scans (content never leaves the
extraction stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# `import mod3.file17`, `import a.b.c` — target = dotted module path
_IMPORT_RE = r"import\s+([A-Za-z_][A-Za-z0-9_.]*)"


def extract_import_refs(docs: DataFrame) -> DataFrame:
    """(doc_id, ref_module): one row per import statement, module normalized
    to its LAST dotted component, lowercased (F8-style normalization)."""
    refs = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all("content", F.lit(_IMPORT_RE), 1))
        .alias("ref"))
    last = F.element_at(F.split(F.col("ref"), r"\."), -1)
    return refs.select("doc_id", F.lower(last).alias("ref_module"))


def path_module_dim(docs: DataFrame) -> DataFrame:
    """(dst_doc_id, module): file stem of `path`, lowercased — the corpus
    analog of the reference's URL→id map (Crawler urlsIds)."""
    stem = F.regexp_extract("path", r"([^/]+)\.[A-Za-z0-9]+$", 1)
    return docs.select(F.col("doc_id").alias("dst_doc_id"),
                       F.lower(stem).alias("ref_module"))


def resolve_refs(refs: DataFrame, dim: DataFrame) -> DataFrame:
    """Resolve (doc_id, ref_module) refs against the module dimension →
    (src_doc_id, dst_doc_id): unresolved refs drop out (inner join),
    self-links excluded (Indexer.java:357), duplicate edges collapsed
    (page_connections has a composite PK). Shared by the one-shot link
    extraction and the crawl loop so resolution semantics live once."""
    return (refs.join(dim, "ref_module")
            .filter(F.col("doc_id") != F.col("dst_doc_id"))
            .select(F.col("doc_id").alias("src_doc_id"), "dst_doc_id")
            .distinct())


def extract_code_links(docs: DataFrame) -> DataFrame:
    """Edge list (src_doc_id, dst_doc_id) of resolved imports."""
    return resolve_refs(extract_import_refs(docs), path_module_dim(docs))


def pagerank_over_links(spark, docs: DataFrame, n_docs: int,
                        mode: str = "reference", **kw) -> DataFrame:
    """G1→G3→G5 end to end: extract edges, run the DataFrame power
    iteration (incl. the reference's 1−d/N damping quirk in `reference`
    mode), return (doc_id, page_rank) joinable back into the doc store."""
    from .pagerank import pagerank
    edges = extract_code_links(docs).select(
        F.col("src_doc_id").alias("src_doc_id"),
        F.col("dst_doc_id").alias("dst_doc_id"))
    nodes = docs.select("doc_id")
    return pagerank(spark, edges, n_docs, mode=mode, all_doc_ids=nodes, **kw)
