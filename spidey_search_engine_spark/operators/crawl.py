"""S1/S2 analog — frontier-driven crawl without a network.

The reference's crawler is BFS over the web: seed list → fetch → extract
links → normalize → dedupe against visited → enqueue up to a frontier cap,
resumable from its queue tables (Crawler.java:42-45 seed/cap constants,
:282-306 normalization, :308-414 the loop). This sandbox has no network
(SURVEY §2.1 maps S2's HTTP fetch to n/a), but the crawl CONTROL STRUCTURE
is network-independent, so it is implemented here over any "fetchable"
corpus: a fetch is a lookup into the source table (the no-network stand-in
for HTTP GET — on a real deployment, swap `fetch` for an Arrow-batched
HTTP kernel and nothing else changes), links come from the S7 import-ref
extractor, and the frontier/visited bookkeeping is exactly the
reference's.

Spark shapes:

* ``bfs_frontier`` — the crawl loop on a prebuilt edge list: per wave, one
  equi-join frontier→edges, an anti-join against visited, an optional
  deterministic frontier cap (the reference's 6000-queued cap,
  Crawler.java:44 — capped by lowest id for replayability), and a
  localCheckpoint to keep lineage flat. Each wave is one shuffle round —
  the BSP form of BFS that scales to 10^12-node graphs.
* ``crawl_corpus`` — S1→S7 end to end over the corpus: seeds by path,
  "fetch" the wave's content (inner join into the corpus scan — only the
  frontier's rows are ever read), extract+resolve import links, advance.

First-visit depth is recorded per doc (BFS ⇒ min depth), which doubles as
the crawl lineage: re-running with the same seeds/caps reproduces the
identical visit set and depths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


_TOPK_CAP_THRESHOLD = 10_000


def _cap_lowest_ids(nxt: DataFrame, cap: int,
                    two_pass_threshold: int = _TOPK_CAP_THRESHOLD
                    ) -> DataFrame:
    """The lowest-`cap` ids of `nxt` WITHOUT a global single-task sort.

    Small caps (< `two_pass_threshold`) keep the lazy ``orderBy(id).
    limit(cap)`` — Spark plans it as TakeOrderedAndProject (per-partition
    top-cap heaps merged once over ≤ n_partitions×cap rows), so no task
    ever holds the whole frontier and the wave stays one job. The
    reference's own cap is 6000 (Crawler.java:44), i.e. this path.

    Above the threshold the top-k merge itself gets heavy, so: same
    two-pass shape as the doc-id assigner (build.py:94-103) —
    range-partition by id; pass 1 collects one row count per partition
    (≤ n longs); pass 2 sorts each partition locally (row_number window
    keyed on the pinned _pid) and keeps rows whose partition offset +
    within-partition rank is ≤ cap. Ids are distinct here, so the kept
    SET is exactly the orderBy/limit set; every task handles one id
    range, none handles the whole frontier. (Costs an eager
    localCheckpoint of the wave + a counts collect — why it is reserved
    for caps where the single merge would actually hurt.)"""
    if cap < two_pass_threshold:
        return nxt.orderBy("id").limit(cap)
    n = nxt.sparkSession.sparkContext.defaultParallelism
    ordered = (nxt.repartitionByRange(n, "id")
               .withColumn("_pid", F.spark_partition_id())
               .localCheckpoint())  # pin partitioning across both passes
    counts = {int(r["_pid"]): int(r["cnt"]) for r in
              ordered.groupBy("_pid").agg(F.count("*").alias("cnt"))
              .collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if acc <= cap:
        return ordered.drop("_pid")
    keep = [pid for pid in sorted(counts) if offsets[pid] < cap]
    off = F.create_map(
        *[F.lit(v) for pid in keep for v in (pid, offsets[pid])])
    w = Window.partitionBy("_pid").orderBy("id")
    return (ordered.filter(F.col("_pid").isin(keep))
            .withColumn("_rn", F.row_number().over(w))
            .filter(off[F.col("_pid")] + F.col("_rn") <= cap)
            .drop("_pid", "_rn"))


def bfs_frontier(spark: SparkSession, edges: DataFrame, seeds: DataFrame,
                 max_depth: int, frontier_cap: int | None = None) -> DataFrame:
    """BFS over edges (src, dst) from seeds (id) → (id, depth), depth =
    first-visit wave. `frontier_cap` bounds each wave to the lowest-id
    `cap` unseen nodes (deterministic analog of the reference's queue
    cap)."""
    e = (edges.select(F.col("src").cast("long").alias("src"),
                      F.col("dst").cast("long").alias("dst"))
         .distinct().repartition("src").localCheckpoint())
    visited = (seeds.select(F.col("id").cast("long").alias("id")).distinct()
               .withColumn("depth", F.lit(0)).localCheckpoint())
    frontier = visited.select("id")
    for d in range(1, max_depth + 1):
        nxt = (frontier.join(e, frontier["id"] == e["src"])
               .select(F.col("dst").alias("id")).distinct()
               .join(visited.select("id"), "id", "left_anti"))
        if frontier_cap is not None:
            nxt = _cap_lowest_ids(nxt, frontier_cap)
        nxt = nxt.withColumn("depth", F.lit(d)).localCheckpoint()
        if not nxt.head(1):
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("id")
    return visited


def crawl_corpus(spark: SparkSession, corpus: DataFrame, seed_paths: list[str],
                 max_depth: int, frontier_cap: int | None = None) -> DataFrame:
    """S1→S2→S7 loop over a doc corpus: per wave, fetch ONLY the frontier
    docs' content (inner join pushed into the corpus scan), extract+resolve
    import links, advance the unseen targets. Returns (doc_id, depth)."""
    from .links import extract_import_refs, path_module_dim, resolve_refs
    docs = corpus.select("doc_id", "path", "content")
    seeds = (docs.filter(F.col("path").isin(list(seed_paths)))
             .select(F.col("doc_id").alias("id")))
    visited = (seeds.distinct().withColumn("depth", F.lit(0))
               .localCheckpoint())
    # the resolve dimension (path → module map, the reference's urlsIds) is
    # loop-invariant: derive it ONCE, not per wave
    dim = path_module_dim(docs).localCheckpoint()
    frontier = visited.select("id")
    for d in range(1, max_depth + 1):
        fetched = docs.join(frontier.withColumnRenamed("id", "doc_id"),
                            "doc_id")
        links = resolve_refs(extract_import_refs(fetched), dim)
        nxt = (links.select(F.col("dst_doc_id").alias("id")).distinct()
               .join(visited.select("id"), "id", "left_anti"))
        if frontier_cap is not None:
            nxt = _cap_lowest_ids(nxt, frontier_cap)
        nxt = nxt.withColumn("depth", F.lit(d)).localCheckpoint()
        if not nxt.head(1):
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("id")
    return visited.withColumnRenamed("id", "doc_id")

