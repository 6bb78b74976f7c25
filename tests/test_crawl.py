"""S1/S2 analog: frontier BFS crawl — python-oracle checked."""

from pyspark.sql import functions as F


def _bfs_oracle(edges, seeds, max_depth, cap=None):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    depth = {s: 0 for s in seeds}
    frontier = sorted(seeds)
    for dd in range(1, max_depth + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in depth:
                    nxt.add(v)
        nxt = sorted(nxt)
        if cap is not None:
            nxt = nxt[:cap]
        if not nxt:
            break
        for v in nxt:
            depth[v] = dd
        frontier = nxt
    return depth


def test_bfs_frontier_matches_oracle(spark):
    from spidey_search_engine_spark.operators.crawl import bfs_frontier
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 0),
             (2, 6), (6, 7), (7, 8), (8, 9)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "id long")
    for cap in (None, 1):
        got = {r["id"]: r["depth"] for r in
               bfs_frontier(spark, e, seeds, max_depth=4,
                            frontier_cap=cap).collect()}
        assert got == _bfs_oracle(edges, [0], 4, cap)


def test_cap_lowest_ids_equals_global_sort_limit(spark):
    """The distributed rank-over-range cap keeps EXACTLY the
    orderBy(id).limit(cap) set — including cap ≥ n, cap splitting a range
    partition, and an empty input."""
    from spidey_search_engine_spark.operators.crawl import _cap_lowest_ids
    ids = [(i * 37) % 101 for i in range(101)]  # permutation of 0..100
    df = spark.createDataFrame([(i,) for i in ids], "id long").repartition(7)
    for cap in (1, 5, 33, 100, 101, 500):
        # two_pass_threshold=0 forces the rank-over-range path; the default
        # would route these small caps to the lazy TakeOrderedAndProject
        got = {r["id"] for r in
               _cap_lowest_ids(df, cap, two_pass_threshold=0).collect()}
        assert got == set(sorted(ids)[:cap]), cap
        lazy = {r["id"] for r in _cap_lowest_ids(df, cap).collect()}
        assert lazy == got, cap
    empty = df.filter(F.col("id") < 0)
    assert _cap_lowest_ids(empty, 10, two_pass_threshold=0).count() == 0


def test_crawl_corpus_matches_link_graph_bfs(spark, corpus_pdf):
    from spidey_search_engine_spark.operators.build import prepare_docs
    from spidey_search_engine_spark.operators.crawl import crawl_corpus
    from spidey_search_engine_spark.operators.links import extract_code_links

    docs = prepare_docs(spark.createDataFrame(corpus_pdf.head(200)))
    edges = [(r["src_doc_id"], r["dst_doc_id"])
             for r in extract_code_links(docs).collect()]
    seeds_rows = docs.orderBy("doc_id").limit(3) \
        .select("doc_id", "path").collect()
    seed_paths = [r["path"] for r in seeds_rows]
    seed_ids = [r["doc_id"] for r in seeds_rows]

    got = {r["doc_id"]: r["depth"] for r in
           crawl_corpus(spark, docs, seed_paths, max_depth=3).collect()}
    assert got == _bfs_oracle(edges, seed_ids, 3)
    assert len(got) > 3  # the crawl actually reached beyond the seeds
