"""PageRank vs dense numpy oracle, incl. the reference 1−d/N quirk."""

import numpy as np
import pytest


def _numpy_pagerank(edges, n, damping=0.85, tol=0.001, mode="reference",
                    max_iter=100):
    """Dense oracle mirroring PageRanker.java:105-135 exactly."""
    edges = {(s, d) for s, d in edges if s != d}
    M = np.zeros((n, n))
    out = np.zeros(n, dtype=int)
    for s, d in edges:
        out[s] += 1
    for s, d in edges:
        M[d, s] = 1.0 / out[s]
    c = (1.0 - damping / n) if mode == "reference" else (1.0 - damping) / n
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        r2 = damping * (M @ r) + c
        if np.max(np.abs(r2 - r)) < tol:
            r = r2
            break
        r = r2
    return r


EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (4, 0), (4, 3), (1, 1), (2, 0)]
N = 6  # node 5 is dangling AND unreferenced


@pytest.mark.parametrize("mode", ["reference", "textbook"])
def test_pagerank_matches_numpy(spark, mode):
    from spidey_search_engine_spark.operators.pagerank import pagerank
    edges = spark.createDataFrame(EDGES, "src_doc_id long, dst_doc_id long")
    nodes = spark.createDataFrame([(i,) for i in range(N)], "doc_id long")
    got = {r["doc_id"]: r["page_rank"] for r in
           pagerank(spark, edges, N, mode=mode, all_doc_ids=nodes).collect()}
    exp = _numpy_pagerank(EDGES, N, mode=mode)
    assert set(got) == set(range(N))
    for i in range(N):
        assert abs(got[i] - exp[i]) < 1e-9, (mode, i, got[i], exp[i])


def test_algebraic_solve_matches_converged_power_iteration(spark):
    """G4: the direct (I − dM)r = c·1 solve equals the power iteration run
    to tight tolerance, in both damping modes."""
    from pyspark.sql import functions as F
    from spidey_search_engine_spark.operators.pagerank import (
        pagerank, pagerank_algebraic)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0), (4, 2), (0, 2)],
        "src_doc_id long, dst_doc_id long")
    nodes = spark.range(5).select(F.col("id").alias("doc_id"))
    for mode in ("reference", "textbook"):
        it = {r["doc_id"]: r["page_rank"] for r in
              pagerank(spark, edges, 5, tol=1e-12, max_iter=500,
                       mode=mode, all_doc_ids=nodes).collect()}
        alg = {r["doc_id"]: r["page_rank"] for r in
               pagerank_algebraic(spark, edges, 5, mode=mode,
                                  all_doc_ids=nodes).collect()}
        assert set(it) == set(alg)
        for d in it:
            assert abs(it[d] - alg[d]) < 1e-9, (mode, d)


def test_algebraic_solve_guards_scale(spark):
    """The guard bounds the ACTUAL dense dimension (node count), not the
    caller's n_docs claim."""
    import pytest as _pytest
    from pyspark.sql import functions as F
    from spidey_search_engine_spark.operators.pagerank import \
        pagerank_algebraic
    edges = spark.createDataFrame([(0, 1)], "src_doc_id long, dst_doc_id long")
    nodes = spark.range(6000).select(F.col("id").alias("doc_id"))
    with _pytest.raises(ValueError):
        pagerank_algebraic(spark, edges, 6000, all_doc_ids=nodes,
                           max_nodes=5000)
    # a tiny observed graph with a huge n_docs CLAIM is fine — the dense
    # dimension is what matters (constants just use n_docs, like pagerank())
    out = pagerank_algebraic(spark, edges, 10**9)
    assert out.count() == 2


def test_algebraic_solve_subset_nodes_matches_iterative(spark):
    """Edges touching nodes outside all_doc_ids: algebraic must match the
    iterative path (which drops them at its joins), incl. outdeg counting
    out-of-set targets."""
    from pyspark.sql import functions as F
    from spidey_search_engine_spark.operators.pagerank import (
        pagerank, pagerank_algebraic)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (1, 99), (99, 0), (2, 98)],
        "src_doc_id long, dst_doc_id long")  # 98/99 outside the node set
    nodes = spark.range(3).select(F.col("id").alias("doc_id"))
    it = {r["doc_id"]: r["page_rank"] for r in
          pagerank(spark, edges, 3, tol=1e-12, max_iter=500,
                   all_doc_ids=nodes).collect()}
    alg = {r["doc_id"]: r["page_rank"] for r in
           pagerank_algebraic(spark, edges, 3, all_doc_ids=nodes).collect()}
    assert set(it) == set(alg)
    for d in it:
        assert abs(it[d] - alg[d]) < 1e-9, d


def test_pagerank_incremental_warm_start(spark):
    """Warm-starting from the previous ranks reaches the SAME fixed
    point (the iteration is a d-contraction — unique fixed point, start
    vector only changes iteration count): after a small graph delta the
    incremental ranks match a from-scratch run at tolerance, in strictly
    fewer iterations; on an UNCHANGED graph the warm start certifies
    convergence immediately."""
    from spidey_search_engine_spark.operators.pagerank import (
        pagerank, pagerank_incremental)
    import random
    rng = random.Random(11)
    n = 60
    edges0 = sorted({(rng.randrange(n), rng.randrange(n))
                     for _ in range(240)})
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    e0 = spark.createDataFrame(edges0, "src_doc_id long, dst_doc_id long")
    tol = 1e-6
    base = pagerank(spark, e0, n, tol=tol, all_doc_ids=nodes)

    # delta: rewire a handful of edges + one new node with links
    edges1 = edges0[:-5] + [(n, 3), (3, n), (7, 12)]
    n1 = n + 1
    nodes1 = spark.createDataFrame([(i,) for i in range(n1)],
                                   "doc_id long")
    e1 = spark.createDataFrame(edges1, "src_doc_id long, dst_doc_id long")
    cold_info, warm_info = {}, {}
    cold = {r["doc_id"]: r["page_rank"] for r in
            pagerank(spark, e1, n1, tol=tol, all_doc_ids=nodes1,
                     iter_info=cold_info).collect()}
    warm = {r["doc_id"]: r["page_rank"] for r in
            pagerank_incremental(spark, e1, n1, base, tol=tol,
                                 all_doc_ids=nodes1,
                                 iter_info=warm_info).collect()}
    assert set(cold) == set(warm)
    assert max(abs(cold[d] - warm[d]) for d in cold) < 1e-4
    assert warm_info["iterations"] < cold_info["iterations"], \
        (warm_info, cold_info)

    # unchanged graph: one iteration certifies the fixed point
    noop_info = {}
    again = {r["doc_id"]: r["page_rank"] for r in
             pagerank_incremental(spark, e0, n, base, tol=tol,
                                  all_doc_ids=nodes,
                                  iter_info=noop_info).collect()}
    base_d = {r["doc_id"]: r["page_rank"] for r in base.collect()}
    assert noop_info["iterations"] <= 2
    assert max(abs(again[d] - base_d[d]) for d in base_d) < 1e-5
