"""Block-max pruned top-k must equal the exhaustive path on every query
(SURVEY.md §7 step 6)."""

import math

import pytest

from tests.test_search import QUERIES


@pytest.mark.parametrize("query", QUERIES)
def test_pruned_equals_exhaustive(spark, index, query):
    from spidey_search_engine_spark.operators.search import bm25_topk
    from spidey_search_engine_spark.operators.wand import bm25_topk_pruned
    exact = [(r["doc_id"], r["score"]) for r in
             bm25_topk(spark, index, query, k=10).collect()]
    pruned = [(r["doc_id"], r["score"]) for r in
              bm25_topk_pruned(spark, index, query, k=10, range_bits=6,
                               probe_ranges=2).collect()]
    assert [d for d, _ in pruned] == [d for d, _ in exact]
    for (pd_, ps), (ed, es) in zip(pruned, exact):
        assert math.isclose(ps, es, rel_tol=1e-12)


def test_bounds_are_sound(spark, index):
    """Every doc's exact score ≤ its range's UB."""
    from pyspark.sql import functions as F
    from spidey_search_engine_spark.operators.search import (bm25_scores,
                                                             query_term_postings)
    from spidey_search_engine_spark.operators.wand import query_range_bounds
    from spidey_search_engine_spark.functions.analysis import analyze_query
    q_terms, _ = analyze_query("merge sort import")
    range_bits = 6
    bounds = {r["rng"]: r["ub"] for r in
              query_range_bounds(index, q_terms, range_bits).collect()}
    rows = query_term_postings(index["postings"], q_terms,
                               int(index["stats"]["n_buckets"]))
    scores = bm25_scores(rows, index["terms"],
                         float(index["stats"]["avgdl"]), q_terms).collect()
    assert scores
    for r in scores:
        rng = r["doc_id"] >> range_bits
        assert rng in bounds
        assert r["score"] <= bounds[rng] + 1e-9
