"""S7 link extraction + G1 link graph over the synthetic code corpus."""

from __future__ import annotations

import numpy as np


def _corpus_with_ids(spark, n):
    from spidey_search_engine_spark.sources.corpus import generate_corpus_pdf
    pdf = generate_corpus_pdf(n, seed=42).reset_index(drop=True)
    pdf.insert(0, "doc_id", np.arange(n, dtype=np.int64))
    return spark.createDataFrame(pdf).repartition(4), pdf


def test_extract_code_links_matches_generator_rule(spark):
    from spidey_search_engine_spark.operators.links import extract_code_links
    from spidey_search_engine_spark.sources.corpus import link_targets

    n = 121  # chosen so the generator rule yields ≥1 self-reference
    docs, _ = _corpus_with_ids(spark, n)
    got = {(r["src_doc_id"], r["dst_doc_id"])
           for r in extract_code_links(docs).collect()}
    expected = {(i, t) for i in range(n) for t in link_targets(i, n) if t != i}
    assert got == expected
    # the generator does emit self-references for some docs — prove the
    # extractor dropped at least one (Indexer.java:357 semantics)
    self_refs = [(i, t) for i in range(n)
                 for t in link_targets(i, n) if t == i]
    assert self_refs, "fixture should contain self-references"


def test_pagerank_over_links(spark):
    from spidey_search_engine_spark.operators.links import (
        extract_code_links, pagerank_over_links)
    from spidey_search_engine_spark.sources.corpus import link_targets

    n = 80
    docs, _ = _corpus_with_ids(spark, n)
    ranks = {r["doc_id"]: r["page_rank"] for r in
             pagerank_over_links(spark, docs, n, mode="textbook",
                                 tol=1e-9, max_iter=30).collect()}
    assert len(ranks) == n

    # numpy oracle over the same deterministic edge set
    edges = [(i, t) for i in range(n) for t in link_targets(i, n) if t != i]
    edges = sorted(set(edges))
    out = np.zeros(n)
    for s, _t in edges:
        out[s] += 1
    r = np.full(n, 1.0 / n)
    d = 0.85
    for _ in range(30):
        nxt = np.full(n, (1 - d) / n)
        for s, t in edges:
            nxt[t] += d * r[s] / out[s]
        r = nxt
    for i in range(n):
        assert abs(ranks[i] - r[i]) < 1e-6, (i, ranks[i], r[i])
