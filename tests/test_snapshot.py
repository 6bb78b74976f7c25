"""Snapshot-manifest isolation: a reader pinned to snapshot N must see
identical results while a maintenance publish creates N+1 (round-2 verdict
#6); LATEST readers see the delete; expire reclaims old versions."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def snap_dir(spark, corpus_pdf, tmp_path_factory):
    from spidey_search_engine_spark.operators.build import build_index
    from spidey_search_engine_spark.plans.snapshot import init_snapshots
    out = str(tmp_path_factory.mktemp("snapidx"))
    corpus = spark.createDataFrame(corpus_pdf).repartition(4)
    build_index(spark, corpus, out, profile="code", seg_bits=6, n_buckets=4)
    m = init_snapshots(out)
    assert m["version"] == 1
    return out


def test_snapshot_pinned_reader_unchanged_across_publish(spark, snap_dir):
    from spidey_search_engine_spark.operators.search import bm25_topk
    from spidey_search_engine_spark.plans.snapshot import (load_snapshot,
                                                          publish_delete)
    q = "merge sort"
    s1 = load_snapshot(spark, snap_dir)
    before = [(r["doc_id"], round(r["score"], 10)) for r in
              bm25_topk(spark, s1, q, k=10).collect()]
    assert before
    victim = before[0][0]

    m2 = publish_delete(spark, snap_dir, [victim])
    assert m2["version"] == 2 and m2["parent"] == 1

    # the pinned snapshot-1 reader replans the SAME query mid-maintenance:
    # identical results — v1 data dirs were never touched
    again = [(r["doc_id"], round(r["score"], 10)) for r in
             bm25_topk(spark, s1, q, k=10).collect()]
    assert again == before

    # a LATEST reader sees the delete, with stats/df republished
    s2 = load_snapshot(spark, snap_dir)
    assert s2["snapshot_version"] == 2
    after = [r["doc_id"] for r in bm25_topk(spark, s2, q, k=10).collect()]
    assert victim not in after
    assert int(s2["stats"]["n_docs"]) == int(s1["stats"]["n_docs"]) - 1
    assert s2["docs"].filter(F.col("doc_id") == victim).count() == 0

    # pinning version=1 explicitly still reproduces the original results
    s1b = load_snapshot(spark, snap_dir, version=1)
    pinned = [(r["doc_id"], round(r["score"], 10)) for r in
              bm25_topk(spark, s1b, q, k=10).collect()]
    assert pinned == before


def test_expire_snapshots_reclaims_old_versions(spark, snap_dir):
    from spidey_search_engine_spark.operators.search import bm25_topk
    from spidey_search_engine_spark.plans.snapshot import (expire_snapshots,
                                                          latest_version,
                                                          load_snapshot,
                                                          publish_delete)
    # ensure ≥2 versions exist (module fixture order independence)
    if latest_version(snap_dir) == 1:
        publish_delete(spark, snap_dir, [0])
    expired = expire_snapshots(snap_dir, keep_last=1)
    assert expired  # v1 went away
    assert not os.path.exists(os.path.join(snap_dir, "snapshots", "v1.json"))
    assert not os.path.exists(os.path.join(snap_dir, "postings"))
    latest = load_snapshot(spark, snap_dir)
    got = bm25_topk(spark, latest, "merge sort", k=5).collect()
    assert len(got) > 0
