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


def _parquet_files(root):
    return [os.path.join(d, f) for d, _, fs in os.walk(root)
            for f in fs if f.endswith(".parquet")]


def test_compact_postings_relayouts_chunked_index(spark, corpus_pdf,
                                                  tmp_path_factory):
    """Compaction over a many-chunk resumable build: results identical at
    the new snapshot, file count strictly reduced, chunk dirs gone from the
    compacted tree, parent snapshot still readable (pinned readers)."""
    from spidey_search_engine_spark.operators.search import bm25_topk
    from spidey_search_engine_spark.plans.lineage import build_index_resumable
    from spidey_search_engine_spark.plans.snapshot import (compact_postings,
                                                           init_snapshots,
                                                           load_snapshot)
    out = str(tmp_path_factory.mktemp("compactidx"))
    corpus = spark.createDataFrame(corpus_pdf).repartition(4)
    # seg_bits=4, chunk_segments=2 → 32-doc chunks → many chunk dirs
    build_index_resumable(spark, corpus, out, profile="code", seg_bits=4,
                          chunk_segments=2, n_buckets=4)
    m1 = init_snapshots(out)
    n_chunks = len([d for d in os.listdir(os.path.join(out, "postings"))
                    if d.startswith("chunk=")])
    assert n_chunks >= 3
    files_before = _parquet_files(os.path.join(out, "postings"))

    s1 = load_snapshot(spark, out)
    q = "merge sort data"
    before = [(r["doc_id"], round(r["score"], 10)) for r in
              bm25_topk(spark, s1, q, k=10).collect()]
    assert before

    m2 = compact_postings(spark, out, files_per_bucket=1)
    assert m2["version"] == m1["version"] + 1
    assert m2["compacted_from"] == m1["version"]
    assert m2["terms"] == m1["terms"] and m2["docs"] == m1["docs"]

    files_after = _parquet_files(os.path.join(out, m2["postings"]))
    assert len(files_after) < len(files_before)
    assert not any("chunk=" in f for f in files_after)

    s2 = load_snapshot(spark, out)
    assert s2["snapshot_version"] == m2["version"]
    after = [(r["doc_id"], round(r["score"], 10)) for r in
             bm25_topk(spark, s2, q, k=10).collect()]
    assert after == before

    # total row identity, not just the top-k window
    tot_before = s1["postings_raw"].count()
    tot_after = s2["postings_raw"].count()
    assert tot_after == tot_before

    # parent snapshot stays pinned and identical mid-compaction-era
    s1b = load_snapshot(spark, out, version=m1["version"])
    pinned = [(r["doc_id"], round(r["score"], 10)) for r in
              bm25_topk(spark, s1b, q, k=10).collect()]
    assert pinned == before

    # chunked builds strip DOCLEN/DOCSHA sentinels, so a stats-republishing
    # delete on this tree must refuse loudly rather than publish
    # n_docs=0/avgdl=0 stats
    from spidey_search_engine_spark.plans.snapshot import publish_delete
    with pytest.raises(ValueError, match="sentinel"):
        publish_delete(spark, out, [before[0][0]])
    # and the failed publish left no new snapshot behind
    assert load_snapshot(spark, out)["snapshot_version"] == m2["version"]


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
