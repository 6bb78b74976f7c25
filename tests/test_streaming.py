"""Streaming incremental append == batch build over the same docs."""

import os

from pyspark.sql import functions as F


def test_stream_append_equals_batch(spark, corpus_pdf, tmp_path):
    from spidey_search_engine_spark.operators.build import (build_index,
                                                            load_index,
                                                            prepare_docs)
    from spidey_search_engine_spark.plans.lineage import load_index_resumable
    from spidey_search_engine_spark.streaming.incremental import (
        append_index_stream, publish_index)
    from spidey_search_engine_spark.operators.search import bm25_topk

    sub = corpus_pdf.head(150)
    corpus = spark.createDataFrame(sub).repartition(4)
    docs = prepare_docs(corpus).select(
        "doc_id", "repo", "path", "commit", "lang", "content")

    # stage the docs as two parquet "arrival" files for the file stream
    # split aligned to the 64-doc segment boundary (seg_bits=6) so each
    # (term, segment) lives in exactly one chunk and bytes compare 1:1
    src = str(tmp_path / "arrivals")
    docs.filter("doc_id < 64").coalesce(1).write.mode("append").parquet(src)
    docs.filter("doc_id >= 64").coalesce(1).write.mode("append").parquet(src)

    # batch reference build (same seg/bucket params)
    batch_dir = str(tmp_path / "batch")
    build_index(spark, docs, batch_dir, profile="code", seg_bits=6,
                n_buckets=8)
    batch = load_index(spark, batch_dir)
    avgdl = float(batch["stats"]["avgdl"])

    out_dir = str(tmp_path / "streamed")
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = append_index_stream(spark, stream, out_dir,
                            profile="code", seg_bits=6, n_buckets=8,
                            checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    publish_index(spark, out_dir, profile="code", seg_bits=6, n_buckets=8)
    streamed = load_index_resumable(spark, out_dir)

    # identical dictionary + identical compressed postings per (term,segment)
    bt = {r["term"]: (r["df"], r["cf"]) for r in batch["terms"].collect()}
    st = {r["term"]: (r["df"], r["cf"]) for r in streamed["terms"].collect()}
    assert bt == st
    bp = {(r["term"], r["segment"]): bytes(r["bin"])
          for r in batch["postings"].collect()}
    sp = {(r["term"], r["segment"]): bytes(r["bin"])
          for r in streamed["postings"].collect()}
    assert bp == sp
    assert streamed["lineage"].count() >= 1

    got_b = [(r["doc_id"], r["score"]) for r in
             bm25_topk(spark, batch, "merge sort", k=5).collect()]
    got_s = [(r["doc_id"], r["score"]) for r in
             bm25_topk(spark, streamed, "merge sort", k=5).collect()]
    assert got_b == got_s


def test_stream_auto_publish_cadence(spark, corpus_pdf, tmp_path):
    """publish_every=1: terms/stats are fresh after the stream drains with
    NO explicit publish_index call (G6 parity — the reference republishes
    per 500-page batch, Indexer.java:746-748)."""
    from spidey_search_engine_spark.operators.build import prepare_docs
    from spidey_search_engine_spark.plans.lineage import load_index_resumable
    from spidey_search_engine_spark.streaming.incremental import \
        append_index_stream

    sub = corpus_pdf.head(128)
    docs = prepare_docs(spark.createDataFrame(sub).repartition(4)).select(
        "doc_id", "repo", "path", "commit", "lang", "content")
    src = str(tmp_path / "arrivals2")
    docs.filter("doc_id < 64").coalesce(1).write.mode("append").parquet(src)
    docs.filter("doc_id >= 64").coalesce(1).write.mode("append").parquet(src)

    out_dir = str(tmp_path / "streamed2")
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = append_index_stream(spark, stream, out_dir, profile="code",
                            seg_bits=6, n_buckets=8,
                            checkpoint=str(tmp_path / "ckpt2"),
                            publish_every=1)
    q.awaitTermination(120)
    # NO publish_index here — the cadence inside foreachBatch did it
    streamed = load_index_resumable(spark, out_dir)
    assert int(streamed["stats"]["n_docs"]) == 128
    # df over BOTH chunks is published (a term present in each half)
    df_map = {r["term"]: r["df"] for r in streamed["terms"].collect()}
    assert df_map.get("import", 0) > 64  # hot keyword spans both halves


def test_windowed_counts_drop_late_events(spark, tmp_path):
    """Watermarked windowed agg: finalized windows emit once in append
    mode; an event arriving behind the watermark is dropped."""
    from spidey_search_engine_spark.streaming.windows import \
        windowed_user_counts

    src = str(tmp_path / "ev_src")
    schema = "user_id long, ts timestamp, value double"

    def write_batch(rows):
        spark.createDataFrame(rows, "user_id long, sec long, value double") \
            .select("user_id", F.col("sec").cast("timestamp").alias("ts"),
                    "value").coalesce(1).write.mode("append").parquet(src)

    # batch 1: two events in window [0,600) for user 1
    write_batch([(1, 100, 1.0), (1, 200, 2.0)])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = windowed_user_counts(stream, window="10 minutes",
                               watermark="0 seconds")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("win_counts").option(
             "checkpointLocation", str(tmp_path / "ckpt_w")).start())
    try:
        q.processAllAvailable()
        # batch 2 raises the max event time; batch 3 runs with the updated
        # watermark (10000) and finalizes + emits the [0,600) window
        write_batch([(2, 10000, 5.0)])
        q.processAllAvailable()
        write_batch([(2, 20000, 1.0)])
        q.processAllAvailable()
        # batch 4: an event for the ALREADY-FINALIZED [0,600) window —
        # behind the watermark, must be dropped, not re-emitted
        write_batch([(1, 150, 99.0)])
        q.processAllAvailable()
        write_batch([(2, 30000, 1.0)])
        q.processAllAvailable()
    finally:
        q.stop()
    all_rows = spark.sql("select * from win_counts").collect()
    rows = {(r["user_id"], int(r["window_start"].timestamp())):
            (r["n_events"], r["sum_value"]) for r in all_rows}
    # exactly one emission for user 1's [0,600) window, late event excluded
    assert rows[(1, 0)] == (2, 3.0)
    assert sum(1 for r in all_rows
               if r["user_id"] == 1
               and int(r["window_start"].timestamp()) == 0) == 1


def test_sessionize_stream_gap_and_timeout(spark, tmp_path):
    """applyInPandasWithState sessionization: in-batch gap close + event-
    time-timeout close both emit; bounds/counts match a batch oracle."""
    from spidey_search_engine_spark.streaming.windows import sessionize_stream

    src = str(tmp_path / "sess_src")

    def write_batch(rows):
        spark.createDataFrame(rows, "user_id long, sec long") \
            .select("user_id", F.col("sec").cast("timestamp").alias("ts")) \
            .coalesce(1).write.mode("append").parquet(src)

    write_batch([(1, 100), (1, 200), (1, 5000), (2, 150), (3, 1000)])
    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(src))
    # 2h watermark delay: cross-batch late events within 7200s are ACCEPTED
    out = sessionize_stream(stream, gap_seconds=1000, watermark="2 hours")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("sessions").option(
             "checkpointLocation", str(tmp_path / "ckpt_s")).start())
    try:
        q.processAllAvailable()
        # a late event PRECEDING user 3's open session start must merge
        # into it (session_start extends back) — arrives in a later batch
        write_batch([(3, 500), (99, 100000)])
        q.processAllAvailable()
        # push the watermark past every last+gap → open sessions time out
        write_batch([(99, 200000)])
        q.processAllAvailable()
        write_batch([(99, 300000)])
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["user_id"], r["session_start"], r["session_end"], r["n_events"])
           for r in spark.sql("select * from sessions").collect()}
    assert (1, 100, 200, 2) in got      # closed in-batch by the 5000 event
    assert (1, 5000, 5000, 1) in got    # closed by event-time timeout
    assert (2, 150, 150, 1) in got      # closed by event-time timeout
    assert (3, 500, 1000, 2) in got     # late event extended start backward
    assert (3, 1000, 1000, 1) not in got


def test_ann_stream_append_matches_batch_index(spark, tmp_path):
    """Streaming LSH ingest (streaming/ann.append_ann_stream) over two
    micro-batches must produce the same signature table as the one-shot
    write_lsh_index batch build — same buckets, same vectors — and
    ann_topk_lsh over the streamed index returns identical top-k."""
    import numpy as np

    from spidey_search_engine_spark.operators.similarity import (
        ann_topk_lsh, load_lsh_index, write_lsh_index)
    from spidey_search_engine_spark.streaming.ann import append_ann_stream

    rng = np.random.Generator(np.random.PCG64(13))
    vecs = rng.standard_normal((80, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(80)]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<float>")

    src = str(tmp_path / "emb_arrivals")
    df.filter("vec_id < 40").coalesce(1).write.mode("append").parquet(src)
    df.filter("vec_id >= 40").coalesce(1).write.mode("append").parquet(src)

    batch_dir = str(tmp_path / "lsh_batch")
    write_lsh_index(df, batch_dir, dim=16, n_bits=6, seed=5)

    out_dir = str(tmp_path / "lsh_streamed")
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = append_ann_stream(spark, stream, out_dir, dim=16, n_bits=6, seed=5,
                          checkpoint=str(tmp_path / "ann_ckpt"))
    q.awaitTermination(120)

    b = {r["id"]: r["bucket"]
         for r in load_lsh_index(spark, batch_dir).collect()}
    s = {r["id"]: r["bucket"]
         for r in load_lsh_index(spark, out_dir).collect()}
    assert s == b and len(s) == 80

    # at-least-once idempotence: replaying the WHOLE stream (fresh
    # checkpoint) rewrites the same batch=<id> dirs — no duplicate rows
    q2 = append_ann_stream(spark, stream, out_dir, dim=16, n_bits=6,
                           seed=5, checkpoint=str(tmp_path / "ann_ckpt2"))
    q2.awaitTermination(120)
    replayed = load_lsh_index(spark, out_dir)
    assert replayed.count() == 80
    assert {r["id"]: r["bucket"] for r in replayed.collect()} == b

    qv = [float(x) for x in vecs[5]]
    got_b = [(r["id"], round(r["cos"], 10)) for r in
             ann_topk_lsh(None, qv, dim=16, k=5, n_bits=6, probe_hamming=1,
                          signatures=load_lsh_index(spark, batch_dir))
             .collect()]
    got_s = [(r["id"], round(r["cos"], 10)) for r in
             ann_topk_lsh(None, qv, dim=16, k=5, n_bits=6, probe_hamming=1,
                          signatures=load_lsh_index(spark, out_dir))
             .collect()]
    assert got_s == got_b and got_s[0][0] == 5


def test_stream_dedup_drops_later_copies(spark, tmp_path):
    """Streaming exact dedup: the first copy of a content hash passes,
    later copies drop — in both the unbounded and the watermark-bounded
    (dropDuplicatesWithinWatermark) variants."""
    from spidey_search_engine_spark.streaming.dedup import dedup_stream

    schema = "doc_id long, ts timestamp, content string"

    def write_batch(src, rows):
        spark.createDataFrame(rows, "doc_id long, sec long, content string") \
            .select("doc_id", F.col("sec").cast("timestamp").alias("ts"),
                    "content").coalesce(1).write.mode("append").parquet(src)

    for name, wm in (("sd_unbounded", None), ("sd_watermark", "1 hour")):
        src = str(tmp_path / f"src_{name}")
        write_batch(src, [(0, 100, "alpha text"), (1, 200, "beta text")])
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = dedup_stream(stream, watermark=wm)
        q = (out.writeStream.outputMode("append").format("memory")
             .queryName(name).option(
                 "checkpointLocation", str(tmp_path / f"ckpt_{name}"))
             .start())
        try:
            q.processAllAvailable()
            # batch 2: one exact copy of doc 0 (within the watermark
            # horizon) and one fresh doc
            write_batch(src, [(2, 300, "alpha text"), (3, 400, "gamma")])
            q.processAllAvailable()
        finally:
            q.stop()
        ids = sorted(r["doc_id"]
                     for r in spark.sql(f"select * from {name}").collect())
        assert ids == [0, 1, 3], name


def test_near_dedup_ingest_stream(spark, tmp_path):
    """Near-dup dedup at ingest: per-batch LSH probe against everything
    kept so far (partition-pruned MinHash band index), within-batch
    keep-first, survivors appended. A fresh re-run over the same source
    (a full at-least-once replay) reproduces the identical kept set."""
    from spidey_search_engine_spark.streaming.dedup import (
        near_dedup_ingest_stream)

    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep dark forest to find food for winter")
    other = ("completely different text about spark dataframes shuffles "
             "partitions joins aggregations and columnar parquet readers")
    third = ("a third unrelated document mentioning streaming watermarks "
             "state stores checkpoints and exactly once commit semantics")
    src = str(tmp_path / "src")

    def write_batch(rows):
        spark.createDataFrame(rows, "doc_id long, content string") \
            .coalesce(1).write.mode("append").parquet(src)

    # b0: 1 is an exact copy of 0 (within-batch drop)
    write_batch([(0, base), (1, base), (2, other)])
    # b1: 10 is a near copy of 0 (cross-batch drop), 11 is fresh
    write_batch([(10, base + " with a small suffix"), (11, third)])
    # b2: 20 near-copies 11, 21 copies 2, 22 is fresh
    write_batch([(20, third + " trailing words"), (21, other),
                 (22, "entirely novel final document with unique tokens "
                      "nothing shares any shingle with this text at all")])

    params = dict(num_hashes=16, bands=8, threshold=0.2, n_buckets=16)

    def run(store, ckpt=None, verify="exact"):
        stream = (spark.readStream.schema("doc_id long, content string")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = near_dedup_ingest_stream(stream, store, checkpoint=ckpt,
                                     verify=verify, **params)
        q.awaitTermination()
        return sorted(r["doc_id"] for r in
                      spark.read.parquet(store + "/docs").collect())

    store = str(tmp_path / "store")
    kept = run(store, str(tmp_path / "ckpt"))
    assert kept == [0, 2, 11, 22]
    # signature-agreement verify never reads base text; same keeps here
    assert run(str(tmp_path / "store_mh"), verify="minhash") == kept
    # index landed bucket-partitioned per batch
    import os
    bdirs = os.listdir(store + "/minhash")
    assert any(d.startswith("batch=") for d in bdirs)
    assert any(d.startswith("bucket=") for d in os.listdir(
        store + "/minhash/" + sorted(bdirs)[0]))
    # full replay (no checkpoint): every batch reprocesses and overwrites
    # its own dirs — identical keep decisions, no duplicates
    assert run(store) == kept


def test_jsonl_ingest_stream(spark, tmp_path):
    """Streaming JSONL ingest: per-batch exactly-once split into clean
    docs and a quarantine with batch provenance; restart from checkpoint
    does not duplicate."""
    import json
    import os
    from spidey_search_engine_spark.sources.ingest import jsonl_ingest_stream
    src = tmp_path / "drops"
    src.mkdir()
    (src / "a.jsonl").write_text("\n".join([
        json.dumps({"doc_id": 1, "text": "alpha"}),
        '{"doc_id": 2, "text": "broken',
        json.dumps({"doc_id": 3, "text": None})]) + "\n")
    (src / "b.jsonl").write_text(
        json.dumps({"doc_id": 4, "text": "beta"}) + "\n")
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")

    def run():
        q = jsonl_ingest_stream(spark, str(src), store,
                                "doc_id long, text string",
                                checkpoint=ckpt, max_files_per_trigger=1)
        q.awaitTermination()

    run()
    docs = spark.read.parquet(store + "/docs")
    assert sorted((r["doc_id"], r["text"]) for r in docs.collect()) \
        == [(1, "alpha"), (4, "beta")]
    quar = spark.read.parquet(store + "/quarantine").collect()
    assert sorted(r["doc_id"] for r in quar if r["doc_id"] is not None) \
        == [3]
    assert any(r["_corrupt_record"] and "broken" in r["_corrupt_record"]
               for r in quar)
    assert {r["_batch_id"] for r in quar} <= {0, 1}
    run()                                      # replay: checkpoint makes it a no-op
    assert spark.read.parquet(store + "/docs").count() == 2


def test_decontam_ingest_stream(spark, tmp_path):
    """Streaming decontamination: contaminated docs drop as micro-batches
    arrive, flag_only reports DISTINCT shared-gram counts, NULL content
    passes, and the counts equal the batch operator's on the same data."""
    from spidey_search_engine_spark.operators.decontaminate import (
        contamination_hits)
    from spidey_search_engine_spark.streaming.dedup import (
        decontam_ingest_stream)

    bench = spark.createDataFrame(
        [(0, "the secret answer is forty two")],
        "bench_id long, text string")
    rows1 = [(0, "everyone knows the secret answer is forty two now"),
             (1, "a perfectly clean document about sorting")]
    rows2 = [(2, "again: The SECRET answer IS forty-two, repeated; "
                 "the secret answer is forty two"),
             (3, None),
             (4, "another clean one")]
    schema = "doc_id long, content string"
    src = str(tmp_path / "dc_src")
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = decontam_ingest_stream(stream, bench, n=4, flag_only=True)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("dc_flags").option(
             "checkpointLocation", str(tmp_path / "dc_ckpt"))
         .start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    flags = {r["doc_id"]: r["n_hit"] for r in
             spark.sql("select * from dc_flags").collect()}
    assert set(flags) == {0, 1, 2, 3, 4}
    assert flags[1] == 0 and flags[3] == 0 and flags[4] == 0
    assert flags[0] > 0 and flags[2] > 0
    # distinct-gram counts == the batch operator on the union
    batch = {r["doc_id"]: r["n_hit"] for r in contamination_hits(
        spark.createDataFrame(rows1 + rows2, schema), bench,
        n=4).collect()}
    assert {k: v for k, v in flags.items() if v > 0} == batch

    # drop mode: contaminated docs vanish from the stream
    stream2 = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
    out2 = decontam_ingest_stream(stream2, bench, n=4)
    q2 = (out2.writeStream.outputMode("append").format("memory")
          .queryName("dc_clean").option(
              "checkpointLocation", str(tmp_path / "dc_ckpt2"))
          .start())
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    kept = sorted(r["doc_id"] for r in
                  spark.sql("select * from dc_clean").collect())
    assert kept == [1, 3, 4]
    assert spark.sql("select * from dc_clean").columns == \
        ["doc_id", "content"]


def test_stream_auto_compaction_bounds_files(spark, corpus_pdf, tmp_path):
    """compact_files_threshold: after the stream drains, the chunked
    postings tree is consolidated in place (one compact_* chunk dir,
    bounded file count), terms/df are unchanged, BM25 requery is
    rank-identical to an uncompacted control build, and a LATER append
    lands beside the compacted chunk and queries correctly."""
    import os as _os

    from spidey_search_engine_spark.operators.build import prepare_docs
    from spidey_search_engine_spark.operators.search import bm25_topk
    from spidey_search_engine_spark.plans.lineage import load_index_resumable
    from spidey_search_engine_spark.plans.snapshot import parquet_file_count
    from spidey_search_engine_spark.streaming.incremental import (
        append_index_stream, publish_index)

    sub = corpus_pdf.head(192)
    docs = prepare_docs(spark.createDataFrame(sub).repartition(4)).select(
        "doc_id", "repo", "path", "commit", "lang", "content")
    src = str(tmp_path / "arrivals3")
    for lo, hi in ((0, 64), (64, 128)):
        docs.filter(f"doc_id >= {lo} and doc_id < {hi}") \
            .coalesce(1).write.mode("append").parquet(src)

    # control: same chunks, never compacted
    ctl_dir = str(tmp_path / "control")
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    append_index_stream(spark, stream, ctl_dir, profile="code",
                        seg_bits=6, n_buckets=8,
                        checkpoint=str(tmp_path / "ckpt_ctl"),
                        publish_every=1).awaitTermination(120)

    out_dir = str(tmp_path / "autocompact")
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    append_index_stream(spark, stream, out_dir, profile="code",
                        seg_bits=6, n_buckets=8,
                        checkpoint=str(tmp_path / "ckpt_ac"),
                        publish_every=1,
                        compact_files_threshold=1).awaitTermination(120)

    pdir = _os.path.join(out_dir, "postings")
    chunks = sorted(d for d in _os.listdir(pdir) if d.startswith("chunk="))
    assert chunks == ["chunk=compact_0"]
    # bounded: <=2 files per bucket (range partitions can straddle one
    # bucket boundary each) and strictly below the per-(chunk, bucket)
    # growth of the uncompacted control
    assert parquet_file_count(pdir) <= 2 * 8
    assert parquet_file_count(pdir) < parquet_file_count(
        _os.path.join(ctl_dir, "postings"))

    compacted = load_index_resumable(spark, out_dir)
    control = load_index_resumable(spark, ctl_dir)
    ct = {r["term"]: (r["df"], r["cf"]) for r in control["terms"].collect()}
    at = {r["term"]: (r["df"], r["cf"]) for r in
          compacted["terms"].collect()}
    assert ct == at
    want = [(r["doc_id"], r["score"]) for r in
            bm25_topk(spark, control, "merge sort", k=5).collect()]
    got = [(r["doc_id"], r["score"]) for r in
           bm25_topk(spark, compacted, "merge sort", k=5).collect()]
    assert got == want and got

    # appends continue after compaction: a third chunk lands beside the
    # compacted one and the published index covers all 192 docs
    docs.filter("doc_id >= 128").coalesce(1).write.mode("append") \
        .parquet(src)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    append_index_stream(spark, stream, out_dir, profile="code",
                        seg_bits=6, n_buckets=8,
                        checkpoint=str(tmp_path / "ckpt_ac"),
                        publish_every=1).awaitTermination(120)
    final = load_index_resumable(spark, out_dir)
    assert int(final["stats"]["n_docs"]) == 192
    chunks = sorted(d for d in _os.listdir(pdir) if d.startswith("chunk="))
    assert len(chunks) == 2 and "chunk=compact_0" in chunks
    # full-corpus df published over compacted + fresh chunks
    df_map = {r["term"]: r["df"] for r in final["terms"].collect()}
    assert df_map.get("import", 0) > 128


def test_compaction_crash_recovery_and_checkpoint_collision(
        spark, corpus_pdf, tmp_path):
    """(a) A crash between the compaction journal commit and the swap is
    finished by the next publish: no postings lost, no duplicates, the
    journal is consumed. (b) Re-streaming into the same out_dir under a
    FRESH checkpoint fails fast instead of silently skipping or
    overwriting (batch ids restart at 0 and collide with lineage)."""
    import json as _json
    import os as _os
    import shutil as _shutil

    import pytest as _pytest

    from spidey_search_engine_spark.operators.build import prepare_docs
    from spidey_search_engine_spark.operators.search import bm25_topk
    from spidey_search_engine_spark.plans.lineage import load_index_resumable
    from spidey_search_engine_spark.streaming.incremental import (
        _journal_path, append_index_stream, publish_index)
    from pyspark.sql import functions as F

    sub = corpus_pdf.head(128)
    docs = prepare_docs(spark.createDataFrame(sub).repartition(4)).select(
        "doc_id", "repo", "path", "commit", "lang", "content")
    src = str(tmp_path / "arrivals4")
    docs.filter("doc_id < 64").coalesce(1).write.mode("append").parquet(src)
    docs.filter("doc_id >= 64").coalesce(1).write.mode("append").parquet(src)

    out_dir = str(tmp_path / "crashy")
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    append_index_stream(spark, stream, out_dir, profile="code",
                        seg_bits=6, n_buckets=8,
                        checkpoint=str(tmp_path / "ckpt_cr"),
                        publish_every=1).awaitTermination(120)
    want = [(r["doc_id"], r["score"]) for r in bm25_topk(
        spark, load_index_resumable(spark, out_dir),
        "merge sort", k=5).collect()]

    # hand-build the crash state: compacted tmp written, journal
    # committed, ONE consumed dir already removed, swap never ran
    pdir = _os.path.join(out_dir, "postings")
    consumed = sorted(d for d in _os.listdir(pdir)
                      if d.startswith("chunk="))
    assert len(consumed) == 2
    raw = spark.read.option("basePath", pdir).parquet(
        *[_os.path.join(pdir, d) for d in consumed]).drop("chunk")
    tmp = _os.path.join(out_dir, "_compacting")
    (raw.repartitionByRange(8, "bucket", "term", "segment")
     .sortWithinPartitions("bucket", "term", "segment")
     .write.mode("overwrite").partitionBy("bucket").parquet(tmp))
    with open(_journal_path(out_dir) + ".tmp", "w") as fh:
        _json.dump({"new_chunk": "compact_0", "consumed": consumed}, fh)
    _os.replace(_journal_path(out_dir) + ".tmp", _journal_path(out_dir))
    _shutil.rmtree(_os.path.join(pdir, consumed[0]))  # crash mid-step-3

    # the next publish recovers: swap finished, journal gone, data intact
    publish_index(spark, out_dir, profile="code", seg_bits=6, n_buckets=8,
                  compact_files_threshold=1000)
    assert not _os.path.exists(_journal_path(out_dir))
    chunks = sorted(d for d in _os.listdir(pdir) if d.startswith("chunk="))
    assert chunks == ["chunk=compact_0"]
    got = [(r["doc_id"], r["score"]) for r in bm25_topk(
        spark, load_index_resumable(spark, out_dir),
        "merge sort", k=5).collect()]
    assert got == want and got

    # (b) fresh checkpoint over the same out_dir: batch 0 carries a
    # DIFFERENT doc range -> fail fast, nothing silently skipped
    more = docs.select((F.col("doc_id") + 128).alias("doc_id"), "repo",
                       "path", "commit", "lang", "content") \
        .filter("doc_id < 192")
    src2 = str(tmp_path / "arrivals5")
    more.coalesce(1).write.mode("append").parquet(src2)
    stream2 = (spark.readStream.schema(docs.schema)
               .option("maxFilesPerTrigger", 1).parquet(src2))
    q2 = append_index_stream(spark, stream2, out_dir, profile="code",
                             seg_bits=6, n_buckets=8,
                             checkpoint=str(tmp_path / "ckpt_fresh"))
    with _pytest.raises(Exception, match="different doc range"):
        q2.awaitTermination(120)
        q2.processAllAvailable()
