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
