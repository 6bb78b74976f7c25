"""Inverted-index build (SURVEY.md §2.3 A1–A7, §3.2).

Pipeline (all DataFrame ops + Arrow-batched pandas functions, no per-row
Python UDFs):

1. ``assign_doc_ids`` — dense contiguous doc_ids (the reference assumes
   contiguity, PageRanker.java:10) via range-partitioned sort +
   ``zipWithIndex`` (one linear pass, no single-task bottleneck).
2. doc stats — N, avgdl (needed for block-max BM25 bounds at encode time).
3. ``mapInPandas`` partial build — per Arrow batch: tokenize (A1 tf, A2
   positions ordinals in the filtered stream, A3 important flag = stemmed
   token ∈ stemmed path/title token set, Indexer.java:385-415) and emit one
   compressed partial posting row per (term, segment).
4. hierarchical merge (A7) — one shuffle keyed (bucket, salted term) +
   local sort, then a streaming ``mapInPandas`` merging consecutive equal
   (term, segment) keys and re-encoding with block-max metadata (see
   merge_partials for why not groupBy.applyInPandas).

**Skew strategy (SURVEY.md §4 custom #1):** postings are segmented by
doc-id range (``segment = doc_id >> seg_bits``). A hot term (``import``,
``return`` — stopwords are intentionally kept in the index, Indexer.java:442)
therefore materializes as MANY (term, segment) rows instead of one giant
reducer value: the merge key space is salted *structurally* and
deterministically by doc range, each reduce group is bounded by the number
of Arrow batches overlapping one segment, and no executor ever holds a full
hot-term posting list. Query-side the segments of a term are independent
score partitions, so no re-merge is needed. df/cf statistics reduce via
plain associative sums, which Spark partial-aggregates map-side.

Posting segment binary layout (LEB128 varints, see functions/compress.py):

    n_docs, doc_gaps[n], tf_packed[n] (tf<<1 | important), dl[n],
    pos_gaps[sum(tf)]   # per-doc blocks of tf[i] entries, gap-coded

Storing dl inside the posting costs ~1 byte/posting and removes the
query-time join against a 10^12-row doc-length table — the scale-decisive
trade.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, IntegerType,
                               LongType, StringType, StructField, StructType)

from ..functions.analysis import PROFILES, tokenize_title
from ..functions.compress import (decode_varints, delta_decode, delta_encode,
                                  encode_varints)

K1 = 1.2
B = 0.75
BLOCK_SIZE = 128  # docs per block-max block inside a segment

PARTIAL_SCHEMA = StructType([
    StructField("term", StringType()),
    StructField("segment", LongType()),
    StructField("n_docs", IntegerType()),
    StructField("cf", LongType()),
    StructField("bin", BinaryType()),
])

POSTING_SCHEMA = StructType([
    StructField("term", StringType()),
    StructField("segment", LongType()),
    StructField("n_docs", IntegerType()),
    StructField("cf", LongType()),
    StructField("bin", BinaryType()),
    StructField("block_first_doc", ArrayType(LongType())),
    StructField("block_last_doc", ArrayType(LongType())),
    StructField("block_max_impact", ArrayType(DoubleType())),
])


def assign_doc_ids(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Dense deterministic doc_id ordered by (repo, path), fully JVM-side.

    zipWithIndex-style two-pass without the RDD→Python round-trip (pickling
    every content row through Python is the classic scale killer):
    range-partition + local sort gives the total order; pass 1 collects only
    per-partition row counts (32 longs); pass 2 adds the broadcast partition
    offset to a within-partition row_number. No global single-task sort."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = (df.repartitionByRange(n, "repo", "path")
               .sortWithinPartitions("repo", "path")
               .withColumn("_pid", F.spark_partition_id()))
    ordered = ordered.localCheckpoint()  # pin partitioning across both passes
    counts = {r["_pid"]: r["cnt"] for r in
              ordered.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = df.sparkSession
    odf = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long")
    # monotonically_increasing_id = (partition << 33) | local row seq; rows
    # are already locally sorted (pre-checkpoint), so subtracting the
    # partition base yields the in-partition ordinal — a NARROW op, no
    # second shuffle over the content bytes.
    out = (ordered.withColumn("_mid", F.monotonically_increasing_id())
           .join(F.broadcast(odf), "_pid")
           .withColumn("doc_id",
                       F.col("_off") + F.col("_mid")
                       - F.shiftleft(F.col("_pid").cast("long"), 33))
           .drop("_pid", "_off", "_mid"))
    return out.select("doc_id", *df.columns)


def prepare_docs(corpus: DataFrame) -> DataFrame:
    """Doc-store projection: sha256 invariant + doc_id if missing."""
    df = corpus
    if "doc_id" not in df.columns:
        df = assign_doc_ids(df)
    return df.withColumn("content_sha256", F.sha2(F.col("content"), 256))


def doc_stats(docs_tok: DataFrame) -> dict:
    row = docs_tok.agg(
        F.count("*").alias("n_docs"),
        F.avg("n_tokens").alias("avgdl"),
        F.sum("n_tokens").alias("total_tokens"),
    ).collect()[0]
    return {"n_docs": int(row["n_docs"]),
            "avgdl": float(row["avgdl"] or 0.0),
            "total_tokens": int(row["total_tokens"] or 0)}


def _encode_partial(doc_ids: np.ndarray, tf_packed: np.ndarray,
                    dls: np.ndarray, pos_flat: np.ndarray) -> bytes:
    return b"".join([
        encode_varints(np.array([doc_ids.size], dtype=np.uint64)),
        encode_varints(delta_encode(doc_ids)),
        encode_varints(tf_packed.astype(np.uint64)),
        encode_varints(dls.astype(np.uint64)),
        encode_varints(pos_flat.astype(np.uint64)),
    ])


def _decode_partial(buf: bytes):
    hdr, off = decode_varints(buf, 0, 1)
    n = int(hdr[0])
    gaps, off = decode_varints(buf, off, n)
    doc_ids = delta_decode(gaps)
    tf_packed, off = decode_varints(buf, off, n)
    dls, off = decode_varints(buf, off, n)
    total_pos = int((tf_packed >> np.uint64(1)).sum())
    pos_gaps, off = decode_varints(buf, off, total_pos)
    return doc_ids, tf_packed.astype(np.int64), dls.astype(np.int64), pos_gaps


def decode_segment(buf: bytes):
    """Public decoder for query side → (doc_ids, tfs, important, dls, pos_gaps)."""
    doc_ids, tf_packed, dls, pos_gaps = _decode_partial(buf)
    return (doc_ids, tf_packed >> 1, (tf_packed & 1).astype(bool), dls, pos_gaps)


def positions_of(tfs: np.ndarray, pos_gaps: np.ndarray) -> list[np.ndarray]:
    """Expand the flat gap stream into per-doc absolute position arrays."""
    out, start = [], 0
    for tf in tfs:
        out.append(delta_decode(pos_gaps[start:start + tf]))
        start += int(tf)
    return out


# sentinel pseudo-term carrying per-doc lengths inside the partials stream
# (F1 tokens can never contain "\x00": it is outside every token charset)
DOCLEN_TERM = "\x00doclen"


def build_partials(docs: DataFrame, profile: str = "code",
                   seg_bits: int = 16) -> DataFrame:
    """Partial postings via ONE mapInPandas pass (the only pass that touches
    `content`). Tokenization + tf + positions + important flag + doc length
    happen in a single Arrow batch traversal (the reference's 10-thread
    per-doc loop, Indexer.java:291, becomes one vectorized pass per
    partition). Per-doc lengths ride along as postings of the DOCLEN_TERM
    sentinel (tf=1, dl=doc length) so no second tokenization pass is needed
    for the stats table."""
    tokenizer = PROFILES[profile]

    from itertools import chain

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            acc: dict[tuple[str, int], list] = {}
            for doc_id, content, path in zip(pdf["doc_id"].to_numpy(),
                                             pdf["content"], pdf["path"]):
                toks = tokenizer(content) if isinstance(content, str) else []
                dl = len(toks)
                title_set = set(tokenize_title(path)) if isinstance(path, str) else set()
                seg = int(doc_id) >> seg_bits
                # positions stored as GAPS at append time (first absolute):
                # tiny per-list numpy delta_encode calls were the profiled
                # hot spot; a dict of [last_pos, gap, gap, ...] is ~10× less
                per_term: dict[str, list[int]] = {}
                for pos, t in enumerate(toks):
                    e = per_term.get(t)
                    if e is None:
                        per_term[t] = [pos, pos]  # [last_pos, first_gap...]
                    else:
                        e.append(pos - e[0])
                        e[0] = pos
                did = int(doc_id)
                for t, e in per_term.items():
                    gaps = e[1:]
                    acc.setdefault((t, seg), []).append(
                        (did, len(gaps), t in title_set, dl, gaps))
                acc.setdefault((DOCLEN_TERM, seg), []).append(
                    (did, 1, False, dl, [0]))
            rows = []
            for (t, seg), entries in acc.items():
                entries.sort(key=lambda e: e[0])
                doc_ids = np.array([e[0] for e in entries], dtype=np.int64)
                tfs = np.array([e[1] for e in entries], dtype=np.int64)
                imp = np.array([e[2] for e in entries], dtype=np.int64)
                dls = np.array([e[3] for e in entries], dtype=np.int64)
                total_pos = int(tfs.sum())
                pos_flat = np.fromiter(
                    chain.from_iterable(e[4] for e in entries),
                    dtype=np.uint64, count=total_pos)
                buf = _encode_partial(doc_ids, (tfs << 1) | imp, dls, pos_flat)
                rows.append((t, seg, int(doc_ids.size), total_pos, buf))
            yield pd.DataFrame(rows, columns=[f.name for f in PARTIAL_SCHEMA.fields])

    return docs.select("doc_id", "content", "path").mapInPandas(
        gen, schema=PARTIAL_SCHEMA)


def doc_lengths(partials: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) decoded from the DOCLEN_TERM sentinel partials."""
    sent = partials.filter(F.col("term") == DOCLEN_TERM)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, lens = [], []
            for buf in pdf["bin"]:
                doc_ids, _tfp, dls, _pg = _decode_partial(bytes(buf))
                ids.append(doc_ids)
                lens.append(dls)
            yield pd.DataFrame({
                "doc_id": np.concatenate(ids) if ids else np.array([], np.int64),
                "n_tokens": np.concatenate(lens) if lens else np.array([], np.int64),
            })

    return sent.select("bin").mapInPandas(decode, "doc_id long, n_tokens long")


def _merge_group(term: str, seg: int, bins: list, avgdl: float) -> tuple:
    """Merge the decoded partials of ONE (term, segment) group → output row
    tuple matching POSTING_SCHEMA (sans bucket)."""
    parts = [_decode_partial(bytes(b)) for b in bins]
    doc_ids = np.concatenate([p[0] for p in parts])
    tf_packed = np.concatenate([p[1] for p in parts])
    dls = np.concatenate([p[2] for p in parts])
    if doc_ids.size > 1 and (np.diff(doc_ids) <= 0).any():
        # partials may interleave (arbitrary input partitioning) but a doc
        # appears in exactly one partial — sort, then re-slice the per-doc
        # position blocks into the new order
        order = np.argsort(doc_ids, kind="stable")
        if np.unique(doc_ids).size != doc_ids.size:
            raise ValueError(
                f"duplicate doc_id in partials for term={term!r} seg={seg}")
        tfs_all = (tf_packed >> 1).astype(np.int64)
        starts = np.zeros(doc_ids.size, dtype=np.int64)
        np.cumsum(tfs_all[:-1], out=starts[1:])
        pos_gaps_cat = np.concatenate([p[3] for p in parts])
        pos_gaps = np.concatenate(
            [pos_gaps_cat[starts[i]:starts[i] + tfs_all[i]] for i in order]
        ) if tfs_all.sum() else np.zeros(0, np.uint64)
        doc_ids, tf_packed, dls = doc_ids[order], tf_packed[order], dls[order]
    else:
        pos_gaps = np.concatenate([p[3] for p in parts])
    buf = _encode_partial(doc_ids, tf_packed, dls, pos_gaps.astype(np.uint64))
    tfs = (tf_packed >> 1).astype(np.float64)
    impact = tfs / (tfs + K1 * (1 - B + B * dls / avgdl))
    nblocks = (doc_ids.size + BLOCK_SIZE - 1) // BLOCK_SIZE
    bfirst, blast, bmax = [], [], []
    for i in range(nblocks):
        sl = slice(i * BLOCK_SIZE, (i + 1) * BLOCK_SIZE)
        bfirst.append(int(doc_ids[sl][0]))
        blast.append(int(doc_ids[sl][-1]))
        bmax.append(float(impact[sl].max()))
    return (term, int(seg), int(doc_ids.size), int(tfs.sum()), buf,
            bfirst, blast, bmax)


def merge_partials(partials: DataFrame, avgdl: float, n_buckets: int = 64,
                   salt_factor: int = 8) -> DataFrame:
    """A7 hierarchical merge: disjoint doc-range partials → one compressed
    row per (term, segment) with block-max BM25 impact bounds.

    Physical shape: ONE shuffle keyed (bucket, salt(term)) + local sort by
    (term, segment), then a streaming mapInPandas that merges consecutive
    equal keys — NOT groupBy.applyInPandas, whose per-group pandas-DataFrame
    overhead dominates wall time when the group count is large (hundreds of
    thousands of tiny (term,segment) groups is the normal case). The salt
    spreads each bucket over `salt_factor` reducers for merge parallelism
    while keeping the final write partitionBy(bucket) shuffle-free, and the
    sort makes written files term-ordered → parquet row-group min/max
    skipping on query-term filters."""
    avgdl = max(avgdl, 1e-9)
    out_cols = [f.name for f in POSTING_SCHEMA.fields]

    def merge_stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur: tuple | None = None
        bins: list = []
        rows: list = []

        def flush():
            if cur is not None:
                rows.append(_merge_group(cur[0], cur[1], bins, avgdl))

        for pdf in batches:
            for term, seg, b in zip(pdf["term"], pdf["segment"], pdf["bin"]):
                k = (term, seg)
                if k != cur:
                    flush()
                    cur, bins = k, []
                bins.append(b)
            if len(rows) >= 2000:
                yield pd.DataFrame(rows, columns=out_cols)
                rows = []
        flush()
        if rows:
            yield pd.DataFrame(rows, columns=out_cols)

    with_bucket = partials.withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
    ).withColumn(
        "_salt", F.pmod(F.xxhash64("term", F.lit(1)), F.lit(salt_factor)))
    # RANGE partition on (bucket, salt): output partition count — and hence
    # the partitionBy(bucket) file count and commit-rename cost — is fixed
    # at n_buckets·salt_factor regardless of cluster size, and nearly every
    # task holds a single bucket value (hash repartition would mix buckets
    # per task and multiply small files by the core count)
    shuffled = (with_bucket
                .repartitionByRange(n_buckets * salt_factor, "bucket", "_salt")
                .sortWithinPartitions("term", "segment"))
    merged = shuffled.select("term", "segment", "bin", "bucket").mapInPandas(
        merge_stream, schema=POSTING_SCHEMA)
    # bucket is re-derived (constant per term) so the write needs no shuffle
    return merged.withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))


def term_stats(postings: DataFrame, n_docs: int) -> DataFrame:
    """Dictionary + df/cf (A4/A5): plain associative sums over segments —
    no get-or-create lock, no surrogate ids (SURVEY.md §4)."""
    return (postings.groupBy("term")
            .agg(F.sum("n_docs").alias("df"), F.sum("cf").alias("cf"))
            .withColumn("idf_bm25",
                        F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                              / (F.col("df") + 0.5) + 1.0))
            .withColumn("idf_ref", F.log(1.0 + F.lit(float(n_docs)) / F.col("df"))))


def build_index(spark: SparkSession, corpus: DataFrame, out_dir: str,
                profile: str = "code", seg_bits: int = 16,
                n_buckets: int = 64, salt_factor: int = 8) -> dict:
    """Full build → {docs,postings,terms,stats} parquet dirs under out_dir.

    Returns the global stats dict. Postings are written partitioned by
    `bucket` so a k-term query scans k/n_buckets of the files (partition
    pruning stands in for the reference's MySQL hash index,
    create_database.sql:47)."""
    from pyspark import StorageLevel

    docs = prepare_docs(corpus)
    partials = build_partials(docs, profile=profile, seg_bits=seg_bits)
    # DISK_ONLY: partial rows are already-compressed binary; caching them on
    # heap just adds GC pressure under 32 concurrent tasks (measured slower),
    # and the OS page cache makes the re-read effectively free locally
    partials.persist(StorageLevel.DISK_ONLY)  # ONE tokenization pass feeds all below
    doclens = doc_lengths(partials)
    stats = doc_stats(doclens)  # small agg over cached partials, no re-read
    docs_out = (docs.drop("content")
                .join(doclens, "doc_id")
                .select("doc_id", "repo", "path", "commit", "lang",
                        "content_sha256", "n_tokens"))
    docs_out.write.mode("overwrite").parquet(os.path.join(out_dir, "docs"))
    postings = merge_partials(partials.filter(F.col("term") != DOCLEN_TERM),
                              avgdl=stats["avgdl"], n_buckets=n_buckets,
                              salt_factor=salt_factor)
    # merge output is already (bucket,salt)-partitioned and term-sorted:
    # partitionBy(bucket) write needs no further shuffle
    (postings.write.mode("overwrite").partitionBy("bucket")
     .parquet(os.path.join(out_dir, "postings")))
    # df/cf sums over partials ≡ sums over merged postings (docs are
    # disjoint across partials) — avoids a full postings read-back
    terms = term_stats(partials.filter(F.col("term") != DOCLEN_TERM),
                       stats["n_docs"])
    terms.write.mode("overwrite").parquet(os.path.join(out_dir, "terms"))
    partials.unpersist()
    stats_row = dict(stats, avgdl=float(stats["avgdl"]), profile=profile,
                     seg_bits=seg_bits, n_buckets=n_buckets, k1=K1, b=B)
    write_stats_json(spark, out_dir, stats_row)
    return stats_row


def write_stats_json(spark: SparkSession, out_dir: str, stats_row: dict) -> None:
    """Publish the one-row stats table. Driver-side file write for plain
    paths (a Spark 1-row json write measures ~5s of fixed overhead per
    build); remote URIs (hdfs://, s3://...) go through the Spark writer.
    Layout is spark.read.json-readable either way."""
    stats_dir = os.path.join(out_dir, "stats")
    if "://" in out_dir:
        spark.createDataFrame([stats_row]).coalesce(1) \
            .write.mode("overwrite").json(stats_dir)
    else:
        import json as _json
        import shutil as _shutil
        if os.path.isdir(stats_dir):
            _shutil.rmtree(stats_dir)
        os.makedirs(stats_dir, exist_ok=True)
        with open(os.path.join(stats_dir, "part-00000.json"), "w") as f:
            f.write(_json.dumps(stats_row) + "\n")


def load_index(spark: SparkSession, out_dir: str) -> dict:
    stats = spark.read.json(os.path.join(out_dir, "stats")).collect()[0].asDict()
    return {
        "docs": spark.read.parquet(os.path.join(out_dir, "docs")),
        "postings": spark.read.parquet(os.path.join(out_dir, "postings")),
        "terms": spark.read.parquet(os.path.join(out_dir, "terms")),
        "stats": stats,
    }
