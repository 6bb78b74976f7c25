"""Deduplication operators for large-scale training-data pipelines.

All operators take a DataFrame with (id_col, text_col) and return candidate
duplicate pairs or keep/drop decisions. Scale design notes per operator:

* exact_dedup — hash groupBy on sha256(content): one shuffle, map-side
  partial agg, no skew concern (hashes are uniform).
* minhash_lsh — shingles → k minhashes → b bands → band-bucket self-join.
  The join key (band_id, band_hash) is uniform by construction, so the
  self-join is shuffle-balanced; candidate pairs are verified with exact
  Jaccard computed CANDIDATE-FIRST (pair list → per-pair shingle
  intersection join) — never via a full shingle self-join, which a hot
  shingle (boilerplate license header) would turn quadratic.
* simhash — 64-bit weighted-token fingerprint built in a SINGLE streaming
  pass (tokenize+tf in one Arrow kernel, token hash JVM-side, 64 counters
  accumulated in numpy per doc — no 64× row explode, one shuffle on id);
  near-dups = fingerprints within `hamming_max` bits, found by pigeonhole
  banding (split the bits into hamming_max+1 chunks; any pair within
  distance must share one exact chunk → equi-join per chunk, then exact
  Hamming verify).
* ngram_jaccard — exact pairwise Jaccard via shingle inverted join;
  quadratic in docs sharing a shingle, intended for verification/small sets
  (minhash_lsh is the scale path; this is its oracle). `max_shingle_df`
  optionally drops ubiquitous shingles before the self-join.
* embedding_cosine_dedup — cosine ≥ τ pairs via the similarity module's
  LSH bucketing (see similarity.py).

Hashing: the production path uses JVM-side ``F.xxhash64``; every operator
accepts a ``hash_expr`` Column-builder so the DuckDB correctness oracle can
run the SAME LSH math with the SQL-expressible polynomial hash
(functions/hashing.py).
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_MERSENNE = (1 << 61) - 1

HashExpr = Callable[[Column], Column]


def tokens_col(text_col: str = "content"):
    # array_remove over filter(lambda): identical output, codegen'd
    # (HOF lambdas run interpreted per element)
    return F.array_remove(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9_]+"), "")


def ngrams_col(t, n: int):
    """n-gram strings over a token-array column (the one shingle/gram
    definition shared by shingles_df and repetition_stats)."""
    return F.transform(F.sequence(F.lit(0), F.size(t) - n),
                       lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)))


def shingles_df(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "content", n: int = 3) -> DataFrame:
    """Distinct n-gram token shingles, one row per (id, shingle) — built
    in the Arrow gram kernel (2.2x the tokens_col/ngrams_col expression
    chain at 103k docs: HOF lambdas evaluate interpreted per element;
    the expression forms stay for the column-level uses and the kernel
    is pinned row-identical to them by test)."""
    from ..functions.textstats import with_token_grams
    return (with_token_grams(df.select(id_col, text_col), text_col,
                             "_sh", ns=(n,), distinct=True)
            .select(F.col(id_col).alias("id"),
                    F.explode("_sh").alias("shingle"))
            .distinct())


def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "content") -> DataFrame:
    """Keep-decision per exact-content group: (id, content_sha, keep)."""
    w = Window.partitionBy("content_sha").orderBy("id")
    return (df.select(F.col(id_col).alias("id"),
                      F.sha2(F.col(text_col), 256).alias("content_sha"))
            .withColumn("keep", F.row_number().over(w) == 1))


def minhash_signatures(sh: DataFrame, num_hashes: int = 32,
                       seed: int = 7,
                       hash_expr: HashExpr | None = None) -> DataFrame:
    """(id, sig: array<long>) — k permutation minima over shingle hashes.

    h_i(x) = (a_i·x + b_i) mod M61 over x = hash(shingle) mod (2^31−1);
    a_i, b_i < 2^31 keep a·x < 2^62 — no long overflow under ANSI mode. The
    agg is one groupBy(id) with k min() columns → map-side combine, one
    shuffle. `hash_expr` defaults to JVM xxhash64; the oracle profile
    injects the polynomial hash so DuckDB runs identical math."""
    a, b = minhash_coeffs(num_hashes, seed)
    base = (hash_expr or F.xxhash64)(F.col("shingle"))
    x = F.pmod(base, F.lit((1 << 31) - 1))
    mins = [F.min(F.pmod(x * F.lit(int(a[i])) + F.lit(int(b[i])),
                         F.lit(_MERSENNE))).alias(f"h{i}")
            for i in range(num_hashes)]
    sig = sh.groupBy("id").agg(*mins)
    return sig.select("id", F.array(*[f"h{i}" for i in range(num_hashes)])
                      .alias("sig"))


def minhash_coeffs(num_hashes: int, seed: int = 7):
    """The (a_i, b_i) permutation coefficients — exposed so the SQL oracle
    can inline the exact same constants."""
    rng = np.random.Generator(np.random.PCG64(seed))
    m31 = (1 << 31) - 1
    a = rng.integers(1, m31, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, m31, size=num_hashes, dtype=np.int64)
    return a, b


def banded_signatures(sig: DataFrame, bands: int = 8,
                      num_hashes: int = 32,
                      band_hash_expr: HashExpr | None = None,
                      keep_sig: bool = False) -> DataFrame:
    """(id, band, bh[, sig]) — one hash per signature band; the LSH join
    key. ``keep_sig`` carries the full signature on every band row so a
    candidate join can verify by signature agreement WITHOUT any further
    lookup (bands× storage for join-free verification — the trade the
    incremental index makes)."""
    rows_per_band = num_hashes // bands
    if band_hash_expr is None:
        def band_hash_expr(c):
            return F.hash(c)
    cols = ["id", "z.band", "z.bh"] + (["sig"] if keep_sig else [])
    return sig.select(
        "id", "sig",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda bnd: F.struct(
                bnd.alias("band"),
                band_hash_expr(F.concat_ws(
                    ",", F.transform(
                        F.slice("sig", bnd * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string")))).alias("bh")))
        ).alias("z")).select(*cols)


def lsh_candidate_pairs(sig: DataFrame, bands: int = 8,
                        num_hashes: int = 32,
                        band_hash_expr: HashExpr | None = None) -> DataFrame:
    """Band the signature and self-join on (band, band_hash) → (id_a, id_b)."""
    banded = banded_signatures(sig, bands, num_hashes, band_hash_expr)
    a = banded.alias("a")
    b = banded.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bh") == F.col("b.bh"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct())


def jaccard_pairs(sh: DataFrame, pairs: DataFrame | None = None,
                  threshold: float = 0.0,
                  max_shingle_df: int | None = None) -> DataFrame:
    """Exact Jaccard for given candidate pairs (or all co-shingled pairs).

    With `pairs`, intersections are computed CANDIDATE-FIRST: the pair list
    joins to id_a's shingles, then equi-joins (id_b, shingle) — cost is
    linear in Σ|shingles(id_a)| over candidate pairs, so one hot shingle
    shared by every doc cannot trigger a quadratic self-join (round-1
    review finding). Without `pairs` the full inverted self-join runs
    (verification/small-set mode); `max_shingle_df` drops shingles hotter
    than the cap first (documented approximation for that mode only)."""
    if pairs is not None:
        counts = sh.groupBy("id").agg(F.count("*").alias("n"))
        a = sh.select(F.col("id").alias("id_a"), "shingle")
        b = sh.select(F.col("id").alias("id_b"), "shingle")
        inter = (pairs.join(a, "id_a")
                 .join(b, ["id_b", "shingle"])
                 .groupBy("id_a", "id_b").agg(F.count("*").alias("inter")))
    else:
        sh_j = sh
        if max_shingle_df is not None:
            hot = (sh.groupBy("shingle").agg(F.count("*").alias("_df"))
                   .filter(F.col("_df") > max_shingle_df).select("shingle"))
            sh_j = sh.join(hot, "shingle", "left_anti")
        # denominators over the SAME (filtered) universe as the
        # intersections, so the capped mode returns a true Jaccard of the
        # filtered shingle sets (an exact pair stays 1.0)
        counts = sh_j.groupBy("id").agg(F.count("*").alias("n"))
        a = sh_j.alias("a")
        b = sh_j.alias("b")
        inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                        & (F.col("a.id") < F.col("b.id")))
                 .groupBy(F.col("a.id").alias("id_a"),
                          F.col("b.id").alias("id_b"))
                 .agg(F.count("*").alias("inter")))
    jac = (inter
           .join(counts.select(F.col("id").alias("id_a"), F.col("n").alias("na")), "id_a")
           .join(counts.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), "id_b")
           .withColumn("jaccard", F.col("inter")
                       / (F.col("na") + F.col("nb") - F.col("inter"))))
    return jac.filter(F.col("jaccard") >= threshold) \
        .select("id_a", "id_b", "jaccard")


def minhash_lsh_dedup(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "content", n: int = 3,
                      num_hashes: int = 32, bands: int = 8,
                      threshold: float = 0.7, seed: int = 7,
                      hash_expr: HashExpr | None = None,
                      band_hash_expr: HashExpr | None = None) -> DataFrame:
    """Scale path: LSH candidates → exact-Jaccard verify → near-dup pairs."""
    sh = shingles_df(df, id_col, text_col, n)
    sig = minhash_signatures(sh, num_hashes, seed, hash_expr)
    cand = lsh_candidate_pairs(sig, bands, num_hashes, band_hash_expr)
    return jaccard_pairs(sh, cand, threshold)


# ---------------------------------------------------------------------------
# Incremental cross-corpus near-dedup: materialized MinHash band index
# ---------------------------------------------------------------------------

def write_minhash_index(df: DataFrame, out_dir: str,
                        id_col: str = "doc_id", text_col: str = "content",
                        n: int = 3, num_hashes: int = 32, bands: int = 8,
                        seed: int = 7, n_buckets: int = 64,
                        keep_sig: bool = True,
                        hash_expr: HashExpr | None = None,
                        band_hash_expr: HashExpr | None = None) -> None:
    """Materialize the base corpus's MinHash band table for incremental
    dedup: (id, band, bh) written ``partitionBy("bucket")`` with
    bucket = pmod(bh, n_buckets).

    This is the text analog of the materialized LSH ANN index
    (similarity.write_lsh_index) and the bucket-partitioned postings (Q1):
    dedup-against-existing-corpus is an every-ingest operation at 100 TB,
    and re-minhashing the base corpus per incoming batch is the same
    anti-pattern as re-hashing the embedding table per ANN query (round-2
    verdict #1). Band hashes are uniform by construction, so the
    n_buckets partitions are balanced; pick n_buckets so one partition is
    a few GB at the target corpus size. repartition on bucket first: one
    file per bucket, not one per (input partition x bucket).

    With ``keep_sig`` (default) each band row carries the doc's FULL
    signature (bands× storage of num_hashes longs): the probe's candidate
    join then has both signatures in hand and can verify by signature
    agreement without any base-corpus lookup (verify="minhash" below) —
    at 100 TB the verify otherwise costs a text fetch + re-shingle per
    candidate base doc. Callers that will only ever verify="exact" can
    pass keep_sig=False and skip that storage tax entirely."""
    sh = shingles_df(df, id_col, text_col, n)
    sig = minhash_signatures(sh, num_hashes, seed, hash_expr)
    banded = banded_signatures(sig, bands, num_hashes, band_hash_expr,
                               keep_sig=keep_sig)
    (banded.withColumn("bucket", F.pmod(F.col("bh"), F.lit(n_buckets)))
     .repartition("bucket")
     .write.mode("overwrite").partitionBy("bucket").parquet(out_dir))


def load_minhash_index(spark, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)


def incremental_lsh_pairs(new_df: DataFrame, base_df: DataFrame | None,
                          index: DataFrame, *,
                          id_col: str = "doc_id", text_col: str = "content",
                          n: int = 3, num_hashes: int = 32, bands: int = 8,
                          threshold: float = 0.7, seed: int = 7,
                          n_buckets: int = 64, verify: str = "exact",
                          hash_expr: HashExpr | None = None,
                          band_hash_expr: HashExpr | None = None) -> DataFrame:
    """Near-dup pairs (id_a = base doc, id_b = incoming doc) between an
    incoming batch and an already-indexed base corpus, WITHOUT
    re-minhashing the base corpus.

    Plan shape (the incremental-ingest hot path at 100 TB):
    1. MinHash + band ONLY the incoming batch (cost ∝ batch size).
    2. Collect the batch's distinct probe buckets — bounded by n_buckets
       (≤64 values by default), never by corpus or batch size — and prune
       the index scan with `bucket IN (...)` (PartitionFilters, same trick
       as the Q1 dictionary probe).
    3. Equi-join (band, bh) → candidate (base_id, new_id) pairs.
    4. Verify:
       * ``verify="minhash"`` (the 100-TB path) — both full signatures
         already ride on the joined rows (the index stores the signature
         per band row; the batch side carries its own), so the estimated
         Jaccard is computed JOIN-FREE, never touching base text.
         DEBIASED: candidates exist BECAUSE a band matched, so the naive
         agreement fraction conditions on those components agreeing and
         overestimates borderline pairs (measured: a 0.5 threshold kept
         2395 of 2397 candidates where exact Jaccard kept 488 — every
         true-J≈0.4 candidate cleared 0.5). The estimator here counts
         agreement only over components OUTSIDE the matched bands,
         removing the dominant upward selection bias (a small downward
         residual remains: unmatched bands are conditioned on
         not-all-agreeing). It stays a high-variance estimate —
         stderr ≈ sqrt(J(1−J)/m) on the m remaining components
         (≈0.09 at m=28), so near-threshold pairs still pass/fail
         probabilistically (measured post-debias at 0.5: 2138 kept vs
         488 exact — the remaining surplus is borderline-J variance,
         not bias). A pair whose every band matched is scored 1.0.
         Use it to cheaply DROP obvious dups at ingest; route
         keep/borderline decisions through verify="exact".
       * ``verify="exact"`` (default; the oracle-paired mode) — exact
         Jaccard CANDIDATE-FIRST: base shingles are recomputed only for
         candidate base docs (broadcast left-semi prune of the base
         scan), cost proportional to the candidate set, not the corpus.
         Requires ``base_df``; "minhash" ignores it.

    Ids must be unique across the two corpora (pairs with id_a == id_b
    are dropped as self-matches). Parameters must match the ones the
    index was written with; they are not self-describing in the table.

    The batch's band table (and, in exact mode, the candidate pair set
    and the verify shingle table) are persist()ed: each is batch-scale
    and consumed by several downstream subtrees that share no reusable
    exchange (measured 3× lineage replay without it). Long-running
    callers (the ingest stream processes one batch per trigger, forever)
    must release them once the result is consumed: the handles ride on
    the returned DataFrame as ``result._persisted`` — call
    ``.unpersist()`` on each after the final action. CAVEAT: the
    attribute lives on THIS DataFrame object only; any transformation
    (.select/.filter/...) returns a new object without it, so keep a
    reference to the original (or re-attach the list) when you wrap the
    result.
    """
    if verify not in ("exact", "minhash"):
        raise ValueError(f"verify must be 'exact' or 'minhash' ({verify!r})")
    sh_new = shingles_df(new_df, id_col, text_col, n)
    sig_new = minhash_signatures(sh_new, num_hashes, seed, hash_expr)
    banded_new = (banded_signatures(sig_new, bands, num_hashes,
                                    band_hash_expr,
                                    keep_sig=(verify == "minhash"))
                  .withColumn("bucket",
                              F.pmod(F.col("bh"), F.lit(n_buckets)))
                  .persist())
    probe = [r["bucket"]
             for r in banded_new.select("bucket").distinct().collect()]
    idx = index.filter(F.col("bucket").isin(probe)) if probe else index
    joined = (banded_new.alias("q")
              .join(idx.alias("i"),
                    (F.col("q.band") == F.col("i.band"))
                    & (F.col("q.bh") == F.col("i.bh"))
                    & (F.col("q.id") != F.col("i.id"))))
    if verify == "minhash":
        if "sig" not in index.columns:
            raise ValueError(
                "verify='minhash' needs signatures on the index rows — "
                "this index was written without them (keep_sig=False or "
                "a pre-signature layout); rebuild with "
                "write_minhash_index(..., keep_sig=True) or use "
                "verify='exact'")
        rpb = num_hashes // bands
        # a NULL sig (mixed old/new parquet schemas merged at read time)
        # would make the estimate NULL and the >= filter silently KEEP a
        # known duplicate — fail the job loudly instead. assert_true
        # returns NULL on success, so the when() wrapper keeps the check
        # inside the consumed expression (an unused column would be
        # pruned away, assertion and all).
        checked_sig = F.when(
            F.assert_true(
                F.col("i.sig").isNotNull(),
                F.lit("minhash verify hit a NULL index signature — the "
                      "index mixes pre-signature batches; rebuild it with "
                      "write_minhash_index(keep_sig=True)")).isNull(),
            F.col("i.sig"))
        grouped = (joined.groupBy(F.col("i.id").alias("id_a"),
                                  F.col("q.id").alias("id_b"))
                   .agg(F.collect_set(F.col("q.band")).alias("mb"),
                        F.first(checked_sig).alias("sig_a"),
                        F.first(F.col("q.sig")).alias("sig_b")))
        eq = F.zip_with("sig_a", "sig_b", lambda x, y: x == y)
        # component c belongs to band c // rows_per_band; count agreement
        # only on components of UNMATCHED bands (selection-debiased)
        agree_excl = F.size(F.filter(
            eq, lambda v, c: v & ~F.array_contains(
                F.col("mb"), F.floor(c / F.lit(rpb)).cast("int"))))
        n_excl = F.lit(num_hashes) - F.lit(rpb) * F.size("mb")
        est = F.when(n_excl > 0, agree_excl / n_excl.cast("double")) \
            .otherwise(F.lit(1.0))
        out = (grouped.select("id_a", "id_b", est.alias("jaccard"))
               .filter(F.col("jaccard") >= threshold))
        out._persisted = [banded_new]
        return out
    if base_df is None:
        raise ValueError("verify='exact' needs base_df for the "
                         "candidate-first shingle verify")
    cand = (joined.select(F.col("i.id").alias("id_a"),
                          F.col("q.id").alias("id_b"))
            .distinct()
            .persist())
    # candidate ids are normally batch-scale, and AQE picks a broadcast
    # semi-join for them on its own; no explicit F.broadcast hint — a
    # boilerplate-heavy batch whose band bucket collides with a large
    # slice of the base corpus makes the candidate set corpus-scale, and
    # a forced hint would drive that through the driver (8 GB broadcast
    # cap / OOM) where the planner would have degraded to a shuffle
    # semi-join (review finding; same rule as the WAND segment join)
    base_cand = base_df.join(
        cand.select(F.col("id_a").alias(id_col)).distinct(),
        id_col, "left_semi")
    sh_all = (shingles_df(base_cand, id_col, text_col, n)
              .unionByName(sh_new).persist())
    out = jaccard_pairs(sh_all, cand, threshold)
    out._persisted = [banded_new, cand, sh_all]  # release hooks (streaming)
    return out


# ---------------------------------------------------------------------------
# SimHash — single-pass fingerprints + pigeonhole near-pair search
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"[^a-z0-9_]+")  # must equal tokens_col's pattern


def _doc_token_tf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(id, content) → (id, tok, tf) rows, one Arrow kernel, NO shuffle and
    no explode — each doc's tokens live in its own input row already."""
    for pdf in batches:
        ids, toks, tfs = [], [], []
        for i, text in zip(pdf["id"], pdf["content"]):
            if not isinstance(text, str) or not text:
                continue
            c = Counter(t for t in _TOKEN_RE.split(text.lower()) if t)
            ids.extend([i] * len(c))
            toks.extend(c.keys())
            tfs.extend(c.values())
        yield pd.DataFrame({"id": np.asarray(ids, dtype=np.int64),
                            "tok": toks,
                            "tf": np.asarray(tfs, dtype=np.int64)})


def simhash_fingerprints(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "content",
                         hash_expr: HashExpr | None = None) -> DataFrame:
    """64-bit SimHash over tf-weighted token hashes, in a single pass:

    1. one mapInPandas kernel turns each doc row into (id, tok, tf) rows —
       tf is per-doc so no shuffle is needed to count it;
    2. the token hash is a JVM column expression (xxhash64 by default);
    3. repartition(id) + sortWithinPartitions + a streaming mapInPandas
       accumulates the 64 weighted-bit counters in numpy and emits one
       fingerprint per doc, carrying the open group across Arrow batches.

    vs the round-1 version this removes a 64× row explode and two extra
    shuffles on the biggest table of a training-data pipeline; fingerprints
    are bit-identical (pinned by tests/test_pipeline_ops.py numpy oracle)."""
    tf = (df.select(F.col(id_col).alias("id"),
                    F.col(text_col).alias("content"))
          .mapInPandas(_doc_token_tf, "id long, tok string, tf long"))
    hashed = tf.withColumn("h", (hash_expr or F.xxhash64)(F.col("tok"))) \
        .select("id", "h", "tf")

    shifts = np.arange(64, dtype=np.uint64)

    def accumulate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur_id = None
        cur_vec = None  # np.int64[64] weighted-bit counters
        out_ids: list[int] = []
        out_fp: list[int] = []

        def flush():
            if cur_id is None:
                return
            fp = 0
            for i in np.flatnonzero(cur_vec > 0):
                fp |= 1 << int(i)
            if fp >= 1 << 63:  # two's-complement like Spark's long sum
                fp -= 1 << 64
            out_ids.append(int(cur_id))
            out_fp.append(fp)

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if ids.size == 0:
                continue
            hs = pdf["h"].to_numpy().astype(np.int64).view(np.uint64)
            tfs = pdf["tf"].to_numpy().astype(np.int64)
            signs = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int64) * 2 - 1
            weighted = signs * tfs[:, None]
            starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
            sums = np.add.reduceat(weighted, starts, axis=0)
            first_id = ids[starts[0]]
            g = 0
            if cur_id is not None and first_id == cur_id:
                cur_vec += sums[0]
                g = 1
            for k in range(g, starts.size):
                flush()
                cur_id, cur_vec = ids[starts[k]], sums[k].copy()
            if len(out_ids) >= 4096:
                yield pd.DataFrame({"id": np.asarray(out_ids, np.int64),
                                    "simhash": np.asarray(out_fp, np.int64)})
                out_ids, out_fp = [], []
        flush()
        if out_ids:
            yield pd.DataFrame({"id": np.asarray(out_ids, np.int64),
                                "simhash": np.asarray(out_fp, np.int64)})

    return (hashed.repartition("id").sortWithinPartitions("id")
            .mapInPandas(accumulate, "id long, simhash long"))


def simhash_near_pairs(fp: DataFrame, hamming_max: int = 3) -> DataFrame:
    """Pigeonhole banding: split 64 bits into hamming_max+1 chunks; pairs
    within the distance share ≥1 exact chunk → per-chunk equi-join, then
    exact popcount verify (bit_count is JVM-side)."""
    chunks = hamming_max + 1
    width = 64 // chunks
    banded = fp.select(
        "id", "simhash",
        F.explode(F.expr(
            f"transform(sequence(0, {chunks - 1}), c -> struct(c as chunk, "
            f"shiftrightunsigned(simhash, cast(c * {width} as int)) "
            f"& {(1 << width) - 1} as ch))")).alias("z")
    ).select("id", "simhash", "z.chunk", "z.ch")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
                    & (F.col("a.ch") == F.col("b.ch"))
                    & (F.col("a.id") < F.col("b.id")))
             .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                     F.col("a.simhash").alias("sa"), F.col("b.simhash").alias("sb"))
             .distinct())
    return (pairs.withColumn(
        "hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("hamming") <= hamming_max)
        .select("id_a", "id_b", "hamming"))


def contamination_check(corpus_sh: DataFrame, bench_sh: DataFrame,
                        min_shared: int = 5) -> DataFrame:
    """(id, shared_shingles, contaminated) — benchmark decontamination:
    flag corpus docs sharing ≥ min_shared distinct n-gram shingles with an
    evaluation/benchmark set, the standard guard against train/test leak
    in pretraining pipelines.

    Both inputs are shingles_df output (id, shingle). Scale shape: the
    benchmark side is small by definition (an eval set, not a corpus) —
    its DISTINCT shingles broadcast into the corpus-shingle scan, so the
    check is one map-side semi-join + one groupBy(id) count; the 100-TB
    corpus streams through once and never shuffles on the shingle key. A
    boilerplate shingle ubiquitous in BOTH sides only inflates counts
    linearly (no self-join); drop hot shingles from the benchmark side
    first if its distinct set is itself skew-heavy."""
    b = bench_sh.select("shingle").distinct()
    return (corpus_sh.join(F.broadcast(b), "shingle")
            .groupBy("id")
            .agg(F.count("*").alias("shared_shingles"))
            .withColumn("contaminated",
                        (F.col("shared_shingles") >= min_shared)
                        .cast("int")))


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "content", n: int = 3) -> DataFrame:
    """(id, n_grams, max_gram_count, rep_ratio) — degenerate-text
    detector: the fraction of a doc's n-grams occupied by its single most
    repeated n-gram. Generated/spammy text repeats phrases; natural text
    and code keep rep_ratio low. Shape: one explode + one (id, gram)
    count + one (id) rollup — all map-side-combinable aggregations; no
    joins, no skew (keys are (doc, gram) pairs, bounded per doc)."""
    per_gram = (df.withColumn("_t", tokens_col(text_col))
                .filter(F.size("_t") >= n)
                .select(F.col(id_col).alias("id"),
                        F.explode(ngrams_col(F.col("_t"), n)).alias("gram"))
                .groupBy("id", "gram").agg(F.count("*").alias("c")))
    return (per_gram.groupBy("id")
            .agg(F.sum("c").alias("n_grams"),
                 F.max("c").alias("max_gram_count"))
            .withColumn("rep_ratio",
                        F.col("max_gram_count") / F.col("n_grams")))


# ---------------------------------------------------------------------------
# Duplicate clusters — connected components over near-dup pairs + canonical
# ---------------------------------------------------------------------------


def connected_components(edges: DataFrame, nodes: DataFrame | None = None,
                         src: str = "id_a", dst: str = "id_b",
                         max_iter: int = 50) -> DataFrame:
    """(id, component) — undirected connected components by min-label
    propagation ("hash-to-min"), the step that turns pair lists from
    minhash_lsh_dedup / simhash_near_pairs / embedding-cosine into actual
    duplicate CLUSTERS a pipeline can act on.

    Scale design: each round is one shuffle — the symmetric edge list joins
    the current labels on the source endpoint and takes min(label) per
    destination. Rounds needed = component diameter; LSH near-dup
    components are near-cliques (every member pairs with the template doc),
    so 2-4 rounds converge in practice — the driver loop is O(diameter),
    NOT O(V). Each round ends in an eager localCheckpoint so the plan never
    grows, and convergence is one count() of still-moving labels. Isolated
    nodes (no edges) keep their own id. At 10^12 docs the same loop holds:
    labels and edges are both id-partitioned DataFrames, nothing lands on
    the driver. (For pathological long-chain graphs — not dedup output —
    the alternating large-star/small-star variant bounds rounds by
    log(V); dedup clusters never need it, documented deviation.)
    """
    sym = (edges.select(F.col(src).cast("long").alias("s"),
                        F.col(dst).cast("long").alias("d"))
           .union(edges.select(F.col(dst).cast("long").alias("s"),
                               F.col(src).cast("long").alias("d")))
           .distinct()
           .localCheckpoint())  # pay the dedupe shuffle once, not per round
    if nodes is None:
        base = sym.select(F.col("s").alias("id")).distinct()
    else:
        base = nodes.distinct()
    labels = base.select("id", F.col("id").alias("label")).localCheckpoint()
    converged = False
    for _ in range(max_iter):
        nbr = (sym.join(labels.withColumnRenamed("id", "s"), "s")
               .groupBy(F.col("d").alias("id"))
               .agg(F.min("label").alias("nbr_label")))
        new = (labels.join(nbr, "id", "left")
               .select("id", F.least("label", "nbr_label").alias("label"),
                       (F.col("nbr_label") < F.col("label"))
                       .alias("_moved")))
        new = new.localCheckpoint()
        moved = new.filter(F.col("_moved")).count()
        labels = new.select("id", "label")
        if moved == 0:
            converged = True
            break
    if not converged:
        # a silently-split component would let 'filter canon=1' keep
        # duplicates — fail loudly instead of returning a wrong answer
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter — raise max_iter, or "
            "use large-star/small-star for pathological chain graphs)")
    return labels


def dedup_clusters(df: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id",
                   prefer_col: str | None = None) -> DataFrame:
    """(id_col, cluster_id, canon) — assign every doc to its duplicate
    cluster (transitive closure of the pair list) and pick ONE canonical
    representative per cluster. canon is int (1 = keep, 0 = drop) for
    oracle-stable typing. Docs in no pair are their own singleton cluster
    (canon = 1), so filtering canon = 1 yields exactly the deduplicated
    corpus.

    Keep policy (P34): by default the minimum doc id — cheap and
    replayable. With ``prefer_col`` (any numeric column of ``df``, e.g. a
    quality-classifier score or content length) the canonical member is
    instead the cluster's argmax of that column, ties to the lowest id —
    what a real pipeline wants: when near-dups differ, keep the BEST copy,
    not the accidentally-lowest-id one. NULL preference ranks below every
    non-NULL value.

    Scale shape of the prefer path: one hash aggregation per cluster
    (argmax via struct-max — no per-cluster sort, no window, so a
    pathological giant cluster costs a partial-aggregated max, not a
    single-task sort) plus one join of the winner table back on
    cluster_id.
    """
    nodes = df.select(F.col(id_col).cast("long").alias("id"))
    comp = connected_components(pairs, nodes=nodes)
    if prefer_col is None:
        return comp.select(
            F.col("id").alias(id_col),
            F.col("label").alias("cluster_id"),
            (F.col("label") == F.col("id")).cast("int").alias("canon"))
    # scored feeds BOTH the winner aggregation and the output join; pin it
    # so df's upstream lineage (often an expensive quality-score pipeline)
    # is computed once, mirroring connected_components' checkpointing.
    scored = comp.join(
        df.select(F.col(id_col).cast("long").alias("id"),
                  F.col(prefer_col).cast("double").alias("_pref")), "id"
    ).localCheckpoint(eager=False)
    # argmax(prefer, tie -> min id) as max(struct(prefer, -id)): struct
    # comparison is lexicographic, so -id makes equal-preference ties
    # resolve to the LOWEST id. coalesce pins NULL preference to -inf.
    key = F.struct(
        F.coalesce(F.col("_pref"), F.lit(float("-inf"))).alias("p"),
        (-F.col("id")).alias("ni"))
    winners = (scored.groupBy(F.col("label").alias("cluster_id"))
               .agg(F.max(key).alias("_w"))
               .select("cluster_id", (-F.col("_w.ni")).alias("_win")))
    return (scored.withColumnRenamed("label", "cluster_id")
            .join(winners, "cluster_id")
            .select(F.col("id").alias(id_col), "cluster_id",
                    (F.col("id") == F.col("_win")).cast("int")
                    .alias("canon")))


def exploded_lines(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "content",
                   drop_blank: bool = True) -> DataFrame:
    """(id, pos, line) — one row per newline-delimited line of each doc.

    Whitespace-only lines are dropped by default: they carry no training
    signal AND the empty line is the one guaranteed hot key of the
    line-frequency shuffle (it appears in virtually every document, so at
    10^12 files it alone would funnel the corpus through one reducer).
    """
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"))
    if drop_blank:
        lines = lines.filter(F.trim(F.col("line")) != "")
    return lines


def line_dedup(df: DataFrame, max_docs: int, id_col: str = "doc_id",
               text_col: str = "content",
               count_distinct_docs: bool = True) -> DataFrame:
    """CCNet-style line-level deduplication: drop every line that occurs
    in more than ``max_docs`` distinct documents (boilerplate license
    headers, generated-code banners, nav chrome), then reassemble each
    document from its surviving lines in original order.

    Returns (id_col, text_col) for documents with >= 1 surviving line;
    documents whose every line is boilerplate disappear (the downstream
    quality gate would drop empty docs anyway).

    Scale shape — three shuffles, all on uniform keys:
      1. line frequency: groupBy sha256(line) (lines are shuffled by their
         hash, never by raw text, so a 4 KB boilerplate line costs 32
         bytes on the wire). count(DISTINCT id) plans as two partial-agg
         phases, so a line present in 10^9 docs sends per-partition
         partial counts to its reducer, not 10^9 rows.
      2. join lines <-> freq on the same sha key (AQE picks the strategy;
         the freq side carries only lines, counts).
      3. rebuild: groupBy id + array_sort(collect_list(struct(pos, line)))
         — bounded by the max lines of a single document.

    count_distinct_docs=False counts total occurrences instead (a line
    repeated inside ONE file then counts every repetition), matching the
    stricter "drop if the corpus contains it > max_docs times" policy.
    """
    lines = exploded_lines(df, id_col, text_col)
    key = F.sha2(F.col("line"), 256).alias("line_sha")
    counted = (F.count_distinct("id") if count_distinct_docs
               else F.count("*"))
    freq = (lines.select(key, "id")
            .groupBy("line_sha").agg(counted.alias("n_docs")))
    kept = (lines.withColumn("line_sha", key)
            .join(freq, "line_sha")
            .filter(F.col("n_docs") <= max_docs))
    rebuilt = (kept.groupBy("id")
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(F.struct("pos", "line"))),
                       lambda s: s["line"]),
                   "\n").alias(text_col)))
    return rebuilt.select(F.col("id").alias(id_col), text_col)


def duplicate_windows(df: DataFrame, k: int = 100, stride: int = 50,
                      min_count: int = 2, id_col: str = "doc_id",
                      text_col: str = "content",
                      count_distinct_docs: bool = False,
                      keep_first: bool = True) -> DataFrame:
    """(id, start, end) — 1-based inclusive char spans of k-char windows
    whose text occurs >= min_count times corpus-wide.

    The strided-window relaxation of exact substring dedup (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better"): the
    suffix-array construction is inherently sequential, but k-char windows
    every `stride` chars are pure DataFrame ops, and any duplicated run
    >= k + stride chars long is guaranteed to contain a shared window on
    both sides of the copy when the copies are alignment-compatible
    (same offsets mod stride — e.g. whole-block copy-paste at a fixed
    template position, the dominant corpus case). Detection granularity
    is `stride` chars; run substring_dedup with smaller stride for recall
    at proportionally more exploded rows (len/stride per doc).

    keep_first=True exempts the corpus-wide first occurrence (min
    (id, start) per window text) so exactly one copy survives — the
    Lee-et-al. policy. Windows are grouped by sha2 of the window text
    (32-byte shuffle keys, never the raw k chars). Docs shorter than k
    yield one whole-doc window. count_distinct_docs=True requires the
    window to appear in >= min_count distinct docs instead of >= min_count
    total occurrences (ignores self-repetition)."""
    length = F.length(F.col(text_col))
    offs = F.sequence(F.lit(1), F.greatest(length - k + 1, F.lit(1)),
                      F.lit(stride))
    win = df.select(
        F.col(id_col).alias("id"),
        F.explode(offs).alias("off"),
        F.col(text_col))
    win = win.select(
        "id", "off",
        F.sha2(F.col(text_col).substr(F.col("off"), F.lit(k)), 256)
         .alias("h"),
        F.least(F.col("off") + (k - 1), F.length(text_col)).alias("end"))
    counted = (F.count_distinct("id") if count_distinct_docs
               else F.count("*"))
    stats = win.groupBy("h").agg(
        counted.alias("n"),
        F.min(F.struct(F.col("id"), F.col("off"))).alias("first"))
    dup = win.join(stats, "h").filter(F.col("n") >= min_count)
    if keep_first:
        dup = dup.filter(~((F.col("id") == F.col("first.id"))
                           & (F.col("off") == F.col("first.off"))))
    return dup.select("id", F.col("off").alias("start"), "end")


def merge_spans(spans: DataFrame) -> DataFrame:
    """Merge overlapping/adjacent (id, start, end) spans — classic
    gaps-and-islands: a span starts a new island iff it begins past the
    running max end + 1 of everything before it."""
    w = Window.partitionBy("id").orderBy("start", "end")
    prev_end = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    island = F.sum(
        F.when(prev_end.isNull() | (F.col("start") > prev_end + 1), 1)
         .otherwise(0)).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (spans.withColumn("island", island)
            .groupBy("id", "island")
            .agg(F.min("start").alias("start"), F.max("end").alias("end"))
            .drop("island"))


def remove_spans(df: DataFrame, spans: DataFrame, id_col: str = "doc_id",
                 text_col: str = "content") -> DataFrame:
    """Cut merged 1-based inclusive (id, start, end) spans out of each
    doc's text. Docs with no spans pass through unchanged; a fully-covered
    doc comes back as ''. The cut is a single JVM fold over each doc's
    sorted span array (substr + concat) — no Python, no explode."""
    spans_arr = (spans.groupBy("id")
                 .agg(F.array_sort(F.collect_list(
                     F.struct("start", "end"))).alias("_spans"))
                 .withColumnRenamed("id", "_span_id"))  # never collides
    joined = df.join(spans_arr, df[id_col] == F.col("_span_id"),
                     "left").drop("_span_id")
    text = F.col(text_col)
    init = F.struct(F.lit(1).alias("cur"), F.lit("").alias("acc"))
    folded = F.aggregate(
        "_spans", init,
        lambda a, sp: F.struct(
            (sp["end"] + 1).alias("cur"),
            F.concat(a["acc"],
                     text.substr(a["cur"], sp["start"] - a["cur"]))
             .alias("acc")),
        lambda a: F.concat(a["acc"],
                           text.substr(a["cur"],
                                       F.length(text) - a["cur"] + 1)))
    cleaned = F.when(F.col("_spans").isNull(), text).otherwise(folded)
    return joined.select(id_col, cleaned.alias(text_col))


def substring_dedup(df: DataFrame, k: int = 100, stride: int = 50,
                    min_count: int = 2, id_col: str = "doc_id",
                    text_col: str = "content",
                    count_distinct_docs: bool = False,
                    keep_first: bool = True) -> DataFrame:
    """Exact substring-span dedup, end to end: strided duplicate windows →
    merged spans → span removal. Returns every input doc with duplicated
    runs excised (first corpus-wide occurrence kept when keep_first).

    Scale shape: the window explode is len/stride rows per doc (2× corpus
    volume at stride=k/2), shuffled once on the 32-byte window hash with
    map-side partial aggs; span merge shuffles only the duplicate spans
    (tiny); removal shuffles spans by doc id and joins back to the corpus
    scan. No step is quadratic in corpus size or in hot-window frequency
    except the dup-row fan-out itself, which is the answer size."""
    spans = duplicate_windows(df, k, stride, min_count, id_col, text_col,
                              count_distinct_docs, keep_first)
    return remove_spans(df, merge_spans(spans), id_col, text_col)
