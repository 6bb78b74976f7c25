"""Deduplication operators for large-scale training-data pipelines.

All operators take a DataFrame with (id_col, text_col) and return candidate
duplicate pairs or keep/drop decisions. Scale design notes per operator:

* exact_dedup — hash groupBy on sha256(content): one shuffle, map-side
  partial agg, no skew concern (hashes are uniform).
* minhash_lsh — shingles → k minhashes → b bands → band-bucket self-join.
  The join key (band_id, band_hash) is uniform by construction, so the
  self-join is shuffle-balanced; candidate pairs are verified with exact
  Jaccard (two-column exploded intersection, no driver collect).
* simhash — 64-bit weighted-token fingerprint; near-dups = fingerprints
  within `hamming_max` bits, found by pigeonhole banding (split the 64 bits
  into hamming_max+1 chunks; any pair within distance must share one exact
  chunk → equi-join per chunk, then exact Hamming verify).
* ngram_jaccard — exact pairwise Jaccard via shingle inverted join;
  quadratic in docs sharing a shingle, intended for verification/small sets
  (minhash_lsh is the scale path; this is its oracle).
* embedding_cosine_dedup — cosine ≥ τ pairs via the similarity module's
  LSH bucketing (see similarity.py).

MinHash uses 64-bit multiply-shift hashing of xxhash64(shingle) — all
JVM-side (F.xxhash64), no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MERSENNE = (1 << 61) - 1


def tokens_col(text_col: str = "content"):
    return F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9_]+"),
                    lambda x: x != F.lit(""))


def shingles_df(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "content", n: int = 3) -> DataFrame:
    """Distinct n-gram token shingles, one row per (id, shingle)."""
    t = tokens_col(text_col)
    sh = F.transform(F.sequence(F.lit(0), F.size(t) - n),
                     lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)))
    return (df.withColumn("_t", t).filter(F.size("_t") >= n)
            .select(F.col(id_col).alias("id"), F.explode(sh).alias("shingle"))
            .distinct())


def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "content") -> DataFrame:
    """Keep-decision per exact-content group: (id, content_sha, keep)."""
    w = Window.partitionBy("content_sha").orderBy("id")
    return (df.select(F.col(id_col).alias("id"),
                      F.sha2(F.col(text_col), 256).alias("content_sha"))
            .withColumn("keep", F.row_number().over(w) == 1))


def minhash_signatures(sh: DataFrame, num_hashes: int = 32,
                       seed: int = 7) -> DataFrame:
    """(id, sig: array<long>) — k permutation minima over shingle hashes.

    h_i(x) = (a_i·x + b_i) mod M61 over x = xxhash64(shingle) mod (2^31−1);
    a_i, b_i < 2^31 keep a·x < 2^62 — no long overflow under ANSI mode. The
    agg is one groupBy(id) with k min() columns → map-side combine, one
    shuffle."""
    rng = np.random.Generator(np.random.PCG64(seed))
    m31 = (1 << 31) - 1
    a = rng.integers(1, m31, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, m31, size=num_hashes, dtype=np.int64)
    x = F.pmod(F.xxhash64("shingle"), F.lit(m31))
    mins = [F.min(F.pmod(x * F.lit(int(a[i])) + F.lit(int(b[i])),
                         F.lit(_MERSENNE))).alias(f"h{i}")
            for i in range(num_hashes)]
    sig = sh.groupBy("id").agg(*mins)
    return sig.select("id", F.array(*[f"h{i}" for i in range(num_hashes)])
                      .alias("sig"))


def lsh_candidate_pairs(sig: DataFrame, bands: int = 8,
                        num_hashes: int = 32) -> DataFrame:
    """Band the signature and self-join on (band, band_hash) → (id_a, id_b)."""
    rows_per_band = num_hashes // bands
    banded = sig.select(
        "id",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda bnd: F.struct(
                bnd.alias("band"),
                F.hash(F.concat_ws(
                    ",", F.transform(
                        F.slice("sig", bnd * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string")))).alias("bh")))
        ).alias("z")).select("id", "z.band", "z.bh")
    a = banded.alias("a")
    b = banded.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bh") == F.col("b.bh"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct())


def jaccard_pairs(sh: DataFrame, pairs: DataFrame | None = None,
                  threshold: float = 0.0) -> DataFrame:
    """Exact Jaccard for given candidate pairs (or all co-shingled pairs)."""
    counts = sh.groupBy("id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.id") < F.col("b.id")))
             .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
             .agg(F.count("*").alias("inter")))
    if pairs is not None:
        inter = inter.join(pairs, ["id_a", "id_b"], "left_semi")
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
                      threshold: float = 0.7) -> DataFrame:
    """Scale path: LSH candidates → exact-Jaccard verify → near-dup pairs."""
    sh = shingles_df(df, id_col, text_col, n)
    sig = minhash_signatures(sh, num_hashes)
    cand = lsh_candidate_pairs(sig, bands, num_hashes)
    return jaccard_pairs(sh, cand, threshold)


def simhash_fingerprints(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "content") -> DataFrame:
    """64-bit SimHash over tf-weighted token hashes — pure column algebra:
    explode tokens → per (id, bit) weighted majority via sign of
    Σ tf·(bit?1:-1) → assemble bits with a 64-term sum (JVM-side)."""
    t = tokens_col(text_col)
    tf = (df.select(F.col(id_col).alias("id"), F.explode(t).alias("tok"))
          .groupBy("id", "tok").agg(F.count("*").alias("tf"))
          .withColumn("h", F.xxhash64("tok")))
    # column-valued shift amounts need SQL form (F.shiftleft takes int only)
    bits = tf.select(
        "id", "tf",
        F.explode(F.expr(
            "transform(sequence(0, 63), i -> struct(i as bit, "
            "cast(shiftrightunsigned(h, i) & 1 as int) as v))")).alias("z")
    ).select("id", "tf", "z.bit", "z.v")
    acc = (bits.groupBy("id", "bit")
           .agg(F.sum(F.col("tf") * (F.col("v") * 2 - 1)).alias("s")))
    return (acc.groupBy("id")
            .agg(F.sum(F.expr(
                "case when s > 0 then shiftleft(1L, cast(bit as int)) "
                "else 0L end")).alias("simhash")))


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
