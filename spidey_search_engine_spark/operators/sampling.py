"""Deterministic sampling operators for training-data mix construction.

A 100-TB corpus is never trained on whole: pipelines draw per-language /
per-source / per-quality-band quotas. Two primitives, both deterministic
functions of (id, seed) — re-running the pipeline reproduces the sample
bit-for-bit, and adding documents never evicts previously-sampled ones
from the fraction path (stable under corpus growth, the property that
makes incremental re-mixes diffable):

* hash_fraction_sample — keep rows whose salted hash falls under the
  fraction threshold. SHUFFLE-FREE: a scan-local filter Catalyst pushes
  next to the parquet reader; this is the 100-TB path.
* stratified_fraction_sample — per-stratum fractions (the training-mix
  recipe: 30% en, 5% de, …) via a tiny broadcast-joined quota table —
  still no shuffle of the corpus, the join is map-side.
* stratified_sample — EXACTLY n per stratum: rank within stratum by the
  salted hash (ties by id) and keep rank <= n. One shuffle on the strata
  columns (window sort). For huge strata, pre-thin with
  hash_fraction_sample first (oversample ~3n/N), then exact-rank the
  survivors — the two-phase shape keeps the window sort bounded.

Both default to JVM ``xxhash64(id, seed)`` (production) and accept the
``hash_expr`` injection the dedup family uses, so the DuckDB oracle runs
the identical polynomial hash (functions/hashing.py) and the sample is
value-checked row-for-row, not statistically.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HashExpr = Callable[[Column], Column]

_DENOM = 1 << 30


def _sample_key(id_col: str, seed: int,
                hash_expr: HashExpr | None) -> Column:
    if hash_expr is None:
        return F.xxhash64(F.col(id_col), F.lit(seed))
    return hash_expr(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))


def hash_fraction_sample(df: DataFrame, fraction: float,
                         id_col: str = "doc_id", seed: int = 17,
                         hash_expr: HashExpr | None = None) -> DataFrame:
    """Keep ~fraction of rows, deterministically: pmod(hash(id,seed),
    2^30) < fraction·2^30. No shuffle, no state — the predicate is a pure
    column expression evaluated inside the scan stage."""
    key = F.pmod(_sample_key(id_col, seed, hash_expr), F.lit(_DENOM))
    return df.filter(key < F.lit(int(fraction * _DENOM)))


def stratified_fraction_sample(df: DataFrame, strata_col: str,
                               fractions: "dict[str, float]",
                               id_col: str = "doc_id", seed: int = 17,
                               default: float = 0.0,
                               hash_expr: HashExpr | None = None
                               ) -> DataFrame:
    """Per-stratum deterministic fractions — the training-mix recipe.
    The {stratum: fraction} dict becomes a tiny quota DataFrame broadcast
    into the corpus scan (map-side join, corpus never shuffles); rows keep
    iff their salted hash clears their OWN stratum's threshold. Strata
    missing from the dict get ``default`` (0.0 = drop). Same stability
    property as hash_fraction_sample: raising one stratum's fraction only
    ADDS rows, never swaps them."""
    spark = df.sparkSession
    quota = spark.createDataFrame(
        [(s, int(f * _DENOM)) for s, f in fractions.items()],
        f"{strata_col} string, _thresh long")
    key = F.pmod(_sample_key(id_col, seed, hash_expr), F.lit(_DENOM))
    return (df.join(F.broadcast(quota), strata_col, "left")
            .filter(key < F.coalesce(F.col("_thresh"),
                                     F.lit(int(default * _DENOM))))
            .drop("_thresh"))


def stratified_sample(df: DataFrame, strata_cols: Sequence[str],
                      n_per_stratum: int, id_col: str = "doc_id",
                      seed: int = 17,
                      hash_expr: HashExpr | None = None) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, ranked by the salted
    hash (ties by id ASC) — a deterministic quota draw. Output adds
    ``smp_rank`` (1-based within stratum)."""
    key = _sample_key(id_col, seed, hash_expr)
    wnd = (Window.partitionBy(*strata_cols)
           .orderBy(key.asc(), F.col(id_col).asc()))
    return (df.withColumn("smp_rank", F.row_number().over(wnd))
            .filter(F.col("smp_rank") <= n_per_stratum))


def token_budget_sample(df: DataFrame, strata_col: str,
                        budgets: "dict[str, int]",
                        weight_col: str = "n_tokens",
                        id_col: str = "doc_id", seed: int = 17,
                        hash_expr: HashExpr | None = None) -> DataFrame:
    """Per-stratum TOKEN budgets, not row counts — how training mixes are
    actually specified ("200B tokens of en, 50B of de"). Docs are taken in
    salted-hash order (deterministic, growth-stable head) while the
    stratum's running token total stays ≤ its budget; the first doc that
    crosses the line is excluded. One window (cumulative sum over the
    stratum partition) + the broadcast budget table. Output adds
    ``cum_tokens`` (this doc's inclusive running total within its
    stratum).

    Scale caveat: the running sum serializes each stratum through ONE
    window task (sort + spill, not OOM — but a bottleneck when a stratum
    is many TB and the budget covers a small head). For that shape,
    pre-thin with hash_fraction_sample at roughly
    budget/stratum_total_tokens × safety_factor first and budget the
    survivors — still a deterministic quota draw, but over the thinned
    hash order, so record the pre-thin fraction with the mix recipe."""
    spark = df.sparkSession
    quota = spark.createDataFrame(
        [(s, int(b)) for s, b in budgets.items()],
        f"{strata_col} string, _budget long")
    key = _sample_key(id_col, seed, hash_expr)
    wnd = (Window.partitionBy(strata_col)
           .orderBy(key.asc(), F.col(id_col).asc())
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.join(F.broadcast(quota), strata_col, "inner")
            .withColumn("cum_tokens",
                        F.sum(F.col(weight_col).cast("long")).over(wnd))
            .filter(F.col("cum_tokens") <= F.col("_budget"))
            .drop("_budget"))


def assign_shards(df: DataFrame, n_shards: int,
                  id_col: str = "doc_id", seed: int = 17,
                  hash_expr: HashExpr | None = None) -> DataFrame:
    """Deterministic training-shard assignment: adds (shard, pos).

    Trainers read fixed shard files in order; the assignment must be (a)
    uniform, (b) a pure function of (id, seed) so re-runs and resumed
    builds produce byte-identical shards, and (c) free of any global sort.
    shard = pmod(hash(id, seed), n_shards) — uniform by hash construction,
    computed inside the scan. pos = dense 0-based position within the
    shard in salted-hash order (ties by id): one window per shard
    partition, i.e. ONE shuffle on a uniform key — never a global
    row_number, whose single ordered partition is the classic 100-TB
    anti-pattern. The (hash, id) order also globally shuffles the corpus
    across and within shards — exactly the train-time document shuffle —
    without a separate orderBy(rand()) pass.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive (got {n_shards})")
    key = _sample_key(id_col, seed, hash_expr)
    wnd = Window.partitionBy("shard").orderBy(F.col("_skey").asc(),
                                              F.col(id_col).asc())
    return (df.withColumn("_skey", key)
            .withColumn("shard",
                        F.pmod(F.col("_skey"), F.lit(n_shards)).cast("int"))
            .withColumn("pos", (F.row_number().over(wnd) - 1).cast("long"))
            .drop("_skey"))


def write_training_shards(df: DataFrame, out_dir: str, n_shards: int,
                          id_col: str = "doc_id", seed: int = 17,
                          hash_expr: HashExpr | None = None) -> None:
    """Materialize the shard table: one directory per shard, rows stored
    in `pos` order within each shard file.

    repartition on the partition column BEFORE partitionBy — without it
    every input partition writes a file into every shard dir (measured
    64x file explosion on the LSH index write); with it, one file per
    shard, sorted by pos via sortWithinPartitions so a sequential reader
    streams the shard in training order."""
    shards = assign_shards(df, n_shards, id_col, seed, hash_expr)
    (shards.repartition(n_shards, "shard")
     .sortWithinPartitions("shard", "pos")
     .write.mode("overwrite").partitionBy("shard").parquet(out_dir))


def grouped_split(df: DataFrame, group_col: str,
                  fractions: "dict[str, float]", seed: int = 43,
                  hash_expr: HashExpr | None = None,
                  rest: str = "train", out: str = "split") -> DataFrame:
    """Leakage-safe train/val/test split: the unit of assignment is the
    GROUP (repo, domain, dup-cluster id), never the document, so
    near-duplicates and siblings that share a group can never straddle
    the split — the classic eval-leak a row-level random split creates.

    Deterministic interval assignment on u = hash(group:seed)/D: the
    labels in `fractions` claim consecutive [0,1) intervals in dict
    order, everything past the last threshold gets `rest`. Same
    properties as hash_fraction_sample: shuffle-free scan-local
    projection (the group key is hashed in place — no join, no global
    coordination), stable under corpus growth (new docs of an existing
    group land on its side; new groups split ~by fraction), and
    re-runnable bit-for-bit. Rows with a NULL group all fall to `rest`
    (documented, not an error — a NULL group is "no leak structure
    known", and scattering NULLs across sides would leak exactly when
    that assumption is wrong).

    For dup-cluster grouping compose with dedup_clusters: join the
    (id, cluster) assignment and pass coalesce(cluster, id) — see
    leakage_safe_split."""
    if not fractions:
        raise ValueError("fractions must name at least one split label")
    tot = 0.0
    for lbl, f in fractions.items():
        if lbl == rest:
            raise ValueError(f"label {lbl!r} collides with rest={rest!r}")
        if not (0.0 < f < 1.0):
            raise ValueError(f"fraction for {lbl!r} must be in (0,1), "
                             f"got {f}")
        tot += f
    if tot >= 1.0:
        raise ValueError(f"fractions sum to {tot}, must leave room for "
                         f"the {rest!r} remainder")
    key = _sample_key(group_col, seed, hash_expr)
    # NULL-group routing must be explicit: xxhash64(NULL, seed) is
    # non-NULL while an injected string hash of NULL is NULL — without
    # this guard the two hash choices would split NULL groups differently
    u = F.when(F.col(group_col).isNotNull(), F.pmod(key, F.lit(_DENOM)))
    expr = None
    cum = 0.0
    for lbl, f in fractions.items():
        cum += f
        cond = u < F.lit(int(round(cum * _DENOM)))
        expr = F.when(cond, lbl) if expr is None else expr.when(cond, lbl)
    return df.withColumn(out, expr.otherwise(rest))


def leakage_safe_split(df: DataFrame, clusters: DataFrame,
                       fractions: "dict[str, float]", seed: int = 43,
                       id_col: str = "doc_id",
                       cluster_col: str = "cluster",
                       hash_expr: HashExpr | None = None,
                       rest: str = "train", out: str = "split"
                       ) -> DataFrame:
    """grouped_split with duplicate-cluster grouping: `clusters` maps
    id -> cluster (e.g. dedup_clusters / minhash-LSH components); docs
    absent from it are singleton groups of their own id, so the whole
    corpus still splits by fraction while every near-dup cluster stays
    on one side. One shuffle (the id join); the split itself stays a
    projection."""
    m = clusters.select(F.col(id_col),
                        F.col(cluster_col).alias("_lsplit_cluster"))
    j = df.join(m, id_col, "left").withColumn(
        "_lsplit_group",
        F.coalesce(F.col("_lsplit_cluster").cast("string"),
                   F.concat(F.lit("id:"), F.col(id_col).cast("string"))))
    return (grouped_split(j, "_lsplit_group", fractions, seed, hash_expr,
                          rest, out)
            .drop("_lsplit_cluster", "_lsplit_group"))
