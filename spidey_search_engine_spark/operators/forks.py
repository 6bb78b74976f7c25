"""Repo-level fork detection — set-similarity join at GROUP granularity.

A source-code corpus (the input_hint's (repo, path, commit, lang,
content) table) is full of forks: repos sharing most of their files
byte-for-byte. Document-level dedup keeps one copy of each shared FILE
but still over-represents the forked project's unique tail and poisons
repo-level statistics; training pipelines drop (or downweight) the fork
and keep the canonical repo. Fork detection is resemblance over FILE
SETS: repo ≈ the set of sha256 fingerprints of its file contents (the
same per-file invariant column the build pipeline carries), similarity =
Jaccard of those sets.

This is the MinHash/LSH machinery of operators/dedup.py verbatim — a
repo is a "document" whose "shingles" are its file hashes — so the scale
story is inherited, not re-derived: signatures are one groupBy(repo)
with k min() columns (map-side combine), candidates come from the banded
self-join on (band, band-hash), and verification is candidate-first
exact Jaccard (linear in the candidates' shingle mass, no quadratic
self-join through a hot shared file — and shared files ARE hot: every
fork of a popular repo carries its LICENSE and README verbatim).

The reference engine has no repo-granularity pass (its crawler dedupes
pages by URL/content only); this is pipeline surplus like the rest of
the dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (HashExpr, connected_components, jaccard_pairs,
                    lsh_candidate_pairs, minhash_signatures)


def repo_file_shas(files: DataFrame, repo_col: str = "repo",
                   content_col: str = "content") -> DataFrame:
    """(id, shingle) — each repo's DISTINCT file-content fingerprints,
    shaped for the dedup machinery. Distinct matters twice: vendored
    copies of the same file inside one repo must count once, and the
    downstream Jaccard is a set measure."""
    return (files.select(F.col(repo_col).alias("id"),
                         F.sha2(F.col(content_col), 256).alias("shingle"))
            .distinct())


def fork_pairs(files: DataFrame, repo_col: str = "repo",
               content_col: str = "content", threshold: float = 0.5,
               exact: bool = False, num_hashes: int = 32, bands: int = 8,
               seed: int = 7, hash_expr: HashExpr | None = None,
               band_hash_expr: HashExpr | None = None) -> DataFrame:
    """(id_a, id_b, jaccard) repo pairs with file-set Jaccard >=
    threshold. `exact=True` runs the full inverted self-join (oracle /
    small-universe mode); the default is the scale path: MinHash
    signatures -> LSH band candidates -> candidate-first exact verify,
    so the returned jaccard is EXACT either way — LSH only bounds which
    pairs get verified."""
    sh = repo_file_shas(files, repo_col, content_col)
    if exact:
        return jaccard_pairs(sh, None, threshold)
    sig = minhash_signatures(sh, num_hashes, seed, hash_expr)
    cand = lsh_candidate_pairs(sig, bands, num_hashes, band_hash_expr)
    return jaccard_pairs(sh, cand, threshold)


def fork_clusters(files: DataFrame, pairs: DataFrame,
                  repo_col: str = "repo",
                  content_col: str = "content",
                  sh: DataFrame | None = None) -> DataFrame:
    """(repo, cluster_id, canon) — fork families (transitive closure of
    the pair list) with ONE canonical repo per family: the argmax of
    distinct-file count, ties to the lexicographically smallest name.
    Keep canon = 1 rows; a training mix can also use cluster_id to
    downweight instead of drop.

    connected_components labels 64-bit node ids, so string repo names
    ride through xxhash64 (deterministic; a collision needs ~2^32 repos
    by birthday bound — beyond any plausible repo universe) and join
    back to names afterwards. The canonical pick is the struct-max hash
    aggregation (no window, no per-cluster sort), same as
    dedup_clusters' prefer path."""
    # sha256 over the corpus is the pipeline's dominant cost — accept a
    # precomputed sh=repo_file_shas(...) so the fork_pairs pass is not
    # repeated; the helper dedups, so a plain count is the distinct-file
    # count
    if sh is None:
        sh = repo_file_shas(files, repo_col, content_col)
    repos = (sh.groupBy(F.col("id").alias("repo"))
             .agg(F.count("*").alias("n_files")))
    nodes = repos.select(F.xxhash64("repo").alias("id"))
    edges = pairs.select(F.xxhash64("id_a").alias("id_a"),
                         F.xxhash64("id_b").alias("id_b"))
    comp = connected_components(edges, nodes=nodes,
                                src="id_a", dst="id_b")
    labeled = (repos.withColumn("_nid", F.xxhash64("repo"))
               .join(comp, F.col("_nid") == F.col("id"))
               .select("repo", "n_files", F.col("label").alias("cluster_id")))
    # argmax(n_files, tie -> min repo name) via lexicographic struct max;
    # negate nothing — strings don't negate, so invert the tie by using
    # a min-struct on (-n_files, repo)
    key = F.struct((-F.col("n_files")).alias("nn"), F.col("repo").alias("r"))
    winners = (labeled.groupBy("cluster_id")
               .agg(F.min(key).alias("_w"))
               .select("cluster_id", F.col("_w.r").alias("_win")))
    return (labeled.join(winners, "cluster_id")
            .select("repo", "cluster_id",
                    (F.col("repo") == F.col("_win")).cast("int")
                    .alias("canon")))
