"""Impact-ordered early-terminated BM25 (operators/impact.py): exact
rank identity with the exhaustive scorer on every route, the termination
route actually firing on a tf-skewed corpus, band/meta consistency, and
the stale-projection guard."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spidey_search_engine_spark.operators.impact import (
    IMPACT_THRESHOLDS, bm25_impact_topk_tokens, load_impact_index,
    write_impact_index)


def _rows(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


@pytest.fixture(scope="module")
def skew_index(spark, tmp_path_factory):
    """800-doc corpus where EVERY doc mentions 'hot' once but every 16th
    repeats it 25x — the hot-only shape block-max range pruning is blind
    to (hot docs in every range), while the tf-saturation bands split it
    cleanly: band 0 holds the 50 heavy docs."""
    from spidey_search_engine_spark.operators.build import (build_index,
                                                            load_index)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    for i in range(800):
        body = base + " hot"
        if i % 16 == 0:
            body += " hot" * 24
        rows.append((i, body + f" doc{i}", f"p{i}.py", "r", "c", "py"))
    out = str(tmp_path_factory.mktemp("skew_idx"))
    corpus = spark.createDataFrame(
        rows, "doc_id long, content string, path string, repo string, "
              "commit string, lang string").repartition(8)
    build_index(spark, corpus, out, profile="code", seg_bits=4,
                n_buckets=8)
    idx = load_index(spark, out)
    write_impact_index(spark, idx, out + "/impact")
    return idx, load_impact_index(spark, out + "/impact")


def test_impact_route_terminates_and_matches(spark, skew_index):
    from spidey_search_engine_spark.operators.search import bm25_topk_tokens
    idx, imp = skew_index
    info = {}
    got = bm25_impact_topk_tokens(spark, idx, imp, ["hot"], k=10,
                                  prune_frac=0.9, route_info=info)
    want = bm25_topk_tokens(spark, idx, ["hot"], k=10)
    assert _rows(got) == _rows(want)
    assert info["route"] == "impact", info
    # the candidate set is the heavy-band docs, nowhere near the corpus
    assert 10 <= info["candidates"] < 200, info


def test_impact_multi_term_and_bag_semantics(spark, skew_index):
    from spidey_search_engine_spark.operators.search import bm25_topk_tokens
    idx, imp = skew_index
    for bag in (["hot", "alpha"], ["hot", "hot"], ["alpha", "beta"],
                ["doc7"], ["zzz_absent"]):
        info = {}
        got = bm25_impact_topk_tokens(spark, idx, imp, bag, k=10,
                                      route_info=info)
        want = bm25_topk_tokens(spark, idx, bag, k=10)
        assert _rows(got) == _rows(want), (bag, info)
    assert bm25_impact_topk_tokens(spark, idx, imp, [], k=5).count() == 0


def test_all_bands_route(spark, skew_index):
    """A term whose postings land in ONE band (uniform tf=1 'alpha'):
    with the fraction fallback disabled the prefix immediately covers
    everything and the partials are returned as exact scores."""
    from spidey_search_engine_spark.operators.search import bm25_topk_tokens
    idx, imp = skew_index
    n_bands = {r["term"]: r["n"] for r in
               imp["meta"].groupBy("term")
               .agg(F.count("*").alias("n")).collect()}
    assert n_bands["alpha"] == 1
    info = {}
    got = bm25_impact_topk_tokens(spark, idx, imp, ["alpha"], k=10,
                                  prune_frac=1.1, route_info=info)
    assert info["route"] == "all_bands"
    assert _rows(got) == _rows(bm25_topk_tokens(spark, idx, ["alpha"],
                                                k=10))


def test_stale_projection_falls_back(spark, skew_index):
    """A query term the impact meta does not know (stale aux index) must
    route exhaustive — a silently wrong tail bound is the one way this
    operator could lose correctness."""
    from spidey_search_engine_spark.operators.search import bm25_topk_tokens
    idx, imp = skew_index
    crippled = dict(imp)
    crippled["meta"] = imp["meta"].filter(F.col("term") != "hot")
    info = {}
    got = bm25_impact_topk_tokens(spark, idx, crippled, ["hot", "alpha"],
                                  k=10, prune_frac=0.9, route_info=info)
    assert info["route"] == "exhaustive"
    assert _rows(got) == _rows(bm25_topk_tokens(spark, idx,
                                                ["hot", "alpha"], k=10))


def test_band_rows_cover_postings_exactly(spark, skew_index):
    """Lossless re-partition: the union of band rows decodes to exactly
    the main index's posting rows (doc_id, tf, important, dl) per term,
    and every posting's saturation respects its band's thresholds."""
    from spidey_search_engine_spark.operators.build import (
        decode_segment_nopos)
    idx, imp = skew_index
    main = {}
    for r in idx["postings"].filter(F.col("term") == "hot") \
            .select("bin").collect():
        d, t, i, dl = decode_segment_nopos(bytes(r["bin"]))
        for a, b, c, e in zip(d, t, i, dl):
            main[int(a)] = (int(b), bool(c), int(e))
    banded = {}
    thr = sorted(IMPACT_THRESHOLDS)
    from spidey_search_engine_spark.operators.build import K1, B
    avgdl = float(idx["stats"]["avgdl"])
    for r in imp["rows"].filter(F.col("term") == "hot") \
            .select("band", "bin").collect():
        d, t, i, dl = decode_segment_nopos(bytes(r["bin"]))
        for a, b, c, e in zip(d, t, i, dl):
            banded[int(a)] = (int(b), bool(c), int(e))
            s = b / (b + K1 * (1 - B + B * e / avgdl))
            band = len(thr) - int(np.searchsorted(thr, s, side="right"))
            assert band == r["band"], (a, s, band, r["band"])
    assert banded == main and main


def test_cli_impact_query(spark, tmp_path, capsys):
    """build --impact-index materializes the bands; query --impact
    returns exactly the plain ranker's rows; without the index the flag
    answers exhaustively (same rows); a rebuild without the flag removes
    the now-stale bands."""
    import json
    import os
    import shutil

    from spidey_search_engine_spark.cli import main

    rows = []
    for i in range(64):
        body = "alpha beta hot" + (" hot" * 24 if i % 8 == 0 else "")
        rows.append((i, body + f" doc{i}", f"p{i}.py", "r", "c", "py"))
    src = str(tmp_path / "in")
    idx = str(tmp_path / "idx")
    spark.createDataFrame(
        rows, "doc_id long, content string, path string, repo string, "
              "commit string, lang string").coalesce(2).write.parquet(src)
    rc = main(["build", "--input", src, "--output", idx,
               "--profile", "code", "--seg-bits", "4", "--n-buckets", "4",
               "--impact-index"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["impact_index"] is True
    assert os.path.exists(os.path.join(idx, "impact", "meta.json"))

    rc = main(["query", "--index", idx, "--q", "hot alpha", "--k", "5",
               "--impact"])
    assert rc == 0
    got = [json.loads(ln) for ln in
           capsys.readouterr().out.strip().splitlines()]
    rc = main(["query", "--index", idx, "--q", "hot alpha", "--k", "5"])
    assert rc == 0
    want = [json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == \
        [(r["doc_id"], round(r["score"], 9)) for r in want] and len(got) == 5

    # --impact without a materialized index: exhaustive answer, same rows
    shutil.rmtree(os.path.join(idx, "impact"))
    rc = main(["query", "--index", idx, "--q", "hot alpha", "--k", "5",
               "--impact"])
    assert rc == 0
    assert [json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()] == want

    # mode exclusivity fails fast
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        main(["query", "--index", idx, "--q", "hot", "--impact",
              "--pruned"])
    capsys.readouterr()

    # rebuild WITHOUT the flag removes the stale bands
    rc = main(["build", "--input", src, "--output", idx,
               "--profile", "code", "--seg-bits", "4", "--n-buckets", "4",
               "--impact-index"])
    assert rc == 0
    capsys.readouterr()
    rc = main(["build", "--input", src, "--output", idx,
               "--profile", "code", "--seg-bits", "4", "--n-buckets", "4"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats.get("stale_impact_index_removed") is True
    assert not os.path.exists(os.path.join(idx, "impact"))
