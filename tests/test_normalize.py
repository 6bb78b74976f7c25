"""P33 unicode normalization: Spark kernel ≡ python unicodedata reference,
plus DuckDB-parity of the shared control-strip pattern."""

import unicodedata

import pytest
from pyspark.sql import functions as F

from spidey_search_engine_spark.functions.normalize import (
    CONTROL_CLASS, duck_normalize_sql, normalize_expr, normalize_text)

# decomposed é | ligature ﬁ | Hangul jamo | compose-less e+ring | controls
# | plain ASCII | empty | angstrom sign (NFC maps U+212B -> U+00C5)
CASES = [
    "caf" + chr(101) + chr(769),
    "ﬁle",
    "각",
    "e̊q",
    "a\x01b\x1fc\x7fd\te\nf",
    "plain ascii only",
    "",
    "Ångström",
]


def _py_ref(s, form="NFC", strip=True):
    import re
    out = unicodedata.normalize(form, s)
    if strip:
        out = re.sub(CONTROL_CLASS, "", out)
    return out


@pytest.mark.parametrize("form", ["NFC", "NFKC", "NFD"])
def test_matches_unicodedata(spark, form):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)],
                               "id long, content string")
    out = normalize_text(df, "content", out_col="norm", form=form)
    got = {r["id"]: r["norm"] for r in out.collect()}
    for i, s in enumerate(CASES):
        assert got[i] == _py_ref(s, form), (form, i, repr(s))


def test_null_passthrough_and_changed_flag(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "plain"), (2, "x\x01y"), (3, "caf" + chr(101) + chr(769))],
        "id long, content string")
    out = normalize_text(df, "content", with_changed=True).collect()
    rows = {r["id"]: r for r in out}
    assert rows[0]["content"] is None and rows[0]["content_changed"] == 0
    assert rows[1]["content"] == "plain" and rows[1]["content_changed"] == 0
    assert rows[2]["content"] == "xy" and rows[2]["content_changed"] == 1
    assert rows[3]["content"] == "café" and rows[3]["content_changed"] == 1


def test_overwrite_keeps_single_udf_eval(spark):
    """Overwriting text_col with with_changed must not compare the output
    to itself (the changed flag comes from the pre-overwrite text)."""
    df = spark.createDataFrame([(0, "a\x01b")], "id long, t string")
    r = normalize_text(df, "t", with_changed=True).collect()[0]
    assert r["t"] == "ab" and r["t_changed"] == 1
    assert "__t_normalized" not in normalize_text(df, "t").columns


def test_duckdb_parity_full_pipeline(spark):
    """Same bytes through Spark normalize_expr and the oracle SQL builder."""
    import duckdb
    con = duckdb.connect()
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)],
                               "id long, content string")
    got = {r["id"]: r["n"] for r in df.select(
        "id", normalize_expr(F.col("content")).alias("n")).collect()}
    for i, s in enumerate(CASES):
        want = con.execute(f"SELECT {duck_normalize_sql('$1')}",
                           {"1": s}).fetchone()[0]
        assert got[i] == want, (i, repr(s))


def test_bad_form_rejected(spark):
    df = spark.createDataFrame([(0, "x")], "id long, content string")
    with pytest.raises(ValueError):
        normalize_text(df, "content", form="NFX")
    with pytest.raises(ValueError):
        duck_normalize_sql("content", form="NFKC")


def test_cli_clean_normalize_stage(spark, tmp_path, capsys):
    """--normalize NFC makes an NFD copy exactly dedupe against its NFC
    twin (the motivating composition), and controls are stripped."""
    import json
    from spidey_search_engine_spark.cli import main

    rows = [(0, "café body shared"),          # precomposed é
            (1, "café body shared"),          # NFD twin of doc 0
            (2, "unique\x01 doc with a control")]
    src, dst = str(tmp_path / "in"), str(tmp_path / "out")
    spark.createDataFrame(rows, "doc_id long, content string") \
        .coalesce(1).write.parquet(src)
    rc = main(["clean", "--input", src, "--output", dst,
               "--normalize", "NFC", "--exact-dedup"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["docs_in"] == 3 and stats["docs_out"] == 2
    out = {r["doc_id"]: r["content"]
           for r in spark.read.parquet(dst).collect()}
    assert set(out) == {0, 2}           # exact dedup keeps the lower id
    assert out[0] == "café body shared"
    assert out[2] == "unique doc with a control"
