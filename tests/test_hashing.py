"""Spark/DuckDB polynomial-hash parity (functions/hashing.py docstring
contract): both engines must produce identical values from the one shared
constant set, or every oracle built on hash injection silently diverges."""

import duckdb
import pytest
from pyspark.sql import functions as F

from spidey_search_engine_spark.functions.hashing import (duck_poly,
                                                          duck_poly64,
                                                          poly_hash,
                                                          poly_hash64)

# edge cases: empty, 1-char, long (>any varint boundary), underscores/digits
# (token charset), repeated chars, punctuation, whitespace controls
CASES = [
    "",
    "a",
    "_",
    "0",
    "z9_",
    "hello world",
    "a" * 300,
    "import numpy as np",
    "MixedCase_09",
    "tab\tand\nnewline",
    "!@#$%^&*()[]{};:'\",.<>/?",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    # non-ASCII: both engines' ascii() yields the full Unicode codepoint
    # (verified, incl. astral-plane), so parity extends past ASCII
    "café",
    "über",
    "中文 tokens",
    "emoji \U0001F600",
]


def _spark_hashes(spark, expr_fn):
    df = spark.createDataFrame([(s,) for s in CASES], "s string")
    return [r["h"] for r in
            df.select(expr_fn(F.col("s")).alias("h")).collect()]


def _duck_hashes(expr_sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(CASES)))
    rows = con.execute(
        f"SELECT {expr_sql} FROM t ORDER BY i").fetchall()
    return [r[0] for r in rows]


def test_poly_hash_parity(spark):
    assert _spark_hashes(spark, poly_hash) == _duck_hashes(duck_poly("s"))


def test_poly_hash64_parity(spark):
    got = _spark_hashes(spark, poly_hash64)
    assert got == _duck_hashes(duck_poly64("s"))
    # bit 63 stays clear → BIGINT shifts/sums behave identically (docstring)
    assert all(0 <= h < (1 << 63) for h in got)


def test_poly_hash_distinguishes_cases(spark):
    vals = _spark_hashes(spark, poly_hash)
    non_empty = vals[1:]
    assert len(set(non_empty)) == len(non_empty)
