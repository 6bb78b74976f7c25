"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (engine-built inverted index → BM25
top-10) on sf0.001; ``queries``/``oracle_sql`` pair every implemented
operator (SURVEY.md §2) with a DuckDB-runnable ANSI-SQL oracle. Engine code
lives in spidey_search_engine_spark/; this file is only the contract glue.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spidey_search_engine_spark import entry_queries as EQ

# Driver-side correctness gates verify the FIRST 50 entries of queries()
# in dict order. The window is SELF-COMPUTING: the tail (entries already
# proven green by some prior round) is derived at import time from the
# committed CORRECTNESS_r0*.json files — a key counts as green only when
# rows_match, schema_match AND hash_match are all true in at least one
# round. Everything else ("fresh": never driver-green) is ordered FIRST,
# newest registration first, so a brand-new entry always lands at the head
# of the window with no hand edit; remaining slots fill from the tail in
# registration order. No hand-maintained frozenset — the rotation that
# round 4's verdict flagged as one-round-stale cannot go stale again.


def _driver_green_keys() -> frozenset:
    import glob
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, 'CORRECTNESS_r*.json'))):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for key, row in rows.items():
            if not isinstance(row, dict):
                continue
            if (row.get('rows_match') is True
                    and row.get('schema_match') is True
                    and row.get('hash_match') is True):
                green.add(key)
    return frozenset(green)


_WINDOW_TAIL = _driver_green_keys()


def _window_ordered(d: dict) -> dict:
    fresh_keys = [k for k in d if k not in _WINDOW_TAIL]
    fresh_keys.reverse()  # newest registration first — never behind the cut
    fresh = {k: d[k] for k in fresh_keys}
    seen = {k: v for k, v in d.items() if k in _WINDOW_TAIL}
    return {**fresh, **seen}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the inverted index over /root/testdata/sf0.001
    documents (simple profile), score BM25 for a fixed multi-term query via
    compressed-posting decode, return top-10 (doc_id, score_r)."""
    return EQ.bm25_topk_fixed(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _window_ordered(dict(EQ.QUERIES))


def oracle_sql() -> dict[str, str]:
    # same key order as queries() so any order-sensitive driver pairing
    # sees identical windows
    ordered_q = _window_ordered(dict(EQ.QUERIES))
    out = {k: EQ.ORACLE_SQL[k] for k in ordered_q if k in EQ.ORACLE_SQL}
    out.update({k: v for k, v in EQ.ORACLE_SQL.items() if k not in out})
    return out
