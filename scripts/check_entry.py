"""Local replica of the driver's correctness gate: run each __spark_entry__
query at sf0.01 and compare against its DuckDB oracle (row count, column
names, order-insensitive value hash)."""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    body = df.to_csv(index=False, float_format="%.6f")
    return hashlib.sha256(body.encode()).hexdigest()[:16]


def main(only: list[str] | None = None) -> int:
    import __spark_entry__ as E
    from spidey_search_engine_spark.session import get_spark

    spark = get_spark(app="check-entry", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, os_ = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            failures.append((name, f"spark error: {ex}"))
            print(f"FAIL {name}: spark error: {ex}")
            continue
        sql = os_.get(name)
        if sql is None:
            print(f"SKIP {name}: rows-only ({len(got)} rows)")
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as ex:
            failures.append((name, f"oracle error: {ex}"))
            print(f"FAIL {name}: oracle error: {ex}")
            continue
        g, e = norm(got), norm(exp)
        problems = []
        if list(g.columns) != list(e.columns):
            problems.append(f"columns {list(g.columns)} != {list(e.columns)}")
        if len(g) != len(e):
            problems.append(f"rows {len(g)} != {len(e)}")
        if not problems and value_hash(g) != value_hash(e):
            merged = g.compare(e) if g.shape == e.shape else None
            problems.append(f"value hash mismatch\n{merged}")
        if problems:
            failures.append((name, "; ".join(p.splitlines()[0] for p in problems)))
            print(f"FAIL {name}: " + " | ".join(problems))
        else:
            print(f"OK   {name} ({len(g)} rows)")
    spark.stop()
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
