"""Check a subset of __spark_entry__ gate entries against their DuckDB
oracles (same compare as tools/check_queries.py, filtered).

Usage: python tools/check_one.py NAME [NAME ...] [--sf SF_DIR]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tools.check_queries import canon  # noqa: E402
from webcrawlerfull_spark.session import get_spark  # noqa: E402


def main(names: list[str], sf_dir: str) -> int:
    spark = get_spark(app_name="check-one", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in entrymod._TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name in names:
        got = canon(qs[name](spark, sf_dir).toPandas())
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(got)} rows)")
            continue
        exp = canon(con.execute(oracles[name]).fetchdf())
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
        elif not got.equals(exp):
            import pandas as pd

            diff = (got != exp).any(axis=1)
            print(f"FAIL {name}: value mismatch, first diffs:")
            print(pd.concat([got[diff].head(3), exp[diff].head(3)], keys=["got", "exp"]))
            failures += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    spark.stop()
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        args = args[:i] + args[i + 2 :]
    raise SystemExit(main(args, sf))
