#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry AND its oracle_sql() twin at the given
sf dir, compare row counts, column names, and a value hash (columns
sorted by name, rows sorted, floats pre-rounded by the query itself).

Usage: python tools/check_contract.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # None-safe sort key: mixed None/typed columns would otherwise raise
    # TypeError during sort and crash the gate instead of reporting a
    # mismatch (ADVICE r1)
    canon = sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((v is None, str(type(v)), "" if v is None else str(v)) for v in t),
    )
    h = hashlib.sha256()
    for r in canon:
        h.update(repr(r).encode())
    return h.hexdigest()[:16]


def _canon(v):
    import datetime
    import decimal

    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from dbsyncer_spark.session import get_spark

    con = duckdb.connect()
    con.execute("PRAGMA threads=4")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )

    spark = get_spark("contract_check", cpus=8, shuffle_partitions=8)
    qs = entry.queries()
    oracles = entry.oracle_sql()
    fails = []
    attempted = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        attempted += 1
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"ok~  {name}: rows-only ({len(rows)} rows, no oracle)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {type(e).__name__}: {str(e)[:200]}")
            fails.append(name)
            continue
        problems = []
        if len(rows) != len(orows):
            problems.append(f"rowcount spark={len(rows)} oracle={len(orows)}")
        if sorted(cols) != sorted(ocols):
            problems.append(f"cols spark={sorted(cols)} oracle={sorted(ocols)}")
        if not problems and value_hash(rows, cols) != value_hash(orows, ocols):
            problems.append("value hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            fails.append(name)
        else:
            print(f"ok   {name}: {len(rows)} rows match")
    # tally counts only ATTEMPTED queries — with an only-filter, skipped
    # queries must not read as passes
    print(f"\n{attempted - len(fails)}/{attempted} pass" + (f"; FAILURES: {fails}" if fails else ""))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
