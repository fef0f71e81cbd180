#!/usr/bin/env python3
"""Self-hosted replica of the driver's DuckDB-oracle compare.

Usage: oracle_check.py SF_DIR VERIFY_OUT_DIR

Reads VERIFY_OUT_DIR/oracle_sql.json (written by graft.Verify). For each
query that has oracle SQL: load the Spark result parquet via DuckDB, run
the oracle SQL against the SF_DIR tables, sort columns by name, canonical-
ize every cell, and compare the two row multisets. Queries without oracle
SQL get a rows-present check. Exit 0 iff everything matches.
"""
import datetime
import decimal
import glob
import json
import math
import sys
from collections import Counter

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    """Canonical string for a cell value, so float/Decimal/ts compare cleanly."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def fetch(cur):
    cols = [d[0].lower() for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = Counter()
    for r in cur.fetchall():
        rows[tuple(canon(r[i]) for i in order)] += 1
    return [cols[i] for i in order], rows


def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    with open(f"{out}/oracle_sql.json") as f:
        sqls = json.load(f)
    ok, bad = 0, []
    for name in sorted(sqls):
        try:
            scols, srows = fetch(
                con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
            )
            ocols, orows = fetch(con.execute(sqls[name]))
        except Exception as e:  # noqa: BLE001
            bad.append(f"{name}: ERROR {e}")
            continue
        if scols != ocols:
            bad.append(f"{name}: columns spark={scols} oracle={ocols}")
            continue
        if srows != orows:
            miss = list((orows - srows).items())[:3]
            extra = list((srows - orows).items())[:3]
            bad.append(
                f"{name}: rows spark={sum(srows.values())} oracle={sum(orows.values())}"
                f" missing={miss} extra={extra}"
            )
            continue
        ok += 1
        print(f"PASS {name} ({sum(srows.values())} rows)")
    # rows-only check for oracle-less queries that still dumped output
    for d in sorted(glob.glob(f"{out}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name in sqls:
            continue
        n = con.execute(f"SELECT count(*) FROM read_parquet('{d}*.parquet')").fetchone()[0]
        if n > 0:
            print(f"PASS {name} (rows-only: {n})")
        else:
            bad.append(f"{name}: rows-only check found 0 rows")
    for b in bad:
        print(f"FAIL {b}")
    print(f"[oracle_check] {ok} oracle-matched, {len(bad)} failed")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
