#!/usr/bin/env python3
"""Self-hosted replica of the driver's DuckDB-oracle compare.

Usage: oracle_check.py SF_DIR VERIFY_OUT_DIR

Reads VERIFY_OUT_DIR/oracle_sql.json (written by graft.Verify). For each
query that has oracle SQL, runs TWO comparisons:

1. canon multiset — load both sides, sort columns by name, canonicalize
   every cell, compare row multisets (semantic equality).
2. pandas-strict — fetch both sides via fetchdf() the way the DRIVER
   does, reject array/list/dict-typed cells (they crash the driver's
   sort_values with "unhashable type: numpy.ndarray"), reject dtype
   mismatches (DuckDB HUGEINT -> float64 vs Spark int64 hashed
   differently in round 1), then sort_values over all columns and
   require frame equality.

Queries without oracle SQL get a rows-present check. A manifest.json of
ALL SparkEntry.queries keys (written by Verify) makes a crashed query —
no parquet dir dumped — a hard failure instead of a silent skip.
Exit 0 iff everything matches.
"""
import datetime
import decimal
import glob
import json
import math
import sys
from collections import Counter

import duckdb
import numpy as np

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


def unhashable_cols(df):
    """Columns whose cells would crash the driver's pandas sort/hash."""
    bad = []
    for c in df.columns:
        if df[c].dtype == object:
            for v in df[c].dropna().head(20):
                if isinstance(v, (np.ndarray, list, tuple, dict)):
                    bad.append(c)
                    break
    return bad


def pandas_strict(con, spark_src, oracle_sql):
    """Replicates the driver: fetchdf both sides, sort columns by name,
    sort_values, require dtype + value equality. Returns error or None."""
    sdf = con.execute(f"SELECT * FROM read_parquet('{spark_src}')").fetchdf()
    odf = con.execute(oracle_sql).fetchdf()
    sdf.columns = [c.lower() for c in sdf.columns]
    odf.columns = [c.lower() for c in odf.columns]
    for df, side in ((sdf, "spark"), (odf, "oracle")):
        bad = unhashable_cols(df)
        if bad:
            return f"array-typed column(s) {bad} on {side} side (driver crash)"
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        return f"columns spark={scols} oracle={ocols}"
    sdf, odf = sdf[scols].copy(), odf[ocols].copy()
    # The driver hashes python VALUES, so int32 vs int64 is fine but
    # float64 vs int64 is not (59123.0 != 59123) — compare dtype KINDS,
    # then normalize widths so frame equality below is width-agnostic.
    sdk = [sdf[c].dtype.kind for c in scols]
    odk = [odf[c].dtype.kind for c in ocols]
    if sdk != odk:
        diff = [
            (c, str(sdf[c].dtype), str(odf[c].dtype))
            for c, a, b in zip(scols, sdk, odk) if a != b
        ]
        return f"dtype kind mismatch {diff} (driver hashes these differently)"
    for c in scols:
        k = sdf[c].dtype.kind
        if k in "iu":
            sdf[c] = sdf[c].astype("int64")
            odf[c] = odf[c].astype("int64")
        elif k == "f":
            sdf[c] = sdf[c].astype("float64")
            odf[c] = odf[c].astype("float64")
    s2 = sdf.sort_values(scols, kind="mergesort").reset_index(drop=True)
    o2 = odf.sort_values(ocols, kind="mergesort").reset_index(drop=True)
    if not s2.equals(o2):
        neq = (s2 != o2) & ~(s2.isna() & o2.isna())
        cols = [c for c in scols if neq[c].any()]
        return f"pandas value mismatch in columns {cols}"
    return None


def selftest():
    """Prove the strict pass catches the two classes of driver failures
    observed in round 1: array-typed output cells and float-vs-int dtype
    kinds (DuckDB HUGEINT sums). Exit 0 iff both are flagged."""
    import tempfile

    con = duckdb.connect()
    tmp = tempfile.mkdtemp()
    con.execute(f"COPY (SELECT 1 AS id, [1,2,3] AS arr) TO '{tmp}/a.parquet'")
    err_arr = pandas_strict(
        con, f"{tmp}/a.parquet", "SELECT 1 AS id, [1,2,3] AS arr"
    )
    con.execute(
        f"COPY (SELECT CAST(5 AS BIGINT) AS s) TO '{tmp}/b.parquet'"
    )
    err_sum = pandas_strict(
        con, f"{tmp}/b.parquet",
        "SELECT sum(x) AS s FROM (SELECT CAST(5 AS INTEGER) AS x)",
    )
    ok = True
    if not (err_arr and "array-typed" in err_arr):
        print(f"SELFTEST FAIL: array column not flagged ({err_arr})")
        ok = False
    if not (err_sum and "dtype kind" in err_sum):
        print(f"SELFTEST FAIL: un-cast HUGEINT sum not flagged ({err_sum})")
        ok = False
    if ok:
        print("SELFTEST PASS: array columns and HUGEINT sums are rejected")
    sys.exit(0 if ok else 1)


def main():
    if sys.argv[1] == "--selftest":
        selftest()
        return
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    with open(f"{out}/oracle_sql.json") as f:
        sqls = json.load(f)
    try:
        with open(f"{out}/manifest.json") as f:
            manifest = json.load(f)
    except FileNotFoundError:
        manifest = []
    ok, bad = 0, []
    for name in sorted(sqls):
        src = f"{out}/{name}/*.parquet"
        try:
            scols, srows = fetch(
                con.execute(f"SELECT * FROM read_parquet('{src}')")
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
        try:
            err = pandas_strict(con, src, sqls[name])
        except Exception as e:  # noqa: BLE001
            err = f"pandas-strict crashed: {e}"
        if err:
            bad.append(f"{name}: STRICT {err}")
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
    # manifest: every declared query key must have dumped a parquet dir
    dumped = {d.rstrip("/").split("/")[-1] for d in glob.glob(f"{out}/*/")}
    for name in manifest:
        if name not in dumped:
            bad.append(f"{name}: declared in manifest but no verify output (crashed?)")
    for b in bad:
        print(f"FAIL {b}")
    print(f"[oracle_check] {ok} oracle-matched, {len(bad)} failed")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
