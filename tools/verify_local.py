#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate:
reads Verify's parquet dumps + oracle_sql.json, runs each oracle in
DuckDB over the same sf tables, and diffs (columns sorted by name,
rows sorted by all columns, exact value compare).

Usage: verify_local.py <sfDir> <outDir>
"""
import glob
import json
import math
import sys
from decimal import Decimal

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns, decimals stay objects
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="first",
                            kind="mergesort").reset_index(drop=True)
    return df


def cells_equal(a, b) -> bool:
    """Driver-strict compare: the driver hashes value representations, so
    Decimal('123.40') vs float 123.4, or int vs float, must NOT match.
    Type identity is required; Decimals compare scale-sensitively."""
    if a is None and b is None:
        return True
    try:
        a_na, b_na = bool(pd.isna(a)), bool(pd.isna(b))
        if a_na or b_na:
            return a_na and b_na
    except (TypeError, ValueError):
        pass
    if type(a) is not type(b):
        return False
    if isinstance(a, Decimal):
        return str(a) == str(b)
    if isinstance(a, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if isinstance(a, pd.Timestamp):
        return a == b
    return a == b


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
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        # Declared-type check: fetchdf erases decimal precision (38,2 and
        # 28,2 both become scale-2 Decimals), but the driver hashes the
        # declared type — exactly the r1 failure mode. Compare DESCRIBE
        # output, folding plain integer widths (driver-accepted) while
        # keeping HUGEINT and DECIMAL(p,s) distinct.
        def tsig(t):
            t = t.upper()
            return "INT" if t in ("TINYINT", "SMALLINT", "INTEGER",
                                  "BIGINT") else t
        exp_t = dict(con.execute(f"DESCRIBE {sql}").fetchdf()
                     [["column_name", "column_type"]].values)
        got_t = dict(con.execute(
            f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchdf()
            [["column_name", "column_type"]].values)
        t_bad = [(c, exp_t.get(c), got_t.get(c))
                 for c in sorted(set(exp_t) | set(got_t))
                 if tsig(exp_t.get(c, "?")) != tsig(got_t.get(c, "?"))]
        if t_bad:
            print(f"FAIL {name}: declared-type mismatch {t_bad}")
            n_fail += 1
            continue
        exp, got = norm(exp), norm(got)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} "
                  f"got={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        # Driver evidence (r1): int32 vs int64 hash-equal (q06/q16/q22/...
        # all green), while Decimal scale and int-vs-float do not. So
        # compare dtype KINDS, folding integer widths together.
        def dkind(dt):
            return "i" if dt.kind in "iu" else str(dt)
        dt_bad = [(c, str(exp[c].dtype), str(got[c].dtype))
                  for c in exp.columns
                  if dkind(exp[c].dtype) != dkind(got[c].dtype)]
        if dt_bad:
            print(f"FAIL {name}: dtype mismatch {dt_bad}")
            n_fail += 1
            continue
        bad = []
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                if not cells_equal(a, b):
                    bad.append((c, i, a, b))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell diffs, e.g. {bad}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows, "
                  f"{len(exp.columns)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
