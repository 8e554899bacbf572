#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify first
(writes <outdir>/<query>.parquet dirs + oracle_sql.json), then this script
compares each Spark result against DuckDB executing the oracle SQL over
the same source tables.

Usage: python3 tools/check_oracles.py <sfdir> <outdir>
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Sort columns by name, then rows by stringified values."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_glob = os.path.join(outdir, name, "*.parquet")
        files = glob.glob(res_glob)
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{res_glob}')")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        try:
            exp = con.execute(oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        exp_cols = [d[0] for d in exp.description]
        exp_rows = exp.fetchall()
        gc, gr = canon(got_rows, got_cols)
        ec, er = canon(exp_rows, exp_cols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
        elif len(gr) != len(er):
            print(f"FAIL {name}: {len(gr)} rows != {len(er)}")
            n_fail += 1
        elif gr != er:
            bad = next(i for i in range(len(gr)) if gr[i] != er[i])
            print(f"FAIL {name}: first diff row {bad}:\n  spark={gr[bad]}\n  duck ={er[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
