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


# DuckDB output types whose stringification DIVERGES between the local
# mirror's fetchall() (python int -> "8930") and the driver's pandas/arrow
# fetch path (float64 -> "8930.0"). An oracle projecting one of these can
# pass this mirror yet hash-mismatch at the driver gate with rows/schema
# green -- the r9-r11 "q106 ghost" (VERDICT r11 #1: uncast sum(BIGINT) is
# HUGEINT). DECIMAL is in the class because pandas renders it via float.
BANNED_TYPE_PREFIXES = ("HUGEINT", "UHUGEINT", "DECIMAL")
INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def type_class(t):
    """Collapse a DuckDB type name to the class the driver's hash compare
    actually stringifies by (long vs double vs string vs ...)."""
    t = t.upper()
    if t in INT_TYPES:
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL") or t.startswith("DECIMAL"):
        return "float"
    if t in ("VARCHAR", "TEXT", "STRING", "UUID"):
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t == "DATE":
        return "date"
    return t.lower()


def lint_oracle_types(con, oracle):
    """DESCRIBE every oracle and fail on output column types the driver's
    pandas/arrow fetch path stringifies differently from this mirror's
    fetchall(). Returns (list of offending strings, {name: [(col, type)]})."""
    bad, types = [], {}
    for name in sorted(oracle):
        try:
            rows = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            bad.append(f"{name}: DESCRIBE failed: {e}")
            continue
        types[name] = [(r[0], str(r[1]).upper()) for r in rows]
        for col, typ in types[name]:
            if typ.startswith(BANNED_TYPE_PREFIXES):
                bad.append(f"{name}.{col}: {typ}")
    return bad, types


def lint_null_ints(name, cols, rows):
    """A NULL in an integer column makes pandas promote the whole column
    to float64 on the driver's fetch path (same "8930.0" hazard); the
    mirror's fetchall() renders python ints and can't see it. Flag any
    integer-typed oracle column that actually contains a NULL."""
    bad = []
    by_col = {c: i for i, (c, _) in enumerate(cols)}
    for c, t in cols:
        i = by_col[c]
        if t in INT_TYPES and any(r[i] is None for r in rows):
            bad.append(f"{name}.{c}: NULL in {t} column")
    return bad


def lint_type_classes(name, con, res_glob, oracle_types):
    """The Spark result parquet and the oracle must agree on each column's
    stringification CLASS (long vs double vs string ...) -- a value-equal
    pair like 8930 (long) vs 8930.0 (double) hashes differently at the
    driver even though fetchall() canonicalization may mask it here."""
    try:
        rows = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{res_glob}')").fetchall()
    except Exception as e:
        return [f"{name}: result DESCRIBE failed: {e}"]
    got = sorted((r[0], type_class(str(r[1]))) for r in rows)
    exp = sorted((c, type_class(t)) for c, t in oracle_types)
    if [g[0] for g in got] != [e[0] for e in exp]:
        return []  # column-name mismatch is reported by the main compare
    return [f"{name}.{g[0]}: spark {g[1]} vs oracle {e[1]}"
            for g, e in zip(got, exp) if g[1] != e[1]]


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    type_bad, oracle_types = lint_oracle_types(con, oracle)
    for b in type_bad:
        print(f"FAIL type-lint {b}")
    # One failure per flagged QUERY, and skip its row compare entirely:
    # this mirror's fetchall() canonicalization masks the driver-side
    # divergence the lint exists to catch, so running the compare could
    # print a misleading PASS beside the FAIL type-lint line and make
    # n_pass + n_fail exceed the oracle count (ADVICE r12).
    lint_flagged = {b.split(":")[0].split(".")[0] for b in type_bad}
    n_fail += len(lint_flagged)
    for name in sorted(oracle):
        if name in lint_flagged:
            continue
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
        lint = []
        if name in oracle_types:
            lint += lint_null_ints(name, oracle_types[name], exp_rows)
            lint += lint_type_classes(name, con, res_glob, oracle_types[name])
        if lint:
            for b in lint:
                print(f"FAIL type-lint {b}")
            n_fail += 1
            continue
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
