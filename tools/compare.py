#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness check.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [only_prefix]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB 1.0.0 with every fixture table registered as a bare
view, and compares values against the Spark-written parquet in
<verifyOutDir>/<name>/. Columns are sorted by name before compare (driver
behavior); row ORDER is compared strictly, so every oracle query must end
in a total ORDER BY on both sides. Floats are compared EXACTLY.
"""
import sys, os, glob, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Keys allowed to return ZERO rows (a 0-row result hash-matching a 0-row
# oracle is a vacuous pass — round 10 found six such keys; all were given
# non-empty fixtures in round 11, so this list is EMPTY. Add a key here
# only with a comment proving its empty result is the semantics itself.)
ZERO_ROW_ALLOWLIST: set = set()


def norm(v):
    import datetime
    import numpy as np
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, np.ndarray):
        return tuple(norm(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = sys.argv[3] if len(sys.argv) > 3 else ""
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out}/oracle_sql.json") as f:
        oracle = json.load(f)
    ok, fails = [], []
    for name in sorted(oracle):
        if only and not name.startswith(only):
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            fails.append((name, "no spark output")); continue
        try:
            got = con.execute(
                "SELECT * FROM read_parquet(?)", [files]).fetchdf()
        except Exception as e:
            fails.append((name, f"spark parquet read error: {e}")); continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            fails.append((name, f"oracle sql error: {e}")); continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            fails.append((name, f"cols spark={list(got.columns)} oracle={list(exp.columns)}"))
            continue
        if len(got) != len(exp):
            fails.append((name, f"rowcount spark={len(got)} oracle={len(exp)}"))
            continue
        bad = None
        for c in got.columns:
            a = [norm(v) for v in got[c].tolist()]
            b = [norm(v) for v in exp[c].tolist()]
            if a != b:
                for i, (x, y) in enumerate(zip(a, b)):
                    if x != y:
                        bad = f"col {c} row {i}: spark={x!r} oracle={y!r}"
                        break
                break
        if bad:
            fails.append((name, bad))
        elif len(got) == 0 and name not in ZERO_ROW_ALLOWLIST:
            fails.append((name, "vacuous pass: 0 rows on both sides "
                                "(not in ZERO_ROW_ALLOWLIST)"))
        else:
            ok.append(name)
    for n in ok:
        print(f"PASS {n}")
    for n, why in fails:
        print(f"FAIL {n}: {why}")
    print(f"\n{len(ok)} pass, {len(fails)} fail")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
