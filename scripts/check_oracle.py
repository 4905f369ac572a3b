#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB over the
sfDir parquet tables, then compares: columns sorted by name, rows sorted,
floats rounded to 4 decimals. Prints PASS/FAIL per query.

Dev-only tool (driver-side python); not part of the Scala library.
"""
import sys, os, json, math
import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rel):
    """Canonicalize via pandas like the driver does: dtype-sensitive.

    DuckDB HUGEINT (sum of BIGINT) becomes float64 in pandas while
    Spark's int64 stays int64 — repr "123.0" vs "123" must FAIL here
    exactly as it fails the driver's hash (cf. q12_json round 1).
    """
    df = rel.df()
    cols = sorted(df.columns)
    df = df[cols]
    out = []
    for row in df.itertuples(index=False, name=None):
        vals = []
        for v in row:
            if isinstance(v, (float, np.floating)):
                v = float(v)
                v = "NaN" if math.isnan(v) else round(v, 4)
            elif isinstance(v, (int, np.integer)):
                v = int(v)
            elif isinstance(v, np.ndarray):
                v = v.tolist()
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return cols, out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        try:
            got = con.sql(f"SELECT * FROM '{d}/*.parquet'")
            gcols, grows = canon(got)
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1; continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only check: {len(grows)} rows)")
            continue
        try:
            exp = con.sql(oracles[name])
            ecols, erows = canon(exp)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1; continue
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != oracle {ecols}")
            n_fail += 1
        elif grows != erows:
            diff = [(a, b) for a, b in zip(grows, erows) if a != b][:3]
            print(f"FAIL {name}: {len(grows)} vs {len(erows)} rows; first diffs: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
