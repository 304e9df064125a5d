#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB correctness gate.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

For each <name>.parquet dir under verifyOutDir, runs the matching SQL from
oracle_sql.json in DuckDB (tables = parquet files in sfDir), then compares:
  - schema (column names, sorted)
  - row count
  - values (columns sorted by name, rows sorted, EXACT match — no float
    tolerance: the driver hashes exact values, so tolerance here would
    hide real mismatches)

This is a local feedback loop only — the library itself never uses Python.
"""
import json, sys, glob, os
import duckdb

def norm(v):
    # exact compare: the driver hashes exact values, so any tolerance here
    # hides real mismatches (learned in round 1)
    return v

def canon(rows):
    return sorted([tuple(norm(v) for v in r) for r in rows], key=lambda r: tuple((x is None, str(x)) for x in r))

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    # a query that crashed in Verify never produced an output dir — that
    # must FAIL the gate, not silently skip the comparison
    produced = {os.path.basename(q.rstrip("/")) for q in glob.glob(f"{out_dir}/*/")}
    for name in sorted(set(oracle) - produced):
        print(f"FAIL {name}: query produced no output (crashed in Verify?)")
        n_fail += 1
    # Verify's explicit failure manifest covers NON-oracle queries too —
    # a crashed rows-only query has no oracle entry AND no dir, which the
    # set difference above cannot see
    failed_path = f"{out_dir}/_failed.json"
    if os.path.exists(failed_path):
        for name in json.load(open(failed_path)):
            if name not in oracle:  # oracle names already FAILed above
                print(f"FAIL {name}: crashed in Verify (no oracle to miss)")
                n_fail += 1
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        try:
            got_rel = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            if name not in oracle:
                print(f"SKIP {name}: no oracle (rows={len(got_rel.fetchall())})")
                n_skip += 1
                continue
            exp_rel = con.sql(oracle[name])
        except Exception as e:
            # one bad oracle SQL (syntax, missing view) must FAIL that
            # query, not abort the loop and leave every later query
            # unchecked with no summary line
            print(f"FAIL {name}: oracle execution error: {e}")
            n_fail += 1
            continue
        # Driver-parity type audit: the driver's pandas bridge renders DuckDB
        # HUGEINT/DECIMAL as floats while Spark parquet DECIMAL keeps its
        # scale ("1234.50" vs "1234.5") — either type in a result column
        # means the driver's hash can mismatch even when values are equal.
        # Cast sums to BIGINT / final money to DOUBLE in the query instead.
        bad_types = [f"{c}:{t}" for c, t in zip(exp_rel.columns, map(str, exp_rel.types))
                     if str(t) == "HUGEINT" or str(t).startswith("DECIMAL")]
        bad_types += [f"{c}:{t}" for c, t in zip(got_rel.columns, map(str, got_rel.types))
                      if str(t).startswith("DECIMAL")]
        if bad_types:
            print(f"FAIL {name}: driver-unsafe result types {bad_types}")
            n_fail += 1
            continue
        got_cols = sorted(got_rel.columns)
        exp_cols = sorted(exp_rel.columns)
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns differ got={got_cols} exp={exp_cols}")
            n_fail += 1
            continue
        got = canon(got_rel.project(", ".join(got_cols)).fetchall())
        exp = canon(exp_rel.project(", ".join(exp_cols)).fetchall())
        if len(got) != len(exp):
            print(f"FAIL {name}: rowcount got={len(got)} exp={len(exp)}")
            n_fail += 1
            continue
        bad = [(g, e) for g, e in zip(got, exp) if g != e]
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: got={bad[0][0]} exp={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
