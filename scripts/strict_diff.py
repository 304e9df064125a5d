#!/usr/bin/env python3
"""Strict comparison for debugging driver hash mismatches.

Unlike oracle_check.py (9dp float tolerance), this compares EXACT values and
prints the first differing cell with full repr + python type, to expose
representation-level differences (float ulps, Decimal scale, int vs float,
date vs datetime) that a value-hash comparator would flag.

Usage: python3 scripts/strict_diff.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb

def canon(rows):
    return sorted([tuple(r) for r in rows],
                  key=lambda r: tuple((x is None, str(x)) for x in r))

def main(sf_dir, out_dir, names):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    for name in names:
        if name not in oracle:
            print(f"{name}: no oracle")
            continue
        got_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        exp_rel = con.sql(oracle[name])
        cols = sorted(got_rel.columns)
        got = canon(got_rel.project(", ".join(cols)).fetchall())
        exp = canon(exp_rel.project(", ".join(cols)).fetchall())
        ndiff = 0
        for i, (g, e) in enumerate(zip(got, exp)):
            if g != e or any(type(a) is not type(b) for a, b in zip(g, e)):
                for j, (a, b) in enumerate(zip(g, e)):
                    if a != b or type(a) is not type(b):
                        if ndiff < 3:
                            print(f"{name} row{i} col={cols[j]}: spark={a!r} ({type(a).__name__}) duck={b!r} ({type(b).__name__})")
                        ndiff += 1
        # also compare string forms the way a hasher would
        sg = [tuple(str(v) for v in r) for r in got]
        se = [tuple(str(v) for v in r) for r in exp]
        strdiff = sum(1 for a, b in zip(sg, se) if a != b)
        print(f"{name}: {ndiff} exact-cell diffs, {strdiff} str-row diffs over {len(got)} rows")

if __name__ == "__main__":
    qs = sys.argv[3:] or ["e01_tumbling_hour", "e04_sessionize", "e07_json_struct",
        "h03_shipping_priority", "h05_local_supplier", "h10_returned_items",
        "q25_join_star", "q32_agg_having", "q71_scalar_math", "t05_corpus_stats"]
    main(sys.argv[1], sys.argv[2], qs)
