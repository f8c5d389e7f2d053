#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from Verify's oracle_sql.json in DuckDB over the fixture
parquet tables, loads the Spark result parquet, sorts columns by name, and
compares values exactly (with a small report of near-miss float deltas so we
can see whether any query relies on luck).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            failures += 1
            continue
        want = want.reindex(sorted(want.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
            failures += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            failures += 1
            continue
        ok = True
        for c in want.columns:
            wv, gv = want[c].tolist(), got[c].tolist()
            for i, (w, g) in enumerate(zip(wv, gv)):
                same = (w == g) or (w is None and g is None) \
                    or (isinstance(w, float) and isinstance(g, float)
                        and math.isnan(w) and math.isnan(g)) \
                    or (pd.isna(w) and pd.isna(g))
                if not same:
                    print(f"FAIL {name}: col={c} row={i} want={w!r} got={g!r}")
                    ok = False
                    failures += 1
                    break
            if not ok:
                break
        # report dangerous dtype mismatches even when values match
        for c in want.columns:
            if str(want[c].dtype) != str(got[c].dtype):
                print(f"  note {name}: dtype {c}: duckdb={want[c].dtype} spark={got[c].dtype}")
        if ok:
            print(f"PASS {name} ({len(want)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries pass")
    # self-describing metadata: declared-no-oracle queries carry an
    # engine-side machine check (HLL bound, seeded-order determinism)
    try:
        meta = json.load(open(f"{out_dir}/verify_meta.json"))
    except FileNotFoundError:
        meta = None
    if meta:
        print(f"meta: sf={meta['sf_dir']} spark={meta['spark_version']} "
              f"selected={meta['queries_selected']} "
              f"oracle_backed={meta['oracle_backed']}")
        if meta.get("dump_errors"):
            print(f"FAIL dump errors: {meta['dump_errors']}")
            failures += 1
        for name in meta.get("no_oracle_by_design", []):
            chk = meta.get("engine_checks", {}).get(name)
            if chk is None:
                print(f"FAIL {name}: no_oracle_by_design but no engine check ran")
                failures += 1
            elif not chk.get("passed"):
                print(f"FAIL {name}: engine check failed: {chk}")
                failures += 1
            else:
                print(f"PASS {name} (engine check: {chk})")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
