#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the Spark parquet result, run
the matching oracle SQL from oracle_sql.json in DuckDB over the sfDir
tables, sort columns by name, and compare row-by-row values.

Dev-only tool (driver-side python); not part of the shipped library.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    import os
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracles):
        sql = oracles[name]
        # dev iteration dumps a subset of queries; a result dir absent
        # entirely is "not dumped this run", not a failure (the driver's
        # full run always dumps everything, so this never hides a miss)
        if not os.path.exists(f"{out_dir}/{name}"):
            n_skip += 1
            continue
        try:
            got_t = pq.read_table(f"{out_dir}/{name}")
            got_cols = sorted(got_t.column_names)
            got = [tuple(norm(row[c]) for c in got_cols) for row in got_t.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp_t = con.execute(sql).fetch_arrow_table()
            exp_cols = sorted(exp_t.column_names)
            exp = [tuple(norm(row[c]) for c in exp_cols) for row in exp_t.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} vs {exp_cols}")
            n_fail += 1
        elif got != exp:
            diff = sum(1 for a, b in zip(got, exp) if a != b) + abs(len(got) - len(exp))
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}, {diff} differing")
            for i, (a, b) in enumerate(zip(got, exp)):
                if a != b:
                    print(f"  first diff row {i}:\n    spark={a}\n    duck ={b}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1

    # rows-only entries (no oracle) — oracle_notes.json carries the
    # machine-readable contract for why each one is unoracled
    try:
        with open(f"{out_dir}/oracle_notes.json") as f:
            notes = json.load(f)
    except Exception:
        notes = {}
    for d in sorted(os.listdir(out_dir)):
        if d.startswith("q") and d not in oracles:
            try:
                n = pq.read_table(f"{out_dir}/{d}").num_rows
                note = notes.get(d, "UNDECLARED — add an oracleNotes entry")
                print(f"ROWS {d}: {n} rows ({note})")
            except Exception as e:
                print(f"FAIL {d}: unreadable: {e}")
                n_fail += 1
    skipped = f", {n_skip} not dumped this run" if n_skip else ""
    print(f"\n{n_pass} pass / {n_fail} fail of {len(oracles)} oracled{skipped}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
