#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev-only; the
shipped engine is pure Scala/Spark — this uses the driver-side python
stack to pre-verify oracle parity before each round).

Usage: python3 tools/diffcheck.py [sfDir] [outDir] [--no-verify] [names...]
 1. runs `sbt "runMain graft.Verify <sfDir> <outDir>"` (unless --no-verify)
 2. registers the fixture parquet as DuckDB views
 3. runs each oracle_sql.json entry, compares with the Spark parquet dump:
    columns sorted by name, values compared exactly, row order as produced.
"""
import json, subprocess, sys, math
from pathlib import Path

import duckdb
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, np.ndarray):
        return tuple(norm_cell(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple((k, norm_cell(x)) for k, x in sorted(v.items()))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def compare(name, ours, oracle):
    ocols = sorted(oracle.columns)
    scols = sorted(ours.columns)
    if ocols != scols:
        return f"COLUMN MISMATCH spark={scols} oracle={ocols}"
    if len(ours) != len(oracle):
        return f"ROWCOUNT MISMATCH spark={len(ours)} oracle={len(oracle)}"
    ours = ours[ocols]
    oracle = oracle[ocols]
    for c in ocols:
        a, b = list(ours[c]), list(oracle[c])
        for i, (x, y) in enumerate(zip(a, b)):
            x, y = norm_cell(x), norm_cell(y)
            if x != y and str(x) != str(y):
                note = ""
                if isinstance(x, float) and isinstance(y, float) and y and abs(x - y) / max(abs(y), 1e-300) < 1e-9:
                    note = " (within 1e-9 rel — float-order issue)"
                return f"VALUE MISMATCH col={c} row={i}: spark={x!r} oracle={y!r}{note}"
    return None


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"
    only = set(args[2:])

    if "--no-verify" not in flags:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
            cwd="/root/repo", capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-4000:])
            print(r.stderr[-4000:])
            sys.exit(1)
        for line in r.stdout.splitlines():
            if "[verify]" in line:
                print(line)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    oracle_sql = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_ok = n_fail = 0
    q_names = sorted(set(list(oracle_sql) +
                         [p.name for p in Path(out_dir).iterdir() if p.is_dir()]))
    for name in q_names:
        if only and name not in only:
            continue
        spark_dir = Path(out_dir) / name
        if not spark_dir.is_dir():
            print(f"FAIL {name}: spark output missing (query errored)")
            n_fail += 1
            continue
        if name not in oracle_sql:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{spark_dir}/*.parquet')").fetchone()[0]
            print(f"....  {name}: no oracle (rows-only check, {n} rows)")
            continue
        try:
            oracle = con.execute(oracle_sql[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle errored: {str(e)[:200]}")
            n_fail += 1
            continue
        ours = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
        err = compare(name, ours, oracle)
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"OK    {name} ({len(ours)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
