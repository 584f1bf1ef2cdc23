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
import pandas as pd


def _isna_scalar(v):
    try:
        r = pd.isna(v)
        return r if isinstance(r, (bool, np.bool_)) else False
    except Exception:
        return False

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def compare(name, ours, oracle):
    """STRICT compare emulating the driver's gate (CORRECTNESS_r01 lessons):
    rows sorted via pandas sort_values over all columns (crashes on raw
    array/struct cells exactly like the driver's comparator — surfaced as
    HARNESS-ERR), dtypes compared exactly, values compared exactly with no
    str() fallback and no float tolerance (NaN == NaN only)."""
    ocols = sorted(oracle.columns)
    scols = sorted(ours.columns)
    if ocols != scols:
        return f"COLUMN MISMATCH spark={scols} oracle={ocols}"
    if len(ours) != len(oracle):
        return f"ROWCOUNT MISMATCH spark={len(ours)} oracle={len(oracle)}"
    ours = ours[ocols]
    oracle = oracle[ocols]
    try:
        ours = ours.sort_values(by=ocols, kind="mergesort").reset_index(drop=True)
        oracle = oracle.sort_values(by=ocols, kind="mergesort").reset_index(drop=True)
    except (TypeError, ValueError) as e:
        # object columns holding numpy arrays raise ValueError ("truth
        # value of an array is ambiguous"), not just TypeError
        return f"HARNESS-ERR (driver comparator would crash): {e}"
    # Driver-observed rule (r01): integer WIDTH diffs hash equal (w1_ranking
    # int32-vs-int64 passed) but KIND diffs fail (f_math int-vs-float,
    # BIGINT-vs-HUGEINT/object failed). Compare numpy dtype kinds.
    def kind(t):
        k = t.kind
        return "i" if k in "iu" else k
    sd, od = [kind(t) for t in ours.dtypes], [kind(t) for t in oracle.dtypes]
    if sd != od:
        diffs = [f"{c}: spark={a}({ta}) oracle={b}({tb})"
                 for c, a, b, ta, tb in zip(ocols, sd, od, ours.dtypes, oracle.dtypes)
                 if a != b]
        return f"DTYPE-KIND MISMATCH {'; '.join(diffs)}"
    for c in ocols:
        a, b = list(ours[c]), list(oracle[c])
        for i, (x, y) in enumerate(zip(a, b)):
            try:
                if _isna_scalar(x) and _isna_scalar(y):
                    continue
                differs = x != y
                if hasattr(differs, "any"):  # array cell → elementwise result
                    differs = bool(getattr(differs, "any")())
            except (TypeError, ValueError) as e:
                return f"HARNESS-ERR (driver comparator would crash): {e}"
            if differs:
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
        names = " ".join(sorted(only))
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir} {names}'.strip()],
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
        # driver fixtures are single files; ScaleGen corpora are
        # directories of part files — register either layout
        p = Path(sf_dir) / f"{t}.parquet"
        src = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

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
