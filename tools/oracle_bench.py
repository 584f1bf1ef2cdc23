#!/usr/bin/env python3
"""Same-host DuckDB oracle timing for the bench artifact.

The 2x perf gate compares engine wall time against the DuckDB oracle on
the SAME host under the SAME conditions, but the driver's artifact only
records the engine side; the judge had to re-measure the oracle manually
every round. This script runs the full oracle statement suite (the same
SQL Verify dumps as oracle_sql.json) under DuckDB on the same parquet,
best-of-N wall seconds, so Bench can embed "oracle_sec" next to the
engine number and the ratio is auditable from the artifact alone.

Usage: oracle_bench.py <oracle_sql.json> <sf_dir> [passes=3]
Prints ONE compact JSON object (no spaces) on the last stdout line —
{"sec":best,"threads":N,"duckdb":"x.y.z","passes":N,"load_before":f,
"load_after":f} — so the artifact self-describes the oracle side's
config and host load (the ratio must be auditable round-over-round).
Any per-statement failures go to stderr and make the exit code non-zero
so a broken oracle can never masquerade as a fast one.
"""
import json
import os
import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sql_path, sf_dir = sys.argv[1], sys.argv[2]
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    with open(sql_path) as f:
        stmts = json.load(f)

    best = None
    failed = set()
    threads = os.cpu_count()
    load_before = round(os.getloadavg()[0], 2)
    for _ in range(passes):
        con = duckdb.connect()
        con.execute(f"SET threads TO {threads}")
        for t in TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        t0 = time.perf_counter()
        for name, q in sorted(stmts.items()):
            try:
                con.execute(q).fetchall()
            except Exception as e:  # noqa: BLE001 — record and keep timing
                if name not in failed:
                    print(f"[oracle] {name} failed: {e}", file=sys.stderr)
                failed.add(name)
        wall = time.perf_counter() - t0
        con.close()
        best = wall if best is None else min(best, wall)

    load_after = round(os.getloadavg()[0], 2)
    print(json.dumps({
        "sec": round(best, 3), "threads": threads,
        "duckdb": duckdb.__version__, "passes": passes,
        "load_before": load_before, "load_after": load_after,
    }, separators=(",", ":")))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
