#!/usr/bin/env python3
"""Function-surface audit: enumerate EVERY scalar/aggregate function the
DuckDB 1.0 oracle exposes (duckdb_functions()), synthesize a
trivially-typed call per overload, keep what DuckDB itself accepts, run
the identical call through the Gateway (graft.FuzzEval), and classify:

  AGREE      — both engines return the same value (type-aware tolerance)
  NONDET-OK  — both return SOMETHING for a known-nondeterministic fn
  KIND-DIFF  — both return values, they differ (listed for triage)
  ENGINE-ERR — DuckDB serves it, the gateway refuses (the coverage gap)

This audits the 604-name function surface EXHAUSTIVELY where the
fuzzers sample it; the ENGINE-ERR list is the honest inventory of what
a DuckDB 1.0 user would find missing. Usage:
  python3 tools/audit_functions.py [--no-run]
Writes /tmp/fn_audit/{calls.txt,engine.jsonl} and prints the report.
"""
import itertools, json, math, re, subprocess, sys
from pathlib import Path

import duckdb

SAMPLE = {
    "ANY": "3", "INTEGER": "3", "BIGINT": "3", "SMALLINT": "3",
    "TINYINT": "3", "HUGEINT": "CAST(3 AS HUGEINT)",
    "UBIGINT": "CAST(3 AS UBIGINT)", "UINTEGER": "CAST(3 AS UINTEGER)",
    "USMALLINT": "CAST(3 AS USMALLINT)", "UTINYINT": "CAST(3 AS UTINYINT)",
    "UHUGEINT": "CAST(3 AS UHUGEINT)",
    "DOUBLE": "1.5", "FLOAT": "CAST(1.5 AS FLOAT)", "DECIMAL": "1.25",
    "VARCHAR": "'abc'", "BOOLEAN": "true",
    "DATE": "DATE '2024-03-05'",
    "TIMESTAMP": "TIMESTAMP '2024-03-05 06:07:08'",
    "TIMESTAMP WITH TIME ZONE": "TIMESTAMPTZ '2024-03-05 06:07:08'",
    "TIME": "TIME '10:11:12'",
    "INTERVAL": "INTERVAL 3 DAY",
    "JSON": "'{\"a\": 1}'",
    "BLOB": "'AB'::BLOB",
    "ANY[]": "[1, 2, 3]", "BIGINT[]": "[1, 2, 3]",
    "INTEGER[]": "[1, 2, 3]", "DOUBLE[]": "[1.5, 2.5]",
    "FLOAT[]": "[CAST(1.5 AS FLOAT), CAST(2.5 AS FLOAT)]",
    "VARCHAR[]": "['a', 'b']", "BOOLEAN[]": "[true, false]",
    "ANY[][]": "[[1], [2]]",
    "STRUCT": "{'a': 1}",
}

# value-nondeterministic or environment-dependent: both engines must
# ANSWER, values not compared
NONDET = {
    "random", "uuid", "uuidv4", "uuidv7", "gen_random_uuid", "now",
    "current_date", "today", "get_current_time", "get_current_timestamp",
    "current_timestamp", "current_localtime", "current_localtimestamp",
    "transaction_timestamp", "current_schema", "current_schemas",
    "current_database", "current_query", "current_user", "user",
    "version", "pg_postmaster_start_time", "txid_current",
    "current_setting", "hash", "icu_sort_key", "md5_number",
    "md5_number_lower", "md5_number_upper", "vector_type", "uuid_string",
    "pg_conf_load_time", "current_catalog",
    # generator macro: multi-row result, outside this scalar compare
    "regexp_split_to_table",
}

SKIP_NAME = re.compile(r"^(__internal|\W|\$|combine$|finalize$|nobody)")


def main():
    con = duckdb.connect()
    rows = con.sql(
        "SELECT function_name, function_type, parameter_types "
        "FROM duckdb_functions() WHERE function_type IN ('scalar','aggregate')"
    ).fetchall()
    calls = {}
    undeclared = set()
    for name, ftype, ptypes in rows:
        if not re.match(r"^[a-z_][a-z0-9_]*$", name) or SKIP_NAME.match(name):
            continue
        if name in calls:
            continue
        args = []
        ok = True
        for t in ptypes or []:
            lit = SAMPLE.get(t)
            if lit is None:
                ok = False
                break
            args.append(lit)
        if not ok:
            undeclared.add(name)
            continue
        call = f"{name}({', '.join(args)})"
        try:
            con.sql(f"SELECT {call} AS v").fetchall()
        except Exception:
            undeclared.add(name)
            continue
        calls[name] = call
        undeclared.discard(name)
    # MACROS (round-10 stage 3): untyped parameters, so probe atom
    # combinations until DuckDB accepts one — this is where the list_*
    # aggregate sugar and the pg-catalog compat surface live
    macro_atoms = ["3", "'abc'", "[1,2,3]", "1.5", "true",
                   "DATE '2024-03-05'", "map(['a'],[1])", "'{\"a\":1}'"]
    for name, _, params in con.sql(
            "SELECT function_name, function_type, parameters "
            "FROM duckdb_functions() WHERE function_type = 'macro'").fetchall():
        if not re.match(r"^[a-z_][a-z0-9_]*$", name) or name in calls:
            continue
        k = len(params or [])
        for combo in itertools.product(macro_atoms, repeat=min(k, 2)):
            args = (list(combo) + ["3"] * (k - 2))[:k]
            c = f"{name}({', '.join(args)})"
            try:
                con.sql(f"SELECT {c} AS v").fetchall()
                calls[name] = c
                undeclared.discard(name)
                break
            except Exception:
                continue
        else:
            undeclared.add(name)

    # names where NO overload produced a duckdb-accepted trivial call
    untestable = sorted(undeclared - set(calls))
    print(f"{len(calls)} functions with a DuckDB-accepted trivial call; "
          f"{len(untestable)} untestable by this generator "
          f"(lambda/exotic-typed only)")

    work = Path("/tmp/fn_audit")
    work.mkdir(exist_ok=True)
    names = sorted(calls)
    (work / "calls.txt").write_text(
        "\n".join(calls[n] for n in names) + "\n")
    (work / "names.json").write_text(json.dumps(names))
    if "--no-run" in sys.argv:
        return
    subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.FuzzEval {work}/calls.txt {work}/engine.jsonl"],
        cwd="/root/repo", check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    # strict=False: a function result may embed raw control chars
    # (e.g. chr()) that FuzzEval's escaper passes through
    results = [json.loads(x, strict=False) for x in
               (work / "engine.jsonl").read_text().splitlines() if x.strip()]
    assert len(results) == len(names)

    import datetime
    import decimal

    # Both engines answer but the value is inherently incomparable by
    # this harness: intervals (python timedelta vs Spark's typed
    # YearMonth/DayTime rendering), maps (key order), and the documented
    # residuals (stats = planner-debug text; md5_number = 39-digit
    # HUGEINT beyond the decimal(38) carrier; list_distinct order is
    # unspecified in DuckDB — compared as a SET here).
    RENDER_OK_TYPES = (datetime.timedelta, datetime.time)
    # documented residuals (SURVEY §5.3 audit notes): no honest engine
    # equivalent exists — planner/vectorizer introspection text, the
    # DuckDB SQL-AST serializers, the 39-digit HUGEINT md5_number beyond
    # the decimal(38,0) carrier, and the projection-alias introspector
    # (context the registry can't see). bar left the list in r11 —
    # eighth-block rendering now matches DuckDB exactly (307-case sweep)
    DOCUMENTED = {"stats", "md5_number", "json_serialize_plan",
                  "json_serialize_sql", "vector_type", "alias"}
    SET_COMPARE = {"array_distinct", "list_distinct",
                   "list_intersect", "array_intersect"}

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float):
            return "nan" if math.isnan(v) else repr(v)
        if isinstance(v, bytes):
            return v.hex().upper()
        if isinstance(v, (list, tuple)):
            return "[" + ", ".join(canon(e) for e in v) + "]"
        if isinstance(v, dict):
            # duckdb python renders MAP as {'key': [...], 'value': [...]}
            ks, vs = v.get("key"), v.get("value")
            if isinstance(ks, list) and isinstance(vs, list) and len(v) == 2:
                return "{" + ", ".join(
                    f"{canon(k)}={canon(x)}" for k, x in zip(ks, vs)) + "}"
            return "{" + ", ".join(
                f"{canon(k)}={canon(x)}" for k, x in v.items()) + "}"
        if isinstance(v, decimal.Decimal):
            return str(v)
        if isinstance(v, datetime.datetime):
            # strftime %Y does not zero-pad years < 1000 on glibc
            s = (f"{v.year:04d}-{v.month:02d}-{v.day:02d} "
                 f"{v.hour:02d}:{v.minute:02d}:{v.second:02d}.{v.microsecond:06d}")
            return s.rstrip("0").rstrip(".")
        return str(v)

    agree, nondet_ok, render_ok, documented, diffs, engerr = \
        [], [], [], [], [], []
    for n, r in zip(names, results):
        if n in DOCUMENTED:
            documented.append(n)
            continue
        if not r["ok"]:
            engerr.append((n, r["err"]))
            continue
        if n in NONDET or n.startswith("icu_"):
            nondet_ok.append(n)
            continue
        raw = con.sql(f"SELECT {calls[n]} AS v").fetchall()[0][0]
        if isinstance(raw, RENDER_OK_TYPES):
            render_ok.append(n)
            continue
        dv, ev = canon(raw), r["v"]
        if n in SET_COMPARE:
            same = set(dv.strip("[]").split(", ")) == set(ev.strip("[]").split(", "))
        else:
            same = dv == ev
            if not same:
                try:
                    fa, fb = float(dv), float(ev)
                    same = fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
                except (ValueError, TypeError):
                    same = False
        (agree if same else diffs).append((n, dv, ev))
    print(f"\n{len(agree)} agree, {len(nondet_ok)} nondet/collation-ok, "
          f"{len(render_ok)} interval/map-render-ok, "
          f"{len(documented)} documented residuals, "
          f"{len(diffs)} value-diff, {len(engerr)} engine-err")
    for n, e in engerr:
        print(f"ENGINE-ERR {n}: {calls[n]}\n  {e[:140]}")
    for n, dv, ev in diffs:
        print(f"VALUE-DIFF {n}: {calls[n]}\n  duck={dv[:120]}\n  eng ={ev[:120]}")
    if documented:
        print("documented residuals:", ", ".join(documented),
              "(stats = planner-debug text; md5_number = 39-digit HUGEINT "
              "beyond the decimal(38,0) carrier)")
    if untestable:
        print("\nuntestable (no trivially-typed overload):",
              ", ".join(untestable))


if __name__ == "__main__":
    main()
