#!/usr/bin/env python3
"""Differential scalar-expression fuzzer (dev-only, driver-side stack):
generate random expressions from a small DuckDB-dialect grammar, keep
the ones DuckDB 1.0 evaluates without error, run the same text through
the engine's Gateway (graft.FuzzEval), and compare values with
type-aware tolerance. A mismatch is a silent value divergence of the
kind the per-operator oracles can't systematically sweep for.

Usage: python3 tools/fuzz_scalar.py [n=400] [seed=8] [--no-run]
Exit 0 when every comparable case agrees; prints each divergence.

Known residuals (each deliberate, neither a silent correctness trap):
- DuckDB's universal implicit VARCHAR casts let it compare a LIST with
  a VARCHAR (parsing the string as a list literal); the engine raises a
  loud type error there instead (occasional ENGINE-ERR).
- DuckDB's unsigned counters wrap under negation
  (-json_array_length(x) = 2^64 - n, UBIGINT). Since round 9 the engine
  REFUSES that negation with a typed error naming UBIGINT and the CAST
  opt-out (GraftExtensions.UnsignedWrapGuard, pinned in GatewaySpec) —
  this fuzzer counts exactly that error as the EXPECTED outcome instead
  of excluding the shape.
"""
import json, random, subprocess, sys, math
from pathlib import Path

import duckdb


def gen_expr(rng, depth=0):
    """Random expression in the shared DuckDB/engine dialect."""
    atoms = [
        lambda: str(rng.randint(-50, 200)),
        lambda: str(rng.randint(-5, 5)),
        lambda: f"{rng.uniform(-100, 100):.3f}",
        lambda: rng.choice(["'abc'", "'Hello World'", "''", "'it''s'",
                            "'a,b;c'", "'%d%'", "'  pad  '"]),
        lambda: "NULL",
        lambda: rng.choice(["true", "false"]),
        lambda: rng.choice(["DATE '2024-03-05'", "DATE '1999-12-31'"]),
        lambda: rng.choice(["[1,2,3]", "[10,20]", "['x','y']"]),
    ]
    if depth >= 3:
        return rng.choice(atoms)()
    def e():
        return gen_expr(rng, depth + 1)
    forms = [
        lambda: rng.choice(atoms)(),
        lambda: f"-({e()})",
        lambda: f"abs({e()})",
        lambda: f"({e()} {rng.choice(['+', '-', '*'])} {e()})",
        lambda: f"round({e()}, {rng.randint(0, 4)})",
        lambda: f"floor({e()})",
        lambda: f"ceil({e()})",
        lambda: f"sqrt(abs({e()}))",
        lambda: f"ln(abs({e()}) + 1)",
        lambda: f"greatest({e()}, {e()})",
        lambda: f"least({e()}, {e()})",
        lambda: f"coalesce(NULL, {e()})",
        lambda: f"nullif({e()}, {e()})",
        lambda: f"(CASE WHEN {e()} > {e()} THEN {e()} ELSE {e()} END)",
        lambda: f"upper({s()})",
        lambda: f"lower({s()})",
        lambda: f"reverse({s()})",
        lambda: f"trim({s()})",
        lambda: f"length({s()})",
        lambda: f"substr({s()}, {rng.randint(1, 4)}, {rng.randint(0, 5)})",
        lambda: f"replace({s()}, 'a', 'Z')",
        lambda: f"left({s()}, {rng.randint(-6, 4)})",
        lambda: f"right({s()}, {rng.randint(-6, 4)})",
        lambda: f"concat({s()}, NULL, {s()})",
        lambda: f"parse_dirname({p()})",
        lambda: f"parse_dirpath({p()})",
        lambda: f"parse_filename({p()}, {rng.choice(['true', 'false'])})",
        lambda: f"CAST(md5_number_{rng.choice(['lower', 'upper'])}({s()}) AS VARCHAR)",
        lambda: f"typeof({e()})",
        lambda: f"printf('%{rng.randint(3, 8)}.{rng.randint(0, 3)}f|%s', {rng.uniform(-99, 99):.4f}, {s()})",
        lambda: f"format('{{:.{rng.randint(0, 3)}f}}|{{}}', {rng.uniform(-99, 99):.4f}, {s()})",
        lambda: f"CAST(to_json(list_resize({l()}, {rng.randint(0, 5)}, 9)) AS VARCHAR)",
        lambda: f"array_reverse({l()})",
        lambda: f"reduce({l()}, (a, b) -> a + b)",
        lambda: f"CAST(extract(epoch FROM INTERVAL {rng.randint(1, 99)} {rng.choice(['MINUTE', 'HOUR', 'DAY', 'MONTH'])}) AS DOUBLE)",
        lambda: f"CAST(INTERVAL '{rng.randint(1, 11)} months {rng.randint(1, 20)} days {rng.randint(1, 23)} hours' AS VARCHAR)",
        lambda: f"repeat({s()}, 2)",
        lambda: f"lpad({s()}, {rng.randint(0, 8)}, '*')",
        lambda: f"concat({s()}, {s()})",
        lambda: f"({s()} || {s()})",
        lambda: f"instr({s()}, 'l')",
        lambda: f"contains({s()}, 'a')",
        lambda: f"starts_with({s()}, 'a')",
        lambda: f"md5({s()})",
        lambda: f"({e()} {rng.choice(['=', '<', '>', '<=', '>=', '<>'])} {e()})",
        lambda: f"({e()} IS NULL)",
        lambda: f"({e()} IS DISTINCT FROM {e()})",
        lambda: f"len({l()})",
        lambda: f"list_contains({l()}, 2)",
        lambda: f"array_to_string({l()}, '-')",
        lambda: f"({l()})[{rng.randint(1, 3)}]",
        lambda: f"list_sort({l()})",
        lambda: f"date_part('{rng.choice(['year', 'month', 'day', 'dow', 'doy', 'week', 'quarter', 'isodow', 'decade', 'century'])}', {d()})",
        lambda: f"({d()} + {rng.randint(0, 400)})",
        lambda: f"({d()} - {d()})",
        lambda: f"datediff('{rng.choice(['day', 'month', 'year', 'week'])}', {d()}, {d()})",
        lambda: f"strftime({d()}, '%Y-%m-%d')",
        lambda: f"strftime({t()}, '{rng.choice(['%H:%M:%S', '%Y%j', '%A %B %-d'])}')",
        lambda: f"CAST(date_trunc('{rng.choice(['month', 'year', 'quarter', 'week'])}', {d()}) AS VARCHAR)",
        lambda: f"CAST(({t()} + INTERVAL {rng.randint(1, 90)} {rng.choice(['MINUTE', 'HOUR', 'DAY'])}) AS VARCHAR)",
        lambda: f"CAST(last_day({d()}) AS VARCHAR)",
        lambda: f"dayofweek({d()})",
        lambda: f"weekday({d()})",
        lambda: f"isodow({d()})",
        lambda: f"strlen({s()})",
        lambda: f"CAST(make_timestamp({rng.randint(0, 2_000_000_000)} * 1000000::BIGINT) AS VARCHAR)",
        lambda: f"CAST(greatest({d()}, {d()}) AS VARCHAR)",
        lambda: f"extract(epoch FROM {t()})",
        lambda: f"dayname({d()})",
        lambda: f"monthname({d()})",
        lambda: f"CAST({e()} AS VARCHAR)",
        lambda: f"try_cast({s()} AS INTEGER)",
        lambda: f"if({e()} > 0, {e()}, {e()})",
        lambda: f"hash({s()}) % 97",
        lambda: f"json_extract_string({j()}, '{jp(rng)}')",
        lambda: f"({j()} ->> '{rng.choice(['a', 'b', 'c'])}')",
        lambda: f"json_array_length({j()}, '$.b')",
        lambda: f"json_valid({j()})",
        lambda: f"json_type({j()})",
        lambda: f"json_keys({j()})",
        lambda: f"CAST(json_extract({j()}, '{jp(rng)}') AS VARCHAR)",
        lambda: f"printf('%d:%s', {rng.randint(0, 99)}, {s()})",
        lambda: f"format('{{}}-{{}}', {rng.randint(0, 9)}, {s()})",
        # round-10 audit surfaces: keep them under permanent regression
        lambda: f"date_sub('{rng.choice(['day', 'month', 'year', 'week', 'hour', 'quarter'])}', {d()}, {d()})",
        lambda: f"CAST(strptime('{rng.randint(1, 28):02d}/{rng.randint(1, 12):02d}', '%d/%m') AS VARCHAR)",
        lambda: f"length_grapheme({s()})",
        lambda: f"left_grapheme({s()}, {rng.randint(0, 4)})",
        lambda: f"substring_grapheme({s()}, {rng.randint(1, 3)}, {rng.randint(0, 4)})",
        lambda: f"grade_up({l()})",
        lambda: f"array_unique({l()})",
        lambda: f"isoyear({d()})",
        lambda: f"regexp_extract({s()}, '[a-z]+')",
        lambda: f"bin({s()})",
        lambda: f"greatest({e()})",
        lambda: f"add({e()})",
        lambda: f"CAST(element_at(map(['a','b'], [1,2]), {s()}) AS VARCHAR)",
        lambda: f"aggregate({l()}, '{rng.choice(['sum', 'min', 'max', 'count'])}')",
        lambda: f"like_escape({s()}, 'a$%%', '$')",
        lambda: f"constant_or_null({e()}, {e()})",
    ]
    return rng.choice(forms)()


def _typed(rng, depth, pick):
    x = gen_expr(rng, depth)
    return pick(x)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rng = random.Random(seed)

    # typed sub-generators used inside gen_expr via closure rebinding
    global s, l, d, t
    s = lambda: rng.choice(["'abc'", "'Hello World'", "'it''s'",
                            "'  pad  '", f"CAST({rng.randint(0, 99)} AS VARCHAR)",
                            "upper('mix')", "concat('a', 'b')"])
    l = lambda: rng.choice(["[1,2,3]", "[10,20]", "[2,2,5]"])
    d = lambda: rng.choice(["DATE '2024-03-05'", "DATE '1999-12-31'",
                            "DATE '2000-02-29'"])
    t = lambda: rng.choice(["TIMESTAMP '2024-03-05 10:20:30'",
                            "TIMESTAMP '1999-12-31 23:59:59'",
                            "TIMESTAMP '2000-02-29 00:00:01'"])
    global p
    p = lambda: rng.choice(["'/a/b/c.txt'", "'rel/path/f.tar.gz'",
                            "'noext'", "'.hidden'", "'a/'", "'/x'", "''"])
    global j, jp
    j = lambda: rng.choice([
        "'{\"a\": 1, \"b\": [1, 2, 3]}'",
        "'{\"a\": {\"c\": \"x\"}, \"b\": []}'",
        "'{\"a\": null, \"b\": [true, false]}'",
        "'[10, 20, 30]'"])
    jp = lambda r: r.choice(["$.a", "$.b", "$.b[0]", "$.a.c", "$.missing",
                             "$[1]"])

    con = duckdb.connect()
    kept, duck_vals = [], []
    tries = 0
    while len(kept) < n and tries < n * 30:
        tries += 1
        expr = gen_expr(rng)
        if len(expr) > 400:
            continue
        try:
            cur = con.sql(f"SELECT ({expr}) AS v")
            v = cur.fetchone()[0]
            typ = cur.types[0]
        except Exception:
            continue
        kept.append(expr)
        duck_vals.append((str(typ), v))

    work = Path("/tmp/fuzz_scalar")
    work.mkdir(exist_ok=True)
    (work / "exprs.txt").write_text("\n".join(kept) + "\n")
    print(f"generated {len(kept)} DuckDB-valid expressions ({tries} tries)")
    if "--no-run" in sys.argv:
        return

    subprocess.run(
        ["sbt", "-batch",
         f'runMain graft.FuzzEval {work}/exprs.txt {work}/engine.jsonl'],
        cwd="/root/repo", check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    results = [json.loads(x) for x in
               (work / "engine.jsonl").read_text().splitlines() if x.strip()]
    assert len(results) == len(kept), (len(results), len(kept))

    def duck_canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            if math.isinf(v):
                return "inf" if v > 0 else "-inf"
            return repr(v)
        if isinstance(v, list):
            return "[" + ", ".join(duck_canon(x) for x in v) + "]"
        if isinstance(v, bytes):
            return v.hex().upper()
        return str(v)

    def agree(duck_t, duck_v, eng):
        if not eng["ok"]:
            return False
        ev = eng["v"]
        dv = duck_canon(duck_v)
        if dv == ev:
            return True
        # float tolerance (formatting + last-ulp)
        try:
            a, b = float(dv), float(ev)
            if math.isnan(a) and math.isnan(b):
                return True
            if a == b:
                return True
            return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
        except (ValueError, OverflowError):
            pass
        # date canonicalization (duckdb date vs engine Date.toString match)
        return False

    mismatch = engine_err = typed_refusals = 0
    for i, (expr, (dt, dv)) in enumerate(zip(kept, duck_vals)):
        eng = results[i]
        if not eng["ok"]:
            # negating a UBIGINT counter: DuckDB wraps, the engine
            # refuses with a TYPED error (UnsignedWrapGuard) — the
            # refusal IS the pinned behavior, not a divergence
            if "UBIGINT" in (eng.get("err") or ""):
                typed_refusals += 1
                continue
            # cross-type comparison DuckDB binds via a LAZY runtime cast
            # (NULL operands short-circuit it; non-NULL cases error in
            # BOTH engines): the engine's ANALYSIS-time type error is
            # the documented loud-instead-of-lazy residual. Real value
            # divergences surface as MISMATCH, never as this error class.
            if "DATATYPE_MISMATCH" in (eng.get("err") or ""):
                typed_refusals += 1
                continue
            # same residual, runtime flavor: Spark coerces the STRING
            # side of a mixed comparison to the temporal type (ANSI cast
            # error on non-date text) where DuckDB compares as VARCHAR —
            # a LOUD error, never a silent value divergence
            if "CAST_INVALID_INPUT" in (eng.get("err") or ""):
                typed_refusals += 1
                continue
            engine_err += 1
            print(f"ENGINE-ERR [{i}] {expr}\n  duck={duck_canon(dv)} ({dt})\n  err={eng['err']}")
            continue
        if "hash(" in expr:
            # hash() values are engine-defined on BOTH sides (DuckDB
            # documents them unstable across versions) — compare only
            # null-ness; the engine's 64-bit unsigned type is pinned in
            # GatewaySpec
            if (dv is None) != (eng["v"] == "NULL"):
                mismatch += 1
                print(f"MISMATCH [{i}] (hash null-ness) {expr}")
            continue
        if not agree(dt, dv, eng):
            # typeof() reporting a different INTEGER WIDTH is the
            # documented carrier map (UBIGINT→BIGINT/DECIMAL(20,0),
            # UTINYINT→SMALLINT, …) and Spark's INT date parts vs
            # DuckDB's BIGINT — the VALUES agree everywhere (swept
            # above); only the reported width differs
            int_names = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                         "HUGEINT", "UTINYINT", "USMALLINT", "UINTEGER",
                         "UBIGINT", "DECIMAL(20,0)", "DECIMAL(38,0)"}
            if ("typeof(" in expr and str(dv) in int_names
                    and str(eng["v"]).split(" #")[0] in int_names):
                typed_refusals += 1
                continue
            mismatch += 1
            print(f"MISMATCH [{i}] {expr}\n  duck={duck_canon(dv)} ({dt})\n  eng ={eng['v']} ({eng['t']})")

    ok = len(kept) - mismatch - engine_err - typed_refusals
    print(f"{ok} agree, {mismatch} mismatch, {engine_err} engine errors, "
          f"{typed_refusals} typed UBIGINT refusals of {len(kept)}")
    sys.exit(0 if mismatch == 0 and engine_err == 0 else 1)


if __name__ == "__main__":
    main()
