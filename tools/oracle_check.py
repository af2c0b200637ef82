#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, load the engine's Verify output parquet,
sort columns by name + sort rows, and compare values.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import decimal
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _sort_key_val(x):
    # Round floats for the SORT KEY ONLY: a sub-tolerance float discrepancy
    # between Spark and DuckDB must not reorder near-tied rows before the
    # positional tolerance-aware compare (ADVICE r1).
    if isinstance(x, float):
        return f"{x:.6g}"
    return str(x)


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple(_sort_key_val(x) for x in t))
    return [cols[i] for i in order], out


def values_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    # DECIMAL columns fetch as decimal.Decimal: compare numerically with the
    # same tolerance as floats (a Spark DOUBLE vs DuckDB DECIMAL comparison
    # must not fail on the textual '1.5' vs '1.50')
    if isinstance(a, (float, decimal.Decimal)) or isinstance(b, (float, decimal.Decimal)):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failures = 0
    for name in sorted(oracle):
        try:
            rel = con.sql(oracle[name])
            ocols = [c.lower() for c in rel.columns]
            otypes = [str(t) for t in rel.types]
            orows = rel.fetchall()
            grel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols = [c.lower() for c in grel.columns]
            gtypes = {c: str(t) for c, t in zip(gcols, grel.types)}
            grows = grel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: error {e}")
            failures += 1
            continue
        # The driver's hash compare is type-sensitive in ways fetchall() hides
        # (DuckDB SUM(BIGINT) → HUGEINT hashes differently from the engine's
        # int64 even when every value is equal — broke corpus_pack_plan r04).
        # HUGEINT the engine can never emit → hard fail. DECIMAL it CAN
        # (Spark DecimalType), so a DECIMAL oracle column is fine when the
        # engine emits the matching decimal type, and only a WARNING when the
        # types differ (VERDICT r6 #5): the value compare below still runs
        # with numeric tolerance, so a real mismatch is caught — but the
        # driver's stricter hash gate may still want an explicit CAST.
        bad_types = [(c, t) for c, t in zip(ocols, otypes)
                     if t in ("HUGEINT", "UHUGEINT")]
        if bad_types:
            print(f"FAIL  {name}: oracle emits non-engine types {bad_types} "
                  f"(add CAST(... AS BIGINT/DOUBLE) in the oracle SQL)")
            failures += 1
            continue
        for c, t in zip(ocols, otypes):
            if t.startswith("DECIMAL") and gtypes.get(c) != t:
                print(f"WARN  {name}: oracle column {c} is {t} but engine "
                      f"emits {gtypes.get(c)}; values compared with "
                      f"tolerance — the driver's hash gate may be stricter")
        if sorted(ocols) != sorted(gcols):
            print(f"FAIL  {name}: schema oracle={sorted(ocols)} got={sorted(gcols)}")
            failures += 1
            continue
        _, onorm = normalize(orows, ocols)
        _, gnorm = normalize(grows, gcols)
        if len(onorm) != len(gnorm):
            print(f"FAIL  {name}: rows oracle={len(onorm)} got={len(gnorm)}")
            failures += 1
            continue
        bad = None
        exact = True
        for ro, rg in zip(onorm, gnorm):
            for vo, vg in zip(ro, rg):
                if not values_equal(vo, vg):
                    bad = (vo, vg)
                    break
                if str(vo) != str(vg):
                    exact = False
            if bad:
                break
        if bad:
            print(f"FAIL  {name}: value oracle={bad[0]!r} got={bad[1]!r}")
            failures += 1
        else:
            tag = "ok" if exact else "ok(~float)"
            print(f"PASS  {name}: {len(gnorm)} rows {tag}")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries pass")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
