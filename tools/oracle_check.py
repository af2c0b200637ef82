#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, load the engine's Verify output parquet,
sort columns by name + sort rows, and compare values.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [--single NAME]

--single runs exactly one query and exits — the subprocess-isolation mode
the main loop shells out to when a query OOMs in-process (an OOM can
poison the whole process allocator, so the retry needs its own process).
"""
import decimal
import gc
import json
import math
import os
import subprocess
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


def connect(sf_dir):
    """Fresh connection with the table views, a memory ceiling, and a disk
    spill directory — at the amplified ~sf1 fixture the heavy minhash CTEs
    exceed RAM, and without a limit+spill one OOM poisons the process
    allocator so every LATER query false-fails too (observed r12)."""
    con = duckdb.connect()
    con.sql(f"SET memory_limit='{os.environ.get('ORACLE_MEM', '48GB')}'")
    spill = f"{os.environ.get('TMPDIR', '/tmp')}/graft_duck_spill"
    os.makedirs(spill, exist_ok=True)
    con.sql(f"SET temp_directory='{spill}'")
    for t in TABLES:
        # driver testdata ships single-file tables; the amplified sf1
        # fixture writes Spark-style directories — glob those for DuckDB
        path = f"{sf_dir}/{t}.parquet"
        pat = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    return con


def check_one(con, name, sql, out_dir):
    """Run one oracle query + compare. Returns the result line to print
    (PASS/FAIL/WARN-prefixed, newline-joined). Raises OutOfMemoryException
    through to the caller (which owns the isolation policy)."""
    lines = []
    rel = con.sql(sql)
    ocols = [c.lower() for c in rel.columns]
    otypes = [str(t) for t in rel.types]
    orows = rel.fetchall()
    grel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
    gcols = [c.lower() for c in grel.columns]
    gtypes = {c: str(t) for c, t in zip(gcols, grel.types)}
    grows = grel.fetchall()
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
        lines.append(f"FAIL  {name}: oracle emits non-engine types {bad_types} "
                     f"(add CAST(... AS BIGINT/DOUBLE) in the oracle SQL)")
        return "\n".join(lines)
    for c, t in zip(ocols, otypes):
        if t.startswith("DECIMAL") and gtypes.get(c) != t:
            lines.append(f"WARN  {name}: oracle column {c} is {t} but engine "
                         f"emits {gtypes.get(c)}; values compared with "
                         f"tolerance — the driver's hash gate may be stricter")
    if sorted(ocols) != sorted(gcols):
        lines.append(f"FAIL  {name}: schema oracle={sorted(ocols)} got={sorted(gcols)}")
        return "\n".join(lines)
    _, onorm = normalize(orows, ocols)
    _, gnorm = normalize(grows, gcols)
    if len(onorm) != len(gnorm):
        lines.append(f"FAIL  {name}: rows oracle={len(onorm)} got={len(gnorm)}")
        return "\n".join(lines)
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
        lines.append(f"FAIL  {name}: value oracle={bad[0]!r} got={bad[1]!r}")
    else:
        tag = "ok" if exact else "ok(~float)"
        lines.append(f"PASS  {name}: {len(gnorm)} rows {tag}")
    return "\n".join(lines)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    single = sys.argv[4] if len(sys.argv) > 4 and sys.argv[3] == "--single" else None
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    if single is not None:
        # isolation mode: one query, own process, full memory budget.
        # Exit nonzero on FAIL so a direct CI invocation can't read a
        # false green (ADVICE r12); the parent loop parses stdout and
        # treats a FAIL line + rc 1 as a result, not a crash.
        line = check_one(connect(sf_dir), single, oracle[single], out_dir)
        print(line)
        sys.exit(1 if any(l.startswith("FAIL")
                          for l in line.splitlines()) else 0)

    def run_single(name):
        """One query in its own process, full memory budget. Returns the
        verdict line; synthesizes a FAIL only when the child produced no
        verdict at all (crash)."""
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), sf_dir, out_dir,
             "--single", name],
            capture_output=True, text=True)
        line = r.stdout.strip()
        if not line:
            err = (r.stderr or "").strip().splitlines()
            line = (f"FAIL  {name}: error {err[-1] if err else 'subprocess died'}"
                    " [oracle memory-bound at this sf]")
        return line

    con = connect(sf_dir)
    failures = 0
    for name in sorted(oracle):
        try:
            if con is None:
                # previous query OOM'd; try to resume in-process. connect()
                # itself can raise while the allocator is still recovering
                # — the duckdb.Error branch below then routes THIS query to
                # an isolated subprocess and the next iteration retries.
                con = connect(sf_dir)
            line = check_one(con, name, oracle[name], out_dir)
        except duckdb.Error:
            # the failed query's buffers are not reliably released back to
            # this process (an OOM/disk-full poisons the allocator for
            # NEIGHBOURS too — observed r12: events_cusum/events_funnel
            # false-failed; observed r14: even the reconnect OOM'd and the
            # old code let that escape main, killing the whole sweep).
            # Drop the connection FIRST so the retry subprocess is not
            # memory-squeezed by our dead buffers, then retry isolated.
            try:
                if con is not None:
                    con.close()
            except Exception:
                pass
            con = None
            gc.collect()
            line = run_single(name)
        except Exception as e:
            line = f"FAIL  {name}: error {e}"
        print(line, flush=True)
        if any(l.startswith("FAIL") for l in line.splitlines()):
            failures += 1
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries pass")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
