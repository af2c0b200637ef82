#!/usr/bin/env python3
"""Chunked DuckDB oracle for queries whose single-statement mirrors exceed
one process's RAM+spill at large scale factors (VERDICT r12 #3: the six
MinHash-closure / IVF-sweep mirrors at ~sf1).

The single-statement oracle holds every CTE of a 128-seed MinHash
pipeline (plus a recursive transitive closure) in one query's hash
tables. This runner evaluates the SAME oracle SQL — read verbatim from
the Verify dump's oracle_sql.json, never re-authored — as a sequence of
materialized steps in an ON-DISK DuckDB database:

  * each top-level CTE becomes `CREATE TABLE <name> AS <body>` in order,
    so one step's working set is one step's, not the whole pipeline's;
  * the `sigl` per-seed-minimum step (the 128x shingle-hash explode) is
    chunked over seed ranges, appending per chunk;
  * the recursive `reach(src, dst)` closure is run as semi-naive
    iteration (INSERT new pairs EXCEPT known, until fixpoint) — the
    standard rewriting of `WITH RECURSIVE ... UNION`;
  * tables are dropped as soon as no later step references them, and the
    database is CHECKPOINTed between steps so freed blocks recycle.

The decomposition is purely mechanical (CTE-by-CTE), so the verdict it
produces is the same oracle's verdict, just evaluated with bounded
memory. Compare logic is imported from oracle_check so the tolerance
rules cannot drift.

Usage: python3 tools/oracle_chunked.py <sfDir> <verifyOutDir> <q1,q2,...>
"""
import json
import os
import re
import sys
import tempfile

import duckdb

from oracle_check import TABLES, normalize, values_equal

SEED_CHUNK = 16  # seeds per sigl pass: 128/16 = 8 bounded passes


def split_ctes(sql):
    """Split 'WITH [RECURSIVE] n1 AS (b1), n2(...) AS (b2), ... SELECT ...'
    into ([(name, cols_or_None, body)], final_select). Paren- and
    quote-aware; only top-level commas separate CTE entries."""
    s = sql.strip()
    m = re.match(r"WITH\s+(RECURSIVE\s+)?", s, re.IGNORECASE)
    if not m:
        return [], s
    i = m.end()
    ctes = []
    n = len(s)
    while True:
        # name [(col, ...)] AS (
        hm = re.compile(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s*(\(([^)]*)\))?\s+AS\s*\(",
                        re.IGNORECASE).match(s, i)
        if not hm:
            raise ValueError(f"cannot parse CTE header at: {s[i:i+80]!r}")
        name, cols = hm.group(1), hm.group(3)
        j = hm.end()  # first char of body (after the opening paren)
        depth, q = 1, False
        while j < n and depth:
            c = s[j]
            if q:
                if c == "'":
                    q = s[j:j + 2] == "''"  # '' stays inside the string
                    if q:
                        j += 1
            elif c == "'":
                q = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        ctes.append((name, cols, s[hm.end():j - 1].strip()))
        # after the closing paren: ',' -> next CTE, else the final SELECT
        k = j
        while k < n and s[k].isspace():
            k += 1
        if k < n and s[k] == ",":
            i = k + 1
        else:
            return ctes, s[k:]


def top_level_union(body):
    """Index of a depth-0 UNION keyword, or -1."""
    depth, q, i, n = 0, False, 0, len(body)
    while i < n:
        c = body[i]
        if q:
            if c == "'":
                if body[i:i + 2] == "''":
                    i += 1
                else:
                    q = False
        elif c == "'":
            q = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and body[i:i + 5].upper() == "UNION" \
                and (i == 0 or not body[i - 1].isalnum()) \
                and not body[i + 5:i + 6].isalnum():
            return i
        i += 1
    return -1


def word_used(name, text):
    return re.search(rf"\b{re.escape(name)}\b", text) is not None


def table_ref(name, text):
    """True iff `name` appears as a table reference (FROM/JOIN name) —
    a column ALIAS sharing a CTE's name (e.g. `... AS sh FROM toks`
    inside the `sh` CTE) must not read as self-reference."""
    return re.search(rf"\b(FROM|JOIN)\s+{re.escape(name)}\b", text,
                     re.IGNORECASE) is not None


def run_recursive(con, name, cols, body, log):
    """Semi-naive fixpoint for a self-referential CTE with WITH RECURSIVE
    ... UNION (dedup) semantics: the seed is materialized DISTINCT and
    each round inserts only never-seen rows (EXCEPT below)."""
    u = top_level_union(body)
    if u < 0:
        raise ValueError(f"recursive CTE {name} without top-level UNION")
    base, step = body[:u], body[u + 5:]
    # UNION ALL has bag semantics the EXCEPT-based fixpoint below does
    # not implement (a dup-producing step would terminate early / lose
    # multiplicity) — refuse loudly rather than silently diverge
    if re.match(r"\s*ALL\b", step, re.IGNORECASE):
        raise ValueError(
            f"recursive CTE {name} uses UNION ALL; this fixpoint only "
            f"implements UNION (set) semantics")
    col_list = f" t({cols})" if cols else ""
    con.sql(f"CREATE TABLE {name} AS "
            f"SELECT DISTINCT * FROM ({base}){col_list}")
    rounds = 0
    while True:
        got = con.execute(
            f"INSERT INTO {name} SELECT * FROM (SELECT DISTINCT * FROM"
            f" ({step}) EXCEPT SELECT * FROM {name})").fetchall()
        rounds += 1
        if not got or got[0][0] == 0:
            break
    log(f"    {name}: fixpoint after {rounds} rounds")


def run_sigl_chunked(con, name, body, log):
    """The 128-seed minimum, SEED_CHUNK seeds at a time. The chunk filter
    goes on the seeds side of the cross join, so each pass's explode is
    |hsx| x SEED_CHUNK instead of x128."""
    # the rewrite below is only valid for the exact dumped shape: one
    # GROUP BY, the seeds relation cross-joined under alias `s`, and no
    # pre-existing WHERE (the injected filter would otherwise land in the
    # wrong scope or produce invalid SQL) — assert it, don't assume it
    if len(re.findall(r"\bGROUP BY\b", body)) != 1:
        raise ValueError("sigl CTE shape changed: expected exactly one "
                         "GROUP BY; chunked rewrite unsafe")
    if re.search(r"\bWHERE\b", body, re.IGNORECASE):
        raise ValueError("sigl CTE shape changed: body already has a "
                         "WHERE clause; chunked rewrite unsafe")
    if not re.search(r"CROSS JOIN seeds\s+s\b", body):
        raise ValueError("sigl CTE shape changed: expected "
                         "'CROSS JOIN seeds s'; chunked rewrite unsafe")
    max_i = con.sql("SELECT max(i) FROM seeds").fetchall()[0][0]
    first = True
    for lo in range(0, max_i + 1, SEED_CHUNK):
        hi = min(lo + SEED_CHUNK - 1, max_i)
        chunk = re.sub(r"\bGROUP BY\b",
                       f"WHERE s.i BETWEEN {lo} AND {hi} GROUP BY",
                       body, count=1)
        if first:
            con.sql(f"CREATE TABLE {name} AS {chunk}")
            first = False
        else:
            con.sql(f"INSERT INTO {name} {chunk}")
        con.sql("CHECKPOINT")
    log(f"    {name}: chunked over seed ranges of {SEED_CHUNK} (0..{max_i})")


def evaluate(con, sql, log):
    """Evaluate one oracle statement CTE-by-CTE; return (cols, rows)."""
    ctes, final = split_ctes(sql)
    later = [c[2] for c in ctes] + [final]
    for idx, (name, cols, body) in enumerate(ctes):
        log(f"    step {idx + 1}/{len(ctes)}: {name}")
        if table_ref(name, body):
            run_recursive(con, name, cols, body, log)
        elif re.search(r"CROSS JOIN seeds\b", body) and "MIN(" in body:
            run_sigl_chunked(con, name, body, log)
        elif cols:
            con.sql(f"CREATE TABLE {name} AS SELECT * FROM ({body}) t({cols})")
        else:
            con.sql(f"CREATE TABLE {name} AS {body}")
        # drop every table no later step references (word-boundary match is
        # conservative: a column sharing the name keeps the table alive)
        remaining = later[idx + 1:]
        for pname, _, _ in ctes[:idx + 1]:
            alive = any(word_used(pname, t) for t in remaining)
            if not alive:
                try:
                    con.sql(f"DROP TABLE IF EXISTS {pname}")
                except duckdb.Error:
                    pass
        con.sql("CHECKPOINT")
    rel = con.sql(final)
    cols = [c.lower() for c in rel.columns]
    return cols, rel.fetchall(), [str(t) for t in rel.types]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3].split(",")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    failures = 0
    for name in names:
        dbdir = tempfile.mkdtemp(prefix="graft-chunked-")
        con = duckdb.connect(f"{dbdir}/oracle.db")
        con.sql(f"SET memory_limit='{os.environ.get('ORACLE_MEM', '24GB')}'")
        spill = f"{os.environ.get('TMPDIR', '/tmp')}/graft_duck_spill"
        os.makedirs(spill, exist_ok=True)
        con.sql(f"SET temp_directory='{spill}'")
        for t in TABLES:
            path = f"{sf_dir}/{t}.parquet"
            pat = f"{path}/*.parquet" if os.path.isdir(path) else path
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
        try:
            log(f"  {name}: chunked evaluation")
            ocols, orows, otypes = evaluate(con, oracle[name], log)
            grel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols = [c.lower() for c in grel.columns]
            grows = grel.fetchall()
            bad_types = [(c, t) for c, t in zip(ocols, otypes)
                         if t in ("HUGEINT", "UHUGEINT")]
            if bad_types:
                print(f"FAIL  {name}: oracle emits non-engine types {bad_types}")
                failures += 1
                continue
            if sorted(ocols) != sorted(gcols):
                print(f"FAIL  {name}: schema oracle={sorted(ocols)} "
                      f"got={sorted(gcols)}")
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
                print(f"PASS  {name}: {len(gnorm)} rows {tag} [chunked]")
        except Exception as e:
            print(f"FAIL  {name}: error {e}")
            failures += 1
        finally:
            try:
                con.close()
            except Exception:
                pass
            import shutil
            shutil.rmtree(dbdir, ignore_errors=True)
        sys.stdout.flush()
    print(f"\n{len(names) - failures}/{len(names)} chunked queries pass")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
