#!/usr/bin/env python3
"""Full-registry sf1 oracle sweep with PER-QUERY process isolation.

Round-16 post-mortem: the in-process oracle loop (tools/oracle_check.py
main) survives individual DuckDB OOMs by retrying the failed query in a
subprocess, but the PARENT process still hosts the poisoned allocator —
at ~sf1 the r16 run died silently (no traceback, no tally) two queries
after the known-heavy `dedup_cluster_stats` mirror OOM'd, taking the
whole sweep's tally with it. This runner never hosts DuckDB in the
parent: every query runs `oracle_check.py --single` in its own process
(full memory budget, crash-isolated), and the queries whose
single-statement mirrors are KNOWN to exceed one process's RAM+spill at
this scale (the MinHash-closure / IVF-sweep family, r12 §3) are routed
straight to the chunked CTE-by-CTE evaluator instead of being OOM'd
first. The verdict logic is oracle_check/oracle_chunked's own — this
file only schedules processes and folds the tally.

Usage: tools/sf1_isolated_sweep.py <sfDir> <verifyOutDir> <outJson>
"""
import datetime
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

# Single-statement mirrors measured to exceed one DuckDB process's
# RAM+spill at ~sf1 (VERIFYALL_SF1 r12/r13 history) — evaluated via
# tools/oracle_chunked.py (same SQL, CTE-by-CTE, bounded memory).
CHUNKED = [
    "dedup_cluster_stats", "dedup_minhash_lsh", "dedup_near_attribution",
    "dedup_quality_keeper", "dedup_savings", "sim_ivf_nprobe_curve",
]


def main():
    sf_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    def run_single(name):
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "oracle_check.py"),
             sf_dir, out_dir, "--single", name],
            capture_output=True, text=True)
        line = r.stdout.strip()
        if not line:
            err = (r.stderr or "").strip().splitlines()
            line = (f"FAIL  {name}: subprocess died rc={r.returncode} "
                    f"{err[-1] if err else ''}")
        return line

    lines = []
    failures = []
    retried = []
    for name in sorted(oracle):
        if name in CHUNKED:
            continue
        line = run_single(name)
        # A memory-bound FAIL in an ISOLATED process is a sample of box
        # state (spill pressure from neighbours in the same sweep), not a
        # verdict — r16 observed `dedup_minhash_incremental` OOM mid-sweep
        # and pass in 50 s on the same box once quiet. Retry once; a
        # second memory-bound failure is recorded as the verdict.
        if "FAIL" in line and ("Out of Memory" in line or
                               "memory" in line.lower()):
            retry = run_single(name)
            retried.append(f"{name}: {line.splitlines()[-1][:120]} -> "
                           f"{retry.splitlines()[-1][:80]}")
            line = retry
        print(line, flush=True)
        lines.append(line)
        if any(l.startswith("FAIL") for l in line.splitlines()):
            failures.append(line)

    # A verdict can be multi-line (check_one prefixes WARN lines, e.g. a
    # DECIMAL-type note, before the PASS line) — counting only
    # line.startswith('PASS') would drop such a query from BOTH tallies
    # and silently desync the headline count from the (empty) failures
    # list (ADVICE r16). Mirror the FAIL check: a pass is any-line-PASS
    # with no-line-FAIL.
    single_pass = len([l for l in lines
                       if any(s.startswith("PASS") for s in l.splitlines())
                       and not any(s.startswith("FAIL")
                                   for s in l.splitlines())])
    print(f"\n[isolated] single-statement: {single_pass}/"
          f"{len(oracle) - len(CHUNKED)} pass, routing "
          f"{len(CHUNKED)} known-heavy mirrors chunked: {','.join(CHUNKED)}",
          flush=True)

    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "oracle_chunked.py"),
         sf_dir, out_dir, ",".join(CHUNKED)],
        capture_output=True, text=True)
    chunked_lines = [l.strip() for l in r.stdout.splitlines()
                     if l.startswith(("PASS", "FAIL"))]
    for l in chunked_lines:
        print(l, flush=True)
    if not chunked_lines:
        print(r.stdout[-2000:])
        print(r.stderr[-2000:])
        failures.append("FAIL  <chunked runner produced no verdicts>")
    chunked_pass = len([l for l in chunked_lines if l.startswith("PASS")])
    failures += [l for l in chunked_lines if l.startswith("FAIL")]

    total_pass = single_pass + chunked_pass
    tally = f"{total_pass}/{len(oracle)} queries pass"
    print(f"\n{tally}", flush=True)

    rec = {
        "when": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "sf": f"{sf_dir} (10x content-rewritten amplification of sf0.1: "
              "50k documents, 20k embeddings, 1M events)",
        "correctness": tally,
        "methodology": "ONE dated run at HEAD: one graft.Verify dump, then "
                       "every oracle in its own DuckDB process "
                       "(crash-isolated; the in-process loop died from "
                       "allocator poisoning at this sf), with the six "
                       "known-heavy MinHash-closure/IVF mirrors evaluated "
                       "via tools/oracle_chunked.py — the same oracle SQL, "
                       "CTE-by-CTE, bounded memory",
        "single_statement_tally":
            f"{single_pass}/{len(oracle) - len(CHUNKED)}",
        "chunked_retries": chunked_lines,
        "memory_bound_retries": retried,
        "failures": failures,
    }
    with open(out_json, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(f"[isolated] published {out_json}: {tally}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
