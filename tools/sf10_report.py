#!/usr/bin/env python3
"""Assemble the fourth-decade scaling record (VERDICT r14 #1).

Inputs: three per-query bench records —
  sf0.1 (bench_out.json from the round bench, warmup + 2-pass min),
  ~sf1  (BENCH_SF1.json, warmup + 2-pass min),
  ~sf10 (the single-pass no-warmup sweep at /tmp/graft_sf10).
Output: BENCH_SF10.json with per-family totals and growth exponents for
BOTH decades (sf0.1→sf1 and sf1→sf10, exponent = log10 of the time
ratio per 10x data), plus the named list of queries whose sf1→sf10
exponent exceeds 0.5 — the 100 TB risks the verdict asked to name.

Usage: tools/sf10_report.py <sf01_json> <sf1_json> <sf10_json> [out]
"""
import datetime
import json
import math
import sys


def family(name):
    f = name.split("_")[0]
    if f.startswith("q") and f[1:].isdigit():
        return "transit"
    return {"latest": "transit", "shard": "corpus", "sample": "corpus",
            "mm": "multimodal"}.get(f, f)


def main():
    sf01p, sf1p, sf10p = sys.argv[1:4]
    out = sys.argv[4] if len(sys.argv) > 4 else "BENCH_SF10.json"
    q01 = json.load(open(sf01p))["queries"]
    q1 = json.load(open(sf1p))["queries"]
    rec10 = json.load(open(sf10p))
    q10 = rec10["queries"]

    def exp(a, b):
        return round(math.log10(b / a), 2) if a > 0 and b > 0 else None

    per_query = []
    for n in sorted(q10):
        e01 = exp(q01.get(n, -1), q1.get(n, -1))
        e1 = exp(q1.get(n, -1), q10[n])
        per_query.append({"query": n, "family": family(n),
                          "sf01_s": round(q01.get(n, -1), 2),
                          "sf1_s": round(q1.get(n, -1), 2),
                          "sf10_s": round(q10[n], 2),
                          "exp_01_to_1": e01, "exp_1_to_10": e1})

    fams = {}
    for r in per_query:
        f = fams.setdefault(r["family"], {"sf01": 0.0, "sf1": 0.0, "sf10": 0.0,
                                          "n": 0})
        f["sf01"] += max(r["sf01_s"], 0)
        f["sf1"] += max(r["sf1_s"], 0)
        f["sf10"] += max(r["sf10_s"], 0)
        f["n"] += 1
    fam_rows = {f: {"n": v["n"],
                    "sf01_s": round(v["sf01"], 1),
                    "sf1_s": round(v["sf1"], 1),
                    "sf10_s": round(v["sf10"], 1),
                    "exp_01_to_1": exp(v["sf01"], v["sf1"]),
                    "exp_1_to_10": exp(v["sf1"], v["sf10"])}
                for f, v in sorted(fams.items())}

    risks = [r for r in per_query
             if r["exp_1_to_10"] is not None and r["exp_1_to_10"] > 0.5]
    risks.sort(key=lambda r: -r["exp_1_to_10"])

    tot01 = sum(max(r["sf01_s"], 0) for r in per_query)
    tot1 = sum(max(r["sf1_s"], 0) for r in per_query)
    tot10 = sum(max(r["sf10_s"], 0) for r in per_query)

    rec = {
        "when": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "fixture": "/tmp/graft_sf10 (Sf10Gen: 100x sf0.1 — 500k docs, 200k "
                   "embeddings, 10M events, 60M lineitem; deterministic, "
                   "copies decorrelated)",
        "methodology": "sf10 column = ONE timed pass, no warmup "
                       "(single queries run minutes at this decade; the "
                       "sf0.1/sf1 columns keep the warmup+2-pass-min "
                       "discipline, so sf10 times are conservatively high "
                       "and exponents are upper bounds)",
        "errors": rec10.get("errors", []),
        "totals": {"sf0.1_s": round(tot01, 1), "sf1_s": round(tot1, 1),
                   "sf10_s": round(tot10, 1),
                   "exp_01_to_1": exp(tot01, tot1),
                   "exp_1_to_10": exp(tot1, tot10)},
        "families": fam_rows,
        "over_exp_0_5": [{k: r[k] for k in
                          ("query", "sf1_s", "sf10_s", "exp_1_to_10")}
                         for r in risks],
        "per_query": per_query,
    }
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(f"totals: sf0.1 {tot01:.0f}s  sf1 {tot1:.0f}s  sf10 {tot10:.0f}s  "
          f"exponents {rec['totals']['exp_01_to_1']} / "
          f"{rec['totals']['exp_1_to_10']}")
    for f_, v in fam_rows.items():
        print(f"  {f_:11s} n={v['n']:3d}  {v['sf01_s']:7.1f} {v['sf1_s']:8.1f} "
              f"{v['sf10_s']:9.1f}  exp {v['exp_01_to_1']} / {v['exp_1_to_10']}")
    print(f"{len(risks)} queries over exponent 0.5:",
          [r["query"] for r in risks][:15])


if __name__ == "__main__":
    main()
