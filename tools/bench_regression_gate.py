#!/usr/bin/env python3
"""Cross-round regression gate on the committed bench's CPU channel.

Usage: bench_regression_gate.py <prev_committed.json> <cur_out.json>
       [factor] [min_cpu]

Compares per-query cpu seconds (qcpu) of the current run against the
previous committed file. Exits 1 — naming the queries — when any query
regresses more than `factor` (default 1.5x) at more than `min_cpu`
(default 1.0s) absolute cpu. Writes a `regression_gate` verdict object
into <cur_out.json> either way, so the committed artifact carries the
comparison it passed.
"""
import json, sys

def main() -> int:
    prev_path, cur_path = sys.argv[1], sys.argv[2]
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    min_cpu = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0
    prev = json.load(open(prev_path))
    cur = json.load(open(cur_path))
    pq, cq = prev.get("qcpu", {}), cur.get("qcpu", {})
    bad = []
    for q, c in sorted(cq.items()):
        p = pq.get(q)
        if p is None or p <= 0:
            continue  # new query: nothing to regress against
        if c > min_cpu and c > factor * p:
            bad.append((q, p, c, c / p))
    cur["regression_gate"] = {
        "factor": factor, "min_cpu": min_cpu,
        "prev_cpu_total": prev.get("cpu_total"),
        "cur_cpu_total": cur.get("cpu_total"),
        "regressed": [{"q": q, "prev": p, "cur": c, "ratio": round(r, 2)}
                      for q, p, c, r in bad]}
    json.dump(cur, open(cur_path, "w"))
    if bad:
        print("REGRESSION_GATE: FAIL — per-query committed cpu "
              f"regressed >{factor}x at >{min_cpu}s absolute:",
              file=sys.stderr)
        for q, p, c, r in bad:
            print(f"  {q}: {p:.2f}s -> {c:.2f}s ({r:.2f}x)",
                  file=sys.stderr)
        print("(intentional? rerun with SKIP_REGRESSION_GATE=1)",
              file=sys.stderr)
        return 1
    print(f"REGRESSION_GATE: pass ({len(cq)} queries vs previous "
          f"committed cpu; factor {factor}, floor {min_cpu}s)")
    return 0

if __name__ == "__main__":
    sys.exit(main())
