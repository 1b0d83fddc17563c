#!/usr/bin/env python3
"""Cross-round regression gate on the committed bench's CPU channel.

Usage: bench_regression_gate.py <prev_committed.json> <cur_out.json>
       [factor] [min_cpu] [--queries q1,q2] [--verdict-into <json>]

Compares per-query cpu seconds (qcpu — per-rep lists) of the current
run against the previous committed file. A query flags only when BOTH
robust statistics agree (rep-MIN and rep-MEDIAN each regressed more
than `factor`, default 1.5x) at more than `min_cpu` (default 1.0s)
current rep-median cpu — single-statistic jumps are whole-JVM cpu
attribution noise, not regressions (per-query process-cpu spreads
3-5x across reps on identical plans; see SCALE_SMOKE.md round-13).

Exits 1 naming the flagged queries, plus a machine-readable line
`REGRESSED: q1,q2` so the caller (tools/commit_bench.sh) can
re-measure exactly those in ISOLATION and re-compare — isolation
removes cross-query attribution noise, and only a regression that
survives it fails the commit.

`--queries` restricts the comparison (the retest pass).
`--verdict-into FILE` writes the verdict object into FILE (default:
the current file) so the committed artifact carries the comparison.
"""
import json, sys


def rep_stats(v):
    """(min, median) of a per-rep cpu list; scalars pass through."""
    if isinstance(v, list):
        xs = sorted(x for x in v if isinstance(x, (int, float)) and x > 0)
        if not xs:
            return (0.0, 0.0)
        return (xs[0], xs[len(xs) // 2])
    if isinstance(v, (int, float)) and v > 0:
        return (float(v), float(v))
    return (0.0, 0.0)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    only = None
    into = None
    if "--queries" in args:
        i = args.index("--queries")
        only = set(args[i + 1].split(","))
        del args[i:i + 2]
    if "--verdict-into" in args:
        i = args.index("--verdict-into")
        into = args[i + 1]
        del args[i:i + 2]
    prev_path, cur_path = args[0], args[1]
    factor = float(args[2]) if len(args) > 2 else 1.5
    min_cpu = float(args[3]) if len(args) > 3 else 1.0
    prev = json.load(open(prev_path))
    cur = json.load(open(cur_path))
    pq = {q: rep_stats(v) for q, v in prev.get("qcpu", {}).items()}
    cq = {q: rep_stats(v) for q, v in cur.get("qcpu", {}).items()}
    bad = []
    for q, (cmn, cmd) in sorted(cq.items()):
        if only is not None and q not in only:
            continue
        st = pq.get(q)
        if st is None or st[0] <= 0 or st[1] <= 0:
            continue  # new query: nothing to regress against
        pmn, pmd = st
        if cmd > min_cpu and cmn > factor * pmn and cmd > factor * pmd:
            bad.append((q, pmn, pmd, cmn, cmd))
    verdict = {
        "factor": factor, "min_cpu": min_cpu,
        "prev_cpu_total": prev.get("cpu_total"),
        "cur_cpu_total": cur.get("cpu_total"),
        "restricted_to": sorted(only) if only else None,
        "regressed": [{"q": q, "prev_min": pmn, "prev_med": pmd,
                       "cur_min": cmn, "cur_med": cmd,
                       "min_ratio": round(cmn / pmn, 2),
                       "med_ratio": round(cmd / pmd, 2)}
                      for q, pmn, pmd, cmn, cmd in bad]}
    target = into or cur_path
    tj = json.load(open(target)) if target != cur_path else cur
    tj["regression_gate"] = verdict
    # retest pass (restricted + writing into the MAIN artifact): the
    # isolation numbers are the VALIDATED measurements for the flagged
    # queries — splice them over the main run's noise-inflated ones,
    # or each adjudicated-clean round would ratchet the committed
    # baseline up ~factor x and mask a real regression next round
    if only and into and not bad:
        retested = {}
        for q in only:
            if q in cur.get("qcpu", {}):
                tj.setdefault("qcpu", {})[q] = cur["qcpu"][q]
                retested[q] = cur.get("queries", {}).get(q)
                if q in cur.get("queries", {}):
                    tj.setdefault("queries", {})[q] = cur["queries"][q]
        verdict["retested_committed"] = retested
    json.dump(tj, open(target, "w"))
    if bad:
        print("REGRESSION_GATE: FAIL — per-query committed cpu "
              f"regressed >{factor}x (rep-min AND rep-median agree) "
              f"at >{min_cpu}s:", file=sys.stderr)
        for q, pmn, pmd, cmn, cmd in bad:
            print(f"  {q}: min {pmn:.2f}->{cmn:.2f} "
                  f"({cmn / pmn:.2f}x), med {pmd:.2f}->{cmd:.2f} "
                  f"({cmd / pmd:.2f}x)", file=sys.stderr)
        print("REGRESSED: " + ",".join(q for q, *_ in bad))
        return 1
    scope = f"{len(only)} retested" if only else f"{len(cq)}"
    print(f"REGRESSION_GATE: pass ({scope} queries vs previous "
          f"committed cpu; factor {factor}, floor {min_cpu}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
