#!/usr/bin/env bash
# The quiet-runner protocol for the COMMITTED bench channel — the
# committed numbers are produced by this gate, not by hand (round-11
# known-remaining #3: the ±15% ambient band needs a protocol, not
# vigilance).
#
#   tools/commit_bench.sh [reps] [sfDir]   (default 5, /root/testdata/sf0.1)
#
# Protocol, enforced in order:
#   1. refuse to start while ambient 1-min load > LOAD_MAX (0.5):
#      a committed number produced in a loaded window is the exact
#      artifact the channel exists to exclude;
#   2. run graft.Bench with per-rep wall+cpu+GC accounting;
#   3. verify the run's own verdict: ambient_suspect must be false
#      (the cpu-channel steal detector) — if true, retry ONCE after a
#      cool-down, then give up loudly;
#   4. on success copy bench_out.json -> bench_committed.json and
#      print both wall and cpu totals (the cpu total is the
#      steal-immune number rounds compare on).
#
# Cross-round committed anchors (wall s / cpu s, 272-query set):
#   r12 = 142.5 / 493.3    r13 = 137.6 / 530.9
# (r14+ adds queries — compare per-query or on the shared subset.)
set -uo pipefail
cd "$(dirname "$0")/.."
REPS="${1:-5}"
SF_DIR="${2:-/root/testdata/sf0.1}"
LOAD_MAX="${LOAD_MAX:-0.5}"

ambient_load() { awk '{print $1}' /proc/loadavg; }

load=$(ambient_load)
if awk -v l="$load" -v m="$LOAD_MAX" 'BEGIN{exit !(l > m)}'; then
  echo "REFUSED: ambient load $load > $LOAD_MAX — the committed" >&2
  echo "channel only accepts quiet-box runs (retry when idle," >&2
  echo "or raise LOAD_MAX knowingly)." >&2
  exit 2
fi
echo "== quiet check passed (load $load <= $LOAD_MAX)"

run_once() {
  # a stale bench_out.json from an earlier run must never pass as
  # this run's result: remove it first, so a failed/crashed bench
  # reads as "missing", not as the previous numbers
  rm -f bench_out.json
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_BENCH_REPS="$REPS" \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -3
  [ -f bench_out.json ] || {
    echo "FAIL: bench produced no bench_out.json (crash/compile?)" >&2
    return 1
  }
}

verdict() { # prints "ok" / "suspect" / "missing"
  python3 - <<'EOF'
import json, sys
try:
    j = json.load(open("bench_out.json"))
except Exception:
    print("missing"); sys.exit(0)
print("suspect" if j.get("ambient_suspect") else "ok")
EOF
}

echo "== bench run 1/: reps=$REPS sf=$SF_DIR"
run_once
v=$(verdict)
if [ "$v" = "suspect" ]; then
  echo "== ambient_suspect=true — cooling down 120s and retrying once"
  sleep 120
  load=$(ambient_load)
  echo "== retry (load now $load)"
  run_once
  v=$(verdict)
fi
if [ "$v" != "ok" ]; then
  echo "FAIL: bench verdict '$v' — NOT committing this run" >&2
  exit 1
fi

# 5. cross-round regression gate on the CPU channel: diff per-query
#    committed cpu against the PREVIOUS committed file and refuse the
#    commit when any query regresses > REG_FACTOR at > REG_MIN_CPU s
#    absolute — the cpu channel exists to make round-over-round
#    comparison honest; this closes the loop so a regression is a
#    gate failure, not verdict-time archaeology. Override knowingly
#    with SKIP_REGRESSION_GATE=1 (e.g. an intentional algorithm
#    change), which records the skip in the committed file.
REG_FACTOR="${REG_FACTOR:-1.5}"
REG_MIN_CPU="${REG_MIN_CPU:-1.0}"
PREV="${PREV_COMMITTED:-bench_committed.json}"
if [ "${SKIP_REGRESSION_GATE:-0}" != "1" ] && [ -f "$PREV" ]; then
  cp "$PREV" /tmp/bench_prev_gate.json   # survive the committed-file copy
  gate_out=$(python3 tools/bench_regression_gate.py \
    /tmp/bench_prev_gate.json bench_out.json \
    "$REG_FACTOR" "$REG_MIN_CPU" 2> >(cat >&2))
  if [ $? -ne 0 ]; then
    # Re-measure ONLY the flagged queries in ISOLATION and re-compare:
    # per-query process-cpu on a 32-thread JVM carries cross-query
    # attribution noise that isolation removes (the ScaleSmoke
    # round-13 lesson). Only a regression that SURVIVES isolation
    # fails the commit.
    flagged=$(printf '%s\n' "$gate_out" | sed -n 's/^REGRESSED: //p')
    if [ -z "$flagged" ]; then
      # the gate died WITHOUT a regression verdict (crash, torn json):
      # that is a broken comparison, not a clean one — never commit
      echo "FAIL: regression gate errored without a verdict — NOT" >&2
      echo "committing this run" >&2
      exit 3
    fi
    echo "== regression gate flagged [$flagged] — retesting in isolation"
    cp bench_out.json /tmp/bench_main_run.json
    rm -f bench_out.json
    SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_BENCH_REPS="$REPS" \
      SPARK_GRAFT_BENCH_QS="$flagged" \
      sbt -batch "runMain graft.Bench" 2>&1 | tail -2
    if [ ! -f bench_out.json ]; then
      echo "FAIL: isolation retest produced no bench_out.json" >&2
      exit 3
    fi
    if ! python3 tools/bench_regression_gate.py \
        /tmp/bench_prev_gate.json bench_out.json \
        "$REG_FACTOR" "$REG_MIN_CPU" --queries "$flagged" \
        --verdict-into /tmp/bench_main_run.json; then
      echo "FAIL: regression survived the isolation retest — NOT" >&2
      echo "committing this run (SKIP_REGRESSION_GATE=1 to override)" >&2
      exit 3
    fi
    echo "== isolation retest CLEAN: the flags were attribution noise"
    mv /tmp/bench_main_run.json bench_out.json
  fi
else
  reason=$([ -f "$PREV" ] && echo "SKIP_REGRESSION_GATE=1" || echo "no previous committed file")
  echo "== regression gate skipped ($reason)"
  # the committed artifact must carry the skip — an intentionally
  # skipped comparison and a never-compared run are different audits
  REASON="$reason" python3 - <<'EOF'
import json, os
j = json.load(open("bench_out.json"))
j["regression_gate"] = {"skipped": True, "reason": os.environ["REASON"]}
json.dump(j, open("bench_out.json", "w"))
EOF
fi
cp bench_out.json bench_committed.json
python3 - <<'EOF'
import json
j = json.load(open("bench_committed.json"))
print(f"COMMITTED: wall total {j['value']}s, "
      f"cpu total {j.get('cpu_total', 'n/a')}s, "
      f"min_of {j.get('min_of')}, load max {j['load']['max']}, "
      f"ambient_suspect {j.get('ambient_suspect')}")
EOF
echo "== done: bench_committed.json updated (git add it with the round)"
