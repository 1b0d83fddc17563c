#!/usr/bin/env bash
# The one-command local stand-in for the driver's correctness gate.
#
#   tools/local_gate.sh [sfDir]        (default /root/testdata/sf0.01)
#
# Runs, in order:
#   1. graft.Verify        — every SparkEntry query -> parquet + oracle_sql.json
#   2. check_oracle.py     — DuckDB value compare (the driver's check)
#   3. oracle_type_lint.py — no HUGEINT/UHUGEINT oracle output columns
#      (the driver-hasher artifact class that cost rounds 5 and 7)
#   4. canonical_hash.py   — bit-level cross-engine hash for any query
#      check_oracle flagged (bisects driver-hasher artifacts from real
#      value divergence)
# Exits non-zero on the first red step. Run before every end-of-round
# so a driver-red can never be the first detection.
set -uo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT=/tmp/local_gate_out

rm -rf "$OUT"
echo "== 1/4 graft.Verify @ $SF_DIR"
sbt -batch "runMain graft.Verify $SF_DIR $OUT" 2>&1 |
  grep -E "\[verify\]|Nonzero exit|error\] \(run" || true
[ -f "$OUT/oracle_sql.json" ] || { echo "FAIL: Verify produced no oracle_sql.json"; exit 1; }

echo "== 2/4 check_oracle.py"
CHECK=$(python3 tools/check_oracle.py "$SF_DIR" "$OUT")
echo "$CHECK" | tail -1
FAILED_QS=$(echo "$CHECK" | sed -n 's/^FAIL \([a-zA-Z0-9_]*\).*/\1/p' | sort -u)

echo "== 3/4 oracle_type_lint.py"
python3 tools/oracle_type_lint.py "$SF_DIR" "$OUT/oracle_sql.json" || exit 1

if [ -n "$FAILED_QS" ]; then
  echo "== 4/4 canonical_hash.py (bisecting failures)"
  # shellcheck disable=SC2086
  python3 tools/canonical_hash.py "$SF_DIR" "$OUT" $FAILED_QS
  echo "FAIL: value compare red (MATCH above = driver-hasher artifact;"
  echo "      DIFF = real value divergence — fix before end of round)"
  exit 1
fi
echo "== 4/4 canonical_hash.py skipped (nothing to bisect)"
echo "GATE GREEN @ $SF_DIR"
