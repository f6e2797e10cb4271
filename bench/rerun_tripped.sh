#!/usr/bin/env bash
# Isolated re-run adjudicator for bench tripwire firings (VERDICT r9 #1).
#
# A tripped query that Bench classifies `cpi` (task CPU grown at equal
# shuffle bytes, clean JVM counters) is ambiguous between host CPI
# inflation (r9's q33–q34c block) and a plan doing more per-byte compute.
# The discriminating experiment is a FRESH-JVM re-run of just those
# queries on a quiet host: reproduced at reference ⇒ environmental,
# still elevated ⇒ plan. This script runs that experiment under the exact
# driver protocol (same sbt fork, same envs, same 3-pass min reporting)
# and prints the per-query verdict.
#
# Usage:
#   bench/rerun_tripped.sh               # keys from the last protocol output
#   bench/rerun_tripped.sh q33 q34b      # explicit keys
# Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
#      BENCH_JSON (tripped-list source, default bench/driver_protocol_last.json)
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
SRC="${BENCH_JSON:-bench/driver_protocol_last.json}"
if [ $# -gt 0 ]; then
  KEYS="$*"
else
  KEYS=$(python3 -c "import json; print(' '.join(json.load(open('$SRC')).get('tripped', [])))")
fi
if [ -z "$KEYS" ]; then
  echo "[rerun-tripped] no tripped queries (source: $SRC)" >&2
  exit 0
fi
# Bench's CLI filter is substring-contains over FULL query names; report
# keys are the qNN[x] prefix. "q33" would also match q33b_*, so bare
# prefixes get a trailing underscore to match only their own family row.
FILTER=$(python3 -c "
import sys
ks = sys.argv[1:]
print(','.join(k if '_' in k else k + '_' for k in ks))" $KEYS)
OUT="bench/rerun_tripped_last.json"
LOG="$(mktemp /tmp/graft_rerun_tripped_XXXX.log)"
echo "[rerun-tripped] keys=[$KEYS] filter=$FILTER sf=$SF_DIR log=$LOG" >&2

SPARK_GRAFT_SF_DIR="$SF_DIR" \
SPARK_GRAFT_METRICS_OUT="bench/rerun_tripped_last.metrics.json" \
  sbt -batch "runMain graft.Bench $FILTER" >"$LOG" 2>&1 || {
    echo "[rerun-tripped] sbt rc=$? — tail:" >&2; tail -20 "$LOG" >&2; exit 1; }
grep '"metric":"total"' "$LOG" | tail -1 > "$OUT"

python3 - "$OUT" $KEYS <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
keys = sys.argv[2:]
ref = json.load(open("bench/reference.json"))["queries"]
still = set(d.get("tripped", []))
print(f"[rerun-tripped] isolated fresh-JVM re-run at {d['sf']}:")
for k in keys:
    got, want = d["queries"].get(k), ref.get(k)
    if got is None or want is None:
        print(f"  {k}: not measured (got={got}, ref={want})")
    elif k in still:
        print(f"  {k}: {got:.2f}s vs ref {want:.2f}s — STILL ELEVATED => plan regression")
    else:
        print(f"  {k}: {got:.2f}s vs ref {want:.2f}s — reproduced => environmental")
if not still:
    print("[rerun-tripped] VERDICT: all reproduced at reference — environmental")
else:
    print(f"[rerun-tripped] VERDICT: {sorted(still)} remain elevated in isolation — plan")
EOF
echo "[rerun-tripped] wrote $OUT (+ bench/rerun_tripped_last.metrics.json)" >&2
