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
# CONTROL queries ride along in every re-run: three stable, code-untouched
# rows (hash agg / broadcast join / window). If the host is uniformly slow
# RIGHT NOW (the roving CPI-inflation class strikes whole time windows,
# not queries), the controls read elevated too — the epilogue divides the
# tripped queries by the controls' median elevation before judging, so a
# host-wide scalar cannot masquerade as a per-query plan regression.
CONTROLS="q03 q09 q14"
# Bench's CLI filter is substring-contains over FULL query names; report
# keys are the qNN[x] prefix. "q33" would also match q33b_*, so bare
# prefixes get a trailing underscore to match only their own family row.
FILTER=$(python3 -c "
import sys
ks = sys.argv[1:]
print(','.join(k if '_' in k else k + '_' for k in ks))" $KEYS $CONTROLS)
KEYS_N=$(echo $KEYS | wc -w)
OUT="bench/rerun_tripped_last.json"
LOG="$(mktemp /tmp/graft_rerun_tripped_XXXX.log)"
echo "[rerun-tripped] keys=[$KEYS] controls=[$CONTROLS] filter=$FILTER sf=$SF_DIR log=$LOG" >&2

SPARK_GRAFT_SF_DIR="$SF_DIR" \
SPARK_GRAFT_METRICS_OUT="bench/rerun_tripped_last.metrics.json" \
  sbt -batch "runMain graft.Bench $FILTER" >"$LOG" 2>&1 || {
    echo "[rerun-tripped] sbt rc=$? — tail:" >&2; tail -20 "$LOG" >&2; exit 1; }
grep '"metric":"total"' "$LOG" | tail -1 > "$OUT"

# Verdict per query, CONTROL-NORMALIZED. The reference was captured in one
# host window; this re-run happens in another. The controls' median
# elevation vs their own reference rows estimates the host-wide scalar of
# the CURRENT window (floored at 1.0 — a faster host never excuses a
# regression); each tripped query is divided by it before the tripwire
# rule re-applies. A plan regression survives normalization (it is
# per-query, on top of whatever the host does); the roving CPI class is
# host-wide and divides out. The flagged-figure comparison stays as a
# second signal: an elevation that collapsed to well under half its
# flagged figure did not reproduce, whatever the scalar says.
python3 - "$OUT" "$SRC" "$KEYS_N" $KEYS $CONTROLS <<'EOF'
import json, os, statistics, sys
d = json.load(open(sys.argv[1]))
src = json.load(open(sys.argv[2])) if os.path.exists(sys.argv[2]) else {"queries": {}}
nkeys = int(sys.argv[3])
keys, controls = sys.argv[4:4 + nkeys], sys.argv[4 + nkeys:]
ref = json.load(open("bench/reference.json"))["queries"]
got_q = d["queries"]
ratios = [got_q[c] / ref[c] for c in controls if c in got_q and ref.get(c, 0) > 0]
scalar = max(1.0, statistics.median(ratios)) if ratios else 1.0
print(f"[rerun-tripped] isolated fresh-JVM re-run at {d['sf']}; host scalar "
      f"from controls {controls}: {scalar:.2f}x "
      f"({', '.join(f'{c}={got_q[c]:.2f}/{ref[c]:.2f}' for c in controls if c in got_q)})")
plan = []
for k in keys:
    got, want = got_q.get(k), ref.get(k)
    flagged = src["queries"].get(k)
    if got is None or want is None:
        print(f"  {k}: not measured (got={got}, ref={want})")
        continue
    adj = got / scalar
    elevated = adj > want * 1.5 and adj - want > 0.3   # Bench.tripwire's rule
    collapsed = flagged is not None and got < 0.6 * flagged
    if elevated and not collapsed:
        plan.append(k)
        print(f"  {k}: {got:.2f}s ({adj:.2f}s host-normalized) vs ref {want:.2f}s "
              f"— elevation survives normalization => plan regression")
    elif elevated and collapsed:
        print(f"  {k}: {got:.2f}s vs ref {want:.2f}s — elevation collapsed from "
              f"{flagged:.2f}s => environmental spike (did not reproduce)")
    else:
        print(f"  {k}: {got:.2f}s ({adj:.2f}s host-normalized) vs ref {want:.2f}s "
              f"— at reference => environmental")
if plan:
    print(f"[rerun-tripped] VERDICT: {sorted(plan)} remain elevated after "
          f"host normalization — plan")
else:
    print("[rerun-tripped] VERDICT: no query remains elevated after host "
          "normalization — environmental")
EOF
echo "[rerun-tripped] wrote $OUT (+ bench/rerun_tripped_last.metrics.json)" >&2
