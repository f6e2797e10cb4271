#!/usr/bin/env bash
# Builder-side reproduction of the driver's per-round bench invocation —
# see bench/driver_protocol.md. Produces the same JSON line the driver
# records as BENCH_r{N}.json's `parsed`, plus bench/metrics_last.json.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.1}"
OUT="${2:-bench/driver_protocol_last.json}"
LOG="$(mktemp /tmp/graft_driver_protocol_XXXX.log)"

echo "[driver-protocol] sf=$SF_DIR log=$LOG" >&2
# Freshness stamp taken IMMEDIATELY before launch (ADVICE r13): comparing
# line_full.json against $LOG is always false — the log keeps receiving
# Spark-shutdown/sbt output after Bench writes the capture mid-run, so the
# log's mtime always wins and the guard silently degraded every capture to
# the stdout line. Against a pre-launch stamp, any line_full.json written
# DURING this run tests newer; a stale git-tracked copy tests older.
STAMP="$(mktemp /tmp/graft_driver_stamp_XXXX)"
# backdate the stamp: -nt is false on mtime TIES, so on coarse-granularity
# (1s) filesystems a capture written in the stamp's second would read as
# stale and silently degrade to the stdout line (ADVICE r14)
touch -d '1 second ago' "$STAMP"
SPARK_GRAFT_SF_DIR="$SF_DIR" sbt -batch "runMain graft.Bench" >"$LOG" 2>&1 || {
  echo "[driver-protocol] sbt rc=$? — tail:" >&2; tail -20 "$LOG" >&2; exit 1; }

# the driver parses the LAST line that is a JSON object; replicate that
grep '"metric":"total"' "$LOG" | tail -1 > "$OUT.stdout"
if [ ! -s "$OUT.stdout" ]; then
  echo "[driver-protocol] no bench JSON line found — tail:" >&2
  tail -20 "$LOG" >&2; exit 1
fi
# the stdout line must fit the harness's 2000-char tail window — fail loudly
# here rather than silently shipping a line the driver can't parse (r12)
LINELEN=$(wc -c < "$OUT.stdout")
if [ "$LINELEN" -gt 2000 ]; then
  echo "[driver-protocol] STDOUT LINE OVER BUDGET: $LINELEN chars (>2000)" >&2; exit 1
fi
# the CAPTURE (what gets compared and promoted as a reference) is the
# untruncated line: full per-query map even when the stdout line degraded
# its map to the slowest-K to fit the window (round 13, 168 queries)
# (mtime guard vs the PRE-LAUNCH stamp: a git-tracked stale copy must not
#  impersonate this run — the rerun_auto.metrics.json lesson from ADVICE
#  r12, guard repaired per ADVICE r13)
if [ -s bench/line_full.json ] && [ bench/line_full.json -nt "$STAMP" ]; then
  cp bench/line_full.json "$OUT"
else
  echo "[driver-protocol] WARNING: no fresh line_full.json — falling back to stdout line" >&2
  cp "$OUT.stdout" "$OUT"
fi
rm -f "$OUT.stdout" "$STAMP"
python3 - "$OUT" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
qs = d["queries"]
print(f"warm total {d['value']}s  cold {d['cold_total']}s  n={len(qs)}  failed={d['failed']}")
worst = sorted(qs.items(), key=lambda kv: -kv[1])[:10]
print("worst:", " ".join(f"{k}={v}" for k, v in worst))
EOF
# Archive this run's per-query task metrics NEXT TO the seconds capture
# (VERDICT r9 #6): metrics_last.json is overwritten by every run, which made
# after-the-fact block-firing forensics (r9's q33–q34c) impossible once a
# newer run had landed. The sibling file means any promoted reference
# capture automatically has its metrics twin for the tripwire adjudicator.
if [ -f bench/metrics_last.json ]; then
  cp bench/metrics_last.json "${OUT%.json}.metrics.json"
fi
echo "[driver-protocol] wrote $OUT + ${OUT%.json}.metrics.json (+ bench/metrics_last.json)" >&2
