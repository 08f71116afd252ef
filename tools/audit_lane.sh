#!/usr/bin/env bash
# One-command lane audit (builder tooling): engine Verify pass with the
# DuckDB oracle check OVERLAPPED (each query compared as soon as its
# parquet dir completes), then classify, then serial large-budget
# retries for resource failures/timeouts, then a self-contained
# markdown ledger. Rounds 8-9 hand-stitched exactly this pipeline and
# the final ledger fell through the cracks (VERDICT r9 finding #1);
# one command means the ledger always exists and always recomputes.
#
# Usage: tools/audit_lane.sh <sfDir> <outDir> [oracleTimeoutSec]
#   tools/audit_lane.sh scaledata/zipf_sf0.01 target/audit_zipf_sf0.01
#   SPARK_DRIVER_MEM=64g SPARK_GRAFT_QUERY_TIMEOUT=900 CHECK_WORKERS=2 \
#     tools/audit_lane.sh scaledata/zipf_sf10 target/audit_zipf_sf10 900
#
# Env knobs: SPARK_DRIVER_MEM (engine JVM heap, default 8g),
# SPARK_GRAFT_QUERY_TIMEOUT (engine per-query watchdog sec; unset = none),
# CHECK_WORKERS (parallel DuckDB workers, default 2, 12 GB cap each),
# RETRY_TIMEOUT (serial retry wall-clock sec, default 1800),
# AUDIT_ONLY (comma-separated query subset passed to Verify).
#
# Resource scoping (the r10 lane's ops gotcha, CORRECTNESS_ZIPF.md):
# DUCKDB_MEMORY_LIMIT / DUCKDB_TEMP_LIMIT exported by the CALLER apply
# to the SERIAL phase only — the incremental workers always run at
# their own bounded caps (12 GB mem / 40 GB spill each), because two
# workers inheriting a caller's 60 GB spill cap raced the disk to
# "No space left" in the round-10 regeneration (q_mm_phash).
set -uo pipefail
cd "$(dirname "$0")/.."
SF=$1; OUT=$2; OT=${3:-900}
mkdir -p "$OUT"
rm -f "$OUT/VERIFY_DONE"

# caller-supplied DuckDB budgets are for the serial phase only
SERIAL_MEM=${DUCKDB_MEMORY_LIMIT:-48GB}
SERIAL_TMP=${DUCKDB_TEMP_LIMIT:-35GB}
unset DUCKDB_MEMORY_LIMIT DUCKDB_TEMP_LIMIT

echo "== engine pass (background, log: $OUT/verify.log) =="
tools/run.sh graft.Verify "$SF" "$OUT" ${AUDIT_ONLY:+"$AUDIT_ONLY"} \
  > "$OUT/verify.log" 2>&1 &
VPID=$!

# Verify writes oracle_sql.json before its query loop; the checker needs
# it up front. Bail out if the engine dies before producing it.
while [ ! -f "$OUT/oracle_sql.json" ]; do
  if ! kill -0 "$VPID" 2>/dev/null; then
    echo "engine pass died before writing oracle_sql.json:" >&2
    tail -20 "$OUT/verify.log" >&2
    exit 1
  fi
  sleep 1
done

# Manifest the ledger/gate diff against: with AUDIT_ONLY, the attempted
# set is the SUBSET, not the full registry — diffing against the full
# oracle_sql.json would list every unselected query as an engine-side
# no-result and corrupt the ledger arithmetic.
MANIFEST="$OUT/oracle_sql.json"
if [ -n "${AUDIT_ONLY:-}" ]; then
  MANIFEST="$OUT/manifest.json"
  python3 - "$AUDIT_ONLY" > "$MANIFEST" <<'EOF'
import json, sys
print(json.dumps([q for q in sys.argv[1].split(",") if q.strip()]))
EOF
fi

echo "== overlapped oracle check (workers: ${CHECK_WORKERS:-2}) =="
# VPID passed so engine-process death counts as "finished" — without it
# a mid-loop driver OOM leaves VERIFY_DONE unwritten and the checker
# polls forever, hanging a multi-hour audit instead of failing it.
python3 tools/check_incremental.py "$SF" "$OUT" "$OT" \
  "${CHECK_WORKERS:-2}" "$VPID"
wait "$VPID"

RES="$OUT/incremental_results.txt"
echo "== first-pass classification =="
python3 tools/classify_results.py "$RES"

echo "== serial retries (default ${SERIAL_MEM}/${SERIAL_TMP}, ${RETRY_TIMEOUT:-1800}s each) =="
python3 tools/classify_results.py "$RES" --retry-queue | while read -r q; do
  [ -n "$q" ] || continue
  # Known giants get their measured budgets up front (round-10 direct
  # evidence: q_mm_phash passed at 90 GB mem / 109.4M rows, 12 GB+disk
  # failed; q_jaro_winkler's 91.0M-pair compare ran ~15 min; the
  # cluster-family retries passed at 80 GB) instead of burning one
  # default-budget retry first.
  mem=$SERIAL_MEM; tmp=$SERIAL_TMP; t=${RETRY_TIMEOUT:-1800}
  case "$q" in
    q_mm_phash)            mem=90GB; tmp=60GB; [ "$t" -lt 2700 ] && t=2700 ;;
    q_jaro_winkler)        mem=80GB; tmp=60GB; [ "$t" -lt 2700 ] && t=2700 ;;
    q_neardup_clusters|q_incr_clusters) mem=80GB; tmp=60GB ;;
  esac
  echo "-- retry $q (mem=$mem tmp=$tmp timeout=${t}s)"
  out=$(DUCKDB_MEMORY_LIMIT=$mem DUCKDB_TEMP_LIMIT=$tmp \
    tools/retry_oracle.sh "$SF" "$OUT" "$q" "$t" 2>&1)
  # append the retry outcome as a results record (last record wins in
  # classification); keep full detail as continuation lines
  line=$(printf '%s\n' "$out" | grep -m1 -E '^(PASS|FAIL|ORACLE_TIMEOUT)' \
    || echo "FAIL $q: retry produced no verdict line")
  {
    printf '%s\n' "$line"
    printf '%s\n' "$out" | sed 's/^/  | /'
  } >> "$RES"
  printf '%s\n' "$line"
done

echo "== ledger -> $OUT/LEDGER.md =="
python3 tools/classify_results.py "$RES" --ledger "$MANIFEST" \
  > "$OUT/LEDGER.md"
cat "$OUT/LEDGER.md"
