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
set -uo pipefail
cd "$(dirname "$0")/.."
SF=$1; OUT=$2; OT=${3:-900}
mkdir -p "$OUT"
rm -f "$OUT/VERIFY_DONE"

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

echo "== overlapped oracle check (workers: ${CHECK_WORKERS:-2}) =="
python3 tools/check_incremental.py "$SF" "$OUT" "$OT" "${CHECK_WORKERS:-2}"
wait "$VPID"

RES="$OUT/incremental_results.txt"
echo "== first-pass classification =="
python3 tools/classify_results.py "$RES"

echo "== serial retries (48 GB DuckDB, ${RETRY_TIMEOUT:-1800}s each) =="
python3 tools/classify_results.py "$RES" --retry-queue | while read -r q; do
  [ -n "$q" ] || continue
  echo "-- retry $q"
  out=$(tools/retry_oracle.sh "$SF" "$OUT" "$q" "${RETRY_TIMEOUT:-1800}" 2>&1)
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
python3 tools/classify_results.py "$RES" --ledger "$OUT/oracle_sql.json" \
  > "$OUT/LEDGER.md"
cat "$OUT/LEDGER.md"
