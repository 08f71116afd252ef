#!/usr/bin/env bash
# Serial large-budget oracle retries for the sf10 audit (builder
# tooling): the parallel incremental pass caps each DuckDB worker at
# 12 GB / 40 GB spill so two workers can't exhaust the box; oracles
# that OOM'd there get ONE serial retry at 48 GB memory / 35 GB spill
# (override via DUCKDB_TEMP_LIMIT) before being recorded as resource
# exclusions.
# Usage: tools/retry_oracle.sh <sfDir> <outDir> <query> [timeoutSec]
set -uo pipefail
cd "$(dirname "$0")/.."
SF=$1; OUT=$2; Q=$3; T=${4:-1800}
DUCKDB_MEMORY_LIMIT=${DUCKDB_MEMORY_LIMIT:-48GB} \
  DUCKDB_TEMP_LIMIT=${DUCKDB_TEMP_LIMIT:-35GB} \
  timeout "$T" python3 tools/check.py "$SF" "$OUT" "$Q"
rc=$?
if [ $rc -eq 124 ]; then echo "ORACLE_TIMEOUT $Q (> ${T}s serial retry)"; fi
exit $rc
