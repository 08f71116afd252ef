#!/usr/bin/env bash
# Standing TRIPLE-LANE correctness gate (builder tooling): the full
# DuckDB oracle compare on THREE corpus shapes —
#   lane 1: uniform sf0.01 (/root/testdata — the driver's own gate),
#   lane 2: zipf_sf0.01 (fixtures/zipf_sf0.01, COMMITTED — Zipf-headed
#           keys + open 1M-word vocabulary, the rank-frequency shape of
#           the reference's Amazon-reviews data), and
#   lane 3: clustered_sf0.01 (fixtures/clustered_sf0.01, COMMITTED —
#           mixture-of-Gaussians EMBEDDINGS with Zipf-skewed cluster
#           populations and planted near-duplicates at a known tau
#           margin; driver-shaped everywhere else). The zipf lane's
#           embeddings are zipf-invariant, so the embedding family
#           (semdedup/ANN/kmeans/cosine-neardup/isotropy/MMD) had no
#           adversarial corpus before this lane.
# Rationale: 6 of the 8 divergence classes found through round 9 were
# zipf-only (incl. the KM-minhash recall bug, silent for NINE rounds of
# green uniform gates). Every new operator gets checked under skew by
# default from now on — run this before committing any milestone.
#
# Usage: tools/gate.sh [outRoot]     (default target/gate)
# Exit 0 iff ALL lanes are 100% hash-green with no missing records.
set -uo pipefail
cd "$(dirname "$0")/.."
ROOT=${1:-target/gate}
ok=0
for lane in uniform:/root/testdata/sf0.01 zipf:fixtures/zipf_sf0.01 \
            clustered:fixtures/clustered_sf0.01; do
  name=${lane%%:*}; sf=${lane#*:}
  out="$ROOT/$name"
  rm -rf "$out"
  echo "=== lane: $name ($sf) ==="
  tools/audit_lane.sh "$sf" "$out" "${ORACLE_TIMEOUT:-900}" || true
  # audit_lane writes manifest.json on AUDIT_ONLY subset runs — gate
  # against the attempted set, not the full registry
  m="$out/manifest.json"; [ -f "$m" ] || m="$out/oracle_sql.json"
  python3 tools/classify_results.py "$out/incremental_results.txt" \
    --gate "$m" || ok=1
done
exit $ok
