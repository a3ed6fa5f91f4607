#!/bin/bash
# Round-9 sf10 measurement sweep: one JVM per query (PERF_r4 §1),
# scratch wiped between JVMs, results appended as JSON lines to $1.
# Usage: dev/sf10_r9.sh <resultsLog> [passes=2]
cd "$(dirname "$0")/.." || exit 1
LOG="${1:-/tmp/sf10_r9.jsonl}"
PASSES="${2:-2}"
QUERIES=(
  q124_pagerank q126_triangles q129_clustering q131_kcore
  q135_khop q137_random_walks
  q282_stratified_containment q283_stratified_recall q284_minted_pairs
  q272_gram_matrix q249_surprise_filter q138_dsir q276_winsorized
  q200_curation q154_entity_resolution q281_curation_neardup
)
for q in "${QUERIES[@]}"; do
  rm -rf /dev/shm/graft-scratch/spark-local/*
  echo "=== $q ===" >&2
  timeout 1200 dev/run1.sh graft.dev.TimeOne "$q" dev/sf10 "$PASSES" \
    2>/dev/null | grep '"query"' >> "$LOG" \
    || echo "{\"query\":\"$q\",\"dir\":\"dev/sf10\",\"sec\":\"TIMEOUT/FAIL\"}" >> "$LOG"
done
rm -rf /dev/shm/graft-scratch/spark-local/*
echo "done" >&2
