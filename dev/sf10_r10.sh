#!/bin/bash
# Round-10 sf10 measurement sweep: one JVM per query (PERF_r4 §1),
# scratch wiped between JVMs, results appended as JSON lines to $1.
# Covers the queries whose plans changed this round.
# Usage: dev/sf10_r10.sh <resultsLog> [passes=2]
cd "$(dirname "$0")/.." || exit 1
LOG="${1:-/tmp/sf10_r10.jsonl}"
PASSES="${2:-2}"
QUERIES=(
  q155_phash_dedup q206_trimmed_mean
  q55_fhir_encounters q56_fhir_pa
  q46_upsert_sample q34_mint q276_winsorized
)
for q in "${QUERIES[@]}"; do
  rm -rf /dev/shm/graft-scratch/spark-local/*
  echo "=== $q ===" >&2
  HEAP=40g timeout 1200 dev/run1.sh graft.dev.TimeOne "$q" dev/sf10 "$PASSES" \
    2>/dev/null | grep '"query"' >> "$LOG" \
    || echo "{\"query\":\"$q\",\"dir\":\"dev/sf10\",\"sec\":\"TIMEOUT/FAIL\"}" >> "$LOG"
done
