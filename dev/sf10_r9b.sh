#!/bin/bash
# Round-9 sf10 follow-ups: minted-barcode scale (8-hex at its packing-
# feasible 400k + 10-hex at the full 1.5M, all-pairs over each, and the
# saturated fail-fast control), curation DAG template route, q283
# single-pass. One JVM per measurement, scratch wiped between.
cd "$(dirname "$0")/.." || exit 1
LOG="${1:-/tmp/sf10_r9b.jsonl}"
wipe() { rm -rf /dev/shm/graft-scratch/spark-local/*; }

wipe; echo "=== mint 400k len8 ===" >&2
timeout 2400 dev/run1.sh graft.dev.BarcodeScale mint 400000 /dev/shm/minted8 8 \
  2>/tmp/mint8.err | grep '"mode"' >> "$LOG" \
  || echo '{"mode":"mint","code_len":8,"sec":"FAIL"}' >> "$LOG"

wipe; echo "=== pairs over minted8 ===" >&2
timeout 1200 dev/run1.sh graft.dev.BarcodeScale pairs /dev/shm/minted8 \
  2>/tmp/pairs8.err | grep '"mode"' >> "$LOG" \
  || echo '{"mode":"pairs8","sec":"FAIL"}' >> "$LOG"

wipe; echo "=== mint 1.5M len10 ===" >&2
timeout 2400 dev/run1.sh graft.dev.BarcodeScale mint 1500000 /dev/shm/minted10 10 \
  2>/tmp/mint10.err | grep '"mode"' >> "$LOG" \
  || echo '{"mode":"mint","code_len":10,"sec":"FAIL"}' >> "$LOG"

wipe; echo "=== pairs over minted10 ===" >&2
timeout 1200 dev/run1.sh graft.dev.BarcodeScale pairs /dev/shm/minted10 \
  2>/tmp/pairs10.err | grep '"mode"' >> "$LOG" \
  || echo '{"mode":"pairs10","sec":"FAIL"}' >> "$LOG"

wipe; echo "=== barcode saturated control ===" >&2
timeout 1200 dev/run1.sh graft.dev.BarcodeScale control 1500000 \
  2>/tmp/control.err | grep '"mode"' >> "$LOG" \
  || echo '{"mode":"control","sec":"FAIL"}' >> "$LOG"

wipe; echo "=== curation template (banded route) ===" >&2
timeout 2400 dev/run1.sh graft.dev.CurationScale template 500000 \
  2>/tmp/curt.err | grep '"metric"' >> "$LOG" \
  || echo '{"metric":"curation_dag","mode":"template","sec":"FAIL"}' >> "$LOG"

wipe; echo "=== q283 single pass ===" >&2
timeout 3000 dev/run1.sh graft.dev.TimeOne q283_stratified_recall dev/sf10 1 \
  2>/tmp/q283.err | grep '"query"' >> "$LOG" \
  || echo '{"query":"q283_stratified_recall","sec":"TIMEOUT/FAIL"}' >> "$LOG"

wipe
echo "done" >&2
