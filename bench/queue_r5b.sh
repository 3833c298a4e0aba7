#!/bin/bash
# Round-5 queue #2: re-run the (fixed) wave decomposition probe.
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl
echo "# r5b queue start $(date -u +%FT%TZ)" >> "$OUT"
env PROBE_LOG_N=22 PROBE_STEPS=32 timeout 7200 python bench/probe_wave.py \
  > bench/.r5b_wave.out 2> bench/.r5b_wave.err \
  && cat bench/.r5b_wave.out >> "$OUT" \
  || echo "{\"probe\": \"wave_22\", \"error\": $?}" >> "$OUT"
echo "# r5b queue end $(date -u +%FT%TZ)" >> "$OUT"
