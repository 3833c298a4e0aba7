#!/bin/bash
# Round-5 queue #1: wave decomposition probe (gates the Pallas DMA-gather
# decision), G2 2^24, PLONK 2^20 stage breakdown, solve-variance probe.
set -u
cd "$(dirname "$0")/.."
OUT=bench/SWEEP.jsonl
echo "# r5a queue start $(date -u +%FT%TZ)" >> "$OUT"

env PROBE_LOG_N=22 PROBE_STEPS=32 timeout 7200 python bench/probe_wave.py \
  > bench/.r5a_wave.out 2> bench/.r5a_wave.err \
  && cat bench/.r5a_wave.out >> "$OUT" \
  || echo "{\"probe\": \"wave_22\", \"error\": $?}" >> "$OUT"

env BENCH_METRIC=msm_g2 BENCH_LOG_N=24 BENCH_ITERS=2 timeout 7200 \
  python bench.py > bench/.r5a_g2_24.out 2> bench/.r5a_g2_24.err \
  && cat bench/.r5a_g2_24.out >> "$OUT" \
  || echo "{\"metric\": \"msm_g2_2^24\", \"error\": $?}" >> "$OUT"

env BENCH_METRIC=plonk BENCH_LOG_N=20 BENCH_ITERS=2 timeout 10800 \
  python bench.py > bench/.r5a_plonk_20.out 2> bench/.r5a_plonk_20.err \
  && cat bench/.r5a_plonk_20.out >> "$OUT" \
  || echo "{\"metric\": \"plonk_2^20\", \"error\": $?}" >> "$OUT"

# host-only (CPU): solve variance — runs after the TPU work so it owns
# the single CPU core
env SOLVE_LOG_N=20 SOLVE_ITERS=6 timeout 3600 python bench/probe_solve.py \
  > bench/.r5a_solve.out 2> bench/.r5a_solve.err \
  && cat bench/.r5a_solve.out >> "$OUT" \
  || echo "{\"probe\": \"solve_20\", \"error\": $?}" >> "$OUT"

echo "# r5a queue end $(date -u +%FT%TZ)" >> "$OUT"
