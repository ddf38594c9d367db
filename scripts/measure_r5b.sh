#!/usr/bin/env bash
# Round-5 part B: legs depending on r5 code landed after measure_r5.sh
# started (paged host-mirror tables + paged pipelined composition).
set -u
cd "$(dirname "$0")/.."
OUT=scripts/measure_r5.jsonl
run() {
  echo "== $*" >&2
  env "$@" timeout 2000 python bench.py >> "$OUT" 2>> scripts/measure_r5.err
}
# paged A/B at 16 slots: plain (host-mirror tables, no per-chunk device
# read) vs pipelined — the r4 paged row burned 38 ms/step in dispatch
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_SLOTS=16 BENCH_REQUESTS=48 BENCH_PAGED=1 BENCH_PIPELINED=1
# paged at 32 slots (paged is the config that fits 32 dense-free slots)
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_SLOTS=32 BENCH_REQUESTS=96 BENCH_PAGED=1
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_SLOTS=32 BENCH_REQUESTS=96 BENCH_PAGED=1 BENCH_PIPELINED=1
# decode_chunk frontier at the best point (chunk32 beat chunk16 790->829)
run BENCH_MODE=serving BENCH_CONFIG=int8kv BENCH_SLOTS=32 BENCH_REQUESTS=96 BENCH_CHUNK=48
run BENCH_MODE=serving BENCH_CONFIG=int8kv BENCH_SLOTS=32 BENCH_REQUESTS=96 BENCH_CHUNK=64
run BENCH_MODE=serving BENCH_CONFIG=int8kv BENCH_SLOTS=32 BENCH_REQUESTS=192 BENCH_CHUNK=32
# decode-attention mode at the serving batch shape: the r3 bs1 in-range
# finding (xla wins below S=4096) may invert at 33 rows with int8 KV
# (the xla path materializes dequantized K/V per layer; split timers r5
# attribute 0.8 ms/row of marginal decode cost)
run BENCH_MODE=serving BENCH_CONFIG=int8kv BENCH_SLOTS=32 BENCH_REQUESTS=96 BENCH_CHUNK=32 BENCH_DECODE_ATTN=split
run BENCH_MODE=serving BENCH_CONFIG=int8kv BENCH_SLOTS=32 BENCH_REQUESTS=96 BENCH_CHUNK=32 BENCH_DECODE_ATTN=fused
