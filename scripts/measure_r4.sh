#!/usr/bin/env bash
# Round-4 measurement matrix on the real chip (run when the axon tunnel is
# up). Each line appends one JSON record to scripts/measure_r4.jsonl.
# Focus (VERDICT r3): int4/fp8 bit-plant kernels, serving slot-scaling
# roofline + phase breakdown + percentiles, prompt-lookup serving, batched
# offline decode, long-context DMA-dispatch rows, pipelined regime check.
set -u
cd "$(dirname "$0")/.."
OUT=scripts/measure_r4.jsonl
run() {
  echo "== $*" >&2
  env "$@" timeout 1800 python bench.py >> "$OUT" 2>> scripts/measure_r4.err
}

# Task B (bs1 in8 out50) per quant config — int4/fp8 carry the new decodes
for c in int8 int4 fp8 fp16 sq int8kv int8_int8kv; do
  run BENCH_CONFIG=$c
done
# Task A shape
for c in fp16 int8 int4; do
  run BENCH_CONFIG=$c BENCH_IN=923 BENCH_OUT=100
done
# Batched offline decode (item 8): bs 4/8/16
for b in 4 8 16; do
  run BENCH_CONFIG=int8 BENCH_BATCH=$b
done
run BENCH_CONFIG=int4 BENCH_BATCH=8
# Long context where the DMA decode kernel auto-dispatches (item 7)
run BENCH_CONFIG=int8_int8kv BENCH_IN=8192 BENCH_OUT=64
run BENCH_CONFIG=int8 BENCH_IN=8192 BENCH_OUT=64
run BENCH_CONFIG=int8 BENCH_IN=8192 BENCH_OUT=64 BENCH_DECODE_ATTN=xla
run BENCH_CONFIG=int8_int8kv BENCH_IN=16384 BENCH_OUT=64
# Serving slot-scaling roofline (item 2): 8/16/32 slots x {int8,int4} x
# {dense,paged}; n_req scales with slots
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_SLOTS=8  BENCH_REQUESTS=24
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_SLOTS=16 BENCH_REQUESTS=48
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_SLOTS=32 BENCH_REQUESTS=96
run BENCH_MODE=serving BENCH_CONFIG=int4 BENCH_SLOTS=8  BENCH_REQUESTS=24
run BENCH_MODE=serving BENCH_CONFIG=int4 BENCH_SLOTS=16 BENCH_REQUESTS=48
run BENCH_MODE=serving BENCH_CONFIG=int4 BENCH_SLOTS=32 BENCH_REQUESTS=96
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_SLOTS=16 BENCH_REQUESTS=48 BENCH_PAGED=1
# Pipelined in its designed regime (item 4): more slots + admission churn
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_SLOTS=16 BENCH_REQUESTS=48 BENCH_PIPELINED=1
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_SLOTS=32 BENCH_REQUESTS=96 BENCH_PIPELINED=1
# Prompt-lookup speculative serving (item 3): repetitive workload
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_SPEC_DRAFT=lookup BENCH_REPETITIVE=1
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_REPETITIVE=1
