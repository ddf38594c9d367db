#!/usr/bin/env bash
# Round-5 measurement matrix on the real chip (run when the axon tunnel is
# up). Each line appends one JSON record to scripts/measure_r5.jsonl.
# Focus (VERDICT r4): repeat-backed canonical rows (BENCH_REPEATS=3 is the
# bench default now — every row carries n= and samples[]), the int8kv dense
# serving slot curve at 7B, clean pipelined-vs-plain A/Bs at fixed slot
# counts, split compute/transfer readback attribution, the fixed
# prompt-lookup engine on zero-acceptance AND copy (accepting) workloads,
# and the decode_chunk retune. The 32-slot dense int8 leg is EXPECTED to
# fail fast with the capacity pre-check message (its remedy rows — int8kv —
# are the curve below); its stderr is the committed witness.
set -u
cd "$(dirname "$0")/.."
OUT=scripts/measure_r5.jsonl
run() {
  echo "== $*" >&2
  env "$@" timeout 2000 python bench.py >> "$OUT" 2>> scripts/measure_r5.err
}

# Task B (bs1 in8 out50) per quant config — now median-of-3 with samples
for c in int8 int4 fp8 fp16 sq int8kv int8_int8kv; do
  run BENCH_CONFIG=$c
done
# Task A shape
for c in fp16 int8 int4; do
  run BENCH_CONFIG=$c BENCH_IN=923 BENCH_OUT=100
done
# Batched offline decode (the serving roofline reference points)
for b in 4 8 16; do
  run BENCH_CONFIG=int8 BENCH_BATCH=$b
done
run BENCH_CONFIG=int4 BENCH_BATCH=8
# Long context (DMA decode auto-dispatch regime)
run BENCH_CONFIG=int8_int8kv BENCH_IN=8192 BENCH_OUT=64
run BENCH_CONFIG=int8_int8kv BENCH_IN=16384 BENCH_OUT=64

# --- Serving ---------------------------------------------------------------
# int8kv dense slot curve (VERDICT item 2b: the configs 3d8ffff added were
# never benched at 7B)
run BENCH_MODE=serving BENCH_CONFIG=int8kv BENCH_SLOTS=8  BENCH_REQUESTS=24
run BENCH_MODE=serving BENCH_CONFIG=int8kv BENCH_SLOTS=16 BENCH_REQUESTS=48
run BENCH_MODE=serving BENCH_CONFIG=int8kv BENCH_SLOTS=32 BENCH_REQUESTS=96
# bf16-KV comparison points that fit (16-slot r4 "OOM" was a crashed-leg
# cascade: re-measured clean at 516.8 tok/s in isolation, r5)
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_SLOTS=8  BENCH_REQUESTS=24
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_SLOTS=16 BENCH_REQUESTS=48
run BENCH_MODE=serving BENCH_CONFIG=int4 BENCH_SLOTS=16 BENCH_REQUESTS=48
run BENCH_MODE=serving BENCH_CONFIG=int4 BENCH_SLOTS=32 BENCH_REQUESTS=96
# capacity pre-check witness: expected to emit an error JSON fast
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_SLOTS=32 BENCH_REQUESTS=96 BENCH_ATTEMPTS=1 BENCH_REPEATS=1
# paged
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_SLOTS=16 BENCH_REQUESTS=48 BENCH_PAGED=1
# pipelined vs plain, SAME slot count, both fitting (clean A/B x2)
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_SLOTS=16 BENCH_REQUESTS=48 BENCH_PIPELINED=1
run BENCH_MODE=serving BENCH_CONFIG=int8kv BENCH_SLOTS=32 BENCH_REQUESTS=96 BENCH_PIPELINED=1
# decode_chunk retune at the big-batch point
run BENCH_MODE=serving BENCH_CONFIG=int8kv BENCH_SLOTS=32 BENCH_REQUESTS=96 BENCH_CHUNK=8
run BENCH_MODE=serving BENCH_CONFIG=int8kv BENCH_SLOTS=32 BENCH_REQUESTS=96 BENCH_CHUNK=32
# split compute/transfer attribution (costs ~27 ms/chunk: measurement row)
run BENCH_MODE=serving BENCH_CONFIG=int8kv BENCH_SLOTS=32 BENCH_REQUESTS=96 TLLM_SPLIT_READBACK=1
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_SLOTS=8 BENCH_REQUESTS=24 TLLM_SPLIT_READBACK=1

# --- Speculative serving (post weight-read-budget fix) ---------------------
# zero-acceptance regime: repetitive prompts, non-copying model — r4 lost
# 2-4x here; the fix should put spec-lookup ~at plain
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_REPETITIVE=1
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_SPEC_DRAFT=lookup BENCH_REPETITIVE=1
# accepting regime: copy-capable model (full 7B weight traffic), same A/B
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_COPY=1
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_SPEC_DRAFT=lookup BENCH_COPY=1
