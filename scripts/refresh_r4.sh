#!/usr/bin/env bash
# Re-run the measure_r4 rows that died before the int8kv/int4kv serving
# configs landed (RESOURCE_EXHAUSTED: 16+ dense slots need int8 KV on a
# 16 GB chip — see bench.py serving_bench). Appends to measure_r4.jsonl.
set -u
cd "$(dirname "$0")/.."
OUT=scripts/measure_r4.jsonl
run() {
  echo "== $*" >&2
  env "$@" timeout 1800 python bench.py >> "$OUT" 2>> scripts/measure_r4.err
}

# slot-scaling curve (VERDICT r3 item 2): int8 uses int8 KV at 16+ slots
run BENCH_MODE=serving BENCH_CONFIG=int8kv BENCH_SLOTS=16 BENCH_REQUESTS=48
run BENCH_MODE=serving BENCH_CONFIG=int8kv BENCH_SLOTS=32 BENCH_REQUESTS=96
run BENCH_MODE=serving BENCH_CONFIG=int4 BENCH_SLOTS=16 BENCH_REQUESTS=48
run BENCH_MODE=serving BENCH_CONFIG=int4 BENCH_SLOTS=8 BENCH_REQUESTS=24
# pipelined at 16 slots re-check (first run read an anomalous 144.8)
run BENCH_MODE=serving BENCH_CONFIG=int8kv BENCH_SLOTS=16 BENCH_REQUESTS=48 \
    BENCH_PIPELINED=1
# prompt-lookup serving after the extend attend-before-write hazard fix
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_SPEC_DRAFT=lookup \
    BENCH_REPETITIVE=1
