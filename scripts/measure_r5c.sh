#!/usr/bin/env bash
# Round-5 part C: speculation x big-batch composition + spec chunk tuning.
set -u
cd "$(dirname "$0")/.."
OUT=scripts/measure_r5.jsonl
run() {
  echo "== $*" >&2
  env "$@" timeout 2000 python bench.py >> "$OUT" 2>> scripts/measure_r5.err
}
# prompt-lookup x 32-slot int8kv on the copy workload (speculation and
# batching compose: each verify extend amortizes one weight read over
# 33 slots x up-to-gamma+1 tokens) + its plain A/B twin
run BENCH_MODE=serving BENCH_CONFIG=int8kv BENCH_SLOTS=32 BENCH_REQUESTS=96 BENCH_CHUNK=32 BENCH_COPY=1
run BENCH_MODE=serving BENCH_CONFIG=int8kv BENCH_SPEC_DRAFT=lookup BENCH_COPY=1 BENCH_SLOTS=32 BENCH_REQUESTS=96 BENCH_CHUNK=32
# spec chunk tuning at 8 slots (the r5 headline spec row used chunk16)
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_SPEC_DRAFT=lookup BENCH_COPY=1 BENCH_CHUNK=32
# zero-acceptance twin at chunk32 (budget honesty at the bigger chunk)
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_SPEC_DRAFT=lookup BENCH_REPETITIVE=1 BENCH_CHUNK=32
