#!/usr/bin/env bash
# Round-3 measurement matrix on the real chip (run when the axon tunnel is
# up). Each line appends one JSON record to scripts/measure_r3.jsonl.
# Total wall time ~40-60 min cold (persistent compile cache makes reruns
# minutes).
set -u
cd "$(dirname "$0")/.."
OUT=scripts/measure_r3.jsonl
run() {
  echo "== $*" >&2
  env "$@" timeout 1800 python bench.py >> "$OUT" 2>> scripts/measure_r3.err
}

# Task B (bs1 in8 out50) per quant config
for c in fp16 int8 int4 int8kv sq; do
  run BENCH_CONFIG=$c
done
# Task A shape (in923 out100)
for c in fp16 int8 int4; do
  run BENCH_CONFIG=$c BENCH_IN=923 BENCH_OUT=100
done
# Long context (streaming prefill + decode-kernel crossover region)
run BENCH_CONFIG=int8 BENCH_IN=4096 BENCH_OUT=64
run BENCH_CONFIG=int8 BENCH_IN=4096 BENCH_OUT=64 BENCH_DECODE_ATTN=dma
# Serving matrix
run BENCH_MODE=serving BENCH_CONFIG=int8
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_PREFILL_CHUNK=64
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_PACKED=1
run BENCH_MODE=serving BENCH_CONFIG=int4
# Speculative bounds
run BENCH_MODE=speculative BENCH_CONFIG=int8 BENCH_DRAFT=self
run BENCH_MODE=speculative BENCH_CONFIG=int8 BENCH_DRAFT=random
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_SPEC_DRAFT=self
# Round-3 additions
run BENCH_CONFIG=int8_int8kv
run BENCH_CONFIG=fp8
run BENCH_CONFIG=int8 BENCH_IN=4096 BENCH_OUT=64 BENCH_DECODE_ATTN=xla
echo "done; results in $OUT" >&2
