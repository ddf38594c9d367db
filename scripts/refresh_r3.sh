#!/usr/bin/env bash
# Post-readback-optimization refresh of matrix rows measured before
# commits 59dc71b/cbcb4f5 (batched d2h readbacks), plus the pipelined
# serving row that was never banked.
set -u
cd "$(dirname "$0")/.."
OUT=scripts/measure_r3.jsonl
run() {
  echo "== $*" >&2
  env "$@" timeout 1800 python bench.py >> "$OUT" 2>> scripts/measure_r3.err
}
run BENCH_CONFIG=int8 BENCH_IN=4096 BENCH_OUT=64
run BENCH_CONFIG=fp16
run BENCH_CONFIG=sq
run BENCH_CONFIG=int8 BENCH_IN=923 BENCH_OUT=100
run BENCH_MODE=serving BENCH_CONFIG=int8 BENCH_PIPELINED=1
echo refresh done >&2
