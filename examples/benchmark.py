"""CLI: latency/throughput benchmark harness.

Reference analogue: benchmarks/benchmark.py + gpt_benchmark.py:330-347 —
reports per-config first-token latency, decode throughput, percentiles.
Runs either from a converted engine dir or synthetic random weights.

  python examples/benchmark.py --engine_dir engines/llama7b-int4 \
      --batch_sizes 1,8 --input_lens 8,128 --output_len 50
  python examples/benchmark.py --synthetic int4 --batch_sizes 1
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("TLLM_FORCE_CPU"):
    # the environment's sitecustomize force-registers the TPU backend;
    # config.update is the only reliable override (see tests/conftest.py)
    import jax
    jax.config.update("jax_platforms", "cpu")
import json
import time

import numpy as np
import jax


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--engine_dir", default=None)
    p.add_argument("--synthetic", default=None,
                   choices=["fp16", "int8", "int4", "int8kv", "sq",
                            "fp8", "fp8kv"],
                   help="random-weight LLaMA-7B in the given mode")
    p.add_argument("--batch_sizes", default="1")
    p.add_argument("--input_lens", default="8")
    p.add_argument("--output_len", type=int, default=50)
    p.add_argument("--num_runs", type=int, default=3)
    p.add_argument("--warm_up", type=int, default=1)
    return p.parse_args()


def main():
    args = parse_args()
    from trtllm_llama_tpu.config import EngineConfig
    from trtllm_llama_tpu.runtime.sampling import SamplingConfig
    from trtllm_llama_tpu.runtime.session import GenerationSession

    batch_sizes = [int(x) for x in args.batch_sizes.split(",")]
    input_lens = [int(x) for x in args.input_lens.split(",")]

    if args.engine_dir:
        from trtllm_llama_tpu.convert.serialize import load_engine
        cfg, params, kv_scales = load_engine(args.engine_dir)
    else:
        import bench as bench_mod  # repo-root bench.py builders
        cfg, _sess = bench_mod.build_engine(
            args.synthetic or "int8", max(batch_sizes),
            max(input_lens) + args.output_len + 16)
        params, kv_scales = _sess.params, _sess.kv_scales

    results = []
    for bs in batch_sizes:
        for il in input_lens:
            sess = GenerationSession(
                cfg, params,
                EngineConfig(max_batch_size=bs, max_input_len=il,
                             max_seq_len=il + args.output_len + 8,
                             prefill_buckets=(il,)),
                kv_scales=kv_scales)
            scfg = SamplingConfig(end_id=-1)
            ids = np.random.default_rng(0).integers(
                3, cfg.vocab_size, (bs, il))
            for _ in range(args.warm_up):
                sess.generate(ids, sampling=scfg,
                              max_new_tokens=args.output_len)
                sess.generate(ids, sampling=scfg, max_new_tokens=1)
            times, ft_times = [], []
            for _ in range(args.num_runs):
                t0 = time.perf_counter()
                sess.generate(ids, sampling=scfg, max_new_tokens=1)
                ft_times.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                sess.generate(ids, sampling=scfg,
                              max_new_tokens=args.output_len)
                times.append(time.perf_counter() - t0)
            times.sort()
            ft_times.sort()
            lat = times[len(times) // 2]
            row = {
                "batch_size": bs, "input_len": il,
                "output_len": args.output_len,
                "latency_s": round(lat, 4),
                "p99_s": round(times[-1], 4),
                "first_token_s": round(ft_times[len(ft_times) // 2], 4),
                "tokens_per_s": round(bs * args.output_len / lat, 2),
            }
            # peak device memory (reference mem_monitor.py peak-mem column);
            # TPU/GPU backends expose allocator stats, CPU does not
            stats = getattr(jax.devices()[0], "memory_stats", lambda: None)()
            if stats and "peak_bytes_in_use" in stats:
                row["peak_mem_gb"] = round(
                    stats["peak_bytes_in_use"] / 2**30, 3)
            results.append(row)
            print(json.dumps(row))
    return results


if __name__ == "__main__":
    main()
