"""Trace a 7B int8 decode to find where the step time goes."""
import glob
import os
import sys
import time

import numpy as np
import jax


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    os.environ.setdefault("BENCH_CONFIG", "int8")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench
    cfg, sess = bench.build_engine("int8", 1, 128)
    from trtllm_llama_tpu.runtime.sampling import SamplingConfig
    ids = np.random.default_rng(0).integers(3, 25000, (1, 8))
    scfg = SamplingConfig(end_id=-1)
    log("warmup/compile")
    sess.generate(ids, max_new_tokens=50, sampling=scfg)
    log("warm run")
    t0 = time.perf_counter()
    sess.generate(ids, max_new_tokens=50, sampling=scfg)
    t1 = time.perf_counter()
    log(f"warm 50 tok: {t1-t0:.3f}s -> {50/(t1-t0):.1f} tok/s")
    log("tracing")
    with jax.profiler.trace("/tmp/jax_trace_int8"):
        sess.generate(ids, max_new_tokens=50, sampling=scfg)
    log("trace done")
    files = glob.glob("/tmp/jax_trace_int8/**/*.xplane.pb", recursive=True)
    log("xplane files:", files)


if __name__ == "__main__":
    main()
