"""Measure decode attention: XLA fallback vs the manual-DMA kernel.

LLaMA-7B decode shapes (L=32 int8-KV stacked cache, B=1, H=32, D=128),
sweeping compiled cache size S_max and live position pos. Reports µs per
(layer-)step: a jitted fn chains ITERS dependent calls (q derived from the
previous output) so dispatch latency through the axon tunnel amortizes out.

Sets KERNELS['decode_dma_min_s'] / docs/kernels.md from the results.
Usage: python scripts/probe_dma_decode.py [--quick]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from trtllm_llama_tpu.ops import attention as A          # noqa: E402
from trtllm_llama_tpu.ops.pallas.dma_decode_attention import (  # noqa: E402
    dma_decode_attention,
)

ITERS = 64
L, B, HQ, HKV, D = 4, 1, 32, 32, 128   # 4 layers cycled; per-call cost is
# layer-independent (layer idx is scalar-prefetched), 32 would just burn HBM


def bench(fn, *args):
    out = jax.block_until_ready(fn(*args))   # compile
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    dt = time.perf_counter() - t0
    del out
    return dt / ITERS * 1e6                  # µs per call


def make_cache(s):
    rng = np.random.default_rng(0)
    kc = jnp.asarray(rng.integers(-127, 127, (L, B, HKV, s, D)), jnp.int8)
    vc = jnp.asarray(rng.integers(-127, 127, (L, B, HKV, s, D)), jnp.int8)
    scale = jnp.full((L,), 0.05, jnp.float32)
    return kc, vc, scale


def run(s, pos):
    rng = np.random.default_rng(1)
    q0 = jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((B, HKV, D)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((B, HKV, D)), jnp.bfloat16)
    posv = jnp.full((B,), pos, jnp.int32)
    kc, vc, scale = make_cache(s)

    @jax.jit
    def dma_loop(q, kc, vc):
        def body(i, st):
            q, kc, vc = st
            out, kc, vc = dma_decode_attention(
                q, kn + q[:, :HKV] * 1e-6, vn, kc, vc, scale, i % L, posv)
            return out.astype(q.dtype), kc, vc
        return jax.lax.fori_loop(0, ITERS, body, (q, kc, vc))

    @jax.jit
    def xla_loop(q, kc, vc):
        cache = A.KVCache(kc, vc, scale)
        def body(i, st):
            q, cache = st
            cache = A.write_kv_decode_at(cache, i % L,
                                         kn + q[:, :HKV] * 1e-6, vn, posv)
            out = A.decode_attention(q, A._layer_cache(cache, i % L),
                                     posv + 1)
            return out.astype(q.dtype), cache
        q, cache = jax.lax.fori_loop(0, ITERS, body, (q, cache))
        return q, cache.k, cache.v

    t_dma = bench(dma_loop, q0, kc, vc)
    del kc, vc
    kc, vc, scale2 = make_cache(s)
    t_xla = bench(xla_loop, q0, kc, vc)
    del kc, vc
    return t_xla, t_dma


def main():
    quick = "--quick" in sys.argv
    cases = [(2048, 128), (2048, 1024), (2048, 1900),
             (4096, 1024), (4096, 3900),
             (8192, 1024), (8192, 4096), (8192, 8000)]
    if quick:
        cases = [(2048, 128), (4096, 1024), (8192, 4096)]
    print(f"{'S_max':>6} {'pos':>6} {'xla µs':>9} {'dma µs':>9} {'dma/xla':>8}")
    for s, pos in cases:
        t_xla, t_dma = run(s, pos)
        print(f"{s:>6} {pos:>6} {t_xla:>9.1f} {t_dma:>9.1f} "
              f"{t_dma / t_xla:>8.2f}")


if __name__ == "__main__":
    main()
