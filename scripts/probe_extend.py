"""Why is forward_extend (speculative verify) slow vs forward_decode?

Measures, on the real chip at the serving-bench 7B int8 configuration
(8 slots, smax 200), the per-dispatch device time of:
  - forward_decode (bs=8)                  — the plain serving step unit
  - forward_extend (bs=8, T=gamma+1=5)     — the prompt-lookup verify unit
  - the full pl_decode chunk fn            — n_iters verify iterations

Serving row math (scripts/measure_r4.jsonl): spec-lookup readback was
~368 ms/step at n_iters=4 => ~90 ms per extend vs ~11 ms per decode.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from trtllm_llama_tpu.config import ModelConfig
    from trtllm_llama_tpu.quantization.mode import QuantMode
    from trtllm_llama_tpu.quantization.quantize import (
        init_random_quantized_params,
    )
    from trtllm_llama_tpu.models import llama

    qm = QuantMode.use_weight_only(False)
    cfg = ModelConfig(vocab_size=32000, hidden_size=4096,
                      intermediate_size=11008, num_layers=32, num_heads=32,
                      num_kv_heads=32, head_dim=128, quant_mode=qm)
    params = init_random_quantized_params(cfg, jax.random.PRNGKey(0), qm)
    params = llama.fuse_gate_up_params(llama.fuse_qkv_params(params))
    bs, smax, gamma = 8, 200, 4
    caches = llama.init_caches(cfg, bs, smax)

    dec = jax.jit(lambda p, c, t, pos: llama.forward_decode(p, cfg, t, pos, c),
                  donate_argnums=(1,))
    ext = jax.jit(lambda p, c, t, st: llama.forward_extend(p, cfg, t, st, c),
                  donate_argnums=(1,))

    toks1 = jnp.zeros((bs,), jnp.int32) + 5
    pos = jnp.zeros((bs,), jnp.int32) + 130
    toksg = jnp.zeros((bs, gamma + 1), jnp.int32) + 5
    st = jnp.zeros((bs,), jnp.int32) + 130

    log("compile decode")
    lg, caches = dec(params, caches, toks1, pos)
    lg.block_until_ready()
    log("compile extend")
    lg, caches = ext(params, caches, toksg, st)
    lg.block_until_ready()

    def timeloop(fn, n, *args):
        nonlocal caches
        t0 = time.perf_counter()
        for _ in range(n):
            lg, caches = fn(params, caches, *args)
        # axon: block_until_ready returns early; a real d2h fetch syncs
        np.asarray(jax.device_get(lg.ravel()[:8]))
        return time.perf_counter() - t0

    for name, fn, args in (("decode bs8", dec, (toks1, pos)),
                           ("extend bs8xT5", ext, (toksg, st))):
        t8 = timeloop(fn, 8, *args)
        t24 = timeloop(fn, 24, *args)
        per = (t24 - t8) / 16
        log(f"{name}: {per*1e3:.2f} ms/call (slope 8->24; "
            f"t8={t8*1e3:.1f} ms t24={t24*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
