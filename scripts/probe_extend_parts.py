"""Break forward_extend's ~2x-per-call cost (vs forward_decode) into parts.

Times, over all 32 layers on the stacked 7B cache (smax 200, bs 8):
  - write_kv_extend_at + extend_attention_at   (the extend attn path)
  - fused_decode_attention_at                  (the decode attn path)
and the full forward_extend vs forward_decode, all with warm d2h-synced
loops (axon block_until_ready returns early).
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
    from trtllm_llama_tpu.ops.attention import (
        extend_attention_at, fused_decode_attention_at, write_kv_extend_at,
    )

    qm = QuantMode.use_weight_only(False)
    cfg = ModelConfig(vocab_size=32000, hidden_size=4096,
                      intermediate_size=11008, num_layers=32, num_heads=32,
                      num_kv_heads=32, head_dim=128, quant_mode=qm)
    params = init_random_quantized_params(cfg, jax.random.PRNGKey(0), qm)
    params = llama.fuse_gate_up_params(llama.fuse_qkv_params(params))
    bs, smax, t = 8, 200, 5
    caches = llama.init_caches(cfg, bs, smax)
    L, H, D = cfg.num_layers, cfg.num_heads, cfg.head_dim

    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (bs, t, H, D), jnp.bfloat16)
    kv = jax.random.normal(key, (bs, t, H, D), jnp.bfloat16)
    q1 = q[:, 0]
    start = jnp.full((bs,), 130, jnp.int32)

    legacy = bool(int(os.environ.get("PROBE_LEGACY", "0")))

    def ext_attn_all_layers(c, q, kv, start):
        def body(c, layer):
            if legacy:   # write-then-attend: the scan-carry copy hazard
                c = write_kv_extend_at(c, layer, kv, kv, start)
                a = extend_attention_at(q, c, layer, start)
            else:        # attend-then-write (r4): no hazard
                a = extend_attention_at(q, c, layer, start, kv, kv)
                c = write_kv_extend_at(c, layer, kv, kv, start)
            return c, jnp.sum(a)
        c, s = jax.lax.scan(body, c, jnp.arange(L))
        return c, jnp.sum(s)

    def dec_attn_all_layers(c, q1, kv, start):
        def body(c, layer):
            a, c = fused_decode_attention_at(q1, kv[:, 0], kv[:, 0], c,
                                             layer, start)
            return c, jnp.sum(a)
        c, s = jax.lax.scan(body, c, jnp.arange(L))
        return c, jnp.sum(s)

    ext_j = jax.jit(ext_attn_all_layers, donate_argnums=(0,))
    dec_j = jax.jit(dec_attn_all_layers, donate_argnums=(0,))
    fext = jax.jit(lambda p, c, tk, st: llama.forward_extend(p, cfg, tk, st,
                                                             c),
                   donate_argnums=(1,))
    fdec = jax.jit(lambda p, c, tk, pos: llama.forward_decode(p, cfg, tk,
                                                              pos, c),
                   donate_argnums=(1,))
    toksg = jnp.zeros((bs, t), jnp.int32) + 5
    toks1 = jnp.zeros((bs,), jnp.int32) + 5

    def timed(name, fn, *args):
        nonlocal caches
        # warm (incl. compile)
        for _ in range(3):
            caches, out = fn(caches, *args)
        np.asarray(jax.device_get(out))
        ns = (8, 24)
        ts = []
        for n in ns:
            t0 = time.perf_counter()
            for _ in range(n):
                caches, out = fn(caches, *args)
            np.asarray(jax.device_get(out))
            ts.append(time.perf_counter() - t0)
        per = (ts[1] - ts[0]) / (ns[1] - ns[0])
        log(f"{name}: {per*1e3:.2f} ms/call "
            f"(t{ns[0]}={ts[0]*1e3:.0f} t{ns[1]}={ts[1]*1e3:.0f})")

    timed("extend attn+write x32L ", ext_j, q, kv, start)
    timed("fused decode attn x32L ", dec_j, q1, kv, start)

    def fext_w(c, p, tk, st):
        lg, c = fext(p, c, tk, st)
        return c, jnp.sum(lg)

    def fdec_w(c, p, tk, pos):
        lg, c = fdec(p, c, tk, pos)
        return c, jnp.sum(lg)

    timed("forward_extend bs8 T5  ", fext_w, params, toksg, start)
    timed("forward_decode bs8     ", fdec_w, params, toks1, start)


if __name__ == "__main__":
    main()
