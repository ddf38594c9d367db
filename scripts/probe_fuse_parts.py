"""Decompose 7B decode step time on the real chip (r5).

The r4 gap analysis (docs/kernels.md) priced inter-kernel HBM idle at
~2.2 ms/token int4 / ~3.7 ms int8 and prescribed fusing the XLA ops into
the matmul kernels. r5 implemented that (dense_fused) and the e2e number
did not move — this probe separates the remaining per-layer cost:

  matmuls   : layer scan with attention+rope REPLACED by a slice (keeps
              all 4 fused matmul kernels incl. fused norms/residuals)
  matmuls-  : same but fuse_decode off (4 kernels + XLA norm/silu/resid)
  attn      : layer scan of ONLY rope + fused decode attention
  lm_head   : final norm + lm_head projection
  full      : the real forward_decode (fused path), cache carried
  full-     : forward_decode with fuse_decode off (r4 path)

All lax.scan over the 32 stacked layers; slope timing with the state
carried through the loop (so caches are not re-copied per iteration).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def bench_state(step, state, params, n1=128):
    """ms per step(params, state)->state call, slope-timed, state carried.
    params ride as a jit ARGUMENT (captured closures would embed ~6.5 GB
    of weights as lowered constants — observed, and it wrecks compile)."""
    def make(n):
        @jax.jit
        def lf(p, st):
            return jax.lax.fori_loop(0, n, lambda _, s: step(p, s), st)
        return lf

    def timed(n):
        lf = make(n)
        jax.block_until_ready(lf(params, state))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(lf(params, state))
            best = min(best, time.perf_counter() - t0)
        return best

    for _ in range(5):
        n2 = 3 * n1
        t1, t2 = timed(n1), timed(n2)
        if t2 >= 1.5 * t1 and t2 > 0.060:
            break
        n1 *= 4
    return (t2 - t1) / (n2 - n1) * 1e3


def main():
    config = os.environ.get("BENCH_CONFIG", "int8")
    only = set(filter(None, os.environ.get("PROBE_ONLY", "").split(",")))
    from trtllm_llama_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from trtllm_llama_tpu.config import ModelConfig
    from trtllm_llama_tpu.quantization.mode import QuantMode
    from trtllm_llama_tpu.quantization.quantize import (
        init_random_quantized_params,
    )
    from trtllm_llama_tpu.models import llama
    from trtllm_llama_tpu.ops.linear import dense, dense_fused, \
        enable_pallas_kernels
    from trtllm_llama_tpu.ops.norm import rms_norm
    from trtllm_llama_tpu.ops.registry import KERNELS

    enable_pallas_kernels(True)
    qm = {"int8": QuantMode.use_weight_only(False),
          "int4": QuantMode.use_weight_only(True, per_group=True),
          "fp8": QuantMode.FP8_QDQ}[config]
    group = 128 if config == "int4" else 0
    cfg = ModelConfig.llama_7b(quant_mode=qm, group_size=group)
    params = init_random_quantized_params(cfg, jax.random.PRNGKey(0), qm,
                                          group)
    params = llama.fuse_gate_up_params(llama.fuse_qkv_params(params))
    bs, smax = 1, 128
    caches = llama.init_caches(cfg, bs, smax)
    toks = jnp.zeros((bs,), jnp.int32) + 5
    pos = jnp.zeros((bs,), jnp.int32) + 64

    d = cfg.hidden_size
    nq_d = cfg.num_heads * cfg.head_dim

    def matmuls(p, h):
        lw = p["layers"]
        def body(h, layer):
            qkv = dense_fused(h, lw["wqkv"], layer=layer, part="col",
                              norm_w=lw["attn_norm"], eps=cfg.rms_norm_eps)
            attn = qkv[..., :nq_d].astype(h.dtype)      # stand-in for attn
            h = dense_fused(attn, lw["wo"], layer=layer, part="row",
                            resid=h, out_dtype=h.dtype)
            gu = dense_fused(h, lw["w_gate_up"], layer=layer, part="col",
                             norm_w=lw["mlp_norm"], eps=cfg.rms_norm_eps)
            h = dense_fused(gu, lw["w_down"], layer=layer, part="row",
                            swiglu=True, resid=h, out_dtype=h.dtype)
            return h, None
        h, _ = jax.lax.scan(body, h, jnp.arange(cfg.num_layers))
        return h * 1e-3          # keep magnitudes bounded across chaining

    def attn_step(p, st):
        del p
        a, c = st
        from trtllm_llama_tpu.ops.rope import (apply_rope, rope_tables_for,
                                               take_rope)
        from trtllm_llama_tpu.ops.attention import fused_decode_attention_at
        cos_t, sin_t = rope_tables_for(cfg)
        cos, sin = take_rope(cos_t, sin_t, pos)
        def body(carry, layer):
            q, c = carry
            qr = apply_rope(q, cos, sin)
            o, c = fused_decode_attention_at(qr, qr[:, :cfg.num_kv_heads],
                                             qr[:, :cfg.num_kv_heads], c,
                                             layer, pos)
            return (o.astype(q.dtype), c), None
        (o, c), _ = jax.lax.scan(body, (a, c), jnp.arange(cfg.num_layers))
        return (o * 1e-3, c)

    def lm_head_only(p, h):
        hn = rms_norm(h.astype(cfg.jnp_dtype), p["final_norm"],
                      cfg.rms_norm_eps)
        lg = dense(hn, p["lm_head"], jnp.float32)
        return (h + lg[..., :d] * 1e-20).astype(h.dtype)

    def full_step(p, st):
        t, c = st
        lg, c = llama.forward_decode(p, cfg, t, pos, c)
        return (jnp.argmax(lg, -1).astype(jnp.int32), c)

    x_d = jnp.zeros((bs, d), jnp.bfloat16) + 0.01
    q0 = jnp.zeros((bs, cfg.num_heads, cfg.head_dim), jnp.bfloat16) + 0.01

    log(f"config={config} only={sorted(only) or 'all'}")

    def want(name):
        return not only or name in only

    if want("matmuls"):
        r = bench_state(matmuls, x_d, params)
        log(f"matmuls (fused) : {r:8.3f} ms/step")
    if want("matmuls_unfused"):
        KERNELS["fuse_decode"] = False
        r = bench_state(matmuls, x_d, params)
        log(f"matmuls (unfus) : {r:8.3f} ms/step")
        KERNELS["fuse_decode"] = True
    if want("attn"):
        r = bench_state(attn_step, (q0, caches), params)
        log(f"attn+rope       : {r:8.3f} ms/step")
    if want("lm_head"):
        r = bench_state(lm_head_only, x_d, params)
        log(f"lm_head         : {r:8.3f} ms/step")
    if want("full"):
        r = bench_state(full_step, (toks, caches), params)
        log(f"full (fused)    : {r:8.3f} ms/step")
    if want("full_unfused"):
        KERNELS["fuse_decode"] = False
        r = bench_state(full_step, (toks, caches), params)
        log(f"full (unfused)  : {r:8.3f} ms/step")


if __name__ == "__main__":
    main()
