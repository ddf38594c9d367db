"""Per-QuantMode accuracy evaluation vs the fp32 golden model.

The reference validates every quantized engine with a real-weights ROUGE run
(examples/llama/summarize.py; README.md:894-918 table). No LLaMA checkpoint
exists in this environment, so this module measures the same contract one
level down: distribution shift of the quantized engine vs its own fp32 params
at golden-model scale, on the real engine code paths —

  * prefill: full-sequence logits through forward_prefill (exercises the
    quantized matmul paths and the int8-KV cache *write*),
  * decode: teacher-forced forward_decode steps over a continuation the fp32
    model generated greedily (exercises decode attention and the int8-KV
    cache *read/dequant* — where KV quantization error actually lands).

Used by tests/test_accuracy_gates.py (CI thresholds) and
examples/accuracy_report.py (README table).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models import llama
from ..utils.accuracy import logit_metrics, ppl_ratio
from .mode import QuantMode
from .quantize import quantize_params


def build_golden_setup(hidden: int = 256, layers: int = 4, heads: int = 8,
                       intermediate: int = 512, vocab: int = 512,
                       init_range: float = 0.06, seed: int = 0,
                       calib_samples: int = 6):
    """Random-weight golden-scale LLaMA + calibrated ranges.

    init_range is bumped above HF's 0.02 default so logit spread at this
    depth is realistic rather than near-uniform (argmax-stable enough that
    top-1 agreement is a meaningful metric — see tests/test_convert.py's
    note on near-uniform tiny-model logits).

    Returns (cfg_fp32, params_fp32, act_ranges, kv_scales, hf_model).
    """
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from ..convert.hf import params_from_hf_model
    from .calibrate import (act_ranges_for_smoothquant,
                            capture_activation_ranges, kv_scales_from_ranges)

    torch.manual_seed(seed)
    hf_cfg = LlamaConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=intermediate,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=heads, max_position_embeddings=256,
        initializer_range=init_range, tie_word_embeddings=False)
    hf_model = LlamaForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    params = params_from_hf_model(hf_model, cfg)

    class _IdTok:
        """Calibration 'tokenizer' over synthetic corpora: text is a seed."""
        def __call__(self, text, **kw):
            rng = np.random.default_rng(abs(hash(text)) % (2**32))
            ids = rng.integers(3, vocab, (1, 48))
            return {"input_ids": torch.tensor(ids)}

    texts = [f"calib-{i}" for i in range(calib_samples)]
    ranges = capture_activation_ranges(hf_model, _IdTok(), texts)
    act_ranges = act_ranges_for_smoothquant(ranges)
    kv_scales = kv_scales_from_ranges(ranges)
    return cfg, params, act_ranges, kv_scales, hf_model


def greedy_continuation(cfg: ModelConfig, params, prompt_ids: np.ndarray,
                        cont_len: int, kv_scales=None) -> np.ndarray:
    """Greedy-decode cont_len tokens with the given params; returns [B, cont]."""
    b, s = prompt_ids.shape
    max_len = s + cont_len + 1
    caches = llama.init_caches(cfg, b, max_len, kv_scales=kv_scales)
    lens = jnp.full((b,), s, jnp.int32)
    logits, caches = llama.forward_prefill(
        params, cfg, jnp.asarray(prompt_ids), lens, caches)
    out = []
    tok = jnp.argmax(logits, axis=-1)
    for i in range(cont_len):
        out.append(np.asarray(tok))
        logits, caches = llama.forward_decode(
            params, cfg, tok, lens + i, caches)
        tok = jnp.argmax(logits, axis=-1)
    return np.stack(out, axis=1)


def teacher_forced_logits(cfg: ModelConfig, params, prompt_ids: np.ndarray,
                          cont_ids: np.ndarray, kv_scales=None):
    """Run prefill on the prompt, then teacher-forced decode over cont_ids.

    Returns (prefill_logits [B, S, V], decode_logits [B, C, V]) where
    decode_logits[:, i] is the distribution *predicting* cont_ids[:, i]
    shifted by one (i.e. logits produced after consuming cont_ids[:, i]).
    """
    b, s = prompt_ids.shape
    c = cont_ids.shape[1]
    caches = llama.init_caches(cfg, b, s + c + 1, kv_scales=kv_scales)
    lens = jnp.full((b,), s, jnp.int32)
    prefill_logits, caches = llama.forward_prefill(
        params, cfg, jnp.asarray(prompt_ids), lens, caches,
        return_all_logits=True)
    dec = []
    for i in range(c):
        logits, caches = llama.forward_decode(
            params, cfg, jnp.asarray(cont_ids[:, i]), lens + i, caches)
        dec.append(np.asarray(logits))
    return np.asarray(prefill_logits), np.stack(dec, axis=1)


def reference_run(cfg_fp: ModelConfig, params_fp, prompt_ids: np.ndarray,
                  cont_len: int):
    """fp32 greedy continuation + its teacher-forced logits: the shared
    reference side of every quant-mode evaluation."""
    cont = greedy_continuation(cfg_fp, params_fp, prompt_ids, cont_len)
    ref_pre, ref_dec = teacher_forced_logits(cfg_fp, params_fp, prompt_ids,
                                             cont)
    return cont, ref_pre, ref_dec


def evaluate_quant_mode(cfg_fp: ModelConfig, params_fp, mode_name: str,
                        quant_mode: QuantMode, prompt_ids: np.ndarray,
                        act_ranges=None, kv_scales=None,
                        group_size: int = 0, cont_len: int = 12,
                        ref_run=None) -> dict:
    """Quantize params_fp under quant_mode and measure its logit/ppl deltas
    vs the fp32 model. Returns a metrics row (see utils.accuracy).

    ref_run: optional precomputed (cont, ref_pre, ref_dec) from
    reference_run() — pass it when evaluating several modes on one model."""
    if ref_run is None:
        ref_run = reference_run(cfg_fp, params_fp, prompt_ids, cont_len)
    cont, ref_pre, ref_dec = ref_run

    import dataclasses

    qparams = quantize_params(params_fp, quant_mode, group_size=group_size,
                              act_ranges=act_ranges)
    cfg_q = dataclasses.replace(cfg_fp, quant_mode=quant_mode)
    q_kv = kv_scales if quant_mode.has_int8_kv_cache() else None
    if quant_mode.has_fp8_kv_cache() and kv_scales is not None:
        # build_golden_setup's scales are int8 (amax/127); fp8-e4m3 saturates
        # at 448, so rescale to amax/448 (kv_scales_from_ranges qmax=448).
        q_kv = np.asarray(kv_scales) * (127.0 / 448.0)
    test_pre, test_dec = teacher_forced_logits(
        cfg_q, qparams, prompt_ids, cont, kv_scales=q_kv)

    pre = logit_metrics(ref_pre, test_pre)
    dec = logit_metrics(ref_dec, test_dec)
    # ppl ratio on the fp32 model's own greedy continuation, decode phase
    # (positions 0..c-2 predict cont[1..c-1])
    ratio = ppl_ratio(ref_dec[:, :-1], test_dec[:, :-1], cont[:, 1:])
    return {
        "mode": mode_name,
        "prefill_top1": pre["top1_agree"], "prefill_kl": pre["kl"],
        "decode_top1": dec["top1_agree"], "decode_kl": dec["kl"],
        "ppl_ratio": ratio,
        "max_abs_err": max(pre["max_abs_err"], dec["max_abs_err"]),
    }


def structure_weights(params, rank: int = 32, rho: float = 0.6,
                      channel_sigma: float = 0.5,
                      outlier_frac: float = 0.005, outlier_gain: float = 6.0,
                      seed: int = 0):
    """Impose trained-like statistics on RANDOM-init projection weights so
    the loosest quant formats can be gated at depth.

    Real trained transformer weights differ from gaussian init in exactly
    the ways that decide whether 16-level (int4) and 3-mantissa-bit (fp8)
    quantization hold up at depth: (a) energy concentrates in a
    low-dimensional dominant subspace (singular spectra decay fast), so
    forward signal rides directions whose magnitude dwarfs the isotropic
    rounding noise, and (b) per-output-channel scales spread over roughly
    an order of magnitude with a sparse set of large "outlier" channels
    (the observation behind SmoothQuant's alpha migration; reference
    examples/llama_quant smoothing). Random iid weights have neither:
    every direction carries equal signal, int4 rounding noise is a flat
    ~-22 dB per layer, and 8 layers of accumulation collapse the model
    (measured ppl ratio 41x, tests/test_accuracy_midscale.py r3 note) —
    a gate on that asserts nothing about the engine.

    This transform keeps each weight's shape and Frobenius norm while
    mixing in a rank-`rank` dominant component (weight rho of the energy)
    and log-normal per-channel scales with outliers:

        W' = normalize(sqrt(1-rho) * W + sqrt(rho) * U V / sqrt(r)) * c

    with c renormalized so ||W'||_F = ||W||_F (forward dynamics and
    RMSNorm stats stay in the init regime; only the SHAPE of the
    distribution changes). Per-channel c alone would be absorbed exactly
    by per-channel quant scales — the low-rank component is what gives
    grouped-int4 / fp8 noise something structured to be small against.
    """
    import jax

    key = jax.random.PRNGKey(seed)
    out_layers = {}
    for name, w in params["layers"].items():
        if w.ndim != 3:                       # norms etc.
            out_layers[name] = w
            continue
        l, k, n = w.shape
        key, k_u, k_v, k_c, k_m = jax.random.split(key, 5)
        u = jax.random.normal(k_u, (l, k, rank), jnp.float32)
        v = jax.random.normal(k_v, (l, rank, n), jnp.float32)
        w_f = w.astype(jnp.float32)
        std = jnp.std(w_f, axis=(-2, -1), keepdims=True)
        low = jnp.einsum("lkr,lrn->lkn", u, v) / np.sqrt(rank)
        mixed = (np.sqrt(1.0 - rho) * w_f
                 + np.sqrt(rho) * low * std)
        c = jnp.exp(channel_sigma
                    * jax.random.normal(k_c, (l, 1, n), jnp.float32))
        mask = jax.random.uniform(k_m, (l, 1, n)) < outlier_frac
        c = jnp.where(mask, c * outlier_gain, c)
        mixed = mixed * c
        norm0 = jnp.sqrt(jnp.sum(w_f * w_f, axis=(-2, -1), keepdims=True))
        norm1 = jnp.sqrt(jnp.sum(mixed * mixed, axis=(-2, -1),
                                 keepdims=True))
        out_layers[name] = (mixed * norm0 / jnp.maximum(norm1, 1e-9)
                            ).astype(w.dtype)
    return {**params, "layers": out_layers}


def make_copy_params(cfg: ModelConfig, params, cycle, gain: float = 4.0):
    """Teacher-forced COPY model: a workload on which speculative
    prompt-lookup can actually accept.

    Random-init weights never copy (greedy continuations are not periodic
    even for periodic prompts), so prompt-lookup acceptance was previously
    untestable end-to-end (VERDICT r4). This transform keeps the model's
    full weight footprint and compute — every projection is still read
    from HBM and dotted at its real size — but zeroes the OUTPUT side of
    each residual block (wo / w_down: quantized containers get zero
    dequant scales, plain arrays are zeroed), so the residual stream is
    exactly the token embedding. The lm_head is rebuilt so greedy decode
    emits the successor permutation over `cycle`:

        lm_head[:, cycle[i+1 mod len]] = embed[cycle[i]] * gain

    With ~orthogonal gaussian embedding rows, argmax(rms_norm(embed[t])
    @ lm_head) == succ(t) with margin ~sqrt(D); a prompt that repeats the
    cycle makes the model's continuation periodic, n-gram lookup proposes
    it, and acceptance is ~full. Works for fp32/bf16 and every quantized
    container (the bench uses it at 7B int8 so the copy workload carries
    the real memory traffic).
    """
    import dataclasses
    from .tensors import FP8Weight, SQWeight, WOQWeight

    def zero_out(w):
        if isinstance(w, WOQWeight):
            return dataclasses.replace(w, scale=jnp.zeros_like(w.scale))
        if isinstance(w, SQWeight):
            return dataclasses.replace(w, scale_w=jnp.zeros_like(w.scale_w))
        if isinstance(w, FP8Weight):
            return dataclasses.replace(w, scale=jnp.zeros_like(w.scale))
        return jnp.zeros_like(w)

    layers = dict(params["layers"])
    for name in ("wo", "w_down"):
        layers[name] = zero_out(layers[name])
    emb = np.asarray(params["embed"], np.float32)
    lm = np.zeros((cfg.hidden_size, cfg.vocab_size), np.float32)
    for i, t in enumerate(cycle):
        nxt = cycle[(i + 1) % len(cycle)]
        lm[:, nxt] = emb[t] * gain
    return {**params, "layers": layers,
            "lm_head": jnp.asarray(lm).astype(params["embed"].dtype)}
