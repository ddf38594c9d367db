"""HF checkpoints -> engine params for the decoder families
(models/decoder.py: GPT-J, GPT-NeoX, Bloom, OPT).

The load-time half of the reference's per-family weight pipelines
(examples/{gptj,gptneox,bloom,opt}/weight.py). Torch nn.Linear weights are
[out, in]; ours are [in, out], so projections transpose once here. The
fused query_key_value matrices of NeoX/Bloom are stored head-interleaved
([head, (q,k,v), head_dim] on the output axis — HF GPTNeoXAttention /
BloomAttention._split_heads); they are de-interleaved into separate
wq/wk/wv so the engine's stacked-projection layout (and its quantization
containers) apply uniformly.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .hf import _n, _t


def _stack(sd, fmt, n, conv=_n):
    return np.stack([conv(sd[fmt.format(i)]) for i in range(n)])


def _split_fused_qkv(w_qkv, b_qkv, n_heads, head_dim):
    """De-interleave [L, 3*D, D] / [L, 3*D] with [head, 3, head_dim] row
    layout into ((wq, wk, wv) [L, D, D] matmul-ready, (bq, bk, bv) [L, D])."""
    l = w_qkv.shape[0]
    d_in = w_qkv.shape[-1]
    w = w_qkv.reshape(l, n_heads, 3, head_dim, d_in)
    ws = [np.transpose(w[:, :, i], (0, 3, 1, 2)).reshape(l, d_in, -1)
          for i in range(3)]
    b = b_qkv.reshape(l, n_heads, 3, head_dim)
    bs = [b[:, :, i].reshape(l, -1) for i in range(3)]
    return ws, bs


def _as(tree, dtype):
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), tree)


# ---------------------------------------------------------------- GPT-J --
def config_from_hf_gptj(hf_cfg, **over) -> ModelConfig:
    d = dict(
        vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.n_embd,
        intermediate_size=getattr(hf_cfg, "n_inner", None) or 4 * hf_cfg.n_embd,
        num_layers=hf_cfg.n_layer, num_heads=hf_cfg.n_head,
        num_kv_heads=hf_cfg.n_head,
        head_dim=hf_cfg.n_embd // hf_cfg.n_head,
        max_position_embeddings=hf_cfg.n_positions,
        rotary_dim=hf_cfg.rotary_dim or 0,
        rms_norm_eps=hf_cfg.layer_norm_epsilon,
    )
    d.update(over)
    return ModelConfig(**d)


def params_from_hf_gptj(hf_model, cfg: ModelConfig, dtype=None):
    dtype = dtype or cfg.jnp_dtype
    sd = hf_model.state_dict()
    l = cfg.num_layers
    h = "transformer.h.{}."
    layers = {
        "ln1_w": _stack(sd, h + "ln_1.weight", l),
        "ln1_b": _stack(sd, h + "ln_1.bias", l),
        "wq": _stack(sd, h + "attn.q_proj.weight", l, _t),
        "wk": _stack(sd, h + "attn.k_proj.weight", l, _t),
        "wv": _stack(sd, h + "attn.v_proj.weight", l, _t),
        "wo": _stack(sd, h + "attn.out_proj.weight", l, _t),
        "w_fc": _stack(sd, h + "mlp.fc_in.weight", l, _t),
        "b_fc": _stack(sd, h + "mlp.fc_in.bias", l),
        "w_proj": _stack(sd, h + "mlp.fc_out.weight", l, _t),
        "b_proj": _stack(sd, h + "mlp.fc_out.bias", l),
    }
    return {
        "embed": jnp.asarray(_n(sd["transformer.wte.weight"]), dtype),
        "layers": _as(layers, dtype),
        "final_ln_w": jnp.asarray(_n(sd["transformer.ln_f.weight"]), dtype),
        "final_ln_b": jnp.asarray(_n(sd["transformer.ln_f.bias"]), dtype),
        "lm_head": jnp.asarray(_t(sd["lm_head.weight"]), dtype),
        "lm_head_b": jnp.asarray(_n(sd["lm_head.bias"]), jnp.float32),
    }


# ------------------------------------------------------------- GPT-NeoX --
def config_from_hf_gptneox(hf_cfg, **over) -> ModelConfig:
    hd = hf_cfg.hidden_size // hf_cfg.num_attention_heads
    d = dict(
        vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        num_kv_heads=hf_cfg.num_attention_heads, head_dim=hd,
        max_position_embeddings=hf_cfg.max_position_embeddings,
        rotary_dim=int(hd * hf_cfg.rotary_pct),
        rope_theta=getattr(hf_cfg, "rotary_emb_base", 10000.0),
        rms_norm_eps=hf_cfg.layer_norm_eps,
    )
    d.update(over)
    if not getattr(hf_cfg, "use_parallel_residual", True):
        raise NotImplementedError(
            "GPT-NeoX with use_parallel_residual=False (sequential residual) "
            "is the Bloom/OPT wiring; use a custom ArchSpec")
    return ModelConfig(**d)


def params_from_hf_gptneox(hf_model, cfg: ModelConfig, dtype=None):
    dtype = dtype or cfg.jnp_dtype
    sd = hf_model.state_dict()
    l = cfg.num_layers
    h = "gpt_neox.layers.{}."
    (wq, wk, wv), (bq, bk, bv) = _split_fused_qkv(
        _stack(sd, h + "attention.query_key_value.weight", l),
        _stack(sd, h + "attention.query_key_value.bias", l),
        cfg.num_heads, cfg.head_dim)
    layers = {
        "ln1_w": _stack(sd, h + "input_layernorm.weight", l),
        "ln1_b": _stack(sd, h + "input_layernorm.bias", l),
        "ln2_w": _stack(sd, h + "post_attention_layernorm.weight", l),
        "ln2_b": _stack(sd, h + "post_attention_layernorm.bias", l),
        "wq": wq, "bq": bq, "wk": wk, "bk": bk, "wv": wv, "bv": bv,
        "wo": _stack(sd, h + "attention.dense.weight", l, _t),
        "bo": _stack(sd, h + "attention.dense.bias", l),
        "w_fc": _stack(sd, h + "mlp.dense_h_to_4h.weight", l, _t),
        "b_fc": _stack(sd, h + "mlp.dense_h_to_4h.bias", l),
        "w_proj": _stack(sd, h + "mlp.dense_4h_to_h.weight", l, _t),
        "b_proj": _stack(sd, h + "mlp.dense_4h_to_h.bias", l),
    }
    return {
        "embed": jnp.asarray(_n(sd["gpt_neox.embed_in.weight"]), dtype),
        "layers": _as(layers, dtype),
        "final_ln_w": jnp.asarray(
            _n(sd["gpt_neox.final_layer_norm.weight"]), dtype),
        "final_ln_b": jnp.asarray(
            _n(sd["gpt_neox.final_layer_norm.bias"]), dtype),
        "lm_head": jnp.asarray(_t(sd["embed_out.weight"]), dtype),
    }


# ----------------------------------------------------------------- Bloom --
def config_from_hf_bloom(hf_cfg, **over) -> ModelConfig:
    d = dict(
        vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
        intermediate_size=4 * hf_cfg.hidden_size,
        num_layers=hf_cfg.n_layer, num_heads=hf_cfg.n_head,
        num_kv_heads=hf_cfg.n_head,
        head_dim=hf_cfg.hidden_size // hf_cfg.n_head,
        max_position_embeddings=2048,        # ALiBi: no positional table
        rms_norm_eps=hf_cfg.layer_norm_epsilon,
        tie_word_embeddings=True,
    )
    d.update(over)
    return ModelConfig(**d)


def params_from_hf_bloom(hf_model, cfg: ModelConfig, dtype=None):
    dtype = dtype or cfg.jnp_dtype
    sd = hf_model.state_dict()
    l = cfg.num_layers
    h = "transformer.h.{}."
    (wq, wk, wv), (bq, bk, bv) = _split_fused_qkv(
        _stack(sd, h + "self_attention.query_key_value.weight", l),
        _stack(sd, h + "self_attention.query_key_value.bias", l),
        cfg.num_heads, cfg.head_dim)
    layers = {
        "ln1_w": _stack(sd, h + "input_layernorm.weight", l),
        "ln1_b": _stack(sd, h + "input_layernorm.bias", l),
        "ln2_w": _stack(sd, h + "post_attention_layernorm.weight", l),
        "ln2_b": _stack(sd, h + "post_attention_layernorm.bias", l),
        "wq": wq, "bq": bq, "wk": wk, "bk": bk, "wv": wv, "bv": bv,
        "wo": _stack(sd, h + "self_attention.dense.weight", l, _t),
        "bo": _stack(sd, h + "self_attention.dense.bias", l),
        "w_fc": _stack(sd, h + "mlp.dense_h_to_4h.weight", l, _t),
        "b_fc": _stack(sd, h + "mlp.dense_h_to_4h.bias", l),
        "w_proj": _stack(sd, h + "mlp.dense_4h_to_h.weight", l, _t),
        "b_proj": _stack(sd, h + "mlp.dense_4h_to_h.bias", l),
    }
    embed = _n(sd["transformer.word_embeddings.weight"])
    return {
        "embed": jnp.asarray(embed, dtype),
        "emb_ln_w": jnp.asarray(
            _n(sd["transformer.word_embeddings_layernorm.weight"]), dtype),
        "emb_ln_b": jnp.asarray(
            _n(sd["transformer.word_embeddings_layernorm.bias"]), dtype),
        "layers": _as(layers, dtype),
        "final_ln_w": jnp.asarray(_n(sd["transformer.ln_f.weight"]), dtype),
        "final_ln_b": jnp.asarray(_n(sd["transformer.ln_f.bias"]), dtype),
        "lm_head": jnp.asarray(embed.T, dtype),
    }


# ------------------------------------------------------------------- OPT --
def config_from_hf_opt(hf_cfg, **over) -> ModelConfig:
    if hf_cfg.word_embed_proj_dim != hf_cfg.hidden_size:
        raise NotImplementedError("OPT word_embed_proj_dim != hidden_size")
    if not hf_cfg.do_layer_norm_before:
        raise NotImplementedError("OPT-350m post-norm variant unsupported")
    d = dict(
        vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.ffn_dim,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        num_kv_heads=hf_cfg.num_attention_heads,
        head_dim=hf_cfg.hidden_size // hf_cfg.num_attention_heads,
        max_position_embeddings=hf_cfg.max_position_embeddings,
        rms_norm_eps=1e-5,
        tie_word_embeddings=True,
    )
    d.update(over)
    return ModelConfig(**d)


def params_from_hf_opt(hf_model, cfg: ModelConfig, dtype=None):
    dtype = dtype or cfg.jnp_dtype
    sd = hf_model.state_dict()
    l = cfg.num_layers
    h = "model.decoder.layers.{}."
    layers = {
        "ln1_w": _stack(sd, h + "self_attn_layer_norm.weight", l),
        "ln1_b": _stack(sd, h + "self_attn_layer_norm.bias", l),
        "wq": _stack(sd, h + "self_attn.q_proj.weight", l, _t),
        "bq": _stack(sd, h + "self_attn.q_proj.bias", l),
        "wk": _stack(sd, h + "self_attn.k_proj.weight", l, _t),
        "bk": _stack(sd, h + "self_attn.k_proj.bias", l),
        "wv": _stack(sd, h + "self_attn.v_proj.weight", l, _t),
        "bv": _stack(sd, h + "self_attn.v_proj.bias", l),
        "wo": _stack(sd, h + "self_attn.out_proj.weight", l, _t),
        "bo": _stack(sd, h + "self_attn.out_proj.bias", l),
        "ln2_w": _stack(sd, h + "final_layer_norm.weight", l),
        "ln2_b": _stack(sd, h + "final_layer_norm.bias", l),
        "w_fc": _stack(sd, h + "fc1.weight", l, _t),
        "b_fc": _stack(sd, h + "fc1.bias", l),
        "w_proj": _stack(sd, h + "fc2.weight", l, _t),
        "b_proj": _stack(sd, h + "fc2.bias", l),
    }
    embed = _n(sd["model.decoder.embed_tokens.weight"])
    return {
        "embed": jnp.asarray(embed, dtype),
        "pos_embed": jnp.asarray(
            _n(sd["model.decoder.embed_positions.weight"]), dtype),
        "layers": _as(layers, dtype),
        "final_ln_w": jnp.asarray(
            _n(sd["model.decoder.final_layer_norm.weight"]), dtype),
        "final_ln_b": jnp.asarray(
            _n(sd["model.decoder.final_layer_norm.bias"]), dtype),
        "lm_head": jnp.asarray(embed.T, dtype),
    }


# --------------------------------------------------------------- Falcon --
def config_from_hf_falcon(hf_cfg, **over) -> ModelConfig:
    """Falcon-7B-style config (beyond the reference, which predates Falcon).

    Supported wiring: rotary + parallel_attn + single input LayerNorm +
    bias-free projections, with MQA (multi_query=True -> num_kv_heads=1) or
    MHA. The 40B `new_decoder_architecture` (grouped KV + two LNs per
    block) and the alibi/bias RW variants raise."""
    if getattr(hf_cfg, "new_decoder_architecture", False):
        raise NotImplementedError(
            "Falcon new_decoder_architecture (40B wiring: grouped KV + two "
            "LNs per block) is not mapped; 7B wiring only")
    if getattr(hf_cfg, "alibi", False) or getattr(hf_cfg, "bias", False):
        raise NotImplementedError(
            "Falcon RW variants (alibi=True / bias=True) are not mapped")
    if not getattr(hf_cfg, "parallel_attn", True):
        raise NotImplementedError("Falcon with parallel_attn=False is the "
                                  "sequential-residual (Bloom/OPT) wiring")
    hd = hf_cfg.hidden_size // hf_cfg.num_attention_heads
    d = dict(
        vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
        intermediate_size=getattr(hf_cfg, "ffn_hidden_size",
                                  4 * hf_cfg.hidden_size),
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        num_kv_heads=1 if hf_cfg.multi_query else hf_cfg.num_attention_heads,
        head_dim=hd,
        max_position_embeddings=hf_cfg.max_position_embeddings,
        rotary_dim=hd,                       # full-dim neox rotary
        rope_theta=getattr(hf_cfg, "rope_theta", 10000.0),
        rms_norm_eps=hf_cfg.layer_norm_epsilon,
        architecture="falcon",
    )
    d.update(over)
    return ModelConfig(**d)


def params_from_hf_falcon(hf_model, cfg: ModelConfig, dtype=None):
    dtype = dtype or cfg.jnp_dtype
    sd = hf_model.state_dict()
    l, nq, hd = cfg.num_layers, cfg.num_heads, cfg.head_dim
    h = "transformer.h.{}."
    w_qkv = _stack(sd, h + "self_attention.query_key_value.weight", l)
    if cfg.num_kv_heads == 1:
        # MQA fused layout: nq query heads, then ONE k head, then ONE v head
        # (FalconAttention._split_heads, multi_query branch)
        wq = np.transpose(w_qkv[:, :nq * hd], (0, 2, 1))
        wk = np.transpose(w_qkv[:, nq * hd:(nq + 1) * hd], (0, 2, 1))
        wv = np.transpose(w_qkv[:, (nq + 1) * hd:], (0, 2, 1))
    else:
        # MHA fused layout is [head, 3, head_dim]-interleaved like GPT-NeoX
        (wq, wk, wv), _ = _split_fused_qkv(
            w_qkv, np.zeros(w_qkv.shape[:2], w_qkv.dtype), nq, hd)
    layers = {
        "ln1_w": _stack(sd, h + "input_layernorm.weight", l),
        "ln1_b": _stack(sd, h + "input_layernorm.bias", l),
        "wq": wq, "wk": wk, "wv": wv,
        "wo": _stack(sd, h + "self_attention.dense.weight", l, _t),
        "w_fc": _stack(sd, h + "mlp.dense_h_to_4h.weight", l, _t),
        "b_fc": np.zeros((l, cfg.intermediate_size), np.float32),
        "w_proj": _stack(sd, h + "mlp.dense_4h_to_h.weight", l, _t),
        "b_proj": np.zeros((l, cfg.hidden_size), np.float32),
    }
    return {
        "embed": jnp.asarray(_n(sd["transformer.word_embeddings.weight"]),
                             dtype),
        "layers": _as(layers, dtype),
        "final_ln_w": jnp.asarray(_n(sd["transformer.ln_f.weight"]), dtype),
        "final_ln_b": jnp.asarray(_n(sd["transformer.ln_f.bias"]), dtype),
        "lm_head": jnp.asarray(_t(sd["lm_head.weight"]), dtype),
    }
