"""Generic decoder-only model families: GPT-J, GPT-NeoX, Bloom, OPT.

The reference builds each family as its own graph-builder class
(models/{gptj,gptneox,bloom,opt}/model.py, ~2k LoC of near-identical
wiring). On TPU the differences are a handful of static block-wiring
choices, so one functional block parameterized by an `ArchSpec` covers all
four — the spec is resolved at trace time, XLA only ever sees the branch
taken. Every family plugs into the same engine as LLaMA/GPT-2: stacked-
weight scan, shared KV cache layout and attention kernels, same
GenerationSession/ServingEngine (`model=decoder.GPTJ` etc.), same
quantization containers.

Family facts mirrored from the reference (and validated against HF
goldens in tests/test_families.py):
- GPT-J   (models/gptj/model.py:22-125): interleaved ("neox_rotary_style=
  False") partial rotary, ONE LayerNorm per block feeding both attention
  and MLP, parallel residual, no qkv/out biases, untied lm_head WITH bias.
- GPT-NeoX (models/gptneox/model.py:21-115): half-split rotary on a
  rotary_pct slice, two LayerNorms, parallel residual, biases everywhere,
  untied lm_head without bias.
- Bloom   (models/bloom/model.py:20-106): ALiBi (no position table), an
  extra LayerNorm right after the word embedding, sequential residuals,
  tied lm_head.
- OPT     (models/opt/model.py:20-147): learned absolute positions with
  the HF +2 offset, ReLU MLP, sequential residuals, pre-norm
  (do_layer_norm_before), tied lm_head.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.attention import (
    KVCache, alibi_slopes, extend_attention_at, fused_decode_attention_at,
    prefill_attention, write_kv_extend_at, write_kv_prefill_at,
)
from ..ops.linear import dense, embedding_lookup
from ..ops.norm import layer_norm
from ..ops.rope import (
    apply_rope, apply_rope_interleaved, rope_table, rope_table_interleaved,
    take_rope,
)
from ..utils.debugging import debug_output
from .llama import init_caches as _llama_init_caches


@dataclasses.dataclass(frozen=True)
class ArchSpec:
    """Static block-wiring description of a decoder family."""

    name: str
    rope: str = "none"             # none | neox (half-split) | interleaved
    alibi: bool = False
    learned_pos: bool = False      # learned absolute position table
    pos_offset: int = 0            # OPT: table row = position + 2
    parallel_residual: bool = False  # x + attn(ln(x)) + mlp(...)
    shared_ln: bool = False        # GPT-J: MLP input is ln1's output
    embed_ln: bool = False         # Bloom: LayerNorm after word embedding
    act: str = "gelu_tanh"         # gelu_tanh | gelu | relu
    qkv_bias: bool = True
    attn_out_bias: bool = True
    lm_head_bias: bool = False


GPTJ_SPEC = ArchSpec("gptj", rope="interleaved", parallel_residual=True,
                     shared_ln=True, qkv_bias=False, attn_out_bias=False,
                     lm_head_bias=True)
GPTNEOX_SPEC = ArchSpec("gptneox", rope="neox", parallel_residual=True,
                        act="gelu")
BLOOM_SPEC = ArchSpec("bloom", alibi=True, embed_ln=True)
OPT_SPEC = ArchSpec("opt", learned_pos=True, pos_offset=2, act="relu")
# Falcon-7B wiring (beyond the reference, which predates Falcon): full-dim
# neox rotary, ONE LayerNorm feeding both attention and MLP (parallel
# residual like GPT-J), exact GELU, no biases anywhere, and multi-query
# attention — MQA is just cfg.num_kv_heads=1 through the shared GQA
# attention ops. Validated against HF FalconForCausalLM goldens
# (tests/test_families.py).
FALCON_SPEC = ArchSpec("falcon", rope="neox", parallel_residual=True,
                       shared_ln=True, act="gelu", qkv_bias=False,
                       attn_out_bias=False)


def _act(spec: ArchSpec, x):
    xf = x.astype(jnp.float32)
    if spec.act == "relu":
        y = jax.nn.relu(xf)
    elif spec.act == "gelu":
        y = jax.nn.gelu(xf, approximate=False)
    else:
        y = jax.nn.gelu(xf, approximate=True)
    return y.astype(x.dtype)


def _rotary_dim(spec: ArchSpec, cfg: ModelConfig) -> int:
    return cfg.rotary_dim or cfg.head_dim


def _apply_rope(spec: ArchSpec, cfg: ModelConfig, x, cos, sin):
    rd = _rotary_dim(spec, cfg)
    if spec.rope == "interleaved":
        return apply_rope_interleaved(x, cos, sin, rd)
    if rd == x.shape[-1]:
        return apply_rope(x, cos, sin)
    xr = apply_rope(x[..., :rd], cos, sin)
    return jnp.concatenate([xr, x[..., rd:]], axis=-1)


def _rope_tables(spec: ArchSpec, cfg: ModelConfig):
    rd = _rotary_dim(spec, cfg)
    if spec.rope == "interleaved":
        return rope_table_interleaved(cfg.max_position_embeddings, rd,
                                      cfg.rope_theta)
    return rope_table(cfg.max_position_embeddings, rd, cfg.rope_theta)


class DecoderFamily:
    """Model-protocol object (init_params/init_caches/forward_*) for one
    ArchSpec; GenerationSession/ServingEngine take it via `model=`."""

    def __init__(self, spec: ArchSpec):
        self.spec = spec
        self.__name__ = f"decoder.{spec.name}"

    # -- parameters ----------------------------------------------------
    def init_params(self, cfg: ModelConfig, key, dtype=None):
        spec = self.spec
        dtype = dtype or cfg.jnp_dtype
        d, l, f = cfg.hidden_size, cfg.num_layers, cfg.intermediate_size
        nq, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        keys = iter(jax.random.split(key, 16))

        def w(shape, fan_in):
            return jax.random.normal(next(keys), shape, dtype) * fan_in ** -0.5

        layers = {
            "ln1_w": jnp.ones((l, d), dtype), "ln1_b": jnp.zeros((l, d), dtype),
            "wq": w((l, d, nq * hd), d),
            "wk": w((l, d, nkv * hd), d),
            "wv": w((l, d, nkv * hd), d),
            "wo": w((l, nq * hd, d), d),
            "w_fc": w((l, d, f), d), "b_fc": jnp.zeros((l, f), dtype),
            "w_proj": w((l, f, d), f), "b_proj": jnp.zeros((l, d), dtype),
        }
        if not spec.shared_ln:
            layers["ln2_w"] = jnp.ones((l, d), dtype)
            layers["ln2_b"] = jnp.zeros((l, d), dtype)
        if spec.qkv_bias:
            layers["bq"] = jnp.zeros((l, nq * hd), dtype)
            layers["bk"] = jnp.zeros((l, nkv * hd), dtype)
            layers["bv"] = jnp.zeros((l, nkv * hd), dtype)
        if spec.attn_out_bias:
            layers["bo"] = jnp.zeros((l, d), dtype)

        params = {
            "embed": w((cfg.vocab_size, d), d),
            "layers": layers,
            "final_ln_w": jnp.ones((d,), dtype),
            "final_ln_b": jnp.zeros((d,), dtype),
            "lm_head": w((d, cfg.vocab_size), d),
        }
        if spec.learned_pos:
            params["pos_embed"] = w(
                (cfg.max_position_embeddings + spec.pos_offset, d), d)
        if spec.embed_ln:
            params["emb_ln_w"] = jnp.ones((d,), dtype)
            params["emb_ln_b"] = jnp.zeros((d,), dtype)
        if spec.lm_head_bias:
            params["lm_head_b"] = jnp.zeros((cfg.vocab_size,), jnp.float32)
        return params

    def init_caches(self, cfg: ModelConfig, batch: int, max_len: int,
                    kv_scales=None):
        return _llama_init_caches(cfg, batch, max_len, kv_scales)

    # -- blocks --------------------------------------------------------
    def _block(self, cfg, lw, layer, x, cos, sin, alibi, caches, seq_lens,
               decode, extend=None):
        spec = self.spec
        idx = lambda a: jax.lax.dynamic_index_in_dim(a, layer, 0,
                                                     keepdims=False)

        def proj(h, wname, bname, n_heads):
            y = dense(h, lw[wname], layer=layer, part="col")
            if bname in lw:
                y = y + idx(lw[bname])
            return y.reshape(*y.shape[:-1], n_heads, cfg.head_dim)

        h1 = layer_norm(x, idx(lw["ln1_w"]), idx(lw["ln1_b"]),
                        cfg.rms_norm_eps)
        q = proj(h1, "wq", "bq", cfg.num_heads)
        k = proj(h1, "wk", "bk", cfg.num_kv_heads)
        v = proj(h1, "wv", "bv", cfg.num_kv_heads)
        if spec.rope != "none":
            q = _apply_rope(spec, cfg, q, cos, sin)
            k = _apply_rope(spec, cfg, k, cos, sin)
        if extend is not None:
            # multi-token generation slab at per-row offsets (chunked
            # prefill / speculative verification; llama forward_extend
            # semantics)
            attn = extend_attention_at(q, caches, layer, extend, k, v,
                                       alibi=alibi)
            caches = write_kv_extend_at(caches, layer, k, v, extend)
        elif decode:
            attn, caches = fused_decode_attention_at(
                q, k, v, caches, layer, seq_lens, alibi=alibi)
        else:
            caches = write_kv_prefill_at(caches, layer, k, v)
            attn = prefill_attention(q, k, v, seq_lens, alibi=alibi)
        attn = attn.reshape(*attn.shape[:-2], cfg.num_heads * cfg.head_dim)
        attn = dense(attn, lw["wo"], layer=layer, part="row")
        if "bo" in lw:
            attn = attn + idx(lw["bo"])
        debug_output("attention_output", attn)

        def mlp(h):
            h = dense(h, lw["w_fc"], layer=layer, part="col") + idx(lw["b_fc"])
            h = _act(spec, h)
            return dense(h, lw["w_proj"], layer=layer,
                         part="row") + idx(lw["b_proj"])

        if spec.parallel_residual:
            mlp_in = h1 if spec.shared_ln else layer_norm(
                x, idx(lw["ln2_w"]), idx(lw["ln2_b"]), cfg.rms_norm_eps)
            out = x + attn + mlp(mlp_in)
        else:
            x = x + attn
            h2 = layer_norm(x, idx(lw["ln2_w"]), idx(lw["ln2_b"]),
                            cfg.rms_norm_eps)
            out = x + mlp(h2)
        debug_output("decoder_layer_output", out)
        return out, caches

    def _run_layers(self, cfg, params, x, cos, sin, alibi, caches, seq_lens,
                    decode, extend=None):
        lw = params["layers"]

        def body(carry, layer):
            x, caches = carry
            x, caches = self._block(cfg, lw, layer, x, cos, sin, alibi,
                                    caches, seq_lens, decode, extend)
            return (x, caches), None

        (x, caches), _ = jax.lax.scan(body, (x, caches),
                                      jnp.arange(cfg.num_layers))
        return x, caches

    # -- embedding / head ----------------------------------------------
    def _embed(self, params, cfg, ids, positions):
        spec = self.spec
        x = embedding_lookup(params["embed"], ids, cfg.jnp_dtype)
        if spec.learned_pos:
            x = x + embedding_lookup(params["pos_embed"],
                                     positions + spec.pos_offset,
                                     cfg.jnp_dtype)
        if spec.embed_ln:
            x = layer_norm(x, params["emb_ln_w"], params["emb_ln_b"],
                           cfg.rms_norm_eps)
        return x

    def _head(self, params, cfg, x):
        logits = dense(x, params["lm_head"], jnp.float32)
        if "lm_head_b" in params:
            logits = logits + params["lm_head_b"]
        return logits

    def _pos_tables(self, cfg, positions):
        spec = self.spec
        if spec.rope == "none":
            return None, None
        cos_t, sin_t = _rope_tables(spec, cfg)
        return take_rope(cos_t, sin_t, positions)

    def _alibi(self, cfg):
        return alibi_slopes(cfg.num_heads) if self.spec.alibi else None

    # -- forward -------------------------------------------------------
    def forward_prefill(self, params, cfg: ModelConfig, input_ids, seq_lens,
                        caches: KVCache, return_all_logits: bool = False):
        b, s = input_ids.shape
        pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        cos, sin = self._pos_tables(cfg, pos)
        x = self._embed(params, cfg, input_ids, pos)
        x, caches = self._run_layers(cfg, params, x, cos, sin,
                                     self._alibi(cfg), caches, seq_lens,
                                     False)
        x = layer_norm(x, params["final_ln_w"], params["final_ln_b"],
                       cfg.rms_norm_eps)
        if return_all_logits:
            return self._head(params, cfg, x), caches
        last = jnp.take_along_axis(
            x, (seq_lens - 1)[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        return self._head(params, cfg, last), caches

    def forward_extend(self, params, cfg: ModelConfig, tokens, start,
                       caches: KVCache):
        """Multi-token generation slab: tokens [B, T], row (b, i) at
        position start[b] + i (llama.forward_extend contract — enables
        chunked prefill and speculative verification for this family).
        Returns (logits [B, T, V], caches)."""
        b, t = tokens.shape
        pos = start[:, None] + jnp.arange(t)[None]            # [B, T]
        cos, sin = self._pos_tables(cfg, pos)
        x = self._embed(params, cfg, tokens, pos)
        x, caches = self._run_layers(cfg, params, x, cos, sin,
                                     self._alibi(cfg), caches, None,
                                     False, extend=start)
        x = layer_norm(x, params["final_ln_w"], params["final_ln_b"],
                       cfg.rms_norm_eps)
        return self._head(params, cfg, x), caches

    def forward_decode(self, params, cfg: ModelConfig, tokens, positions,
                       caches: KVCache):
        cos, sin = self._pos_tables(cfg, positions)
        x = self._embed(params, cfg, tokens, positions)
        x, caches = self._run_layers(cfg, params, x, cos, sin,
                                     self._alibi(cfg), caches, positions,
                                     True)
        x = layer_norm(x, params["final_ln_w"], params["final_ln_b"],
                       cfg.rms_norm_eps)
        return self._head(params, cfg, x), caches


GPTJ = DecoderFamily(GPTJ_SPEC)
GPTNEOX = DecoderFamily(GPTNEOX_SPEC)
BLOOM = DecoderFamily(BLOOM_SPEC)
OPT = DecoderFamily(OPT_SPEC)
FALCON = DecoderFamily(FALCON_SPEC)

FAMILIES = {s.name: f for s, f in [(GPTJ_SPEC, GPTJ), (GPTNEOX_SPEC, GPTNEOX),
                                   (BLOOM_SPEC, BLOOM), (OPT_SPEC, OPT)]}
