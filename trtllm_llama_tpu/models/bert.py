"""BERT encoder family (reference models/bert/model.py).

The reference ships BertModel + BertForQuestionAnswering as the encoder-only
demonstration of its graph stack (bertAttentionPlugin for the fused
bidirectional attention, tests/model/test_bert.py goldens). TPU-native
equivalent: one functional encoder over stacked layer weights (lax.scan,
like every decoder family here), bidirectional `prefill_attention(causal=
False)` with the length mask, post-LN residuals, exact-erf GELU — HF
`BertModel` semantics, validated against transformers goldens in
tests/test_bert.py.

No KV cache / no generation runtime: encoders are single-shot (the
reference runs them through its generic `Session`, session.py:35-180; here
`forward` is simply jitted by the caller).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.attention import prefill_attention
from ..ops.linear import dense, embedding_lookup
from ..ops.norm import layer_norm


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dtype: str = "float32"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def from_hf_config(cls, hf_cfg, **over) -> "BertConfig":
        return cls(
            vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
            num_layers=hf_cfg.num_hidden_layers,
            num_heads=hf_cfg.num_attention_heads,
            intermediate_size=hf_cfg.intermediate_size,
            max_position_embeddings=hf_cfg.max_position_embeddings,
            type_vocab_size=hf_cfg.type_vocab_size,
            layer_norm_eps=hf_cfg.layer_norm_eps, **over)


def init_params(cfg: BertConfig, key, qa_head: bool = False):
    """Random params in the stacked-layer layout."""
    d, f, l = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    dt = cfg.jnp_dtype
    keys = iter(jax.random.split(key, 16))

    def w(shape, fan_in):
        return (jax.random.normal(next(keys), shape, jnp.float32)
                * (fan_in ** -0.5)).astype(dt)

    params = {
        "word_emb": w((cfg.vocab_size, d), d),
        "pos_emb": w((cfg.max_position_embeddings, d), d),
        "type_emb": w((cfg.type_vocab_size, d), d),
        "emb_ln_w": jnp.ones((d,), dt), "emb_ln_b": jnp.zeros((d,), dt),
        "layers": {
            "wq": w((l, d, d), d), "bq": jnp.zeros((l, d), dt),
            "wk": w((l, d, d), d), "bk": jnp.zeros((l, d), dt),
            "wv": w((l, d, d), d), "bv": jnp.zeros((l, d), dt),
            "wo": w((l, d, d), d), "bo": jnp.zeros((l, d), dt),
            "ln1_w": jnp.ones((l, d), dt), "ln1_b": jnp.zeros((l, d), dt),
            "w_fc": w((l, d, f), d), "b_fc": jnp.zeros((l, f), dt),
            "w_proj": w((l, f, d), f), "b_proj": jnp.zeros((l, d), dt),
            "ln2_w": jnp.ones((l, d), dt), "ln2_b": jnp.zeros((l, d), dt),
        },
    }
    if qa_head:
        params["qa_w"] = w((d, 2), d)
        params["qa_b"] = jnp.zeros((2,), dt)
    return params


def _block(cfg: BertConfig, lw, layer, x, seq_lens):
    idx = lambda a: jax.lax.dynamic_index_in_dim(a, layer, 0, keepdims=False)
    b, s, d = x.shape
    h, hd = cfg.num_heads, cfg.head_dim

    def proj(wname, bname):
        y = dense(x, lw[wname], layer=layer, part="col") + idx(lw[bname])
        return y.reshape(b, s, h, hd)

    q, k, v = proj("wq", "bq"), proj("wk", "bk"), proj("wv", "bv")
    attn = prefill_attention(q, k, v, seq_lens, causal=False)
    attn = attn.reshape(b, s, d)
    attn = dense(attn, lw["wo"], layer=layer, part="row") + idx(lw["bo"])
    x = layer_norm(x + attn, idx(lw["ln1_w"]), idx(lw["ln1_b"]),
                   cfg.layer_norm_eps)

    hmid = dense(x, lw["w_fc"], layer=layer, part="col") + idx(lw["b_fc"])
    hmid = jax.nn.gelu(hmid.astype(jnp.float32),
                       approximate=False).astype(x.dtype)
    mlp = dense(hmid, lw["w_proj"], layer=layer, part="row") + idx(
        lw["b_proj"])
    return layer_norm(x + mlp, idx(lw["ln2_w"]), idx(lw["ln2_b"]),
                      cfg.layer_norm_eps)


def forward(params, cfg: BertConfig, input_ids, seq_lens=None,
            token_type_ids=None):
    """Encoder forward. input_ids: [B, S]; seq_lens: optional [B] true
    lengths (pad keys masked); token_type_ids: optional [B, S].
    Returns the final hidden states [B, S, D]."""
    b, s = input_ids.shape
    x = embedding_lookup(params["word_emb"], input_ids)
    x = x + params["pos_emb"][:s][None]
    types = (token_type_ids if token_type_ids is not None
             else jnp.zeros_like(input_ids))
    x = x + embedding_lookup(params["type_emb"], types)
    x = layer_norm(x, params["emb_ln_w"], params["emb_ln_b"],
                   cfg.layer_norm_eps)

    if seq_lens is None:
        seq_lens = jnp.full((b,), s, jnp.int32)

    def body(carry, layer):
        return _block(cfg, params["layers"], layer, carry, seq_lens), None

    x, _ = jax.lax.scan(body, x, jnp.arange(cfg.num_layers))
    return x


def forward_qa(params, cfg: BertConfig, input_ids, seq_lens=None,
               token_type_ids=None):
    """BertForQuestionAnswering (reference model.py:234-276): encoder +
    a 2-output span head. Returns (start_logits, end_logits) [B, S]."""
    x = forward(params, cfg, input_ids, seq_lens, token_type_ids)
    logits = dense(x, params["qa_w"]) + params["qa_b"]
    return logits[..., 0], logits[..., 1]
