"""HF BertModel / BertForQuestionAnswering -> engine params
(models/bert.py layout).

The load-time half of the reference's BERT example (examples/bert/weight.py
semantics: per-layer torch [out, in] Linears transposed to matmul-ready
[in, out], stacked over layers)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models.bert import BertConfig
from .hf import _n


def _stack_t(sd, fmt, n):
    """Stacked + transposed projection weights [L, in, out]."""
    return np.stack([_n(sd[fmt.format(i)]).T for i in range(n)])


def _stack(sd, fmt, n):
    return np.stack([_n(sd[fmt.format(i)]) for i in range(n)])


def params_from_hf_bert(hf_model, cfg: BertConfig, dtype=None):
    """Works for transformers BertModel and Bert*-headed models (the
    encoder lives under `bert.` for headed models, at top level for
    BertModel)."""
    sd = {k: v for k, v in hf_model.state_dict().items()}
    prefix = "bert." if any(k.startswith("bert.") for k in sd) else ""
    e = prefix + "embeddings."
    enc = prefix + "encoder.layer.{}."
    l = cfg.num_layers
    dt = jnp.dtype(dtype or cfg.dtype)

    def t(name):
        return jnp.asarray(_n(sd[name]), dt)

    params = {
        "word_emb": t(e + "word_embeddings.weight"),
        "pos_emb": t(e + "position_embeddings.weight"),
        "type_emb": t(e + "token_type_embeddings.weight"),
        "emb_ln_w": t(e + "LayerNorm.weight"),
        "emb_ln_b": t(e + "LayerNorm.bias"),
        "layers": {
            "wq": _stack_t(sd, enc + "attention.self.query.weight", l),
            "bq": _stack(sd, enc + "attention.self.query.bias", l),
            "wk": _stack_t(sd, enc + "attention.self.key.weight", l),
            "bk": _stack(sd, enc + "attention.self.key.bias", l),
            "wv": _stack_t(sd, enc + "attention.self.value.weight", l),
            "bv": _stack(sd, enc + "attention.self.value.bias", l),
            "wo": _stack_t(sd, enc + "attention.output.dense.weight", l),
            "bo": _stack(sd, enc + "attention.output.dense.bias", l),
            "ln1_w": _stack(sd, enc + "attention.output.LayerNorm.weight", l),
            "ln1_b": _stack(sd, enc + "attention.output.LayerNorm.bias", l),
            "w_fc": _stack_t(sd, enc + "intermediate.dense.weight", l),
            "b_fc": _stack(sd, enc + "intermediate.dense.bias", l),
            "w_proj": _stack_t(sd, enc + "output.dense.weight", l),
            "b_proj": _stack(sd, enc + "output.dense.bias", l),
            "ln2_w": _stack(sd, enc + "output.LayerNorm.weight", l),
            "ln2_b": _stack(sd, enc + "output.LayerNorm.bias", l),
        },
    }
    params["layers"] = {k: jnp.asarray(v, dt)
                        for k, v in params["layers"].items()}
    if "qa_outputs.weight" in sd:
        params["qa_w"] = jnp.asarray(_n(sd["qa_outputs.weight"]).T, dt)
        params["qa_b"] = jnp.asarray(_n(sd["qa_outputs.bias"]), dt)
    return params
