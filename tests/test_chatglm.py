"""ChatGLM-6B family tests.

transformers ships no ChatGLM class (upstream is trust_remote_code), so the
golden is an independent torch re-implementation of the GLM semantics
documented in the reference (models/chatglm6b/model.py + its vendored
modeling_chatglm.py:463-771): 2D rotary, prefix-LM bidirectional masking,
sqrt(2L)-scaled post-LN residuals. The torch model runs full-sequence
(context + generated, one shot); the engine runs its real prefill + decode
phases — agreement checks the entire 2D position/cache machinery.
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trtllm_llama_tpu.config import ModelConfig
from trtllm_llama_tpu.models import chatglm


def _torch_glm_forward(params, cfg, ids, ctx_len, mask_pos):
    """Independent torch reference: full-sequence GLM forward over `ids`
    [B, T] where the first ctx_len tokens are context (bidirectional) and
    the rest are generated (causal, 2D positions frozen at mask_pos)."""
    import torch

    def t(a):
        return torch.tensor(np.asarray(a, np.float32))

    lw = {k: t(v) for k, v in params["layers"].items()}
    emb, head = t(params["embedding"]), t(params["lm_head"])
    fw, fb = t(params["final_norm_w"]), t(params["final_norm_b"])

    b, T = ids.shape
    d, h, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim
    half = hd // 2
    alpha = math.sqrt(2.0 * cfg.num_layers)
    eps = cfg.rms_norm_eps

    # 2D positions (modeling_chatglm.py:732-771, gmask branch)
    i = torch.arange(T)
    pos0 = torch.where(i < ctx_len, i, torch.tensor(mask_pos))
    pos1 = torch.where(i < ctx_len, torch.zeros_like(i), i - ctx_len + 1)
    # prefix-LM mask: context fully visible, then causal
    allowed = (i[None, :] < ctx_len) | (i[None, :] <= i[:, None])   # [T, T]

    inv = 1.0 / (10000.0 ** (torch.arange(0, half, 2).float() / half))

    def rope_half(x, pos):                      # x: [B, T, H, half]
        ang = pos[:, None].float() * inv[None]              # [T, half/2]
        cos = torch.cos(torch.cat([ang, ang], -1))[None, :, None, :]
        sin = torch.sin(torch.cat([ang, ang], -1))[None, :, None, :]
        x1, x2 = x[..., :half // 2], x[..., half // 2:]
        rot = torch.cat([-x2, x1], dim=-1)
        return x * cos + rot * sin

    def ln(x, w_, b_):
        return torch.nn.functional.layer_norm(x, (d,), w_, b_, eps)

    x = emb[torch.tensor(ids)]
    for L in range(cfg.num_layers):
        a_in = ln(x, lw["ln1_w"][L], lw["ln1_b"][L])
        q = (a_in @ lw["wq"][L] + lw["bq"][L]).view(b, T, h, hd)
        k = (a_in @ lw["wk"][L] + lw["bk"][L]).view(b, T, h, hd)
        v = (a_in @ lw["wv"][L] + lw["bv"][L]).view(b, T, h, hd)
        q = torch.cat([rope_half(q[..., :half], pos0),
                       rope_half(q[..., half:], pos1)], dim=-1)
        k = torch.cat([rope_half(k[..., :half], pos0),
                       rope_half(k[..., half:], pos1)], dim=-1)
        scores = torch.einsum("bihd,bjhd->bhij", q, k) / math.sqrt(hd)
        scores = scores.masked_fill(~allowed[None, None], -1e9)
        probs = torch.softmax(scores, dim=-1)
        attn = torch.einsum("bhij,bjhd->bihd", probs, v).reshape(b, T, d)
        attn = attn @ lw["wo"][L] + lw["bo"][L]
        x = a_in * alpha + attn
        m_in = ln(x, lw["ln2_w"][L], lw["ln2_b"][L])
        mid = torch.nn.functional.gelu(m_in @ lw["w_fc"][L] + lw["b_fc"][L])
        x = m_in * alpha + (mid @ lw["w_proj"][L] + lw["b_proj"][L])
    x = ln(x, fw, fb)
    return (x @ head).numpy()


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig.tiny(num_heads=4, num_kv_heads=4, head_dim=32,
                           hidden_size=128, dtype="float32")
    params = chatglm.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_prefill_matches_torch_reference(setup):
    cfg, params = setup
    rng = np.random.default_rng(0)
    b, s = 2, 10
    ids = rng.integers(0, cfg.vocab_size, (b, s))

    caches = chatglm.init_caches(cfg, b, 32)
    lens = jnp.full((b,), s, jnp.int32)
    logits, _ = chatglm.forward_prefill(params, cfg, jnp.asarray(ids), lens,
                                        caches, return_all_logits=True)
    ref = _torch_glm_forward(params, cfg, ids, ctx_len=s, mask_pos=s - 2)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-3, rtol=2e-3)


def test_decode_matches_torch_reference(setup):
    """Engine prefill + 3 teacher-forced decode steps == torch full-sequence
    forward with the GLM mask and frozen/counting 2D positions."""
    cfg, params = setup
    rng = np.random.default_rng(1)
    b, s, g = 2, 8, 3
    ids = rng.integers(0, cfg.vocab_size, (b, s + g))

    ref = _torch_glm_forward(params, cfg, ids, ctx_len=s, mask_pos=s - 2)

    caches = chatglm.init_caches(cfg, b, 32)
    lens = jnp.full((b,), s, jnp.int32)
    logits, caches = chatglm.forward_prefill(
        params, cfg, jnp.asarray(ids[:, :s]), lens, caches)
    np.testing.assert_allclose(np.asarray(logits), ref[:, s - 1],
                               atol=2e-3, rtol=2e-3)
    for t in range(g):
        logits, caches = chatglm.forward_decode(
            params, cfg, jnp.asarray(ids[:, s + t]), lens + t, caches)
        np.testing.assert_allclose(np.asarray(logits), ref[:, s + t],
                                   atol=2e-3, rtol=2e-3)


def test_generation_session_drives_chatglm(setup):
    """The standard runtime must drive the family end-to-end (model= hook,
    like GPT-2/decoder families)."""
    from trtllm_llama_tpu.config import EngineConfig
    from trtllm_llama_tpu.runtime.sampling import SamplingConfig
    from trtllm_llama_tpu.runtime.session import GenerationSession

    cfg, params = setup
    sess = GenerationSession(cfg, params,
                             EngineConfig(max_input_len=16, max_seq_len=32),
                             model=chatglm)
    ids = np.random.default_rng(2).integers(3, cfg.vocab_size, (2, 6))
    out = sess.generate(ids, max_new_tokens=5,
                        sampling=SamplingConfig(end_id=-1))
    assert out.output_ids.shape == (2, 5)
    assert (out.output_ids >= 0).all()
    # deterministic across calls
    out2 = sess.generate(ids, max_new_tokens=5,
                         sampling=SamplingConfig(end_id=-1))
    np.testing.assert_array_equal(out.output_ids, out2.output_ids)


def test_state_dict_converter_roundtrip(setup):
    """Build a synthetic THUDM-layout state dict by inverse-transforming
    engine params (incl. the [head, (q,k,v), head_dim] interleave), convert
    it back, and require exact tree equality."""
    import torch

    from trtllm_llama_tpu.convert.hf_chatglm import (
        params_from_chatglm_state_dict,
    )

    cfg, params = setup
    l, d = cfg.num_layers, cfg.hidden_size
    h, hd = cfg.num_heads, cfg.head_dim
    lw = {k: np.asarray(v) for k, v in params["layers"].items()}

    sd = {
        "transformer.word_embeddings.weight":
            torch.tensor(np.asarray(params["embedding"])),
        "transformer.final_layernorm.weight":
            torch.tensor(np.asarray(params["final_norm_w"])),
        "transformer.final_layernorm.bias":
            torch.tensor(np.asarray(params["final_norm_b"])),
        "lm_head.weight": torch.tensor(np.asarray(params["lm_head"]).T),
    }
    for i in range(l):
        p = f"transformer.layers.{i}."
        # engine wq [d, h*hd] -> torch rows [h, hd, d] -> fused [h, 3, hd, d]
        def rows(key):
            return lw[key][i].T.reshape(h, hd, d)
        fused_w = np.stack([rows("wq"), rows("wk"), rows("wv")],
                           axis=1).reshape(3 * h * hd, d)
        fused_b = np.stack([lw["bq"][i].reshape(h, hd),
                            lw["bk"][i].reshape(h, hd),
                            lw["bv"][i].reshape(h, hd)],
                           axis=1).reshape(3 * h * hd)
        sd[p + "attention.query_key_value.weight"] = torch.tensor(fused_w)
        sd[p + "attention.query_key_value.bias"] = torch.tensor(fused_b)
        sd[p + "attention.dense.weight"] = torch.tensor(lw["wo"][i].T)
        sd[p + "attention.dense.bias"] = torch.tensor(lw["bo"][i])
        sd[p + "input_layernorm.weight"] = torch.tensor(lw["ln1_w"][i])
        sd[p + "input_layernorm.bias"] = torch.tensor(lw["ln1_b"][i])
        sd[p + "post_attention_layernorm.weight"] = torch.tensor(
            lw["ln2_w"][i])
        sd[p + "post_attention_layernorm.bias"] = torch.tensor(lw["ln2_b"][i])
        sd[p + "mlp.dense_h_to_4h.weight"] = torch.tensor(lw["w_fc"][i].T)
        sd[p + "mlp.dense_h_to_4h.bias"] = torch.tensor(lw["b_fc"][i])
        sd[p + "mlp.dense_4h_to_h.weight"] = torch.tensor(lw["w_proj"][i].T)
        sd[p + "mlp.dense_4h_to_h.bias"] = torch.tensor(lw["b_proj"][i])

    out = params_from_chatglm_state_dict(sd, cfg)
    a = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(params)}
    b_ = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(out)}
    assert a.keys() == b_.keys()
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b_[k]),
                                   atol=1e-6, err_msg=k)
