"""BERT encoder goldens vs HF transformers.

Reference tier analogue: tests/model/test_bert.py (BertModel +
BertForQuestionAnswering random-weight goldens)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trtllm_llama_tpu.convert.hf_bert import params_from_hf_bert
from trtllm_llama_tpu.models import bert


@pytest.fixture(scope="module")
def hf_setup():
    import torch
    from transformers import BertConfig as HFBertConfig, BertModel

    torch.manual_seed(0)
    hf_cfg = HFBertConfig(
        vocab_size=256, hidden_size=96, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=192,
        max_position_embeddings=64, type_vocab_size=2)
    hf_model = BertModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = bert.BertConfig.from_hf_config(hf_cfg)
    params = params_from_hf_bert(hf_model, cfg)
    return hf_model, cfg, params


def test_encoder_matches_hf(hf_setup):
    import torch

    hf_model, cfg, params = hf_setup
    rng = np.random.default_rng(0)
    b, s = 2, 12
    ids = rng.integers(0, cfg.vocab_size, (b, s))
    types = rng.integers(0, 2, (b, s))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids),
                       token_type_ids=torch.tensor(types)
                       ).last_hidden_state.numpy()
    out = bert.forward(params, cfg, jnp.asarray(ids),
                       token_type_ids=jnp.asarray(types))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=2e-3)


def test_encoder_padding_mask_matches_hf(hf_setup):
    import torch

    hf_model, cfg, params = hf_setup
    rng = np.random.default_rng(1)
    b, s, true = 2, 12, 7
    ids = rng.integers(0, cfg.vocab_size, (b, s))
    mask = np.zeros((b, s), np.int64)
    mask[:, :true] = 1
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids),
                       attention_mask=torch.tensor(mask)
                       ).last_hidden_state.numpy()[:, :true]
    out = bert.forward(params, cfg, jnp.asarray(ids),
                       seq_lens=jnp.full((b,), true, jnp.int32))
    np.testing.assert_allclose(np.asarray(out)[:, :true], ref,
                               atol=2e-3, rtol=2e-3)


def test_qa_head_matches_hf():
    import torch
    from transformers import (BertConfig as HFBertConfig,
                              BertForQuestionAnswering)

    torch.manual_seed(1)
    hf_cfg = HFBertConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=32, type_vocab_size=2)
    hf_model = BertForQuestionAnswering(hf_cfg).eval()
    cfg = bert.BertConfig.from_hf_config(hf_cfg)
    params = params_from_hf_bert(hf_model, cfg)

    rng = np.random.default_rng(2)
    ids = rng.integers(0, cfg.vocab_size, (2, 10))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids))
    start, end = bert.forward_qa(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(start), ref.start_logits.numpy(),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(end), ref.end_logits.numpy(),
                               atol=2e-3, rtol=2e-3)


def test_random_init_runs():
    cfg = bert.BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                          num_heads=2, intermediate_size=64,
                          max_position_embeddings=16)
    params = bert.init_params(cfg, jax.random.PRNGKey(0), qa_head=True)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (1, 8)))
    s, e = jax.jit(lambda p, i: bert.forward_qa(p, cfg, i))(params, ids)
    assert s.shape == (1, 8) and e.shape == (1, 8)
    assert np.isfinite(np.asarray(s)).all()
