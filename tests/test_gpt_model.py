"""GPT-2 model family golden tests vs HF transformers (second family tier,
reference tests/model/test_gpt.py analogue)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trtllm_llama_tpu.config import EngineConfig
from trtllm_llama_tpu.convert.hf_gpt import (
    config_from_hf_gpt2, params_from_hf_gpt2,
)
from trtllm_llama_tpu.models import gpt
from trtllm_llama_tpu.runtime.sampling import SamplingConfig
from trtllm_llama_tpu.runtime.session import GenerationSession


@pytest.fixture(scope="module")
def hf_gpt():
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(0)
    hf_cfg = GPT2Config(vocab_size=256, n_embd=128, n_layer=2, n_head=4,
                        n_positions=128)
    model = GPT2LMHeadModel(hf_cfg).eval()
    cfg = config_from_hf_gpt2(hf_cfg, dtype="float32")
    params = params_from_hf_gpt2(model, cfg)
    return model, cfg, params


def test_gpt_prefill_logits_match_hf(hf_gpt):
    import torch

    hf, cfg, params = hf_gpt
    rng = np.random.default_rng(0)
    b, s = 2, 11
    ids = rng.integers(0, cfg.vocab_size, (b, s))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    caches = gpt.init_caches(cfg, b, 32)
    logits, _ = gpt.forward_prefill(
        params, cfg, jnp.asarray(ids), jnp.full((b,), s, jnp.int32), caches,
        return_all_logits=True)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-2, rtol=2e-2)


def test_gpt_decode_matches_prefill(hf_gpt):
    _, cfg, params = hf_gpt
    rng = np.random.default_rng(1)
    b, s = 2, 9
    ids = rng.integers(0, cfg.vocab_size, (b, s))
    caches = gpt.init_caches(cfg, b, 32)
    full, _ = gpt.forward_prefill(
        params, cfg, jnp.asarray(ids), jnp.full((b,), s, jnp.int32), caches)
    caches = gpt.init_caches(cfg, b, 32)
    _, caches = gpt.forward_prefill(
        params, cfg, jnp.asarray(ids[:, :-1]),
        jnp.full((b,), s - 1, jnp.int32), caches)
    dec, _ = gpt.forward_decode(
        params, cfg, jnp.asarray(ids[:, -1]),
        jnp.full((b,), s - 1, jnp.int32), caches)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(full),
                               atol=1e-2, rtol=1e-2)


def test_gpt_session_generate_matches_hf(hf_gpt):
    import torch

    hf, cfg, params = hf_gpt
    sess = GenerationSession(cfg, params,
                             EngineConfig(max_input_len=16, max_seq_len=64),
                             model=gpt)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, cfg.vocab_size, (1, 8))
    new = 10
    with torch.no_grad():
        ref = hf.generate(torch.tensor(ids), max_new_tokens=new,
                          do_sample=False, pad_token_id=0)
    out = sess.generate(ids, max_new_tokens=new,
                        sampling=SamplingConfig(end_id=-1))
    np.testing.assert_array_equal(out.output_ids, ref[:, 8:].numpy())


def test_gpt_beam_and_quantized(hf_gpt):
    """GPT works through beam search and weight-only quantization too."""
    from trtllm_llama_tpu.quantization.mode import QuantMode
    from trtllm_llama_tpu.quantization.quantize import quantize_params

    _, cfg, params = hf_gpt
    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg.vocab_size, (1, 6))

    sess = GenerationSession(cfg, params,
                             EngineConfig(max_input_len=16, max_seq_len=48),
                             model=gpt)
    beam = sess.generate(ids, max_new_tokens=5,
                         sampling=SamplingConfig(end_id=-1, beam_width=3))
    assert beam.beam_ids.shape == (1, 3, 5)

    qm = QuantMode.use_weight_only(False)
    qp = dict(params)
    qp["layers"] = dict(params["layers"])
    for k in ("wq", "wk", "wv", "wo", "w_fc", "w_proj"):
        from trtllm_llama_tpu.quantization.tensors import quantize_weight_only
        qp["layers"][k] = quantize_weight_only(params["layers"][k], 8, 0)
    qsess = GenerationSession(cfg, qp,
                              EngineConfig(max_input_len=16, max_seq_len=48),
                              model=gpt)
    qout = qsess.generate(ids, max_new_tokens=5,
                          sampling=SamplingConfig(end_id=-1))
    assert qout.output_ids.shape == (1, 5)


def test_prompt_tuning_matches_real_token_run(hf_gpt):
    """Virtual ids whose prompt-table rows ARE real vocab embeddings must
    generate bit-identically to the real-token prompt (the reference's
    PromptTuningEmbedding contract, layers/embedding.py:38-81)."""
    _, cfg, params = hf_gpt
    rng = np.random.default_rng(4)
    real = rng.integers(3, cfg.vocab_size, (2, 8)).astype(np.int32)

    # two tasks, 4 virtual tokens each; task t's table block holds the
    # embeddings of real[t, :4], so replacing those ids with virtual ids
    # must be a no-op on the computation
    tvs = 4
    table = np.concatenate([np.asarray(params["embed"])[real[t, :tvs]]
                            for t in range(2)], axis=0)
    virt = real.copy()
    virt[:, :tvs] = cfg.vocab_size + np.arange(tvs)
    pt = gpt.PromptTuning(jnp.asarray(table),
                          jnp.asarray([0, 1], jnp.int32),
                          jnp.int32(tvs))

    sess = GenerationSession(cfg, params,
                             EngineConfig(max_input_len=16, max_seq_len=48),
                             model=gpt)
    scfg = SamplingConfig(end_id=-1)
    out_real = sess.generate(real, max_new_tokens=6, sampling=scfg)
    out_virt = sess.generate(virt, max_new_tokens=6, sampling=scfg, prompt=pt)
    np.testing.assert_array_equal(out_real.output_ids, out_virt.output_ids)


def test_prompt_tuning_table_changes_output(hf_gpt):
    """A different prompt table must actually steer the model (guards
    against the virtual path silently reading the normal table)."""
    _, cfg, params = hf_gpt
    rng = np.random.default_rng(5)
    ids = rng.integers(3, cfg.vocab_size, (1, 8)).astype(np.int32)
    ids[:, :4] = cfg.vocab_size + np.arange(4)
    caches = gpt.init_caches(cfg, 1, 32)
    lens = jnp.full((1,), 8, jnp.int32)

    def run(scale):
        pt = gpt.PromptTuning(
            jnp.asarray(rng.standard_normal((4, cfg.hidden_size)) * scale,
                        jnp.float32),
            jnp.zeros((1,), jnp.int32), jnp.int32(4))
        logits, _ = gpt.forward_prefill(params, cfg, jnp.asarray(ids), lens,
                                        gpt.init_caches(cfg, 1, 32),
                                        prompt=pt)
        return np.asarray(logits)

    assert np.abs(run(0.02) - run(1.0)).max() > 1e-3
