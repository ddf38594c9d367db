"""End-to-end GenerationSession tests: greedy generation vs HF generate,
on-device loop vs manual step loop, EOS handling."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trtllm_llama_tpu.config import EngineConfig, ModelConfig
from trtllm_llama_tpu.models import llama
from trtllm_llama_tpu.runtime.sampling import SamplingConfig
from trtllm_llama_tpu.runtime.session import GenerationSession


@pytest.fixture(scope="module")
def tiny_engine():
    cfg = ModelConfig.tiny(dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(7))
    ecfg = EngineConfig(max_batch_size=4, max_input_len=32, max_seq_len=64)
    return GenerationSession(cfg, params, ecfg)


def test_greedy_matches_manual_loop(tiny_engine):
    sess = tiny_engine
    cfg = sess.cfg
    rng = np.random.default_rng(0)
    b, s, new = 2, 10, 8
    ids = rng.integers(3, cfg.vocab_size, (b, s))
    scfg = SamplingConfig(end_id=-1)  # never stop

    out = sess.generate(ids, max_new_tokens=new, sampling=scfg)
    assert out.output_ids.shape == (b, new)

    # manual loop with raw model functions (same bucket padding: 16)
    bucket = sess.engine_cfg.bucket_for(s)
    padded = np.zeros((b, bucket), np.int32)
    padded[:, :s] = ids
    caches = llama.init_caches(cfg, b, bucket + new)
    seq_lens = jnp.full((b,), s, jnp.int32)
    logits, caches = llama.forward_prefill(
        params := sess.params, cfg, jnp.asarray(padded), seq_lens, caches)
    toks = [np.asarray(jnp.argmax(logits, -1))]
    positions = seq_lens
    for _ in range(new - 1):
        logits, caches = llama.forward_decode(
            params, cfg, jnp.asarray(toks[-1], jnp.int32).reshape(b),
            positions, caches)
        toks.append(np.asarray(jnp.argmax(logits, -1)))
        positions = positions + 1
    manual = np.stack(toks, 1)
    np.testing.assert_array_equal(out.output_ids, manual)


def test_greedy_matches_hf_generate():
    """Full path vs transformers greedy generate on a random tiny llama."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(1)
    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128)
    hf = LlamaForCausalLM(hf_cfg).eval()

    from trtllm_llama_tpu.convert.hf import params_from_hf_model
    cfg = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    params = params_from_hf_model(hf, cfg)
    sess = GenerationSession(cfg, params,
                             EngineConfig(max_input_len=16, max_seq_len=64))

    rng = np.random.default_rng(2)
    ids = rng.integers(3, 128, (1, 9))
    new = 12
    with torch.no_grad():
        ref = hf.generate(torch.tensor(ids), max_new_tokens=new,
                          do_sample=False, pad_token_id=0)
    ref_new = ref[:, ids.shape[1]:].numpy()

    out = sess.generate(ids, max_new_tokens=new,
                        sampling=SamplingConfig(end_id=-1))
    np.testing.assert_array_equal(out.output_ids, ref_new)


def test_eos_stops_and_pads(tiny_engine):
    """Force EOS via a crafted end_id equal to the greedy first token."""
    sess = tiny_engine
    rng = np.random.default_rng(3)
    ids = rng.integers(3, sess.cfg.vocab_size, (1, 6))
    free = sess.generate(ids, max_new_tokens=6,
                         sampling=SamplingConfig(end_id=-1))
    first = int(free.output_ids[0, 0])
    out = sess.generate(ids, max_new_tokens=6,
                        sampling=SamplingConfig(end_id=first, pad_id=0))
    assert out.lengths[0] == 1
    assert (out.output_ids[0, 1:] == 0).all()


def test_batch_with_ragged_lengths(tiny_engine):
    """List-of-lists input: per-sequence lengths honored."""
    sess = tiny_engine
    rng = np.random.default_rng(4)
    a = rng.integers(3, sess.cfg.vocab_size, (7,)).tolist()
    b = rng.integers(3, sess.cfg.vocab_size, (3,)).tolist()
    out = sess.generate([a, b], max_new_tokens=4,
                        sampling=SamplingConfig(end_id=-1))
    # each sequence must match its solo generation
    solo_a = sess.generate([a], max_new_tokens=4,
                           sampling=SamplingConfig(end_id=-1))
    solo_b = sess.generate([b], max_new_tokens=4,
                           sampling=SamplingConfig(end_id=-1))
    np.testing.assert_array_equal(out.output_ids[0], solo_a.output_ids[0])
    np.testing.assert_array_equal(out.output_ids[1], solo_b.output_ids[0])


def test_generate_rejects_seq_len_overflow():
    """prompt + max_new_tokens past max_seq_len must fail loudly — decode
    writes past the cache end are silently dropped by the scatter and
    would return garbage tokens."""
    import pytest as _pytest
    cfg = ModelConfig.tiny(dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    sess = GenerationSession(
        cfg, params, EngineConfig(max_input_len=16, max_seq_len=20))
    ids = np.random.default_rng(0).integers(3, 250, (1, 16))
    with _pytest.raises(ValueError, match="max_seq_len"):
        sess.generate(ids, max_new_tokens=8,
                      sampling=SamplingConfig(end_id=-1))


def test_top_k1_with_top_p_is_argmax():
    """top_k=1 + top_p>0 is not greedy by the is_greedy predicate, but the
    k=1 filter must still apply: the sample is always the argmax."""
    cfg = ModelConfig.tiny(dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    sess = GenerationSession(
        cfg, params, EngineConfig(max_input_len=16, max_seq_len=48))
    ids = np.random.default_rng(1).integers(3, 250, (1, 8))
    greedy = sess.generate(ids, max_new_tokens=6,
                           sampling=SamplingConfig(end_id=-1))
    k1 = sess.generate(ids, max_new_tokens=6,
                       sampling=SamplingConfig(end_id=-1, top_k=1,
                                               top_p=0.9), seed=7)
    np.testing.assert_array_equal(k1.output_ids, greedy.output_ids)
