"""Per-token logprob outputs (reference DynamicDecodeLayer output_log_probs /
cum_log_probs contract, layers/dynamicDecodeLayer.cpp forward outputs)."""

import numpy as np
import jax
import jax.numpy as jnp

from trtllm_llama_tpu.config import EngineConfig, ModelConfig
from trtllm_llama_tpu.models import llama
from trtllm_llama_tpu.runtime.sampling import SamplingConfig
from trtllm_llama_tpu.runtime.session import GenerationSession

CFG = ModelConfig.tiny(dtype="float32")
ECFG = EngineConfig(max_batch_size=2, max_input_len=16, max_seq_len=48)


def test_logprobs_match_teacher_forced_recompute():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    sess = GenerationSession(CFG, params, ECFG)
    prompt = np.random.default_rng(0).integers(3, 250, (1, 9))
    scfg = SamplingConfig(end_id=-1)
    out = sess.generate(prompt, sampling=scfg, max_new_tokens=8,
                        return_logprobs=True)
    assert out.logprobs.shape == (1, 8)

    # teacher-force the full sequence and read the same positions' logprobs
    full = np.concatenate([prompt, out.output_ids], axis=1)
    s = full.shape[1]
    caches = llama.init_caches(CFG, 1, 64)
    logits, _ = llama.forward_prefill(
        params, CFG, jnp.asarray(full), jnp.full((1,), s, jnp.int32), caches,
        return_all_logits=True)
    lsm = jax.nn.log_softmax(np.asarray(logits).astype(np.float32), axis=-1)
    p_len = prompt.shape[1]
    want = np.array([lsm[0, p_len - 1 + i, out.output_ids[0, i]]
                     for i in range(8)])
    np.testing.assert_allclose(out.logprobs[0], want, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(out.cum_logprobs[0], want.sum(), rtol=1e-4)


def test_logprobs_zero_after_eos():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    sess = GenerationSession(CFG, params, ECFG)
    prompt = np.random.default_rng(1).integers(3, 250, (1, 6))
    free = sess.generate(prompt, sampling=SamplingConfig(end_id=-1),
                         max_new_tokens=6)
    eos = int(free.output_ids[0, 2])   # force EOS at its first occurrence
    stop = free.output_ids[0].tolist().index(eos)
    out = sess.generate(prompt, sampling=SamplingConfig(end_id=eos),
                        max_new_tokens=6, return_logprobs=True)
    assert int(out.lengths[0]) == stop + 1
    assert (out.logprobs[0, :stop + 1] != 0).all()
    assert (out.logprobs[0, stop + 1:] == 0).all()


def test_logprobs_default_off():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    sess = GenerationSession(CFG, params, ECFG)
    prompt = np.random.default_rng(2).integers(3, 250, (1, 5))
    out = sess.generate(prompt, sampling=SamplingConfig(end_id=-1),
                        max_new_tokens=4)
    assert out.logprobs is None and out.cum_logprobs is None
