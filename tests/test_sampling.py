"""Sampling module unit tests (reference tier: sampling kernels + DynamicDecodeLayer)."""

import numpy as np
import jax
import jax.numpy as jnp

from trtllm_llama_tpu.runtime.sampling import (
    SamplingConfig, apply_repetition_penalty, apply_top_k, apply_top_p,
    init_token_counts, sample_step, update_token_counts,
)


def test_greedy():
    logits = jnp.asarray([[0.1, 2.0, -1.0], [3.0, 0.0, 1.0]])
    toks = sample_step(logits, SamplingConfig())
    np.testing.assert_array_equal(np.asarray(toks), [1, 0])


def test_top_k_masks_below_kth():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0, 4.0]])
    out = np.asarray(apply_top_k(logits, 2))
    assert out[0, 1] == 5.0 and out[0, 4] == 4.0
    assert (out[0, [0, 2, 3]] < -1e8).all()


def test_top_p_keeps_nucleus():
    # probs ~ [0.643, 0.236, 0.087, 0.032, 0.002]
    logits = jnp.log(jnp.asarray([[0.643, 0.236, 0.087, 0.032, 0.002]]))
    out = np.asarray(apply_top_p(logits, 0.7))
    assert out[0, 0] > -1e8 and out[0, 1] > -1e8   # cumsum prior < 0.7
    assert (out[0, 2:] < -1e8).all()


def test_top_p_one_keeps_all():
    logits = jnp.asarray([[1.0, 2.0, 3.0]])
    np.testing.assert_array_equal(np.asarray(apply_top_p(logits, 1.0)),
                                  np.asarray(logits))


def test_repetition_penalty_divides_positive():
    logits = jnp.asarray([[2.0, -2.0, 1.0]])
    counts = jnp.asarray([[1, 1, 0]])
    out = np.asarray(apply_repetition_penalty(logits, counts, 2.0))
    np.testing.assert_allclose(out, [[1.0, -4.0, 1.0]])


def test_token_counts_roundtrip():
    ids = jnp.asarray([[1, 2, 2, 0], [3, 3, 3, 3]])
    lens = jnp.asarray([3, 4])
    counts = init_token_counts(ids, lens, 5)
    np.testing.assert_array_equal(
        np.asarray(counts), [[0, 1, 2, 0, 0], [0, 0, 0, 4, 0]])
    counts = update_token_counts(counts, jnp.asarray([4, 3]))
    assert counts[0, 4] == 1 and counts[1, 3] == 5


def test_stochastic_sampling_respects_top_k():
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray([[0.0, 5.0, 4.0, -1.0]] * 64)
    cfg = SamplingConfig(top_k=2, temperature=1.0)
    toks = np.asarray(sample_step(logits, cfg, key))
    assert set(toks.tolist()) <= {1, 2}


def test_sampling_is_jittable():
    cfg = SamplingConfig(top_k=4, top_p=0.9, temperature=0.8,
                         repetition_penalty=1.1)
    fn = jax.jit(lambda lg, key, counts, lens: sample_step(
        lg, cfg, key, counts, lens))
    lg = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    toks = fn(lg, jax.random.PRNGKey(2), jnp.zeros((2, 32), jnp.int32),
              jnp.zeros((2,), jnp.int32))
    assert toks.shape == (2,) and toks.dtype == jnp.int32


def test_bad_words_single_token_banned():
    from trtllm_llama_tpu.runtime.sampling import apply_bad_words
    logits = jnp.zeros((2, 8))
    tail = jnp.zeros((2, 2), jnp.int32)
    out = np.asarray(apply_bad_words(logits, tail, ((3,),)))
    assert (out[:, 3] < -1e8).all() and (out[:, :3] == 0).all()


def test_bad_words_sequence_requires_prefix():
    from trtllm_llama_tpu.runtime.sampling import apply_bad_words
    logits = jnp.zeros((2, 8))
    tail = jnp.asarray([[1, 5], [1, 2]], jnp.int32)
    out = np.asarray(apply_bad_words(logits, tail, ((2, 6),)))
    assert out[0, 6] == 0           # tail doesn't end with 2
    assert out[1, 6] < -1e8         # tail ends with 2 -> ban 6


def test_stop_words_matching():
    from trtllm_llama_tpu.runtime.sampling import stop_words_matched
    tail = jnp.asarray([[7, 8, 9], [1, 2, 3]], jnp.int32)
    hit = np.asarray(stop_words_matched(tail, ((8, 9), (0,))))
    np.testing.assert_array_equal(hit, [True, False])


def test_session_bad_and_stop_words():
    from trtllm_llama_tpu.config import EngineConfig, ModelConfig
    from trtllm_llama_tpu.models import llama
    from trtllm_llama_tpu.runtime.session import GenerationSession

    cfg = ModelConfig.tiny(dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(9))
    sess = GenerationSession(cfg, params,
                             EngineConfig(max_input_len=16, max_seq_len=48))
    ids = np.random.default_rng(5).integers(3, 250, (1, 7))
    free = sess.generate(ids, max_new_tokens=6,
                         sampling=SamplingConfig(end_id=-1)).output_ids[0]

    # ban the greedy first token: generation must avoid it everywhere
    banned = int(free[0])
    out = sess.generate(ids, max_new_tokens=6,
                        sampling=SamplingConfig(end_id=-1,
                                                bad_words=((banned,),)))
    assert banned not in out.output_ids[0].tolist()

    # stop at the 2-token sequence (free[1], free[2])
    stop = (int(free[1]), int(free[2]))
    out = sess.generate(ids, max_new_tokens=6,
                        sampling=SamplingConfig(end_id=-1,
                                                stop_words=(stop,)))
    # generation halts once the stop sequence appears
    toks = out.output_ids[0].tolist()
    if toks[1] == stop[0] and toks[2] == stop[1]:
        assert out.lengths[0] == 3
        assert all(t == 0 for t in toks[3:])
