"""Beam search tests (reference tier: onlineBeamSearchLayer + gatherTree)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trtllm_llama_tpu.config import EngineConfig, ModelConfig
from trtllm_llama_tpu.models import llama
from trtllm_llama_tpu.runtime.sampling import SamplingConfig
from trtllm_llama_tpu.runtime.session import GenerationSession


@pytest.fixture(scope="module")
def sess():
    cfg = ModelConfig.tiny(dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(11))
    return GenerationSession(cfg, params,
                             EngineConfig(max_input_len=16, max_seq_len=48))


def test_beam1_interface_matches_greedy(sess):
    """W=1 beam search must equal greedy decoding (same argmax path)."""
    ids = np.random.default_rng(0).integers(3, 250, (2, 7))
    greedy = sess.generate(ids, max_new_tokens=6,
                           sampling=SamplingConfig(end_id=-1))
    beam = sess.generate(ids, max_new_tokens=6,
                         sampling=SamplingConfig(end_id=-1, beam_width=2))
    # beam-0 of width-2 search starts from the top-1 token; its first token
    # must equal greedy's first token
    assert beam.beam_ids.shape == (2, 2, 6)
    assert (beam.beam_ids[:, 0, 0] == greedy.output_ids[:, 0]).all()


def test_beam_scores_sorted_and_distinct(sess):
    ids = np.random.default_rng(1).integers(3, 250, (1, 5))
    out = sess.generate(ids, max_new_tokens=5,
                        sampling=SamplingConfig(end_id=-1, beam_width=4))
    s = out.beam_scores[0]
    assert (np.diff(s) <= 1e-6).all(), s      # best-first
    # beams should not all be identical sequences
    seqs = {tuple(b) for b in out.beam_ids[0].tolist()}
    assert len(seqs) > 1


def test_beam_search_beats_greedy_logprob(sess):
    """Beam-4's best cumulative logprob >= greedy's (on the same model)."""
    cfg = sess.cfg
    ids = np.random.default_rng(2).integers(3, 250, (1, 6))
    new = 5

    def seq_logprob(tokens):
        caches = llama.init_caches(cfg, 1, 32)
        lens = jnp.asarray([6], jnp.int32)
        logits, caches = llama.forward_prefill(
            sess.params, cfg, jnp.asarray(ids), lens, caches)
        total = 0.0
        pos = lens
        for t in tokens:
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            total += float(lp[0, t])
            logits, caches = llama.forward_decode(
                sess.params, cfg, jnp.asarray([t], jnp.int32), pos, caches)
            pos = pos + 1
        return total

    greedy = sess.generate(ids, max_new_tokens=new,
                           sampling=SamplingConfig(end_id=-1))
    beam = sess.generate(ids, max_new_tokens=new,
                         sampling=SamplingConfig(end_id=-1, beam_width=4))
    lp_greedy = seq_logprob(greedy.output_ids[0].tolist())
    lp_beam = seq_logprob(beam.beam_ids[0, 0].tolist())
    assert lp_beam >= lp_greedy - 1e-4, (lp_beam, lp_greedy)
    # and the reported score must match the independently computed logprob
    np.testing.assert_allclose(beam.beam_scores[0, 0], lp_beam,
                               atol=1e-3, rtol=1e-4)


def test_beam_eos_freezes(sess):
    """A beam hitting EOS keeps its score and pads subsequent tokens."""
    ids = np.random.default_rng(3).integers(3, 250, (1, 5))
    free = sess.generate(ids, max_new_tokens=4,
                         sampling=SamplingConfig(end_id=-1, beam_width=2))
    eos = int(free.beam_ids[0, 0, 1])  # force the 2nd token as EOS
    out = sess.generate(ids, max_new_tokens=4,
                        sampling=SamplingConfig(end_id=eos, beam_width=2,
                                                pad_id=0))
    for wi in range(2):
        toks = out.beam_ids[0, wi].tolist()
        if eos in toks:
            i = toks.index(eos)
            assert all(t == 0 for t in toks[i + 1:]), toks
            assert out.beam_lengths[0, wi] == i + 1


def _paged_sess():
    cfg = ModelConfig.tiny(dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(11))
    return GenerationSession(cfg, params,
                             EngineConfig(max_input_len=16, max_seq_len=48),
                             beam_paged_block=4)


def test_beam_paged_indirection_matches_dense(sess):
    """paged_block beam search (carried block-table indirection, the
    reference's cache_indirection) must produce exactly the dense
    windowed-gather engine's beams — tokens, lengths, and scores — while
    its per-step reorder traffic is O(block_size)."""
    rng = np.random.default_rng(4)
    prompts = rng.integers(3, 250, (2, 7))
    ref = sess.generate(prompts, sampling=SamplingConfig(
        end_id=-1, beam_width=3), max_new_tokens=8)
    paged_sess = _paged_sess()
    got = paged_sess.generate(prompts, sampling=SamplingConfig(
        end_id=-1, beam_width=3), max_new_tokens=8)
    np.testing.assert_array_equal(got.beam_ids, ref.beam_ids)
    np.testing.assert_array_equal(got.beam_lengths, ref.beam_lengths)
    np.testing.assert_allclose(got.beam_scores, ref.beam_scores, atol=1e-4)


def test_beam_paged_indirection_with_eos(sess):
    """Frozen beams under the indirection path: EOS freeze semantics must
    match the dense path (frozen rows keep self-adopting their own
    blocks)."""
    rng = np.random.default_rng(9)
    prompts = rng.integers(3, 250, (1, 6))
    free = sess.generate(prompts, sampling=SamplingConfig(
        end_id=-1, beam_width=2), max_new_tokens=6)
    eos = int(free.beam_ids[0, 0, 2])
    ref = sess.generate(prompts, sampling=SamplingConfig(
        end_id=eos, beam_width=2), max_new_tokens=6)
    paged_sess = _paged_sess()
    got = paged_sess.generate(prompts, sampling=SamplingConfig(
        end_id=eos, beam_width=2), max_new_tokens=6)
    np.testing.assert_array_equal(got.beam_ids, ref.beam_ids)
    np.testing.assert_array_equal(got.beam_lengths, ref.beam_lengths)
