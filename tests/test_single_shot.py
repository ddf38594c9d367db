"""InferenceSession (generic single-shot runner, reference
runtime/session.py:35-180) over the BERT encoder."""

import numpy as np
import jax
import jax.numpy as jnp

from trtllm_llama_tpu.models import bert
from trtllm_llama_tpu.runtime.single_shot import InferenceSession


def _tiny():
    cfg = bert.BertConfig(vocab_size=128, hidden_size=32, num_layers=2,
                          num_heads=2, intermediate_size=64,
                          max_position_embeddings=64)
    params = bert.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_run_matches_direct_forward():
    cfg, params = _tiny()
    sess = InferenceSession(bert.forward, cfg, params)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, (2, 9)).astype(np.int32)
    lens = np.array([9, 5], np.int32)
    out = sess.run(ids, lens)
    ref = bert.forward(params, cfg, jnp.asarray(ids), jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_bucket_padding_is_length_masked():
    """Padded rows must not change the unpadded positions' outputs, and
    different lengths inside one bucket share a compiled program."""
    cfg, params = _tiny()
    sess = InferenceSession(bert.forward, cfg, params,
                            pad_axis=1, buckets=(16, 32))
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 128, (1, 11)).astype(np.int32)
    lens = np.array([11], np.int32)
    out_b = np.asarray(sess.run(ids, lens))[:, :11]
    ref = np.asarray(bert.forward(params, cfg, jnp.asarray(ids),
                                  jnp.asarray(lens)))
    np.testing.assert_allclose(out_b, ref, rtol=1e-5, atol=1e-5)

    ids2 = rng.integers(0, 128, (1, 13)).astype(np.int32)
    sess.run(ids2, np.array([13], np.int32))      # same 16-bucket
    assert len(sess._fn_cache) == 1               # one static-kwargs entry


def test_qa_head_tuple_output():
    cfg = bert.BertConfig(vocab_size=128, hidden_size=32, num_layers=1,
                          num_heads=2, intermediate_size=64,
                          max_position_embeddings=64)
    params = bert.init_params(cfg, jax.random.PRNGKey(1), qa_head=True)
    sess = InferenceSession(bert.forward_qa, cfg, params)
    ids = np.random.default_rng(2).integers(0, 128, (2, 7)).astype(np.int32)
    start, end = sess.run(ids, np.array([7, 7], np.int32))
    assert start.shape == (2, 7) and end.shape == (2, 7)
