"""Debug observability tests (reference tests/test_debugging_api.py tier)."""

import numpy as np
import jax
import jax.numpy as jnp

from trtllm_llama_tpu.config import ModelConfig
from trtllm_llama_tpu.models import llama
from trtllm_llama_tpu.utils import debugging


def test_capture_layer_intermediates():
    cfg = ModelConfig.tiny(dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = np.random.default_rng(0).integers(3, 250, (2, 6))
    caches = llama.init_caches(cfg, 2, 16)
    lens = jnp.full((2,), 6, jnp.int32)

    with debugging.capture() as tape:
        logits, _ = llama.forward_prefill(params, cfg, jnp.asarray(ids),
                                          lens, caches)
        jax.block_until_ready(logits)
    assert len(tape["attention_output"]) == cfg.num_layers
    assert len(tape["decoder_layer_output"]) == cfg.num_layers
    a0 = np.asarray(tape["attention_output"][0])
    assert a0.shape == (2, 6, cfg.num_heads * cfg.head_dim)
    assert np.isfinite(a0).all()


def test_noop_outside_capture():
    x = jnp.ones((2, 2))
    assert debugging.debug_output("tag", x) is x
