"""Time the PromptLookupServingEngine's chunk fn vs the plain decode chunk.

Builds both engines at the serving-bench configuration (7B int8, 8 slots,
in128 out64), warms them, then times one decode-phase dispatch each with a
real d2h sync (axon's block_until_ready returns early). Breaks the pl
chunk's ~368 ms/step (measure_r4.jsonl) into device time vs host overhead.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    from trtllm_llama_tpu.config import EngineConfig, ModelConfig
    from trtllm_llama_tpu.quantization.mode import QuantMode
    from trtllm_llama_tpu.quantization.quantize import (
        init_random_quantized_params,
    )
    from trtllm_llama_tpu.runtime.sampling import SamplingConfig
    from trtllm_llama_tpu.runtime.serving import ServingEngine
    from trtllm_llama_tpu.runtime.serving_spec import (
        PromptLookupServingEngine,
    )

    qm = QuantMode.use_weight_only(False)
    cfg = ModelConfig(vocab_size=32000, hidden_size=4096,
                      intermediate_size=11008, num_layers=32, num_heads=32,
                      num_kv_heads=32, head_dim=128, quant_mode=qm)
    params = init_random_quantized_params(cfg, jax.random.PRNGKey(0), qm)
    in_len, out_len, slots = 128, 64, 8
    ecfg = EngineConfig(max_batch_size=slots, max_input_len=in_len,
                        max_seq_len=in_len + out_len + 8,
                        prefill_buckets=(in_len,))
    rng = np.random.default_rng(0)

    which = os.environ.get("PROBE_ENGINE", "pl")
    if which == "pl":
        eng = PromptLookupServingEngine(
            cfg, params, ecfg,
            gamma=int(os.environ.get("PROBE_GAMMA", "4")),
            ngram=int(os.environ.get("PROBE_NGRAM", "3")),
            sampling=SamplingConfig(end_id=-1),
            decode_chunk=int(os.environ.get("PROBE_CHUNK", "16")))
    else:
        eng = ServingEngine(cfg, params, ecfg,
                            sampling=SamplingConfig(end_id=-1),
                            decode_chunk=16)
    params = None  # noqa: F841  (engine fused its own stacked copies)

    # repetitive prompts (prompt-lookup's winning regime)
    span = rng.integers(3, cfg.vocab_size, (16,)).tolist()
    prompts = [(span * (-(-in_len // 16)))[:in_len] for _ in range(slots)]

    log(f"warmup {which}")
    for p in prompts:
        eng.submit(p, out_len)
    eng.run_to_completion()

    log("timed run")
    for k in eng.phase_times:
        eng.phase_times[k] = 0 if k == "steps" else 0.0
    eng._req_times.clear()
    t0 = time.perf_counter()
    for p in prompts:
        eng.submit(p, out_len)
    done = eng.run_to_completion()
    dt = time.perf_counter() - t0
    toks = sum(len(d.output_ids) for d in done.values())
    log(f"{which}: {toks} tokens in {dt:.3f}s = {toks/dt:.1f} tok/s")
    log("phases:", eng.phase_stats())


if __name__ == "__main__":
    main()
