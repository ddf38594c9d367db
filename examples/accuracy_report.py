"""Quantization-accuracy report at golden-model scale.

The zero-egress stand-in for the reference's ROUGE ablation table
(README.md:894-918): for every supported QuantMode, measure the quantized
engine's distribution shift vs its own fp32 params — prefill/decode top-1
agreement, KL, perplexity ratio on the fp32 model's greedy continuations —
and print a markdown table (the README "quant accuracy" section is generated
from this).

Run: python examples/accuracy_report.py [--hidden 256 --layers 4]
The same metrics are threshold-enforced in tests/test_accuracy_gates.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("TLLM_FORCE_TPU"):
    # golden-scale models are dispatch-bound, not compute-bound: CPU is both
    # faster and deterministic here. (sitecustomize force-registers the TPU
    # backend; config.update is the only reliable override.)
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from trtllm_llama_tpu.quantization.evaluate import (build_golden_setup,
                                                    evaluate_quant_mode,
                                                    reference_run)
from trtllm_llama_tpu.quantization.mode import QuantMode


def quant_mode_matrix(group_size: int = 128):
    """(name, QuantMode, group_size) for every mode the engine ships.
    Mirrors the reference's ablation axis (README.md:894-918) plus our
    PER_GROUP extension."""
    return [
        ("int8-wo", QuantMode.use_weight_only(False), 0),
        ("int4-wo", QuantMode.use_weight_only(True), 0),
        ("int4-wo-g", QuantMode.use_weight_only(True, per_group=True),
         group_size),
        ("sq-static", QuantMode.use_smooth_quant(), 0),
        ("sq-ptpc",
         QuantMode.use_smooth_quant(per_token=True, per_channel=True), 0),
        ("int8-kv", QuantMode.INT8_KV_CACHE, 0),
        ("int8-wo+kv",
         QuantMode.use_weight_only(False) | QuantMode.INT8_KV_CACHE, 0),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--intermediate", type=int, default=512)
    ap.add_argument("--vocab", type=int, default=512)
    ap.add_argument("--group_size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--prompt_len", type=int, default=24)
    ap.add_argument("--cont_len", type=int, default=16)
    args = ap.parse_args()

    cfg, params, act_ranges, kv_scales, _ = build_golden_setup(
        hidden=args.hidden, layers=args.layers, heads=args.heads,
        intermediate=args.intermediate, vocab=args.vocab)
    rng = np.random.default_rng(0)
    prompts = rng.integers(3, args.vocab, (args.batch, args.prompt_len))

    ref = reference_run(cfg, params, prompts, args.cont_len)
    rows = []
    for name, qm, gs in quant_mode_matrix(args.group_size):
        row = evaluate_quant_mode(cfg, params, name, qm, prompts,
                                  act_ranges=act_ranges, kv_scales=kv_scales,
                                  group_size=gs, cont_len=args.cont_len,
                                  ref_run=ref)
        rows.append(row)
        print(f"  measured {name}: top1={row['decode_top1']:.3f} "
              f"kl={row['decode_kl']:.2e} ppl_ratio={row['ppl_ratio']:.4f}",
              flush=True)

    print()
    print("| mode | prefill top-1 | decode top-1 | prefill KL | decode KL "
          "| ppl ratio | max |Δlogit| |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['mode']} | {r['prefill_top1']:.3f} | "
              f"{r['decode_top1']:.3f} | {r['prefill_kl']:.2e} | "
              f"{r['decode_kl']:.2e} | {r['ppl_ratio']:.4f} | "
              f"{r['max_abs_err']:.3f} |")


if __name__ == "__main__":
    main()
