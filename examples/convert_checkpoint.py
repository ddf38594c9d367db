"""CLI: HF LLaMA checkpoint -> quantized TPU engine directory.

The user-facing analogue of the reference's examples/llama/build.py +
examples/llama_quant/hf_llama_convert.py in one step (on TPU there is no
separate TRT engine build — see convert/convert.py).

Examples:
  python examples/convert_checkpoint.py --model_dir /path/llama-7b-hf \
      --output_dir engines/llama7b-int4 --use_weight_only --weight_bits 4
  python examples/convert_checkpoint.py --model_dir ... --output_dir ... \
      --use_smooth_quant --per_token --per_channel --int8_kv_cache \
      --calib_file calib.txt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("TLLM_FORCE_CPU"):
    # the environment's sitecustomize force-registers the TPU backend;
    # config.update is the only reliable override (see tests/conftest.py)
    import jax
    jax.config.update("jax_platforms", "cpu")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_dir", required=True,
                   help="HF checkpoint directory")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float16", "float32"])
    p.add_argument("--use_weight_only", action="store_true")
    p.add_argument("--weight_bits", type=int, default=8, choices=[4, 8])
    p.add_argument("--group_size", type=int, default=128,
                   help="grouped scale size for int4 (0 = per-channel)")
    p.add_argument("--use_smooth_quant", action="store_true")
    p.add_argument("--per_token", action="store_true")
    p.add_argument("--per_channel", action="store_true")
    p.add_argument("--smoothquant_alpha", type=float, default=0.5)
    p.add_argument("--int8_kv_cache", action="store_true")
    p.add_argument("--enable_fp8", action="store_true",
                   help="FP8 (e4m3) Q/DQ weights (reference build.py "
                        "--enable_fp8; its FP8 layers were stubs)")
    p.add_argument("--fp8_kv_cache", action="store_true",
                   help="FP8 (e4m3) KV cache (requires --calib_file)")
    p.add_argument("--quantize_lm_head", action="store_true",
                   help="weight-only-quantize lm_head too (reference always "
                        "excludes it)")
    p.add_argument("--calib_file", default=None,
                   help="text file, one calibration sample per line "
                        "(the reference uses lambada)")
    p.add_argument("--calib_samples", type=int, default=512)
    return p.parse_args()


def main():
    args = parse_args()
    from trtllm_llama_tpu.convert.convert import convert_hf_checkpoint
    from trtllm_llama_tpu.quantization.mode import QuantMode

    if args.use_smooth_quant:
        qm = QuantMode.use_smooth_quant(args.per_token, args.per_channel)
    elif args.use_weight_only:
        qm = QuantMode.use_weight_only(
            use_int4_weights=args.weight_bits == 4,
            per_group=args.weight_bits == 4 and args.group_size > 0)
    elif args.enable_fp8:
        qm = QuantMode.FP8_QDQ
    else:
        qm = QuantMode.NONE
    if args.int8_kv_cache:
        qm |= QuantMode.INT8_KV_CACHE
    if args.fp8_kv_cache:
        qm |= QuantMode.FP8_KV_CACHE

    calib_texts = None
    if args.calib_file:
        with open(args.calib_file) as f:
            calib_texts = [ln.strip() for ln in f if ln.strip()]
        calib_texts = calib_texts[:args.calib_samples]

    group = (args.group_size if (args.use_weight_only
                                 and args.weight_bits == 4) else 0)
    cfg = convert_hf_checkpoint(
        args.model_dir, args.output_dir, quant_mode=qm, group_size=group,
        dtype=args.dtype, calib_texts=calib_texts,
        smoothquant_alpha=args.smoothquant_alpha,
        quantize_lm_head=args.quantize_lm_head)
    print(f"engine written to {args.output_dir}\n{cfg.to_json()}")


if __name__ == "__main__":
    main()
