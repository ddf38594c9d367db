"""CLI: generate from a converted engine (reference examples/llama/run.py).

  python examples/run.py --engine_dir engines/llama7b-int4 \
      --tokenizer_dir /path/llama-7b-hf --input_text "Hello" \
      --max_output_len 64 [--top_k 40 --top_p 0.9 --temperature 0.8]
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
    p.add_argument("--engine_dir", required=True)
    p.add_argument("--tokenizer_dir", required=True)
    p.add_argument("--input_text", default="Born in north-east France, Soyer"
                   " trained as a")
    p.add_argument("--max_output_len", type=int, default=64)
    p.add_argument("--max_input_len", type=int, default=1024)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=1)
    p.add_argument("--top_p", type=float, default=0.0)
    p.add_argument("--repetition_penalty", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--draft_engine_dir", default=None,
                   help="engine dir of a small draft model: enables "
                        "speculative decoding (greedy bit-exact; "
                        "temperature/top-k/top-p via rejection sampling)")
    p.add_argument("--gamma", type=int, default=4,
                   help="speculative proposals per iteration")
    p.add_argument("--prompt_lookup", type=int, default=0, metavar="NGRAM",
                   help="speculative decoding WITHOUT a draft model: "
                        "propose continuations by matching the last NGRAM "
                        "tokens against the prompt/output history "
                        "(greedy-only; strong on extractive tasks like "
                        "summarization)")
    return p.parse_args()


def main():
    args = parse_args()
    from transformers import AutoTokenizer

    from trtllm_llama_tpu.config import EngineConfig
    from trtllm_llama_tpu.convert.serialize import load_engine
    from trtllm_llama_tpu.runtime.sampling import SamplingConfig
    from trtllm_llama_tpu.runtime.session import GenerationSession

    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer_dir)
    cfg, params, kv_scales = load_engine(args.engine_dir)
    ecfg = EngineConfig(
        max_input_len=args.max_input_len,
        max_seq_len=args.max_input_len + args.max_output_len)
    if args.draft_engine_dir and args.prompt_lookup:
        raise SystemExit("--draft_engine_dir and --prompt_lookup are "
                         "mutually exclusive draft sources")
    if args.prompt_lookup:
        from trtllm_llama_tpu.runtime.speculative import PromptLookupSession
        sess = PromptLookupSession(cfg, params, ecfg, gamma=args.gamma,
                                   ngram=args.prompt_lookup,
                                   kv_scales=kv_scales)
    elif args.draft_engine_dir:
        from trtllm_llama_tpu.runtime.speculative import SpeculativeSession
        dcfg, dparams, dkv = load_engine(args.draft_engine_dir)
        sess = SpeculativeSession(cfg, params, dcfg, dparams, ecfg,
                                  gamma=args.gamma, kv_scales=kv_scales,
                                  draft_kv_scales=dkv)
    else:
        sess = GenerationSession(cfg, params, ecfg, kv_scales=kv_scales)

    ids = tokenizer(args.input_text).input_ids
    scfg = SamplingConfig(
        temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
        repetition_penalty=args.repetition_penalty,
        end_id=(tokenizer.eos_token_id
                if tokenizer.eos_token_id is not None else 2),
        pad_id=tokenizer.pad_token_id or 0)
    out = sess.generate([ids], sampling=scfg,
                        max_new_tokens=args.max_output_len, seed=args.seed)
    text = tokenizer.decode(out.output_ids[0][:out.lengths[0]],
                            skip_special_tokens=True)
    print(f'Input: "{args.input_text}"')
    print(f'Output: "{text}"')


if __name__ == "__main__":
    main()
