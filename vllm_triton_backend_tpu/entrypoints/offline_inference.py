"""Offline inference smoke entry (reference scripts/offline_inference.py
analog: two fixed prompts, greedy, prints completions).

Usage:
  python -m vllm_triton_backend_tpu.entrypoints.offline_inference \
      [--model-dir /path/to/hf/checkpoint] [--max-tokens 20] [--profile]

Without --model-dir a tiny random-weight model runs (pipeline smoke; the
tokens are meaningless but exercise the full engine on the device).
"""

from __future__ import annotations

import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default=None)
    ap.add_argument("--max-tokens", type=int, default=20)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--profile", action="store_true")
    # speculative decoding: a small draft checkpoint, or draft-free
    # prompt-lookup (both lossless under greedy)
    ap.add_argument("--draft-dir", default=None)
    ap.add_argument("--spec-ngram", action="store_true")
    ap.add_argument("--spec-k", type=int, default=4)
    args = ap.parse_args()

    import jax

    from vllm_triton_backend_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
    )
    from vllm_triton_backend_tpu.runtime.engine import LLM
    from vllm_triton_backend_tpu.runtime.sampler import SamplingParams

    print(f"backend: {jax.default_backend()} devices: {jax.devices()}")

    sampling = SamplingParams(
        temperature=args.temperature, max_tokens=args.max_tokens
    )
    spec_kw = dict(
        draft_dir=args.draft_dir,
        spec_ngram=args.spec_ngram,
        spec_k=args.spec_k,
    )
    if args.model_dir:
        llm = LLM(model_dir=args.model_dir, **spec_kw)
        prompts = [
            "Hello, my name is",
            "The capital of France is",
        ]
    else:
        cfg = EngineConfig(
            model=ModelConfig.tiny(),
            cache=CacheConfig(block_size=16, num_blocks=256),
            scheduler=SchedulerConfig(max_model_len=256),
        )
        llm = LLM(config=cfg, **spec_kw)
        prompts = [[1, 2, 3, 4, 5], [10, 11, 12]]

    if args.profile:
        jax.profiler.start_trace("/tmp/vtb_profile")
    t0 = time.time()
    outputs = llm.generate(prompts, sampling)
    dt = time.time() - t0
    if args.profile:
        jax.profiler.stop_trace()
        print("trace written to /tmp/vtb_profile")

    total_tokens = 0
    for p, out in zip(prompts, outputs):
        total_tokens += len(out.output_token_ids)
        text = out.text if out.text is not None else out.output_token_ids
        print(f"prompt: {p!r}\n  -> {text!r} ({out.finish_reason})")
    print(f"{total_tokens} tokens in {dt:.2f}s ({total_tokens/dt:.1f} tok/s)")
    stats = llm.engine.stats()
    if "spec_rounds" in stats:
        print(
            f"spec rounds: {stats['spec_rounds']} "
            f"acceptance: {stats['spec_acceptance']:.2f}"
        )


if __name__ == "__main__":
    main()
