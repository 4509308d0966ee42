"""Latency-grid benchmark: batch x input-len x output-len sweep, offline.

Reference L6 analog (scripts/bench_vllm_latency_range.py:48-108): grid over
(batch, input_len, output_len), measuring end-to-end generate latency per
cell.  Results to JSON (one record per cell).

Usage:
  python benchmarks/bench_latency_range.py [--model-dir PATH]
      [--batch 1] [--input-len 500] [--output-len 10,100,800]
      [--result-path out.json]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main(argv=None) -> list[dict]:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default=None)
    ap.add_argument(
        "--model", default="tiny", choices=["tiny", "granite-int8"],
        help="granite-int8 = the bench.py headline config (random "
        "int8 weights, int8 KV) for the reference latency grid "
        "(bench_vllm_latency_range.py:48-50)",
    )
    ap.add_argument("--batch", default="1")
    ap.add_argument("--input-len", default="500")
    ap.add_argument("--output-len", default="10,100")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--result-path", default=None)
    args = ap.parse_args(argv)

    import dataclasses

    import jax

    from vllm_triton_backend_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
    )
    from vllm_triton_backend_tpu.models import llama
    from vllm_triton_backend_tpu.runtime.engine import LLM
    from vllm_triton_backend_tpu.runtime.sampler import SamplingParams

    batches = list(map(int, args.batch.split(",")))
    in_lens = list(map(int, args.input_len.split(",")))
    out_lens = list(map(int, args.output_len.split(",")))
    max_len = max(i + o for i, o in itertools.product(in_lens, out_lens)) + 8

    if args.model_dir:
        llm = LLM(model_dir=args.model_dir)
    elif args.model == "granite-int8":
        mc = dataclasses.replace(
            ModelConfig.granite_3_1_8b(), quantization="int8-w8a8"
        )
        params = llama.init_quantized_params(mc, jax.random.key(0), "int8")
        bs = 64
        model_len = max(512, 1 << (max_len - 1).bit_length())
        llm = LLM(
            config=EngineConfig(
                model=mc,
                cache=CacheConfig(
                    block_size=bs,
                    num_blocks=max(batches) * (-(-model_len // bs)) + 8,
                    cache_dtype="int8",
                ),
                scheduler=SchedulerConfig(
                    max_num_seqs=max(batches),
                    max_num_batched_tokens=2048,
                    max_model_len=model_len,
                    token_buckets=(
                        max(batches), 512, 1024, 2048,
                    ),
                ),
            ),
            params=params,
        )
    else:
        llm = LLM(
            config=EngineConfig(
                model=ModelConfig.tiny(),
                cache=CacheConfig(
                    block_size=16,
                    num_blocks=max(256, max(batches) * max_len // 16 * 2),
                ),
                scheduler=SchedulerConfig(
                    max_num_seqs=max(batches),
                    max_num_batched_tokens=2048,
                    max_model_len=max(512, 1 << (max_len - 1).bit_length()),
                ),
            )
        )

    vocab = llm.engine.config.model.vocab_size
    rng = np.random.default_rng(0)
    records = []
    for b, il, ol in itertools.product(batches, in_lens, out_lens):
        # FRESH prompts per rep: reusing one prompt would let the prefix
        # cache absorb the prefill on every rep after the first, turning
        # a prefill-latency cell into a cache-hit benchmark (observed:
        # 16k-prefill "latency" of 0.31 s on warm reps)
        def mk_prompts():
            return [
                rng.integers(1, vocab, size=il).tolist()
                for _ in range(b)
            ]

        sp = SamplingParams(max_tokens=ol, ignore_eos=True)
        llm.generate(mk_prompts(), sp)  # warmup/compile
        llm.generate(mk_prompts(), sp)  # warm the uncached-path shapes
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            outs = llm.generate(mk_prompts(), sp)
            times.append(time.perf_counter() - t0)
            assert all(len(o.output_token_ids) == ol for o in outs)
        rec = {
            "batch": b,
            "input_len": il,
            "output_len": ol,
            "latency_s_p50": float(np.median(times)),
            "latency_s_min": float(np.min(times)),
            "tokens_per_s": b * ol / float(np.median(times)),
        }
        records.append(rec)
        print(json.dumps(rec))

    if args.result_path:
        os.makedirs(
            os.path.dirname(args.result_path) or ".", exist_ok=True
        )
        with open(args.result_path, "w") as f:
            json.dump(records, f, indent=1)
    return records


if __name__ == "__main__":
    main()
