"""Perplexity evaluation — the accuracy-baseline tool.

BASELINE.md requires matching reference perplexity within the
quantization delta (the reference installs lm-evaluation-harness for this
role, Dockerfile:240-243).  This driver computes teacher-forced
perplexity of a checkpoint over a token corpus using the engine's own
prefill path (paged cache + unified attention), so the measured number
reflects the exact serving numerics (incl. fp8/int8 KV-cache and
quantized weights when configured).

Usage:
  python benchmarks/eval_ppl.py --model-dir PATH [--tokens-file f.npy]
      [--seq-len 512] [--max-seqs 16] [--cache-dtype auto|fp8|int8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def compute_ppl(
    cfg,
    params,
    token_chunks: list[np.ndarray],
    cache_dtype: str = "auto",
    k_scale: float = 1.0,
    v_scale: float = 1.0,
) -> dict:
    """Mean next-token NLL / perplexity over chunks via engine prefill."""
    import jax
    import jax.numpy as jnp

    from vllm_triton_backend_tpu.models.llama import (
        ForwardExtras,
        forward,
        make_kv_caches,
    )
    from vllm_triton_backend_tpu.ops.metadata import make_metadata
    from vllm_triton_backend_tpu.utils import get_dtype, next_power_of_2

    total_nll = 0.0
    total_tokens = 0
    for chunk in token_chunks:
        t = len(chunk)
        if t < 2:
            continue
        bucket = next_power_of_2(t)
        block_size = 16
        nb = bucket // block_size + 2
        dtype = (
            jnp.dtype(cfg.dtype) if cache_dtype == "auto"
            else get_dtype(cache_dtype)
        )
        kv_cache = make_kv_caches(cfg, nb, block_size, dtype)
        bt = np.arange(nb, dtype=np.int32).reshape(1, nb)
        padded = np.zeros(bucket, np.int32)
        padded[:t] = chunk
        meta = make_metadata(
            [t], [0], bt, block_size, num_token_bucket=bucket
        )
        logits, _ = forward(
            params, cfg,
            jnp.asarray(padded),
            jnp.arange(bucket, dtype=jnp.int32),
            kv_cache, meta,
            ForwardExtras(
                max_query_len=bucket, max_seq_len=bucket,
                k_scale=k_scale, v_scale=v_scale,
            ),
        )
        logp = jax.nn.log_softmax(logits[: t - 1], axis=-1)
        nll = -jnp.take_along_axis(
            logp, jnp.asarray(chunk[1:, None], jnp.int32), axis=-1
        ).sum()
        total_nll += float(nll)
        total_tokens += t - 1
    mean_nll = total_nll / max(1, total_tokens)
    return {
        "tokens": total_tokens,
        "nll": mean_nll,
        "ppl": float(np.exp(mean_nll)),
    }


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default=None)
    ap.add_argument("--tokens-file", default=None, help=".npy int32 corpus")
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--max-seqs", type=int, default=8)
    ap.add_argument("--cache-dtype", default="auto")
    args = ap.parse_args(argv)

    import jax

    if args.model_dir:
        from vllm_triton_backend_tpu.models.hf import load_params

        cfg, params = load_params(args.model_dir)
    else:
        from vllm_triton_backend_tpu.config import ModelConfig
        from vllm_triton_backend_tpu.models.llama import init_params

        cfg = ModelConfig.tiny()
        params = init_params(cfg, jax.random.key(0))

    if args.tokens_file:
        corpus = np.load(args.tokens_file).astype(np.int32)
    else:
        corpus = np.random.default_rng(0).integers(
            1, cfg.vocab_size, size=args.seq_len * args.max_seqs
        ).astype(np.int32)
    chunks = [
        corpus[i * args.seq_len : (i + 1) * args.seq_len]
        for i in range(min(args.max_seqs, len(corpus) // args.seq_len))
    ]
    k_scale = v_scale = (1.0 / 16.0 if args.cache_dtype == "int8" else 1.0)
    result = compute_ppl(
        cfg, params, chunks, args.cache_dtype, k_scale, v_scale
    )
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
