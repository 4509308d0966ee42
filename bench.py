"""Headline benchmark: decode throughput on the flagship model, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol (BASELINE.md discipline): correctness-gate first (kernel vs oracle
on the bench shapes — incorrect kernels never produce perf rows, reference
scripts/benchmark.py:476-489), warmup, then timed reps.  ``vs_baseline`` is
the speedup of the Pallas paged-decode kernel over the pure-XLA paged
attention baseline on the same shapes (the reference's
implementation-under-test vs BASELINE_TRITON methodology, SURVEY.md §2.5) —
the reference publishes no absolute numbers to compare against
(BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vllm_triton_backend_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
    )
    from vllm_triton_backend_tpu.ops.attention import xla_paged_attention
    from vllm_triton_backend_tpu.ops.metadata import make_metadata
    from vllm_triton_backend_tpu.ops.pallas.decode_attention import (
        paged_decode_attention,
    )
    from vllm_triton_backend_tpu.ops.refs import ref_paged_attention
    from vllm_triton_backend_tpu.runtime.engine import LLMEngine
    from vllm_triton_backend_tpu.runtime.sampler import SamplingParams

    # ---------------- kernel microbench: pallas vs XLA baseline ----------
    rng = np.random.default_rng(0)
    num_seqs, num_q_heads, num_kv_heads, hd = 32, 32, 4, 64
    block_size, seq_len = 32, 1024
    num_blocks = num_seqs * (seq_len // block_size) + 1
    # production lane-padded cache layout (llama.make_kv_caches): real
    # data in [..., :hd], zeros up to the 128-lane boundary
    hd_pad = max(hd, 128)
    shape = (1, num_blocks, 2, num_kv_heads, block_size, hd)
    kv_host = np.zeros(shape[:-1] + (hd_pad,), np.float32)
    kv_host[..., :hd] = (rng.standard_normal(shape) * 0.3).astype(np.float32)
    kv_cache = jnp.asarray(kv_host, jnp.bfloat16)
    q = jnp.asarray(
        rng.standard_normal((num_seqs, num_q_heads, hd)).astype(np.float32),
        jnp.bfloat16,
    )
    bt = rng.permutation(num_blocks - 1)[
        : num_seqs * (seq_len // block_size)
    ].reshape(num_seqs, -1).astype(np.int32)
    meta = make_metadata(
        [1] * num_seqs, [seq_len - 1] * num_seqs, bt, block_size
    )
    scale = hd**-0.5
    layer = jnp.int32(0)

    def run_pallas():
        return paged_decode_attention(
            q, kv_cache, layer, meta.seq_lens, meta.block_table,
            scale=scale, max_seq_len=seq_len,
        )

    def run_xla():
        return xla_paged_attention(
            q, kv_cache, layer, meta,
            scale=scale, max_query_len=1, max_seq_len=seq_len,
        )

    # correctness gate
    out = np.asarray(run_pallas(), np.float32)
    ref = ref_paged_attention(
        np.asarray(q, np.float32),
        np.asarray(kv_cache[0, ..., :hd], np.float32),
        np.asarray(meta.query_start_loc),
        np.asarray(meta.seq_lens),
        bt,
        scale,
    )
    err = np.max(np.abs(out - ref))
    assert err < 2e-2, f"decode kernel incorrect: max err {err}"

    def bench(fn, warmup=5, reps=50):
        # the tunneled TPU runtime's block_until_ready does not reliably
        # wait: force a D2H fetch of one element to fence the timed chain
        for _ in range(warmup):
            fn()
        np.asarray(fn())[:1, :1]
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        np.asarray(r)[:1, :1]
        return (time.perf_counter() - t0) / reps

    t_pallas = bench(run_pallas)
    t_xla = bench(run_xla)
    vs_baseline = t_xla / t_pallas

    # ---------------- e2e decode throughput, flagship model --------------
    cfg = EngineConfig(
        model=ModelConfig.tinyllama_1_1b(),
        cache=CacheConfig(block_size=64, num_blocks=512),
        scheduler=SchedulerConfig(
            max_num_seqs=16,
            max_num_batched_tokens=2048,
            max_model_len=2048,
            token_buckets=(16, 32, 64, 128, 256, 512, 1024, 2048),
        ),
    )
    engine = LLMEngine(cfg)
    n_seqs, prompt_len, n_new = 16, 128, 256

    def run_workload():
        for _ in range(n_seqs):
            prompt = rng.integers(0, cfg.model.vocab_size, size=prompt_len)
            engine.add_request(
                prompt.tolist(), SamplingParams(max_tokens=n_new)
            )
        tokens = 0
        t0 = time.perf_counter()
        while engine.has_unfinished() and time.perf_counter() - t0 < 300:
            for out in engine.step():
                tokens += len(out.output_token_ids)
        return tokens, time.perf_counter() - t0

    run_workload()  # warmup: compiles prefill + decode-session executables
    tokens, dt = run_workload()
    decode_tps = tokens / dt

    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_s_per_chip",
                "value": round(decode_tps, 1),
                "unit": "tok/s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
