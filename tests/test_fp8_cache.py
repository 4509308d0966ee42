"""FP8 (e4m3) KV-cache end-to-end: engine output vs full-precision cache.

The reference's fp8-KV discipline: quantize-on-write via k/v scales, fused
dequant in the attention loop, relaxed atol 1e-2 vs the fp16 oracle
(reference scripts/test.py:283-316).  Here the whole engine runs with
``cache_dtype="fp8"`` and greedy decode must track the fp32-cache engine.
"""

import jax
import numpy as np
import pytest

from vllm_triton_backend_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)
from vllm_triton_backend_tpu.models.llama import init_params
from vllm_triton_backend_tpu.runtime.engine import LLMEngine
from vllm_triton_backend_tpu.runtime.sampler import SamplingParams


@pytest.mark.parametrize("cache_dtype", ["fp8", "int8"])
def test_engine_quantized_kv_cache(cache_dtype):
    mc = ModelConfig.tiny(dtype="float32")
    sched = SchedulerConfig(
        max_num_seqs=2,
        max_num_batched_tokens=32,
        max_model_len=64,
        token_buckets=(8, 16, 32),
    )
    params = init_params(mc, jax.random.key(0))
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, mc.vocab_size, size=12).tolist()
    n_new = 8

    def run(dtype):
        cfg = EngineConfig(
            model=mc,
            cache=CacheConfig(
                block_size=16, num_blocks=32, cache_dtype=dtype
            ),
            scheduler=sched,
        )
        engine = LLMEngine(cfg, params=params)
        engine.add_request(prompt, SamplingParams(max_tokens=n_new))
        outs = []
        while engine.has_unfinished():
            outs += engine.step()
        assert engine.kv_cache.dtype == (
            {"auto": np.float32}.get(dtype)
            or engine.kv_cache.dtype
        )
        return outs[0].output_token_ids

    full = run("auto")
    quant = run(cache_dtype)
    # greedy tokens should substantially agree; require the first few exact
    # (drift after divergence point is expected for random weights)
    assert quant[:2] == full[:2], f"{cache_dtype}: {quant} vs {full}"
    agree = sum(a == b for a, b in zip(quant, full)) / len(full)
    assert agree >= 0.5, f"{cache_dtype} agreement {agree}: {quant} vs {full}"
