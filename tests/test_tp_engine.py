"""Tensor-parallel engine: TP=2 greedy output == single-chip engine."""

import jax
import numpy as np
import pytest

from vllm_triton_backend_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    ParallelConfig,
    SchedulerConfig,
)
from vllm_triton_backend_tpu.models.llama import init_params
from vllm_triton_backend_tpu.runtime.engine import LLMEngine
from vllm_triton_backend_tpu.runtime.sampler import SamplingParams


def test_tp_engine_matches_single_chip():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    mc = ModelConfig.tiny(dtype="float32")
    base = EngineConfig(
        model=mc,
        cache=CacheConfig(block_size=16, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=4,
            max_num_batched_tokens=64,
            max_model_len=128,
            token_buckets=(8, 16, 32, 64),
        ),
    )
    params = init_params(mc, jax.random.key(0))
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(0, mc.vocab_size, size=n).tolist() for n in (6, 17)
    ]
    n_new = 6

    def run(cfg):
        engine = LLMEngine(cfg, params=params)
        for p in prompts:
            engine.add_request(p, SamplingParams(max_tokens=n_new))
        out = {}
        while engine.has_unfinished():
            for o in engine.step():
                out[o.req_id] = o.output_token_ids
        return out

    single = run(base)
    tp = run(base.replace(parallel=ParallelConfig(tensor_parallel=2)))
    assert single == tp


def test_tp_engine_with_attention_bias():
    """Qwen2-style qkv biases through the TP engine: the grouped fused
    bias layout must shard over the model axis like its projection."""
    import dataclasses as dc

    import numpy as np

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    mc = dc.replace(
        ModelConfig.tiny(dtype="float32"), attention_bias=True
    )
    base = EngineConfig(
        model=mc,
        cache=CacheConfig(block_size=16, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=4,
            max_num_batched_tokens=64,
            max_model_len=128,
            token_buckets=(8, 16, 32, 64),
        ),
    )
    params = init_params(mc, jax.random.key(3))
    assert params.layers.qkv_bias is not None
    rng = np.random.default_rng(4)
    prompts = [
        rng.integers(0, mc.vocab_size, size=n).tolist() for n in (7, 15)
    ]

    def run(cfg):
        engine = LLMEngine(cfg, params=params)
        for p in prompts:
            engine.add_request(p, SamplingParams(max_tokens=6))
        out = {}
        while engine.has_unfinished():
            for o in engine.step():
                out[o.req_id] = o.output_token_ids
        return out

    single = run(base)
    tp = run(base.replace(parallel=ParallelConfig(tensor_parallel=2)))
    assert single == tp
