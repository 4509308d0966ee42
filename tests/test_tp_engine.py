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


def test_tp_engine_quantized_fused_matches_single_chip():
    """Quantized FUSED-layout params (the production int8 serving
    config — e.g. llama-70B int8 on one TP=8 host) through the TP
    engine: token-exact vs the single-chip quantized engine.  Covers
    the QuantizedLinear spec tree (parallel/sharded.param_specs
    fused_quant) incl. the gate|up [L, K, 2, inter] shard staging."""
    import dataclasses

    from vllm_triton_backend_tpu.models.llama import quantize_params

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
    qparams = quantize_params(params, "int8", cfg=mc)  # fused layouts
    rng = np.random.default_rng(1)
    prompts = [
        rng.integers(0, mc.vocab_size, size=n).tolist() for n in (6, 17)
    ]
    n_new = 6

    def run(cfg):
        engine = LLMEngine(cfg, params=qparams)
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


def test_tp_engine_quantized_70b_shape_plan():
    """The 70B GQA structure (qpk=8) with int8 fused weights under
    TP=4 x DP=2 — the quantized version of the staged config-5 plan
    (one 70 GB int8 llama-70B fits a single v5e-8 host)."""
    import dataclasses

    from vllm_triton_backend_tpu.models.llama import quantize_params

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    full = ModelConfig.llama3_70b()
    assert full.num_heads // full.num_kv_heads == 8
    mc = ModelConfig.llama3_70b(
        vocab_size=512, hidden_size=1024, intermediate_size=512,
        num_layers=2, num_heads=32, num_kv_heads=4,  # qpk stays 8
        max_position_embeddings=512, dtype="float32",
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
    params = init_params(mc, jax.random.key(0))
    qparams = quantize_params(params, "int8", cfg=mc)
    rng = np.random.default_rng(2)
    prompts = [
        rng.integers(0, mc.vocab_size, size=n).tolist()
        for n in (6, 17, 11)
    ]
    n_new = 5

    def run(cfg):
        engine = LLMEngine(cfg, params=qparams)
        for p in prompts:
            engine.add_request(p, SamplingParams(max_tokens=n_new))
        out = {}
        while engine.has_unfinished():
            for o in engine.step():
                out[o.req_id] = o.output_token_ids
        return out

    single = run(base)
    tpdp = run(base.replace(
        parallel=ParallelConfig(tensor_parallel=4, data_parallel=2)
    ))
    assert single == tpdp
