"""Data-parallel engine: replica schedulers over the data mesh axis.

VERDICT r1 item 5: DP must serve actual requests through the engine, not
just pass a library dryrun.  Gold check: dp=2 (and dp=2 x tp=2) greedy
output matches the single-chip engine for every request.
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


def _base_config(mc):
    return EngineConfig(
        model=mc,
        cache=CacheConfig(block_size=16, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=4,
            max_num_batched_tokens=64,
            max_model_len=128,
            token_buckets=(8, 16, 32, 64),
        ),
    )


def _run(cfg, params, prompts, n_new):
    engine = LLMEngine(cfg, params=params)
    for p in prompts:
        engine.add_request(p, SamplingParams(max_tokens=n_new))
    out = {}
    while engine.has_unfinished():
        for o in engine.step():
            out[o.req_id] = o.output_token_ids
    return out


@pytest.mark.parametrize("dp,tp", [(2, 1), (4, 1), (2, 2)])
def test_dp_engine_matches_single_chip(dp, tp):
    if len(jax.devices()) < dp * tp:
        pytest.skip(f"needs {dp * tp} devices")
    mc = ModelConfig.tiny(dtype="float32")
    base = _base_config(mc)
    params = init_params(mc, jax.random.key(0))
    rng = np.random.default_rng(0)
    # more prompts than one replica's batch, ragged lengths
    prompts = [
        rng.integers(0, mc.vocab_size, size=n).tolist()
        for n in (6, 17, 11, 9, 23)
    ]
    n_new = 6

    single = _run(base, params, prompts, n_new)
    par = _run(
        base.replace(
            parallel=ParallelConfig(data_parallel=dp, tensor_parallel=tp)
        ),
        params, prompts, n_new,
    )
    assert single == par


def test_dp_engine_uses_all_replicas():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    mc = ModelConfig.tiny(dtype="float32")
    cfg = _base_config(mc).replace(
        parallel=ParallelConfig(data_parallel=2)
    )
    engine = LLMEngine(cfg, params=init_params(mc, jax.random.key(0)))
    rng = np.random.default_rng(1)
    for _ in range(4):
        engine.add_request(
            rng.integers(0, mc.vocab_size, size=8).tolist(),
            SamplingParams(max_tokens=4),
        )
    assert all(
        len(s.waiting) + len(s.running) == 2 for s in engine.schedulers
    )
    while engine.has_unfinished():
        engine.step()
    stats = engine.stats()
    assert stats["finished"] == 4
    assert stats["generated_tokens"] == 16


def test_dp_hybrid_engine_matches_single_chip():
    """DP=2 hybrid: replica-local SSM slot pools (slots axis sharded
    over the data mesh axis, reserved dead slot 0 per replica) and
    per-replica KV trash pages — token-exact vs the single-chip engine
    through per-step AND fused-session paths."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from vllm_triton_backend_tpu.models import hybrid

    mc = ModelConfig.tiny(
        dtype="float32",
        num_layers=3,
        layers_block_type=("mamba", "attention", "mamba"),
        architecture="hybrid",
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
    params = hybrid.init_params(mc, jax.random.key(2))
    rng = np.random.default_rng(1)
    prompts = [
        rng.integers(0, mc.vocab_size, size=n).tolist()
        for n in (6, 14, 9)
    ]

    def run(cfg, multistep):
        engine = LLMEngine(cfg, params=params, multistep=multistep)
        for p in prompts:
            engine.add_request(p, SamplingParams(max_tokens=6))
        out = {}
        while engine.has_unfinished():
            for o in engine.step():
                out[o.req_id] = o.output_token_ids
        return out

    single = run(base, multistep=0)
    dp_cfg = base.replace(parallel=ParallelConfig(data_parallel=2))
    assert run(dp_cfg, multistep=0) == single
    assert run(dp_cfg, multistep=4) == single
