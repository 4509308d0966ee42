"""Mixture-of-Experts (Mixtral-family) through the engine and the
expert-parallel (EP) sharded path — SURVEY §2.6's EP column, native.

Routing parity vs transformers lives in test_hf_parity; here: the full
continuous-batching engine (incl. fused decode sessions) on an MoE
model, and EP over the model mesh axis == single chip, token-exact.
"""

import dataclasses as dc

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


def _cfg(**parallel):
    mc = dc.replace(
        ModelConfig.tiny(dtype="float32"),
        num_local_experts=4,
        num_experts_per_tok=2,
    )
    return EngineConfig(
        model=mc,
        cache=CacheConfig(block_size=16, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=4,
            max_num_batched_tokens=64,
            max_model_len=128,
            token_buckets=(8, 16, 32, 64),
        ),
        parallel=ParallelConfig(**parallel) if parallel else
        ParallelConfig(),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    params = init_params(cfg.model, jax.random.key(7))
    assert params.layers.moe_router is not None
    return cfg, params


def _run(cfg, params, prompts, multistep=32, n_new=8):
    engine = LLMEngine(cfg, params=params, multistep=multistep)
    for p in prompts:
        engine.add_request(p, SamplingParams(max_tokens=n_new))
    out = {}
    while engine.has_unfinished():
        for o in engine.step():
            out[o.req_id] = o.output_token_ids
    return out


def _prompts(cfg):
    rng = np.random.default_rng(3)
    return [
        rng.integers(0, cfg.model.vocab_size, size=n).tolist()
        for n in (9, 17)
    ]


def test_moe_engine_sessions_match_per_step(setup):
    cfg, params = setup
    prompts = _prompts(cfg)
    per_step = _run(cfg, params, prompts, multistep=0)
    fused = _run(cfg, params, prompts, multistep=4)
    assert per_step == fused
    # router actually routes: an all-zero router (uniform experts)
    # changes the output
    import jax.numpy as jnp

    uniform = params._replace(
        layers=params.layers._replace(
            moe_router=jnp.zeros_like(params.layers.moe_router)
        )
    )
    assert _run(cfg, uniform, prompts, multistep=0) != per_step


def test_moe_expert_parallel_matches_single_chip(setup):
    """EP=2: experts sharded over the model axis, one psum combine."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    cfg, params = setup
    prompts = _prompts(cfg)
    single = _run(cfg, params, prompts, multistep=0)
    ep_cfg = _cfg(tensor_parallel=2)
    assert _run(ep_cfg, params, prompts, multistep=0) == single
    assert _run(ep_cfg, params, prompts, multistep=4) == single


def test_moe_pipeline_parallel_matches_single_chip(setup):
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    cfg, params = setup
    prompts = _prompts(cfg)
    single = _run(cfg, params, prompts, multistep=0)
    pp_cfg = _cfg(pipeline_parallel=2)
    assert _run(pp_cfg, params, prompts, multistep=0) == single
