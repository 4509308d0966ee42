"""Tensor-parallel hybrid (attention + Mamba) engine: TP=2 == single chip.

The Mamba channel-sharding analog of test_tp_engine: d_inner split over the
``model`` mesh axis (conv/SSM state local per shard, psum after
x_proj/out_proj), attention layers Megatron-sharded as in llama TP.
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
from vllm_triton_backend_tpu.models import hybrid
from vllm_triton_backend_tpu.runtime.engine import LLMEngine
from vllm_triton_backend_tpu.runtime.sampler import SamplingParams


def _mc():
    return ModelConfig.tiny(
        dtype="float32",
        num_layers=3,
        layers_block_type=("mamba", "attention", "mamba"),
        architecture="hybrid",
    )


def test_hybrid_tp_engine_matches_single_chip():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    mc = _mc()
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
    params = hybrid.init_params(mc, jax.random.key(0))
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(0, mc.vocab_size, size=n).tolist() for n in (6, 17)
    ]
    n_new = 6

    def run(cfg, multistep):
        engine = LLMEngine(cfg, params=params, multistep=multistep)
        for p in prompts:
            engine.add_request(p, SamplingParams(max_tokens=n_new))
        out = {}
        while engine.has_unfinished():
            for o in engine.step():
                out[o.req_id] = o.output_token_ids
        return out

    single = run(base, multistep=0)
    tp_cfg = base.replace(parallel=ParallelConfig(tensor_parallel=2))
    # per-step TP AND fused TP decode sessions (sharded hybrid scan)
    assert run(tp_cfg, multistep=0) == single
    assert run(tp_cfg, multistep=4) == single


def test_hybrid_tp4_pure_mamba():
    """Pure-Mamba model family over a model axis of 4."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mc = ModelConfig.tiny(
        dtype="float32", num_layers=2, architecture="mamba",
        num_heads=4, num_kv_heads=4,
    )
    base = EngineConfig(
        model=mc,
        cache=CacheConfig(block_size=16, num_blocks=32),
        scheduler=SchedulerConfig(
            max_num_seqs=2,
            max_num_batched_tokens=32,
            max_model_len=64,
            token_buckets=(8, 16, 32),
        ),
    )
    params = hybrid.init_params(mc, jax.random.key(1))
    prompt = list(range(7))

    def run(cfg):
        engine = LLMEngine(cfg, params=params)
        engine.add_request(prompt, SamplingParams(max_tokens=5))
        out = []
        while engine.has_unfinished():
            for o in engine.step():
                out = o.output_token_ids
        return out

    single = run(base)
    tp = run(base.replace(parallel=ParallelConfig(tensor_parallel=4)))
    assert single == tp
