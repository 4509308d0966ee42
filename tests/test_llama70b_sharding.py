"""Staged north-star config 5 (BASELINE.md): Llama-3-70B multi-host plan.

70B cannot materialize in CI; what must be proven on the fake mesh is the
SHARDING PLAN: the 70B head/GQA structure (64 q heads : 8 kv heads, qpk=8)
served by the engine under TP x DP — TP=4 shards within a host, DP=2
replicas across hosts (the 140 GB bf16 model is served TP=8 per host with
DP across hosts; parallel/multihost.py provides the host-local model-axis
mesh bootstrap).  Greedy output must equal the single-chip engine.
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


def _llama70b_ci() -> ModelConfig:
    """llama3_70b scaled to CI size: same GQA structure (qpk=8), same
    rope/norm hyperparameters, tiny dims."""
    full = ModelConfig.llama3_70b()
    assert full.num_heads // full.num_kv_heads == 8
    return ModelConfig.llama3_70b(
        vocab_size=512, hidden_size=1024, intermediate_size=512,
        num_layers=4, num_heads=32, num_kv_heads=4,  # qpk stays 8
        max_position_embeddings=512, dtype="float32",
    )


def test_llama70b_tp_dp_engine_matches_single_chip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mc = _llama70b_ci()
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
        for n in (6, 17, 11, 9)
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
    sharded = run(
        base.replace(
            parallel=ParallelConfig(tensor_parallel=4, data_parallel=2)
        )
    )
    assert single == sharded
