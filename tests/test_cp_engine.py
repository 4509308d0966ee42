"""Context-parallel engine: sequence-sharded KV over the ``seq`` axis.

VERDICT r1 item 5: CP must serve actual requests through the engine.
Gold check: cp=2/4 greedy output matches the single-chip engine, with
prompts long enough that their KV genuinely spans multiple chips'
pools (prompt > chunk_len), exercising both the CP prefill partials
merge and the CP decode merge.
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


@pytest.mark.parametrize("cp", [2, 4])
def test_cp_engine_matches_single_chip(cp):
    if len(jax.devices()) < cp:
        pytest.skip(f"needs {cp} devices")
    mc = ModelConfig.tiny(dtype="float32")
    base = EngineConfig(
        model=mc,
        cache=CacheConfig(block_size=16, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=4,
            max_num_batched_tokens=128,
            max_model_len=128,
            token_buckets=(8, 16, 32, 64, 128),
            enable_prefix_caching=False,
        ),
    )
    params = init_params(mc, jax.random.key(0))
    rng = np.random.default_rng(0)
    # 90-token prompt spans 2+ chips at chunk_len = 128/cp
    prompts = [
        rng.integers(0, mc.vocab_size, size=n).tolist()
        for n in (90, 40, 7)
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
        base.replace(parallel=ParallelConfig(context_parallel=cp))
    )
    assert single == sharded
