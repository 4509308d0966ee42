"""Preemption under page-pool pressure: output must be unchanged.

When the pool can't grow a decode sequence, the scheduler preempts the
newest running request (free + requeue for recompute).  Greedy output with
a tiny pool must equal the output with an ample pool.
"""

import jax
import numpy as np

from vllm_triton_backend_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)
from vllm_triton_backend_tpu.models.llama import init_params
from vllm_triton_backend_tpu.runtime.engine import LLMEngine
from vllm_triton_backend_tpu.runtime.sampler import SamplingParams


def _run(params, num_blocks, prompts, n_new, multistep=1):
    cfg = EngineConfig(
        model=ModelConfig.tiny(dtype="float32"),
        cache=CacheConfig(block_size=16, num_blocks=num_blocks),
        scheduler=SchedulerConfig(
            max_num_seqs=4,
            max_num_batched_tokens=128,
            max_model_len=128,
            token_buckets=(16, 32, 64, 128),
        ),
    )
    engine = LLMEngine(cfg, params=params, multistep=multistep)
    for p in prompts:
        engine.add_request(p, SamplingParams(max_tokens=n_new))
    results = {}
    guard = 0
    while engine.has_unfinished():
        for out in engine.step():
            results[out.req_id] = out.output_token_ids
        guard += 1
        assert guard < 500, "engine made no progress (deadlock?)"
    return results


def test_preemption_preserves_output():
    params = init_params(ModelConfig.tiny(dtype="float32"), jax.random.key(0))
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(0, 512, size=n).tolist() for n in (40, 45, 50)
    ]
    n_new = 30
    ample = _run(params, num_blocks=64, prompts=prompts, n_new=n_new)
    # tight pool: 3 seqs x ~80 tokens = 15 pages needed at peak; give 12
    # so decode growth forces preemption
    tight = _run(params, num_blocks=12, prompts=prompts, n_new=n_new)
    assert ample == tight


def test_preemption_with_multistep():
    params = init_params(ModelConfig.tiny(dtype="float32"), jax.random.key(0))
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, 512, size=n).tolist() for n in (40, 44)]
    ample = _run(params, 64, prompts, 24, multistep=8)
    tight = _run(params, 9, prompts, 24, multistep=8)
    assert ample == tight
