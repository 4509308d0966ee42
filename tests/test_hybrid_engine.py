"""Hybrid model through the full engine: continuous batching == naive loop."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_triton_backend_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)
from vllm_triton_backend_tpu.models import hybrid
from vllm_triton_backend_tpu.models.llama import ForwardExtras
from vllm_triton_backend_tpu.ops.metadata import make_metadata
from vllm_triton_backend_tpu.runtime.engine import LLMEngine
from vllm_triton_backend_tpu.runtime.sampler import SamplingParams


def _cfg():
    return ModelConfig.tiny(
        dtype="float32",
        num_layers=3,
        layers_block_type=("mamba", "attention", "mamba"),
        architecture="hybrid",
    )


def naive_greedy(cfg, params, prompt, n_new):
    kv_cache = hybrid.make_kv_caches(cfg, 32, 16)
    conv, ssm = hybrid.make_state_pools(cfg, 2)
    bt = np.arange(8, dtype=np.int32).reshape(1, 8)
    state_idx = jnp.asarray([0], jnp.int32)
    toks = list(prompt)
    step_tokens, ctx, out = toks, 0, []
    while len(out) < n_new:
        meta = make_metadata([len(step_tokens)], [ctx], bt, 16)
        extras = ForwardExtras(
            max_query_len=1 if len(step_tokens) == 1 else 64,
            max_seq_len=128,
        )
        logits, kv_cache, conv, ssm = hybrid.forward(
            params, cfg, jnp.asarray(step_tokens, jnp.int32),
            jnp.arange(ctx, ctx + len(step_tokens), dtype=jnp.int32),
            kv_cache, conv, ssm, state_idx, meta, extras,
        )
        nxt = int(jnp.argmax(logits[len(step_tokens) - 1]))
        out.append(nxt)
        ctx += len(step_tokens)
        step_tokens = [nxt]
    return out


def test_hybrid_engine_matches_naive():
    cfg = EngineConfig(
        model=_cfg(),
        cache=CacheConfig(block_size=16, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=4,
            max_num_batched_tokens=64,
            max_model_len=128,
            token_buckets=(8, 16, 32, 64),
        ),
    )
    params = hybrid.init_params(cfg.model, jax.random.key(0))
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(0, cfg.model.vocab_size, size=n).tolist()
        for n in (5, 14)
    ]
    n_new = 6

    def run(multistep):
        engine = LLMEngine(cfg, params=params, multistep=multistep)
        assert engine.is_hybrid and engine.multistep == multistep
        for p in prompts:
            engine.add_request(p, SamplingParams(max_tokens=n_new))
        results = {}
        while engine.has_unfinished():
            for out in engine.step():
                results[out.req_id] = out.output_token_ids
        # slots recycled
        assert not engine._slot_of
        return results

    for multistep in (0, 4):  # per-step loop AND fused decode sessions
        results = run(multistep)
        for i, p in enumerate(prompts):
            expect = naive_greedy(cfg.model, params, p, n_new)
            assert results[f"req-{i}"] == expect, (
                f"prompt {i} diverged (multistep={multistep})"
            )
