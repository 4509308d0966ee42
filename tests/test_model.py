"""Model forward correctness.

The key invariant: processing a prompt in one prefill step, in chunked
prefill steps, or token-by-token decode must give the same logits at the
same positions (validates cache write + paged attention + RoPE positions +
metadata plumbing end-to-end).  This is the model-level analog of the
reference's prefix-prefill consistency tests (reference
scripts/benchmark.py:987-1112 mixed-batch synthesis).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_triton_backend_tpu.config import ModelConfig
from vllm_triton_backend_tpu.models.llama import (
    ForwardExtras,
    forward,
    init_params,
    make_kv_caches,
)
from vllm_triton_backend_tpu.ops.metadata import make_metadata

BLOCK_SIZE = 16
NUM_BLOCKS = 32


def _meta(query_lens, context_lens, block_table):
    return make_metadata(
        query_lens, context_lens, block_table, BLOCK_SIZE
    )


def _positions(query_lens, context_lens):
    pos = []
    for ql, cl in zip(query_lens, context_lens):
        pos.extend(range(cl, cl + ql))
    return jnp.asarray(pos, dtype=jnp.int32)


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig.tiny(dtype="float32")
    params = init_params(cfg, jax.random.key(0))
    return cfg, params


def run_steps(cfg, params, prompt, steps, block_table):
    """Run the model over `prompt` split into chunks given by `steps`
    (list of query lens); returns logits at every prompt position."""
    kv_cache = make_kv_caches(cfg, NUM_BLOCKS, BLOCK_SIZE)
    all_logits = []
    ctx = 0
    for qlen in steps:
        tokens = jnp.asarray(prompt[ctx : ctx + qlen], dtype=jnp.int32)
        meta = _meta([qlen], [ctx], block_table)
        extras = ForwardExtras(
            max_query_len=qlen, max_seq_len=ctx + qlen
        )
        logits, kv_cache = forward(
            params, cfg, tokens, _positions([qlen], [ctx]),
            kv_cache, meta, extras,
        )
        all_logits.append(np.asarray(logits))
        ctx += qlen
    return np.concatenate(all_logits, axis=0)


def test_prefill_matches_decode(model):
    cfg, params = model
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, size=24).tolist()
    block_table = np.arange(2, dtype=np.int32).reshape(1, 2)

    full = run_steps(cfg, params, prompt, [24], block_table)
    chunked = run_steps(cfg, params, prompt, [10, 9, 5], block_table)
    tokenwise = run_steps(cfg, params, prompt, [1] * 24, block_table)

    np.testing.assert_allclose(full, chunked, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(full, tokenwise, atol=2e-4, rtol=1e-3)


def test_batched_matches_single(model):
    """Two sequences in one batch == each alone."""
    cfg, params = model
    rng = np.random.default_rng(1)
    p1 = rng.integers(0, cfg.vocab_size, size=7).tolist()
    p2 = rng.integers(0, cfg.vocab_size, size=13).tolist()

    bt = np.arange(4, dtype=np.int32).reshape(2, 2)
    kv_cache = make_kv_caches(cfg, NUM_BLOCKS, BLOCK_SIZE)
    meta = _meta([7, 13], [0, 0], bt)
    extras = ForwardExtras(max_query_len=13, max_seq_len=13)
    tokens = jnp.asarray(p1 + p2, dtype=jnp.int32)
    logits, _ = forward(
        params, cfg, tokens, _positions([7, 13], [0, 0]),
        kv_cache, meta, extras,
    )
    logits = np.asarray(logits)

    solo1 = run_steps(cfg, params, p1, [7], bt[:1])
    solo2 = run_steps(cfg, params, p2, [13], bt[1:] - 2)
    np.testing.assert_allclose(logits[:7], solo1, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(logits[7:], solo2, atol=2e-4, rtol=1e-3)


def test_granite_multipliers(model):
    """Granite scalar multipliers change the output in the expected way:
    logits_scaling divides logits exactly."""
    cfg, params = model
    cfg2 = ModelConfig.tiny(dtype="float32", logits_scaling=4.0)
    prompt = [1, 2, 3, 4]
    bt = np.arange(1, dtype=np.int32).reshape(1, 1)
    base = run_steps(cfg, params, prompt, [4], bt)
    scaled = run_steps(cfg2, params, prompt, [4], bt)
    np.testing.assert_allclose(base / 4.0, scaled, atol=1e-5, rtol=1e-5)
