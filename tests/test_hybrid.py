"""Hybrid (attention+Mamba) model correctness.

The invariant that validates everything at once (conv-state carry,
SSM-state carry, scan-vs-decode-kernel equivalence, paged attention in
the same stack): one-shot prefill == chunked prefill == token-by-token
decode, for pure-Mamba and mixed-layer models.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_triton_backend_tpu.config import ModelConfig
from vllm_triton_backend_tpu.models.hybrid import (
    forward,
    init_params,
    make_state_pools,
)
from vllm_triton_backend_tpu.models.llama import ForwardExtras, make_kv_caches
from vllm_triton_backend_tpu.ops.metadata import make_metadata

BS, NB = 16, 32


def _cfg(block_types):
    return ModelConfig.tiny(
        dtype="float32",
        num_layers=len(block_types),
        layers_block_type=tuple(block_types),
        architecture="hybrid",
        mamba_state_size=16,
    )


def run_steps(cfg, params, prompt, steps, block_table, n_slots=2):
    kv_cache = make_kv_caches(cfg, NB, BS)
    conv, ssm = make_state_pools(cfg, n_slots)
    state_idx = jnp.asarray([1] + [0] * 0, jnp.int32)  # seq 0 -> slot 1
    out = []
    ctx = 0
    for qlen in steps:
        toks = jnp.asarray(prompt[ctx : ctx + qlen], jnp.int32)
        meta = make_metadata([qlen], [ctx], block_table, BS)
        extras = ForwardExtras(max_query_len=qlen, max_seq_len=ctx + qlen)
        logits, kv_cache, conv, ssm = forward(
            params, cfg, toks,
            jnp.arange(ctx, ctx + qlen, dtype=jnp.int32),
            kv_cache, conv, ssm, state_idx, meta, extras,
        )
        out.append(np.asarray(logits))
        ctx += qlen
    return np.concatenate(out, axis=0)


@pytest.mark.parametrize(
    "blocks",
    [
        ["mamba", "mamba"],
        ["attention", "mamba", "attention", "mamba"],
    ],
    ids=["pure-mamba", "hybrid"],
)
def test_prefill_matches_decode(blocks):
    cfg = _cfg(blocks)
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, size=21).tolist()
    bt = np.arange(2, dtype=np.int32).reshape(1, 2)

    full = run_steps(cfg, params, prompt, [21], bt)
    chunked = run_steps(cfg, params, prompt, [9, 8, 4], bt)
    tokenwise = run_steps(cfg, params, prompt, [1] * 21, bt)

    np.testing.assert_allclose(full, chunked, atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(full, tokenwise, atol=3e-4, rtol=1e-3)


def test_batched_mamba_matches_single():
    """Two sequences in one batch with distinct state slots == each solo."""
    cfg = _cfg(["mamba", "attention"])
    params = init_params(cfg, jax.random.key(1))
    rng = np.random.default_rng(2)
    p1 = rng.integers(0, cfg.vocab_size, size=6).tolist()
    p2 = rng.integers(0, cfg.vocab_size, size=11).tolist()

    bt = np.arange(4, dtype=np.int32).reshape(2, 2)
    kv_cache = make_kv_caches(cfg, NB, BS)
    conv, ssm = make_state_pools(cfg, 4)
    meta = make_metadata([6, 11], [0, 0], bt, BS)
    extras = ForwardExtras(max_query_len=11, max_seq_len=16)
    logits, *_ = forward(
        params, cfg, jnp.asarray(p1 + p2, jnp.int32),
        jnp.asarray(list(range(6)) + list(range(11)), jnp.int32),
        kv_cache, conv, ssm,
        jnp.asarray([2, 3], jnp.int32), meta, extras,
    )
    logits = np.asarray(logits)

    solo1 = run_steps(cfg, params, p1, [6], bt[:1])
    solo2 = run_steps(cfg, params, p2, [11], bt[1:] - 2)
    np.testing.assert_allclose(logits[:6], solo1, atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(logits[6:], solo2, atol=3e-4, rtol=1e-3)


def test_pad_slot_state_untouched():
    """A padded row (state_indices == -1) must leave the pools unchanged."""
    cfg = _cfg(["mamba"])
    params = init_params(cfg, jax.random.key(3))
    bt = np.arange(2, dtype=np.int32).reshape(1, 2)
    kv_cache = make_kv_caches(cfg, NB, BS)
    conv, ssm = make_state_pools(cfg, 2)
    conv_before = np.asarray(conv).copy()
    ssm_before = np.asarray(ssm).copy()
    meta = make_metadata([1], [0], bt, BS)
    extras = ForwardExtras(max_query_len=1, max_seq_len=16)
    _, _, conv2, ssm2 = forward(
        params, cfg, jnp.asarray([5], jnp.int32),
        jnp.asarray([0], jnp.int32),
        kv_cache, conv, ssm,
        jnp.asarray([-1], jnp.int32), meta, extras,
    )
    np.testing.assert_array_equal(np.asarray(conv2), conv_before)
    np.testing.assert_array_equal(np.asarray(ssm2), ssm_before)
