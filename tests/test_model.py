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


def test_kv_sharing():
    """Layers with kv_sharing read the source layer's cache and skip the
    write (reference backend/triton_attn.py:302,393-395).  Oracle: an
    explicit per-layer loop that stores each owner's K/V and feeds the
    shared tensors to the sharing layers."""
    from vllm_triton_backend_tpu.models.llama import (
        apply_rope, linear, rms_norm, _rope_inv_freq,
    )
    cfg = ModelConfig.tiny(
        dtype="float32", num_layers=4, kv_sharing=(0, 1, 1, 0)
    )
    params = init_params(cfg, jax.random.key(2))
    assert make_kv_caches(cfg, 4, BLOCK_SIZE).shape[0] == 2

    rng = np.random.default_rng(0)
    T = 12
    prompt = rng.integers(0, cfg.vocab_size, size=T).tolist()
    block_table = np.arange(1, dtype=np.int32).reshape(1, 1)
    got = run_steps(cfg, params, prompt, [T], block_table)

    # oracle: explicit loop, dense K/V kept per owner layer
    hd = cfg.head_size
    inv_freq = _rope_inv_freq(cfg)
    pos = jnp.arange(T, dtype=jnp.int32)
    x = params.embed[jnp.asarray(prompt)].astype(jnp.float32)
    stored = {}
    causal = np.tril(np.ones((T, T), bool))
    for l in range(cfg.num_layers):
        lp = jax.tree.map(lambda a: a[l], params.layers)
        normed = rms_norm(x, lp.input_norm, cfg.rms_norm_eps)
        q = linear(normed, lp.q_proj).reshape(T, cfg.num_heads, hd)
        k = linear(normed, lp.k_proj).reshape(T, cfg.num_kv_heads, hd)
        v = linear(normed, lp.v_proj).reshape(T, cfg.num_kv_heads, hd)
        q = apply_rope(q, pos, inv_freq)
        k = apply_rope(k, pos, inv_freq)
        if cfg.kv_sharing[l] == l:
            stored[l] = (k, v)
        k, v = stored[cfg.kv_sharing[l]]
        qn = np.asarray(q)
        kn = np.repeat(np.asarray(k), cfg.num_queries_per_kv, axis=1)
        vn = np.repeat(np.asarray(v), cfg.num_queries_per_kv, axis=1)
        s = np.einsum("qhd,khd->hqk", qn, kn) * cfg.attn_scale
        s = np.where(causal[None], s, -np.inf)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        attn = np.einsum("hqk,khd->qhd", p, vn)
        attn_out = linear(
            jnp.asarray(attn.reshape(T, -1), jnp.float32), lp.o_proj
        )
        h_mid = x + attn_out
        normed2 = rms_norm(h_mid, lp.post_attn_norm, cfg.rms_norm_eps)
        gate = jax.nn.silu(linear(normed2, lp.gate_proj))
        mlp = linear(gate * linear(normed2, lp.up_proj), lp.down_proj)
        x = h_mid + mlp
    x = rms_norm(x, params.final_norm, cfg.rms_norm_eps)
    want = np.asarray(linear(x, params.lm_head))

    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
