"""Fused append-attend decode kernel vs the two-op path.

The fused kernel (ops/pallas/decode_attention.paged_decode_append_attention)
must be numerically equivalent to reshape_and_cache followed by
paged_decode_attention (the reference's write-then-attend ordering,
backend/triton_attn.py:393-405,446-468), and must leave the cache in the
same state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.utils import random_batch, random_cache
from vllm_triton_backend_tpu.ops.pallas.cache_ops import reshape_and_cache
from vllm_triton_backend_tpu.ops.pallas.decode_attention import (
    paged_decode_append_attention,
    paged_decode_attention,
)


def run_pair(
    context_lens,
    num_q_heads=4,
    num_kv_heads=2,
    head_size=128,
    block_size=16,
    num_blocks=64,
    sliding_window=0,
    logits_soft_cap=0.0,
    local_chunk_size=0,
    cache_dtype=jnp.float32,
    k_scale=1.0,
    v_scale=1.0,
    owns=1,
    dead_rows=(),
    alibi=False,
    seed=0,
    num_layers=2,
    layer=1,
    atol=2e-3,
):
    """context_lens = tokens already cached; each seq appends one token."""
    rng = np.random.default_rng(seed)
    S = len(context_lens)
    kv_np = random_cache(
        rng, num_kv_heads, num_blocks, block_size, head_size,
        num_layers=num_layers,
    )
    # seq_lens INCLUDE the current token
    q, block_table, meta = random_batch(
        rng, [1] * S, context_lens, num_q_heads, head_size,
        block_size, num_blocks,
    )
    if cache_dtype == jnp.float32:
        kv0 = jnp.asarray(kv_np)
    else:
        kv0 = jnp.asarray(kv_np / k_scale).astype(cache_dtype)
    k_new = jnp.asarray(
        rng.standard_normal((S, num_kv_heads, head_size)) * 0.5, jnp.float32
    )
    v_new = jnp.asarray(
        rng.standard_normal((S, num_kv_heads, head_size)) * 0.5, jnp.float32
    )
    # slot of the current token = position seq_len-1
    pos = np.asarray(meta.seq_lens) - 1
    page = np.take_along_axis(
        block_table, (pos // block_size)[:, None], 1
    )[:, 0]
    slots = (page * block_size + pos % block_size).astype(np.int32)
    for r in dead_rows:
        slots[r] = -1
    slots_d = jnp.asarray(slots)
    scale = head_size ** -0.5
    alibi_slopes = (
        jnp.asarray(np.geomspace(0.5, 0.01, num_q_heads), jnp.float32)
        if alibi else None
    )
    qd = jnp.asarray(q)
    common = dict(
        scale=scale,
        max_seq_len=int(np.max(np.asarray(meta.seq_lens))),
        sliding_window=sliding_window,
        logits_soft_cap=logits_soft_cap,
        local_chunk_size=local_chunk_size,
        alibi_slopes=alibi_slopes,
        k_scale=k_scale,
        v_scale=v_scale,
    )

    # ---- reference path: write, then attend through the cache ----
    write_slots = slots_d if owns else jnp.full_like(slots_d, -1)
    kv_ref = reshape_and_cache(
        kv0, jnp.int32(layer), k_new, v_new, write_slots, k_scale, v_scale
    )
    if not owns:
        # KV-sharing: the owner layer wrote the current token already —
        # emulate by writing with the real slots first
        kv_ref = reshape_and_cache(
            kv_ref, jnp.int32(layer), k_new, v_new, slots_d,
            k_scale, v_scale,
        )
    out_ref = paged_decode_attention(
        qd, kv_ref, jnp.int32(layer), meta.seq_lens, meta.block_table,
        **common,
    )

    # ---- fused path ----
    kv_in = kv_ref if not owns else kv0
    out_fused, kv_fused = paged_decode_append_attention(
        qd, k_new, v_new, kv_in, jnp.int32(layer), jnp.int32(owns),
        meta.seq_lens, meta.block_table,
        write_slots,
        **common,
    )

    live = np.ones(S, bool)
    for r in dead_rows:
        live[r] = False
    np.testing.assert_allclose(
        np.asarray(out_fused, np.float32)[live],
        np.asarray(out_ref, np.float32)[live],
        atol=atol, rtol=2e-2,
    )
    # cache state must match exactly (same quantized row written);
    # exclude the trash page (dead-row redirects differ by design: the
    # two-op path may write different rows there)
    cf = np.asarray(kv_fused.astype(jnp.float32))[:, :-1]
    cr = np.asarray(kv_ref.astype(jnp.float32))[:, :-1]
    np.testing.assert_array_equal(cf, cr)


@pytest.mark.parametrize("heads", [(4, 2), (4, 4), (8, 1)])
def test_append_basic(heads):
    hq, hkv = heads
    run_pair([16, 31, 33, 63], num_q_heads=hq, num_kv_heads=hkv)


def test_append_page_boundary():
    # current token lands at offset 0 of a fresh page (ctx % bs == 0) and
    # mid-page; ctx 0 = first-ever token (no cached history)
    run_pair([16, 32, 0, 5], block_size=16)


def test_append_int8_cache():
    run_pair(
        [16, 40, 63], cache_dtype=jnp.int8, k_scale=1 / 16.0,
        v_scale=1 / 16.0, atol=2e-2,
    )


def test_append_fp8_cache():
    run_pair(
        [16, 40, 63], cache_dtype=jnp.float8_e4m3fn, k_scale=1 / 16.0,
        v_scale=1 / 16.0, atol=2e-2,
    )


def test_append_sliding_window():
    run_pair([40, 70, 100], sliding_window=32)


def test_append_softcap_alibi():
    run_pair([16, 40], logits_soft_cap=20.0)
    run_pair([16, 40], alibi=True)


def test_append_local_chunk():
    # local chunked attention (iRoPE analog): only the current local
    # chunk's positions are visible
    run_pair([40, 70, 127], local_chunk_size=32)


def test_append_kv_sharing_layer():
    # owns=0: current token comes from the cache (already written by the
    # owner layer); fused kernel must not double-count it
    run_pair([16, 40, 63], owns=0)


def test_append_dead_rows():
    # slot -1 rows write to the trash page; their outputs are ignored but
    # live rows must be unaffected
    run_pair([16, 40, 63, 20], dead_rows=(1,))


def test_append_long_multichunk():
    # context long enough to span several DMA chunks
    run_pair([500, 700, 1000], block_size=16, num_blocks=256)
