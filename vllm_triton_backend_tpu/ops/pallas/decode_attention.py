"""Paged decode attention — Pallas TPU kernel.

TPU re-design of the reference's decode path (the 3D split-KV
``kernel_unified_attention_3d`` + ``reduce_segments``, reference
kernels/triton_unified_attention.py:527-836, and the legacy 2D decode kernel
triton_paged_decode_attention_2d.py:99-398).  The design differs from the
GPU version on purpose:

* GPU: a grid of thread-blocks race over (seqs x kv_heads x kv-segments)
  with f32 scratch in HBM and a second reduction kernel.  TPU: the grid is a
  *sequential pipeline* per core, so the online-softmax accumulator lives in
  VMEM scratch across grid steps along the kv-block axis — no scratch
  round-trip and no reduction launch.  (The log-sum-exp merge the reference's
  ``reduce_segments`` performs survives as ``common.merge_softmax_segments``,
  used by ring attention across chips.)
* Pages are gathered from HBM by the Pallas pipeline itself: the kv
  BlockSpec ``index_map`` reads the *scalar-prefetched* block table, so page
  fetches are double-buffered DMAs overlapped with compute — the TPU analog
  of the reference's in-loop ``tl.load`` through the block table
  (triton_unified_attention.py:400-508).
* GQA packing: all query heads of one kv head form the sublane dimension of
  a single tile (the reference packs them into BLOCK_M the same way,
  triton_unified_attention.py:323,343-346).
* FP8/INT8 KV: dequantization happens in-register after the page DMA
  (k * k_scale), fused into the flash loop exactly like the reference's
  fused dequant (triton_unified_attention.py:434-455).

Blocks past a sequence's length are clamped to the last valid page in the
index map, so the pipeline re-uses the resident block (no DMA) and the
compute is skipped — the TPU version of "launch upper bound, early-return"
(reference triton_paged_decode_attention_2d.py:355-361).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_triton_backend_tpu.ops.pallas.common import MASK_VALUE, use_interpret
from vllm_triton_backend_tpu.utils import cdiv, round_up


def _dequant(x, scale):
    if x.dtype in (jnp.float32, jnp.bfloat16, jnp.float16):
        return x.astype(jnp.float32)
    return x.astype(jnp.float32) * scale


def _decode_kernel(
    # scalar prefetch
    seq_lens_ref,  # [S] int32 (SMEM)
    tbl_ref,  # [S, max_blocks] int32 (SMEM)
    # inputs
    q_ref,  # [1, 1, QPK_PAD, hd] f32
    k_ref,  # [1, 1, bs, hd] cache dtype
    v_ref,  # [1, 1, bs, hd] cache dtype
    # outputs
    o_ref,  # [1, 1, QPK_PAD, hd]
    *rest,  # partials mode: (m_out, l_out) refs then scratch
    scale: float,
    block_size: int,
    sliding_window: int,
    logits_soft_cap: float,
    k_scale: float,
    v_scale: float,
    return_partials: bool = False,
    local_chunk_size: int = 0,
):
    if return_partials:
        m_out, l_out, m_ref, l_ref, acc_ref = rest
    else:
        m_ref, l_ref, acc_ref = rest
    s = pl.program_id(0)
    b = pl.program_id(2)
    seq_len = seq_lens_ref[s]

    @pl.when(b == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    block_start = b * block_size
    live = block_start < seq_len
    if sliding_window > 0:
        # decode q position is seq_len-1; keys >= seq_len - window are visible
        live = jnp.logical_and(
            live, block_start + block_size > seq_len - sliding_window
        )
    if local_chunk_size > 0:
        # chunked local attention: only keys in the last token's chunk
        chunk_start = (seq_len - 1) // local_chunk_size * local_chunk_size
        live = jnp.logical_and(
            live, block_start + block_size > chunk_start
        )

    @pl.when(live)
    def _step():
        q = q_ref[0, 0]  # [QPK_PAD, hd] f32
        k = _dequant(k_ref[0, 0], k_scale)  # [bs, hd] f32
        s_blk = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [QPK_PAD, bs]
        if logits_soft_cap > 0.0:
            s_blk = logits_soft_cap * jnp.tanh(s_blk / logits_soft_cap)
        pos = block_start + jax.lax.broadcasted_iota(
            jnp.int32, s_blk.shape, 1
        )
        mask = pos < seq_len
        if sliding_window > 0:
            mask = jnp.logical_and(mask, pos >= seq_len - sliding_window)
        if local_chunk_size > 0:
            chunk_start = (
                (seq_len - 1) // local_chunk_size * local_chunk_size
            )
            mask = jnp.logical_and(mask, pos >= chunk_start)
        s_blk = jnp.where(mask, s_blk, MASK_VALUE)

        m_prev = m_ref[...]  # [QPK_PAD, 128] (lane-broadcast)
        m_cur = jnp.max(s_blk, axis=1, keepdims=True)  # [QPK_PAD, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev[:, :1] - m_new[:, :1])  # [QPK_PAD, 1]
        p = jnp.where(mask, jnp.exp(s_blk - m_new[:, :1]), 0.0)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        v = _dequant(v_ref[0, 0], v_scale)  # [bs, hd]
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [QPK_PAD, hd]
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = m_new

    @pl.when(b == pl.num_programs(2) - 1)
    def _finish():
        l = l_ref[:, :1]
        if return_partials:
            # unnormalized accumulator + running (max, expsum) — the
            # cross-chip merge (merge_softmax_segments / ring attention)
            # normalizes after combining shards
            o_ref[0, 0] = acc_ref[...].astype(o_ref.dtype)
            m_out[0, 0] = m_ref[...]
            l_out[0, 0] = l_ref[...]
        else:
            safe = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, 0] = jnp.where(
                l == 0.0, 0.0, acc_ref[...] / safe
            ).astype(o_ref.dtype)


def _decode_kernel_fused_heads(
    # scalar prefetch
    seq_lens_ref,  # [S] int32 (SMEM)
    tbl_ref,  # [S, max_blocks] int32 (SMEM)
    # inputs
    q_ref,  # [1, Hkv, QPK_PAD, hd] f32
    k_ref,  # [Hkv, 1, bs, hd] cache dtype
    v_ref,  # [Hkv, 1, bs, hd]
    # outputs
    o_ref,  # [1, Hkv, QPK_PAD, hd]
    # scratch
    m_ref,  # [Hkv * QPK_PAD, 128] f32
    l_ref,
    acc_ref,  # [Hkv * QPK_PAD, hd] f32
    *,
    scale: float,
    block_size: int,
    sliding_window: int,
    logits_soft_cap: float,
    k_scale: float,
    v_scale: float,
    local_chunk_size: int = 0,
):
    """Head-fused variant: one grid step loads a page's K/V for ALL kv
    heads (grid (seqs, pages) — Hkv x fewer steps than the per-head
    kernel; the page DMA is one strided slab)."""
    s = pl.program_id(0)
    b = pl.program_id(1)
    seq_len = seq_lens_ref[s]
    hkv, qpk_pad = q_ref.shape[1], q_ref.shape[2]
    hd = q_ref.shape[3]

    @pl.when(b == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    block_start = b * block_size
    live = block_start < seq_len
    if sliding_window > 0:
        live = jnp.logical_and(
            live, block_start + block_size > seq_len - sliding_window
        )
    if local_chunk_size > 0:
        chunk_start = (seq_len - 1) // local_chunk_size * local_chunk_size
        live = jnp.logical_and(
            live, block_start + block_size > chunk_start
        )

    @pl.when(live)
    def _step():
        q = q_ref[0]  # [Hkv, QPK_PAD, hd]
        k = _dequant(k_ref[:, 0], k_scale)  # [Hkv, bs, hd]
        s_blk = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [Hkv, QPK_PAD, bs]
        if logits_soft_cap > 0.0:
            s_blk = logits_soft_cap * jnp.tanh(s_blk / logits_soft_cap)
        pos = block_start + jax.lax.broadcasted_iota(
            jnp.int32, s_blk.shape, 2
        )
        mask = pos < seq_len
        if sliding_window > 0:
            mask = jnp.logical_and(mask, pos >= seq_len - sliding_window)
        if local_chunk_size > 0:
            chunk_start = (
                (seq_len - 1) // local_chunk_size * local_chunk_size
            )
            mask = jnp.logical_and(mask, pos >= chunk_start)
        s_blk = jnp.where(mask, s_blk, MASK_VALUE)

        rows = hkv * qpk_pad
        s2 = s_blk.reshape(rows, block_size)
        mask2 = mask.reshape(rows, block_size)
        m_prev = m_ref[...]
        m_cur = jnp.max(s2, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev[:, :1] - m_new[:, :1])
        p = jnp.where(mask2, jnp.exp(s2 - m_new[:, :1]), 0.0)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        v = _dequant(v_ref[:, 0], v_scale)  # [Hkv, bs, hd]
        pv = jax.lax.dot_general(
            p.reshape(hkv, qpk_pad, block_size), v,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [Hkv, QPK_PAD, hd]
        acc_ref[...] = acc_ref[...] * alpha + pv.reshape(rows, hd)
        m_ref[...] = m_new

    @pl.when(b == pl.num_programs(1) - 1)
    def _finish():
        l = l_ref[:, :1]
        safe = jnp.where(l == 0.0, 1.0, l)
        out = jnp.where(l == 0.0, 0.0, acc_ref[...] / safe)
        o_ref[0] = out.reshape(hkv, qpk_pad, hd).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "max_seq_len", "sliding_window", "logits_soft_cap",
        "k_scale", "v_scale", "return_partials", "fuse_heads",
        "local_chunk_size",
    ),
)
def paged_decode_attention(
    q: jax.Array,  # [num_seqs, num_q_heads, head_size]
    k_cache: jax.Array,  # [Hkv, num_blocks, block_size, head_size]
    v_cache: jax.Array,
    seq_lens: jax.Array,  # [num_seqs] int32
    block_table: jax.Array,  # [num_seqs, max_blocks] int32
    *,
    scale: float,
    max_seq_len: int,
    sliding_window: int = 0,
    logits_soft_cap: float = 0.0,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
    return_partials: bool = False,
    fuse_heads: bool = False,
    local_chunk_size: int = 0,
) -> jax.Array:
    """Single-token-per-sequence paged attention (the decode hot path).

    ``max_seq_len`` is the static kv-length bucket: the grid covers
    ``cdiv(max_seq_len, block_size)`` kv pages per sequence, masked down to
    each sequence's true ``seq_lens[i]``.

    With ``return_partials`` the result is ``(acc, m, l)`` — the
    *unnormalized* flash accumulator plus running max/expsum per q row
    ([S, Hq], f32) — for cross-chip sequence-parallel merging
    (``common.merge_softmax_segments``; SURVEY.md §5.7: the multi-device
    generalization of the reference's reduce_segments).
    """
    num_seqs, num_q_heads, head_size = q.shape
    num_kv_heads, _, block_size, _ = k_cache.shape
    qpk = num_q_heads // num_kv_heads
    assert qpk * num_kv_heads == num_q_heads
    qpk_pad = max(8, round_up(qpk, 8))
    num_kv_blocks = max(1, cdiv(max_seq_len, block_size))

    qr = q.reshape(num_seqs, num_kv_heads, qpk, head_size).astype(jnp.float32)
    if qpk_pad != qpk:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, qpk_pad - qpk), (0, 0)))

    if fuse_heads:
        assert not return_partials, "partials use the per-head kernel"
        return _paged_decode_fused_heads(
            qr, k_cache, v_cache, seq_lens, block_table,
            scale=scale, num_kv_blocks=num_kv_blocks,
            sliding_window=sliding_window,
            logits_soft_cap=logits_soft_cap,
            k_scale=k_scale, v_scale=v_scale,
            out_dtype=q.dtype, qpk=qpk,
            local_chunk_size=local_chunk_size,
        )

    kernel = functools.partial(
        _decode_kernel,
        scale=scale,
        block_size=block_size,
        sliding_window=sliding_window,
        logits_soft_cap=logits_soft_cap,
        k_scale=k_scale,
        v_scale=v_scale,
        return_partials=return_partials,
        local_chunk_size=local_chunk_size,
    )

    def q_map(s, h, b, sl, tbl):
        del b, sl, tbl
        return (s, h, 0, 0)

    def kv_map(s, h, b, sl, tbl):
        nb = jnp.maximum(pl.cdiv(sl[s], block_size) - 1, 0)
        return (h, tbl[s, jnp.minimum(b, nb)], 0, 0)

    out_specs = pl.BlockSpec((1, 1, qpk_pad, head_size), q_map)
    out_shape = jax.ShapeDtypeStruct(
        (num_seqs, num_kv_heads, qpk_pad, head_size),
        jnp.float32 if return_partials else q.dtype,
    )
    if return_partials:
        ml_spec = pl.BlockSpec((1, 1, qpk_pad, 128), q_map)
        ml_shape = jax.ShapeDtypeStruct(
            (num_seqs, num_kv_heads, qpk_pad, 128), jnp.float32
        )
        out_specs = [out_specs, ml_spec, ml_spec]
        out_shape = [out_shape, ml_shape, ml_shape]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_seqs, num_kv_heads, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, qpk_pad, head_size), q_map),
            pl.BlockSpec((1, 1, block_size, head_size), kv_map),
            pl.BlockSpec((1, 1, block_size, head_size), kv_map),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((qpk_pad, 128), jnp.float32),
            pltpu.VMEM((qpk_pad, 128), jnp.float32),
            pltpu.VMEM((qpk_pad, head_size), jnp.float32),
        ],
    )

    kv_bytes = k_cache.dtype.itemsize
    cost = pl.CostEstimate(
        flops=4 * num_seqs * num_q_heads * max_seq_len * head_size,
        bytes_accessed=(
            2 * num_kv_heads * max_seq_len * head_size * kv_bytes * num_seqs
        ),
        transcendentals=num_seqs * num_q_heads * max_seq_len,
    )

    result = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=use_interpret(),
    )(seq_lens, block_table, qr, k_cache, v_cache)

    if return_partials:
        acc, m, l = result
        acc = acc[:, :, :qpk, :].reshape(num_seqs, num_q_heads, head_size)
        m = m[:, :, :qpk, 0].reshape(num_seqs, num_q_heads)
        l = l[:, :, :qpk, 0].reshape(num_seqs, num_q_heads)
        return acc, m, l

    out = result[:, :, :qpk, :].reshape(num_seqs, num_q_heads, head_size)
    return out.astype(q.dtype)


def _paged_decode_fused_heads(
    qr,  # [S, Hkv, qpk_pad, hd] f32
    k_cache,
    v_cache,
    seq_lens,
    block_table,
    *,
    scale,
    num_kv_blocks,
    sliding_window,
    logits_soft_cap,
    k_scale,
    v_scale,
    out_dtype,
    qpk,
    local_chunk_size=0,
):
    num_seqs, num_kv_heads, qpk_pad, head_size = qr.shape
    block_size = k_cache.shape[2]

    kernel = functools.partial(
        _decode_kernel_fused_heads,
        scale=scale,
        block_size=block_size,
        sliding_window=sliding_window,
        logits_soft_cap=logits_soft_cap,
        k_scale=k_scale,
        v_scale=v_scale,
        local_chunk_size=local_chunk_size,
    )

    def q_map(s, b, sl, tbl):
        del b, sl, tbl
        return (s, 0, 0, 0)

    def kv_map(s, b, sl, tbl):
        nb = jnp.maximum(pl.cdiv(sl[s], block_size) - 1, 0)
        return (0, tbl[s, jnp.minimum(b, nb)], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_seqs, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, num_kv_heads, qpk_pad, head_size), q_map),
            pl.BlockSpec(
                (num_kv_heads, 1, block_size, head_size), kv_map
            ),
            pl.BlockSpec(
                (num_kv_heads, 1, block_size, head_size), kv_map
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, num_kv_heads, qpk_pad, head_size), q_map
        ),
        scratch_shapes=[
            pltpu.VMEM((num_kv_heads * qpk_pad, 128), jnp.float32),
            pltpu.VMEM((num_kv_heads * qpk_pad, 128), jnp.float32),
            pltpu.VMEM((num_kv_heads * qpk_pad, head_size), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_seqs, num_kv_heads, qpk_pad, head_size), out_dtype
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=use_interpret(),
    )(seq_lens, block_table, qr, k_cache, v_cache)
    num_q_heads = num_kv_heads * qpk
    return (
        out[:, :, :qpk, :]
        .reshape(num_seqs, num_q_heads, head_size)
        .astype(out_dtype)
    )
