"""Paged prefill / chunked-prefill attention — Pallas TPU kernel.

TPU re-design of the reference's 2D unified kernel
(``kernel_unified_attention_2d``, reference
kernels/triton_unified_attention.py:276-523) and the legacy prefix-prefill
kernel (triton_prefix_prefill.py:25-765): one kernel handles full prefill,
chunked prefill, and prefix-cache reuse, reading *all* K/V (context + new
tokens) through the paged block table.  New tokens' K/V must already be in
the cache (cache write precedes attention, as in the reference's forward,
backend/triton_attn.py:396,446).

TPU-specific design (not a translation):

* **Page-accumulate super-blocks.** Cache pages are small (16-64 tokens); a
  matmul against one page would use a sliver of the 128x128 MXU.  Instead
  the innermost grid axis streams pages — auto-pipelined, double-buffered
  DMAs via a scalar-prefetch block-table ``index_map`` — and the kernel
  *accumulates* them (dequantized) into a VMEM super-block of ``SUPER``
  tokens.  The online-softmax flash update then runs once per super-block on
  a [q_tile, SUPER] score matrix: full MXU utilization independent of page
  size.  (The reference needs no such step because Triton pointers gather
  arbitrary pages per tile, triton_unified_attention.py:400-508.)
* **GQA packing**: the q tile packs all ``q_per_kv`` query heads of a kv
  head with BLOCK_Q query positions into one [q_per_kv * BLOCK_Q, head] tile
  (reference's BLOCK_Q = BLOCK_M / num_queries_per_kv packing,
  triton_unified_attention.py:323,343-346); the causal mask depends only on
  ``row % BLOCK_Q``.
* **Causal early-exit**: kv pages beyond a q-tile's causal horizon are
  clamped to the last needed page in the index map — the pipeline re-uses
  the resident block (no DMA) and compute is skipped (the reference's
  ``max_seq_prefix_len`` early stop, triton_unified_attention.py:384-399).
* **FP8/INT8 KV dequant** is fused into the page-accumulate copy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_triton_backend_tpu.ops.pallas.common import MASK_VALUE, use_interpret
from vllm_triton_backend_tpu.utils.debug import kernel_debug
from vllm_triton_backend_tpu.utils import cdiv, round_up


from vllm_triton_backend_tpu.ops.pallas.decode_attention import (
    _compute_dtype,
    _dequant,
)


def _prefill_kernel(
    # scalar prefetch
    layer_ref,  # [1] int32
    qsl_ref,  # [S+1] int32
    sl_ref,  # [S] int32 causal bound (may exceed cap under CP)
    cap_ref,  # [S] int32 kv tokens PRESENT locally (== sl normally)
    tbl_ref,  # [S, max_blocks] int32
    # inputs
    q_ref,  # [1, BQ, qpk*hd] compute dtype (flat head-group slice)
    kv_hbm,  # [L, num_blocks, 2, Hkv, bs, hd] cache dtype (stays in HBM)
    alibi_ref,  # [1, qpk_pad, 128] f32 or None (bound statically)
    # outputs: o_ref [1, BQ, qpk*hd]; +(m_out, l_out) with partials
    *refs,
    scale: float,
    block_size: int,
    block_q: int,
    super_size: int,
    sliding_window: int,
    logits_soft_cap: float,
    k_scale: float,
    v_scale: float,
    has_alibi: bool,
    local_chunk_size: int = 0,
    return_partials: bool = False,
    pipeline_depth: int = 2,
    debug_oob: bool = False,
):
    """One grid step = one (sequence, kv-head, q-tile, KV SUPER-BLOCK).

    The first version iterated PAGES in the grid and staged each page
    into the super-block buffer with a VPU copy — 16 tiny grid steps +
    one flash step per super; measured 4.49 ms for a 4 x 2048 bf16
    prefill (16% of MXU peak) with ~3 ms of pure grid-step overhead.
    This version walks SUPER-BLOCKS in the grid and fetches their pages
    with manual double-buffered DMAs straight into VMEM (the decode
    kernel's pattern), so every grid step runs one full flash update
    while the next super's pages stream in.
    """
    refs = list(refs)
    o_ref = refs.pop(0)
    if return_partials:
        m_out, l_out = refs.pop(0), refs.pop(0)
    kv_buf, sems, q_scr, m_scr, l_scr, acc_scr = refs
    # kv_buf [depth, 2, super_size, hd] cache dtype; sems [depth, 2, pps]
    # q_scr [m_rows, hd]: the q tile re-staged g-major ONCE per q-tile
    # (sb == 0) from the flat [BQ, qpk*hd] block — the flat q/out layout
    # is a free reshape of the packed [S, QPAD, Hq, hd] array, so no XLA
    # transpose copies materialize around the kernel (they cost
    # 3.9 ms/step at the 2048-token prefill shape)

    s = pl.program_id(0)
    h = pl.program_id(1)
    qb = pl.program_id(2)
    sb = pl.program_id(3)
    n_h = pl.num_programs(1)
    n_qb = pl.num_programs(2)
    n_sb = pl.num_programs(3)
    lyr = layer_ref[0]
    pps = super_size // block_size

    def kv_hi_of(sq, qblk):
        seq_len = sl_ref[sq]
        q_len = qsl_ref[sq + 1] - qsl_ref[sq]
        hi = jnp.minimum(
            jnp.minimum(seq_len, seq_len - q_len + (qblk + 1) * block_q),
            cap_ref[sq],
        )
        # dead q-tile skip: a tile whose every row is past this
        # sequence's query length is pure padding — report an empty kv
        # range so neither its page DMAs nor its flash bodies run.  In a
        # mixed batch a 1-token decode rider otherwise pays
        # (q_pad/block_q) full-context passes instead of one (and padded
        # batch rows, q_len == 0, skip entirely).
        return jnp.where(qblk * block_q >= q_len, 0, hi)

    def foreach_page(sq, hh, qblk, sblk, fn, dead_fn=None):
        """fn(i, page_id, side) for each live page of super sblk; the
        same predicate gates DMA start and wait, keeping them paired."""
        hi = kv_hi_of(sq, qblk)
        for i in range(pps):  # static unroll
            pg = sblk * pps + i
            live = pg * block_size < hi

            if debug_oob:
                # VTB_DEBUG sanitizer tier (SURVEY §5.2)
                @pl.when(
                    jnp.logical_and(
                        live,
                        jnp.logical_or(
                            tbl_ref[sq, pg] < 0,
                            tbl_ref[sq, pg] >= kv_hbm.shape[1],
                        ),
                    )
                )
                def _():
                    pl.debug_print(
                        "VTB_DEBUG prefill OOB page id {} seq {} page {}",
                        tbl_ref[sq, pg], sq, pg,
                    )

            @pl.when(live)
            def _():
                pid = tbl_ref[sq, pg]
                fn(i, pid, 0)
                fn(i, pid, 1)

            if dead_fn is not None:

                @pl.when(jnp.logical_not(live))
                def _():
                    dead_fn(i)

    def start_super(sq, hh, qblk, sblk, slot):
        def start(i, pid, side):
            pltpu.make_async_copy(
                kv_hbm.at[lyr, pid, side, hh],
                kv_buf.at[slot, side, pl.ds(i * block_size, block_size), :],
                sems.at[slot, side, i],
            ).start()

        foreach_page(sq, hh, qblk, sblk, start)

    def wait_super(sq, hh, qblk, sblk, slot):
        def wait(i, pid, side):
            pltpu.make_async_copy(
                kv_hbm.at[lyr, pid, side, hh],
                kv_buf.at[slot, side, pl.ds(i * block_size, block_size), :],
                sems.at[slot, side, i],
            ).wait()

        def zero_dead(i):
            # dead pages were never DMA'd: float caches may hold NaNs
            # that would poison masked columns via 0 * NaN in p @ v
            z = jnp.zeros((block_size, kv_buf.shape[3]), kv_buf.dtype)
            kv_buf[slot, 0, pl.ds(i * block_size, block_size), :] = z
            kv_buf[slot, 1, pl.ds(i * block_size, block_size), :] = z

        needs_zero = kv_buf.dtype not in (jnp.int8, jnp.uint8)
        foreach_page(
            sq, hh, qblk, sblk, wait,
            dead_fn=zero_dead if needs_zero else None,
        )

    def decompose(t):
        sblk = jax.lax.rem(t, n_sb)
        t = t // n_sb
        qblk = jax.lax.rem(t, n_qb)
        t = t // n_qb
        hh = jax.lax.rem(t, n_h)
        return t // n_h, hh, qblk, sblk

    step = ((s * n_h + h) * n_qb + qb) * n_sb + sb
    slot = jax.lax.rem(step, pipeline_depth)
    total_steps = pl.num_programs(0) * n_h * n_qb * n_sb

    @pl.when(step == 0)
    def _warmup():
        for d in range(pipeline_depth - 1):
            if d < total_steps:
                start_super(*decompose(jnp.int32(d)), d % pipeline_depth)

    nxt = step + pipeline_depth - 1

    @pl.when(nxt < total_steps)
    def _prefetch():
        start_super(*decompose(nxt), jax.lax.rem(nxt, pipeline_depth))

    seq_len = sl_ref[s]
    cap = cap_ref[s]
    q_len = qsl_ref[s + 1] - qsl_ref[s]
    ctx_len = seq_len - q_len
    kv_hi = kv_hi_of(s, qb)
    sb_base = sb * super_size

    @pl.when(sb == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        # stage the q tile g-major: rows (g, qpos), g = lane group of
        # the flat [BQ, qpk*hd] block (head index = h * qpk + g)
        bq = q_ref.shape[1]
        hd = q_scr.shape[1]
        qpk = q_ref.shape[2] // hd
        for g in range(qpk):
            q_scr[pl.ds(g * bq, bq), :] = q_ref[
                0, :, pl.ds(g * hd, hd)
            ]

    def flash_body(masked: bool):
        bq = q_ref.shape[1]
        hd = q_scr.shape[1]
        qpk = q_ref.shape[2] // hd
        m_rows = qpk * bq
        q = q_scr[...]  # [M, hd] compute dtype, g-major rows
        k = _dequant(kv_buf[slot, 0], k_scale, q.dtype)
        v = _dequant(kv_buf[slot, 1], v_scale, q.dtype)
        s_blk = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [M, SUPER]
        if logits_soft_cap > 0.0:
            s_blk = logits_soft_cap * jnp.tanh(s_blk / logits_soft_cap)

        if masked:
            # absolute q position per row; rows are (g, qpos) with
            # qpos = r % BQ
            row_q = jax.lax.broadcasted_iota(
                jnp.int32, (m_rows, super_size), 0
            ) % bq
            qpos = ctx_len + qb * block_q + row_q
            kpos = sb_base + jax.lax.broadcasted_iota(
                jnp.int32, (m_rows, super_size), 1
            )
            mask = jnp.logical_and(
                kpos <= qpos, kpos < jnp.minimum(seq_len, cap)
            )
            # rows past this sequence's query length are padding
            mask = jnp.logical_and(
                mask, (qb * block_q + row_q) < q_len
            )
            if sliding_window > 0:
                mask = jnp.logical_and(mask, qpos - kpos < sliding_window)
            if local_chunk_size > 0:
                # chunked local attention: keys within the q token's chunk
                mask = jnp.logical_and(
                    mask,
                    kpos // local_chunk_size == qpos // local_chunk_size,
                )
            if has_alibi:
                slopes = alibi_ref[0, :, :1]  # [qpk_pad, 1]
                slope_row = jnp.broadcast_to(
                    slopes[:qpk], (qpk, bq)
                ).reshape(m_rows, 1)
                s_blk = s_blk + slope_row * (kpos - qpos).astype(
                    jnp.float32
                )
            s_blk = jnp.where(mask, s_blk, MASK_VALUE)

        m_prev = m_scr[...]
        m_cur = jnp.max(s_blk, axis=1, keepdims=True)  # [M, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev[:, :1] - m_new[:, :1])  # [M, 1]
        p = jnp.exp(s_blk - m_new[:, :1])
        if masked:
            p = jnp.where(mask, p, 0.0)
        l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha + pv
        m_scr[...] = m_new

    # full-block fast path (the reference's two-phase full/masked split,
    # triton_flash_attention.py:1118-1216): an interior super is fully
    # visible to every row of the q tile — no iotas, no mask, no where.
    # Conditions: every kv position of the super is <= the TILE-MINIMUM
    # q position, inside the cap, and every tile row is a real query.
    if sliding_window > 0 or local_chunk_size > 0 or has_alibi:
        full_ok = jnp.bool_(False)  # window/bias need per-position math
    else:
        qpos_min = ctx_len + qb * block_q
        full_ok = jnp.logical_and(
            sb_base + super_size - 1 <= qpos_min,
            jnp.logical_and(
                sb_base + super_size <= jnp.minimum(seq_len, cap),
                (qb + 1) * block_q <= q_len,
            ),
        )
    live = sb_base < kv_hi

    @pl.when(jnp.logical_and(live, full_ok))
    def _flash_full():
        wait_super(s, h, qb, sb, slot)
        flash_body(masked=False)

    @pl.when(jnp.logical_and(live, jnp.logical_not(full_ok)))
    def _flash_masked():
        wait_super(s, h, qb, sb, slot)
        flash_body(masked=True)

    @pl.when(sb == n_sb - 1)
    def _finish():
        bq = o_ref.shape[1]
        hd = acc_scr.shape[1]
        qpk = o_ref.shape[2] // hd

        def write_groups(dst, src, width):
            # [M, w] g-major rows -> flat [BQ, qpk*w] lane groups
            for g in range(qpk):
                dst[0, :, pl.ds(g * width, width)] = src[
                    g * bq:(g + 1) * bq, :
                ]

        if return_partials:
            # unnormalized accumulator + running (max, expsum): the
            # cross-chip LSE merge normalizes after combining shards
            # (context.cp_prefill_attention; the reference's
            # reduce_segments contract, triton_unified_attention.py
            # :757-836, lifted onto the mesh axis)
            write_groups(o_ref, acc_scr[...].astype(o_ref.dtype), hd)
            write_groups(m_out, m_scr[...], 128)
            write_groups(l_out, l_scr[...], 128)
        else:
            l = l_scr[:, :1]
            safe = jnp.where(l == 0.0, 1.0, l)
            out = jnp.where(l == 0.0, 0.0, acc_scr[...] / safe)
            write_groups(o_ref, out.astype(o_ref.dtype), hd)


def _pack_ragged(q, query_start_loc, num_seqs_static, q_pad):
    """[T, Hq, hd] ragged -> [S, QPAD, Hq, hd] padded-per-sequence."""
    total = q.shape[0]
    t = jnp.arange(total, dtype=jnp.int32)
    qsl = query_start_loc[: num_seqs_static + 1]
    seq_ids = jnp.clip(
        jnp.searchsorted(qsl, t, side="right") - 1, 0, num_seqs_static - 1
    ).astype(jnp.int32)
    local = t - qsl[seq_ids]
    packed = jnp.zeros(
        (num_seqs_static, q_pad) + q.shape[1:], dtype=q.dtype
    )
    packed = packed.at[seq_ids, local].set(q, mode="drop")
    return packed, seq_ids, local


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "max_query_len", "max_seq_len", "sliding_window",
        "logits_soft_cap", "k_scale", "v_scale", "block_q", "super_size",
        "local_chunk_size", "return_partials", "pipeline_depth",
    ),
)
def _prefill_attention_impl(
    q: jax.Array,  # [num_tokens, num_q_heads, head_size]
    kv_cache: jax.Array,  # [L, num_blocks, 2, Hkv, block_size, head_size]
    layer_idx: jax.Array,  # scalar int32
    query_start_loc: jax.Array,  # [S+1] int32
    seq_lens: jax.Array,  # [S] int32
    block_table: jax.Array,  # [S, max_blocks] int32
    *,
    scale: float,
    max_query_len: int,
    max_seq_len: int,
    sliding_window: int = 0,
    logits_soft_cap: float = 0.0,
    alibi_slopes: jax.Array | None = None,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
    block_q: int = 0,  # 0 -> heuristic
    super_size: int = 0,  # 0 -> heuristic
    local_chunk_size: int = 0,
    kv_len_cap: jax.Array | None = None,  # [S] local kv tokens present
    return_partials: bool = False,
    pipeline_depth: int = 2,  # in-flight super-block DMA buffers
) -> jax.Array:
    """Varlen prefill / chunked prefill over the paged cache.

    ``max_query_len`` and ``max_seq_len`` are static shape buckets.  Handles
    mixed batches (any per-seq query length >= 0, incl. decode rows).
    ``block_q`` / ``super_size`` are the tunable block shapes (autotuned by
    the dejavu layer via :func:`prefill_attention`).

    Context parallelism hooks (SURVEY.md §5.7): ``kv_len_cap`` bounds the
    kv tokens PRESENT in this shard's cache per sequence (``seq_lens``
    stays the causal coordinate and may exceed it or go non-positive);
    ``return_partials`` returns the unnormalized flash state
    ``(acc [T, Hq, hd], m [T, Hq], l [T, Hq])`` for the cross-chip
    log-sum-exp merge instead of the normalized output.
    """
    total, num_q_heads, head_size = q.shape
    _, _, _, num_kv_heads, block_size, head_pad = kv_cache.shape
    qpk = num_q_heads // num_kv_heads
    num_seqs = seq_lens.shape[0]

    if not block_q:
        block_q = min(128, max(8, round_up(max_query_len, 8)))
    block_q = min(block_q, max(8, round_up(max_query_len, 8)))
    if super_size:
        # scoped-VMEM guard: the p intermediate [qpk*block_q, super] f32
        # is qpk-dependent (invisible to the ConfigSpace conditions) and
        # the scoped limit is 16 MB — clamp block_q so p stays <= 6 MB
        # (e.g. a (256, 1024) config tuned at qpk=4 degrades to
        # (128, 1024) on a qpk=8 model instead of failing to compile)
        while (
            qpk * block_q * super_size * 4 > 6 * 1024 * 1024
            and block_q > 16
        ):
            block_q //= 2
    q_pad = round_up(max(max_query_len, 1), block_q)
    num_q_blocks = q_pad // block_q

    if not super_size:
        super_size = min(512, round_up(max_seq_len, block_size))
    super_size = min(super_size, round_up(max_seq_len, block_size))
    super_size = round_up(super_size, block_size)
    pages_per_super = super_size // block_size
    num_kv_pages = round_up(cdiv(max_seq_len, block_size), pages_per_super)

    cdt = _compute_dtype(kv_cache.dtype)
    packed, seq_ids, local = _pack_ragged(
        q.astype(cdt), query_start_loc, num_seqs, q_pad
    )
    # FLAT q/out layout [S, QPAD, Hq*hd]: a free reshape of the packed
    # array; the kernel's blocks slice one kv-head group's qpk*hd lanes
    # per grid step, so no transpose copy materializes on either side
    # (the old [S, Hkv, qpk, QPAD, hd] layout cost 3.9 ms/step of XLA
    # re-layout at the 2048-token prefill shape; Mosaic rejects a
    # (..., qpk, hd) block because qpk < 8 sublanes).  Lane-padded cache
    # head dim: pad q with zeros (no effect on scores; tail sliced off).
    if head_pad != head_size:
        packed = jnp.pad(
            packed, ((0, 0),) * 3 + ((0, head_pad - head_size),)
        )
    qk = packed.reshape(num_seqs, q_pad, num_q_heads * head_pad)

    has_alibi = alibi_slopes is not None
    qpk_pad = max(8, round_up(qpk, 8))
    if has_alibi:
        slopes = alibi_slopes.astype(jnp.float32).reshape(num_kv_heads, qpk)
        slopes = jnp.pad(slopes, ((0, 0), (0, qpk_pad - qpk)))
        slopes = jnp.broadcast_to(
            slopes[:, :, None], (num_kv_heads, qpk_pad, 128)
        )

    params = dict(
        scale=scale,
        block_size=block_size,
        block_q=block_q,
        super_size=super_size,
        sliding_window=sliding_window,
        logits_soft_cap=logits_soft_cap,
        k_scale=k_scale,
        v_scale=v_scale,
        has_alibi=has_alibi,
        local_chunk_size=local_chunk_size,
        return_partials=return_partials,
        pipeline_depth=pipeline_depth,
        debug_oob=kernel_debug(),
    )
    if kv_len_cap is None:
        kv_len_cap = seq_lens
    if has_alibi:
        kernel = functools.partial(_prefill_kernel, **params)
    else:
        def kernel(lyr, qsl, sl, cap, tbl, q_r, kv_r, *rest):
            return _prefill_kernel(
                lyr, qsl, sl, cap, tbl, q_r, kv_r, None, *rest,
                **params,
            )

    def q_map(s, h, qb, sb, lyr, qsl, sl, cap, tbl):
        del sb, lyr, qsl, sl, cap, tbl
        return (s, qb, h)

    def alibi_map(s, h, qb, sb, lyr, qsl, sl, cap, tbl):
        del s, qb, sb, lyr, qsl, sl, cap, tbl
        return (h, 0, 0)

    in_specs = [
        pl.BlockSpec((1, block_q, qpk * head_pad), q_map),
        pl.BlockSpec(memory_space=pl.ANY),  # cache stays in HBM
    ]
    inputs = [qk, kv_cache]
    if has_alibi:
        in_specs.append(pl.BlockSpec((1, qpk_pad, 128), alibi_map))
        inputs.append(slopes)

    m_rows = qpk * block_q
    out_specs = pl.BlockSpec((1, block_q, qpk * head_pad), q_map)
    out_shape = jax.ShapeDtypeStruct(
        (num_seqs, q_pad, num_q_heads * head_pad),
        jnp.float32 if return_partials else q.dtype,
    )
    if return_partials:
        ml_spec = pl.BlockSpec((1, block_q, qpk * 128), q_map)
        ml_shape = jax.ShapeDtypeStruct(
            (num_seqs, q_pad, num_q_heads * 128), jnp.float32
        )
        out_specs = [out_specs, ml_spec, ml_spec]
        out_shape = [out_shape, ml_shape, ml_shape]
    num_supers = num_kv_pages // pages_per_super
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(num_seqs, num_kv_heads, num_q_blocks, num_supers),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM(
                (pipeline_depth, 2, super_size, head_pad),
                kv_cache.dtype,
            ),
            pltpu.SemaphoreType.DMA(
                (pipeline_depth, 2, pages_per_super)
            ),
            pltpu.VMEM((m_rows, head_pad), cdt),  # q staged g-major
            pltpu.VMEM((m_rows, 128), jnp.float32),
            pltpu.VMEM((m_rows, 128), jnp.float32),
            pltpu.VMEM((m_rows, head_pad), jnp.float32),
        ],
    )

    kv_bytes = kv_cache.dtype.itemsize
    cost = pl.CostEstimate(
        flops=4 * num_seqs * num_q_heads * q_pad * max_seq_len * head_size,
        bytes_accessed=(
            2 * num_seqs * num_kv_heads * max_seq_len * head_size * kv_bytes
        ),
        transcendentals=num_seqs * num_q_heads * q_pad * max_seq_len,
    )

    result = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # all arbitrary: the manual cross-step DMA pipeline assumes
            # sequential grid execution (like the decode kernel)
            dimension_semantics=(
                "arbitrary", "arbitrary", "arbitrary", "arbitrary"
            ),
        ),
        cost_estimate=cost,
        interpret=use_interpret(),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        query_start_loc,
        seq_lens,
        kv_len_cap,
        block_table,
        *inputs,
    )

    def to_flat(x, width):
        # [S, QPAD, Hq*w_pad] -> flat [T, Hq, width] (reshape is free;
        # the per-head tail slice is a no-op when w_pad == width)
        w_pad = x.shape[-1] // num_q_heads
        x = x.reshape(num_seqs, q_pad, num_q_heads, w_pad)[..., :width]
        return x[seq_ids, local]

    if return_partials:
        acc, m, l = result
        return (
            to_flat(acc, head_size),
            to_flat(m, 1)[..., 0],
            to_flat(l, 1)[..., 0],
        )
    return to_flat(result, head_size).astype(q.dtype)


# ---------------------------------------------------------------------------
# Autotuned public entry: block_q / super_size resolved by the dejavu layer
# (the reference tunes the same kernel's BLOCK_M/BLOCK_N/warps/stages via
# triton-dejavu, reference triton_unified_attention.py:232-266).
# ---------------------------------------------------------------------------

from vllm_triton_backend_tpu.autotune import ConfigSpace, autotune  # noqa: E402
from vllm_triton_backend_tpu.utils import next_power_of_2  # noqa: E402

PREFILL_CONFIG_SPACE = ConfigSpace(
    space={
        # big q tiles win once the kernel is MXU-bound (measured: the
        # [qpk*256, 1024] tile runs ~100% MXU-busy on a 4x2048 prefill)
        "block_q": [16, 32, 64, 128, 256],
        "super_size": [256, 512, 1024],
        # in-flight super DMA buffers: deeper pipelines hide per-page
        # latency variance on scattered block tables at VMEM cost
        "pipeline_depth": [2, 3],
    },
    conditions=(
        # p intermediate [qpk*block_q, super] f32 must stay within
        # register/VMEM reason (8 MB at the largest point)
        lambda c: c["block_q"] * c["super_size"] <= 256 * 1024,
    ),
)


def _prefill_fallback(key: tuple) -> dict:
    """Static decision rule when no tuning data exists (the reference's
    fallback_heuristic_dt2 analog, triton_unified_attention.py:56-79)."""
    max_q, max_s = key[0], key[1]
    if max_q <= 64:
        bq = 32
    elif max_q <= 256:
        bq = 128
    else:
        bq = 256
    return {
        "block_q": bq,
        "super_size": 512 if max_s <= 512 else 1024,
        "pipeline_depth": 2,
    }


@autotune(
    config_space=PREFILL_CONFIG_SPACE,
    key=[
        "max_query_len_p2", "max_seq_len_p2", "num_q_heads",
        "num_kv_heads", "head_size", "block_size", "kv_dtype",
    ],
    name="prefill_attention",
    fallback_heuristic=_prefill_fallback,
    trace_pattern="prefill_attention",
)
def _prefill_launch(
    q, kv_cache, layer_idx, query_start_loc, seq_lens, block_table,
    *,
    scale, max_query_len, max_seq_len, sliding_window, logits_soft_cap,
    alibi_slopes, k_scale, v_scale, local_chunk_size,
    # autotune key fields (consumed here, not by the impl)
    max_query_len_p2, max_seq_len_p2, num_q_heads, num_kv_heads,
    head_size, block_size, kv_dtype,
    # tuned knobs (injected by the autotuner)
    block_q, super_size,
    pipeline_depth=2,
):
    return _prefill_attention_impl(
        q, kv_cache, layer_idx, query_start_loc, seq_lens, block_table,
        scale=scale, max_query_len=max_query_len, max_seq_len=max_seq_len,
        sliding_window=sliding_window, logits_soft_cap=logits_soft_cap,
        alibi_slopes=alibi_slopes, k_scale=k_scale, v_scale=v_scale,
        block_q=block_q, super_size=super_size,
        local_chunk_size=local_chunk_size,
        pipeline_depth=pipeline_depth,
    )


def prefill_attention(
    q, kv_cache, layer_idx, query_start_loc, seq_lens, block_table,
    *,
    scale,
    max_query_len,
    max_seq_len,
    sliding_window=0,
    logits_soft_cap=0.0,
    alibi_slopes=None,
    k_scale=1.0,
    v_scale=1.0,
    block_q=None,
    super_size=None,
    local_chunk_size=0,
    kv_len_cap=None,
    return_partials=False,
):
    """Autotuned varlen prefill/chunked-prefill attention.

    Explicit ``block_q``/``super_size`` bypass the autotuner (bench use),
    as do the context-parallel hooks (``kv_len_cap``/``return_partials``);
    otherwise the dejavu cache resolves them from the shape-bucket key.
    """
    if (
        block_q is not None or super_size is not None
        or kv_len_cap is not None or return_partials
    ):
        return _prefill_attention_impl(
            q, kv_cache, layer_idx, query_start_loc, seq_lens, block_table,
            scale=scale, max_query_len=max_query_len,
            max_seq_len=max_seq_len, sliding_window=sliding_window,
            logits_soft_cap=logits_soft_cap, alibi_slopes=alibi_slopes,
            k_scale=k_scale, v_scale=v_scale,
            block_q=block_q or 0, super_size=super_size or 0,
            local_chunk_size=local_chunk_size,
            kv_len_cap=kv_len_cap, return_partials=return_partials,
        )
    return _prefill_launch(
        q, kv_cache, layer_idx, query_start_loc, seq_lens, block_table,
        scale=scale, max_query_len=max_query_len, max_seq_len=max_seq_len,
        sliding_window=sliding_window, logits_soft_cap=logits_soft_cap,
        alibi_slopes=alibi_slopes, k_scale=k_scale, v_scale=v_scale,
        local_chunk_size=local_chunk_size,
        max_query_len_p2=next_power_of_2(max_query_len),
        max_seq_len_p2=next_power_of_2(max_seq_len),
        num_q_heads=q.shape[1],
        num_kv_heads=kv_cache.shape[3],
        head_size=q.shape[2],
        block_size=kv_cache.shape[4],
        kv_dtype=str(kv_cache.dtype),
    )
