"""Ragged paged decode attention — Pallas TPU kernel with manual page DMAs.

TPU re-design of the reference's decode path (the 3D split-KV
``kernel_unified_attention_3d`` + ``reduce_segments``, reference
kernels/triton_unified_attention.py:527-836, and the legacy 2D decode kernel
triton_paged_decode_attention_2d.py:99-398).  The design is driven by what
actually bounds decode on TPU — DMA issue rate and grid-step overhead, not
FLOPs — and differs from both the GPU reference and a naive BlockSpec port:

* **One grid step per (sequence, KV-chunk), all kv heads fused.**  A naive
  grid of (seqs x heads x pages) with one 16-token page per step drowns in
  per-step overhead (the first version of this kernel did exactly that and
  ran 20x slower than HBM bandwidth).  Here each step consumes a *chunk* of
  ``chunk_pages`` pages for *all* kv heads at once.
* **Manual double-buffered page DMAs.**  The fused KV cache layout
  ``[L, num_blocks, 2, Hkv, block_size, head]`` makes one page — K and V of
  every head — a single contiguous slab, fetched with ONE
  ``pltpu.make_async_copy`` per page through the scalar-prefetched block
  table.  While chunk ``i`` is being reduced, chunk ``i+1``'s DMAs are
  already in flight into the other buffer slot (the standard Pallas
  double-buffering pattern; the BlockSpec pipeline cannot express a
  multi-page gather, which is why the DMAs are manual).
* **Online softmax in VMEM scratch across chunk steps** — the grid is a
  sequential pipeline per core, so the flash accumulator lives in VMEM with
  no HBM scratch round-trip and no second reduction kernel.  (The
  log-sum-exp merge the reference's ``reduce_segments`` performs survives
  as ``common.merge_softmax_segments`` / ``return_partials``, used by
  cross-chip context parallelism.)
* **GQA packing**: all ``q_per_kv`` query heads of one kv head form the
  sublane dimension of that head's q tile (the reference packs them into
  BLOCK_M the same way, triton_unified_attention.py:323,343-346).
* **FP8/INT8 KV**: pages are DMA'd in the cache dtype (halving/quartering
  the bytes moved — the entire point of a quantized cache on a
  bandwidth-bound path) and dequantized in-register after the copy, fused
  into the flash loop exactly like the reference's fused dequant
  (triton_unified_attention.py:434-455).

Whole-layer cache + scalar layer index: the decoder's ``lax.scan`` over
layers passes the full ``[L, ...]`` cache through its carry; slicing a
layer on the host side would materialize a multi-MB copy per layer, so the
layer index rides in scalar prefetch and the page DMAs address
``kv_hbm[layer, page]`` directly.
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


def _compute_dtype(cache_dtype) -> jnp.dtype:
    """MXU input dtype: bf16 everywhere except f32 caches (CPU tests /
    explicit f32 runs keep exact f32 math).  bf16 inputs with f32
    accumulation double the MXU rate vs f32 x f32 at the same output
    precision contract as the dense bf16 matmuls (VERDICT r1 item 7)."""
    return (
        jnp.float32 if cache_dtype == jnp.float32 else jnp.bfloat16
    )


def _bitcast_e4m3_to_bf16(x):
    """e4m3fn -> bf16 via integer bit surgery — v5e has no fast e4m3
    conversion unit (measured: native ``astype`` runs the fp8 decode
    kernel 5-10x slower than int8 at equal bytes, VERDICT r2 #5/6).

    Layout: e4m3fn = s|eeee|mmm (bias 7), bf16 = s|eeeeeeee|mmmmmmm
    (bias 127).  For normals: E = e + 120, M = m << 4 — one shift and
    one add on the exponent/mantissa block.  Zero is forced to zero;
    e4m3 subnormals (|v| < 2^-6, i.e. < 0.4% of the e4m3 range) land
    one binade high — far below attention tolerance for a quantized
    cache.  The reference's analog is the fused in-loop fp8 dequant
    (kernels/triton_unified_attention.py:434-455)."""
    # bit ops in i32: Mosaic has no 16-bit vector shift (arith.shli on
    # packed i16 fails to legalize)
    b = jax.lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.int32)
    em = b & 0x7F
    bits = ((b & 0x80) << 8) | jnp.where(em == 0, 0, (em << 4) + (120 << 7))
    return jax.lax.bitcast_convert_type(
        bits.astype(jnp.uint16), jnp.bfloat16
    )


def _dequant(x, scale, out_dtype=jnp.float32):
    if x.dtype in (jnp.float32, jnp.bfloat16, jnp.float16):
        return x.astype(out_dtype)
    if x.dtype == jnp.float8_e4m3fn:
        y = _bitcast_e4m3_to_bf16(x)
        return (y.astype(jnp.float32) * scale).astype(out_dtype)
    return (x.astype(jnp.float32) * scale).astype(out_dtype)


def _visible_lo(seq_len, sliding_window: int, local_chunk_size: int):
    """Lowest kv position the (single, last) decode token may attend to."""
    lo = jnp.int32(0)
    if sliding_window > 0:
        lo = jnp.maximum(lo, seq_len - sliding_window)
    if local_chunk_size > 0:
        lo = jnp.maximum(lo, (seq_len - 1) // local_chunk_size * local_chunk_size)
    return lo


def _ragged_decode_kernel(
    # scalar prefetch
    layer_ref,  # [1] int32
    seq_lens_ref,  # [S] int32 (SMEM)
    tbl_ref,  # [S, max_pages] int32 (SMEM)
    # inputs: q_ref [1, Hkv, qpk_pad, hd] (VMEM, per-seq block);
    # kv_hbm [L, num_blocks, 2, Hkv, bs, hd] cache dtype (stays in HBM);
    # optionally alibi [Hkv, qpk_pad, 128]; outputs; scratch
    *rest,
    scale: float,
    block_size: int,
    chunk_pages: int,
    sliding_window: int,
    logits_soft_cap: float,
    k_scale: float,
    v_scale: float,
    return_partials: bool,
    local_chunk_size: int,
    has_alibi: bool,
    stickbreaking: bool = False,
    attend_current: bool = False,
    pipeline_depth: int = 2,
    debug_oob: bool = False,
):
    rest = list(rest)
    q_ref = rest.pop(0)  # [1, Hkv, qpk_pad, hd]
    kv_hbm = rest.pop(0)
    alibi_ref = rest.pop(0) if has_alibi else None
    o_ref = rest.pop(0)  # [1, Hkv, qpk_pad, hd]
    if return_partials:
        m_out, l_out = rest.pop(0), rest.pop(0)
    kv_buf, sems = rest.pop(0), rest.pop(0)
    m_scr, l_scr, acc_scr = rest

    s = pl.program_id(0)
    c = pl.program_id(1)
    num_chunks = pl.num_programs(1)
    num_seqs = pl.num_programs(0)
    lyr = layer_ref[0]
    chunk_tokens = chunk_pages * block_size

    def eff_len(sl):
        # stick-breaking excludes the current (query) token by default:
        # weight p_j = sigmoid(z_j) * prod_{k>j} (1 - sigmoid(z_k)) over
        # the first n_keys keys (reference sb_jit_func.py:119-175)
        if stickbreaking and not attend_current:
            return sl - 1
        return sl

    def ck_of(grid_c):
        # stick-breaking consumes chunks HIGH->LOW positions so the
        # running log(1-beta) suffix accumulates across chunks — the
        # reverse-order analog of the flash (m, l) carry
        if stickbreaking:
            return num_chunks - 1 - grid_c
        return grid_c

    def foreach_page(sq, ck, fn, dead_fn=None):
        """Run fn(i, page_id) for each page of chunk ck of sequence sq that
        intersects the visible kv range [lo, seq_len), and dead_fn(i) for
        the rest.  The same predicate gates DMA start and wait, keeping
        them paired."""
        sl = eff_len(seq_lens_ref[sq])
        # the visibility window is anchored at the FULL length (incl.
        # the current token, which the caller wrote before this kernel)
        lo = _visible_lo(
            seq_lens_ref[sq], sliding_window, local_chunk_size
        )
        for i in range(chunk_pages):  # static unroll
            pg = ck * chunk_pages + i
            live = jnp.logical_and(
                pg * block_size < sl, (pg + 1) * block_size > lo
            )

            if debug_oob:
                # VTB_DEBUG sanitizer tier (SURVEY §5.2): a garbage page
                # id would DMA another sequence's KV silently — print it
                # (the reference's TRITON_BACKEND_DEBUG print_gpu analog)
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
                        "VTB_DEBUG decode OOB page id {} seq {} page {}",
                        tbl_ref[sq, pg], sq, pg,
                    )

            @pl.when(live)
            def _():
                fn(i, tbl_ref[sq, pg])

            if dead_fn is not None:

                @pl.when(jnp.logical_not(live))
                def _():
                    dead_fn(i)

    def _page_dst(slot, i):
        return kv_buf.at[slot, :, :, pl.ds(i * block_size, block_size), :]

    def start_chunk(sq, ck, slot):
        def start(i, page_id):
            pltpu.make_async_copy(
                kv_hbm.at[lyr, page_id], _page_dst(slot, i),
                sems.at[slot, i],
            ).start()

        foreach_page(sq, ck, start)

    def wait_chunk(sq, ck, slot):
        def wait(i, page_id):
            pltpu.make_async_copy(
                kv_hbm.at[lyr, page_id], _page_dst(slot, i),
                sems.at[slot, i],
            ).wait()

        def zero_dead(i):
            # dead pages were never DMA'd: the buffer holds garbage
            # (possibly NaN) that would poison masked columns via 0 * NaN
            # in p @ v — zero them before compute.
            kv_buf[slot, :, :, pl.ds(i * block_size, block_size), :] = (
                jnp.zeros(
                    (2, kv_buf.shape[2], block_size, kv_buf.shape[4]),
                    kv_buf.dtype,
                )
            )

        # Integer caches cannot hold a NaN bit pattern: dequant of any
        # garbage byte is finite, the K side is masked to MASK_VALUE
        # before the row max, and p is an exact 0 on masked columns, so
        # 0 * v_garbage == 0.  Skipping the per-step zero fill removes up
        # to chunk_pages-1 VMEM page stores per grid step on the tail
        # chunk (seqs shorter than the tuned chunk pay it every step).
        # Float caches (bf16/fp8-e4m3) CAN hold NaNs in uninitialized
        # VMEM, so they keep the zero fill.
        needs_zero = kv_buf.dtype not in (jnp.int8, jnp.uint8)
        foreach_page(
            sq, ck, wait, dead_fn=zero_dead if needs_zero else None
        )

    step = s * num_chunks + c
    slot = jax.lax.rem(step, pipeline_depth)

    @pl.when(step == 0)
    def _warmup():
        # fill the pipeline: issue the first depth-1 chunks up front so
        # depth-1 chunks of scattered page DMAs stay in flight (depth 2
        # = classic double buffering; deeper hides per-page DMA latency
        # variance on randomly-permuted block tables)
        for d in range(pipeline_depth - 1):
            @pl.when(d < num_seqs * num_chunks)
            def _(d=d):
                start_chunk(
                    d // num_chunks, ck_of(jax.lax.rem(d, num_chunks)),
                    d % pipeline_depth,
                )

    # keep the pipeline full: issue the chunk depth-1 steps ahead
    nxt = step + pipeline_depth - 1
    ns, nc = nxt // num_chunks, jax.lax.rem(nxt, num_chunks)

    @pl.when(nxt < num_seqs * num_chunks)
    def _prefetch():
        start_chunk(ns, ck_of(nc), jax.lax.rem(nxt, pipeline_depth))

    @pl.when(c == 0)
    def _init():
        m_scr[...] = (
            jnp.zeros_like(m_scr) if stickbreaking
            else jnp.full_like(m_scr, MASK_VALUE)
        )
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    seq_len = eff_len(seq_lens_ref[s])
    lo = _visible_lo(
        seq_lens_ref[s], sliding_window, local_chunk_size
    )
    chunk_lo = ck_of(c) * chunk_tokens
    live = jnp.logical_and(
        chunk_lo < seq_len, chunk_lo + chunk_tokens > lo
    )

    if stickbreaking:
        @pl.when(live)
        def _compute_sb():
            # m_scr doubles as the running suffix log-mass
            # S = sum of log(1 - sigmoid(z)) over all HIGHER keys
            wait_chunk(s, ck_of(c), slot)
            q = q_ref[0]
            cdt = q.dtype
            k = _dequant(kv_buf[slot, 0], k_scale, cdt)
            v = _dequant(kv_buf[slot, 1], v_scale, cdt)
            z = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale  # [H, qpk_pad, chunk_tokens]
            pos = chunk_lo + jax.lax.broadcasted_iota(
                jnp.int32, z.shape, 2
            )
            mask = pos < seq_len
            log1mb = jnp.where(mask, -jax.nn.softplus(z), 0.0)
            # inclusive reverse cumsum within the chunk:
            # log p_j = z_j + sum_{k >= j in chunk} log1mb_k + S.
            # Mosaic lowers neither `rev` nor `cumsum`; express it as a
            # triangular matmul rc[.., j] = sum_k log1mb[.., k] * (k>=j)
            # (MXU-friendly; HIGHEST keeps f32 accuracy — default MXU
            # precision costs ~3e-2 abs err over a 128-token chunk)
            ct = log1mb.shape[2]
            tri = (
                jax.lax.broadcasted_iota(jnp.int32, (ct, ct), 0)
                >= jax.lax.broadcasted_iota(jnp.int32, (ct, ct), 1)
            ).astype(jnp.float32)
            rc = jax.lax.dot_general(
                log1mb, tri, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            logp = z + rc + m_scr[:, :, :1]
            p = jnp.where(mask, jnp.exp(logp), 0.0)
            acc_scr[...] += jax.lax.dot_general(
                p.astype(cdt), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            m_scr[...] += jnp.broadcast_to(
                jnp.sum(log1mb, axis=2, keepdims=True), m_scr.shape
            )

        @pl.when(c == num_chunks - 1)
        def _finish_sb():
            # unnormalized by design: stick mass beyond the window drops
            o_ref[0] = acc_scr[...].astype(o_ref.dtype)

        return

    @pl.when(live)
    def _compute():
        wait_chunk(s, c, slot)
        q = q_ref[0]  # [H, qpk_pad, hd] compute dtype
        hkv, qpk_pad, hd = q.shape
        cdt = q.dtype
        # INT8 MXU fast path: the dequant of K/V to f32 was the kernel's
        # bottleneck, not HBM (measured: bf16 caches stream 736 GB/s
        # while int8 managed 491 — the VPU astype on 2 x [H, chunk, hd]
        # dominated).  Quantize q in-register (per-block absmax) and run
        # q8 @ k8 on the int8 MXU; only the [H, qpk, chunk] SCORES are
        # dequantized — 16x less VPU work.  Same trick on the PV side
        # below (p in [0,1] quantized to 1/127 steps — the reference
        # ships the same option as quantize_p, legacy/fused_gqa_paged/
        # fused_gqa_paged_splitkv.py:438-444).  Measured: 85 -> 58 us at
        # batch 32 / ctx 577 (724 GB/s = 96% of the measured ceiling),
        # max abs error vs the dequant path 2.4e-4.
        int8_fast = kv_buf.dtype == jnp.int8
        if int8_fast:
            qf = q.astype(jnp.float32)
            qs = jnp.maximum(jnp.max(jnp.abs(qf)), 1e-9) / 127.0
            q8 = jnp.round(qf / qs).astype(jnp.int8)
            v8 = kv_buf[slot, 1]
            s_blk = jax.lax.dot_general(
                q8, kv_buf[slot, 0], (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (qs * k_scale * scale)
        else:
            k = _dequant(kv_buf[slot, 0], k_scale, cdt)
            v = _dequant(kv_buf[slot, 1], v_scale, cdt)
            s_blk = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale  # [H, qpk_pad, chunk_tokens]
        if logits_soft_cap > 0.0:
            s_blk = logits_soft_cap * jnp.tanh(s_blk / logits_soft_cap)
        pos = chunk_lo + jax.lax.broadcasted_iota(
            jnp.int32, s_blk.shape, 2
        )
        if has_alibi:
            # bias = slope * (kv_pos - q_pos); the decode token sits at
            # q_pos = seq_len - 1 (reference unified kernel :481-482)
            q_pos = seq_len - 1
            slope = alibi_ref[:, :, :1]  # [H, qpk_pad, 1]
            s_blk = s_blk + slope * (pos - q_pos).astype(jnp.float32)
        mask = jnp.logical_and(pos < seq_len, pos >= lo)
        s_blk = jnp.where(mask, s_blk, MASK_VALUE)

        m_prev = m_scr[...]  # [H, qpk_pad, 128]
        m_cur = jnp.max(s_blk, axis=2, keepdims=True)  # [H, qpk_pad, 1]
        m_new = jnp.maximum(m_prev[:, :, :1], m_cur)
        alpha = jnp.exp(m_prev[:, :, :1] - m_new)
        p = jnp.where(mask, jnp.exp(s_blk - m_new), 0.0)
        l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=2, keepdims=True)
        if int8_fast:
            p8 = jnp.round(p * 127.0).astype(jnp.int8)
            pv = jax.lax.dot_general(
                p8, v8, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (v_scale / 127.0)
        else:
            pv = jax.lax.dot_general(
                p.astype(cdt), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [H, qpk_pad, hd]
        acc_scr[...] = acc_scr[...] * alpha + pv
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(c == num_chunks - 1)
    def _finish():
        l = l_scr[:, :, :1]
        if return_partials:
            # unnormalized accumulator + running (max, expsum) — the
            # cross-chip merge (merge_softmax_segments / ring attention)
            # normalizes after combining shards
            o_ref[0] = acc_scr[...].astype(o_ref.dtype)
            m_out[0] = m_scr[...]
            l_out[0] = l_scr[...]
        else:
            safe = jnp.where(l == 0.0, 1.0, l)
            o_ref[0] = jnp.where(
                l == 0.0, 0.0, acc_scr[...] / safe
            ).astype(o_ref.dtype)


def _default_chunk_pages(
    max_seq_len: int,
    block_size: int,
    num_kv_heads: int,
    head_size: int,
    itemsize: int,
    pipeline_depth: int = 2,
) -> int:
    """Chunk sizing heuristic: big enough to amortize per-step overhead,
    small enough that all ``pipeline_depth`` in-flight chunk buffers fit
    ~8 MB of VMEM (v5e has 128 MB; measured, whole-sequence 1024-token
    chunks beat 512 at batch 32-64)."""
    budget = 8 * 1024 * 1024
    bytes_per_token = pipeline_depth * 2 * num_kv_heads * head_size * itemsize
    max_tokens = max(block_size, budget // max(1, bytes_per_token))
    target = min(1024, max_tokens, round_up(max_seq_len, block_size))
    return max(1, target // block_size)


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "max_seq_len", "sliding_window", "logits_soft_cap",
        "k_scale", "v_scale", "return_partials", "chunk_pages",
        "local_chunk_size", "stickbreaking", "attend_current",
        "pipeline_depth",
    ),
)
def _paged_decode_impl(
    q: jax.Array,  # [num_seqs, num_q_heads, head_size]
    kv_cache: jax.Array,  # [L, num_blocks, 2, Hkv, block_size, head_size]
    layer_idx: jax.Array,  # scalar int32
    seq_lens: jax.Array,  # [num_seqs] int32
    block_table: jax.Array,  # [num_seqs, max_blocks] int32
    *,
    scale: float,
    max_seq_len: int,
    sliding_window: int = 0,
    logits_soft_cap: float = 0.0,
    alibi_slopes: jax.Array | None = None,  # [num_q_heads] f32
    k_scale: float = 1.0,
    v_scale: float = 1.0,
    return_partials: bool = False,
    chunk_pages: int = 0,  # 0 -> heuristic
    local_chunk_size: int = 0,
    stickbreaking: bool = False,
    attend_current: bool = False,
    pipeline_depth: int = 2,  # in-flight chunk buffers (2 = double)
) -> jax.Array:
    """Single-token-per-sequence paged attention (the decode hot path).

    ``max_seq_len`` is the static kv-length bucket: the kernel covers
    ``cdiv(max_seq_len, block_size)`` kv pages per sequence, masked down to
    each sequence's true ``seq_lens[i]``.

    With ``return_partials`` the result is ``(acc, m, l)`` — the
    *unnormalized* flash accumulator plus running max/expsum per q row
    ([S, Hq], f32) — for cross-chip sequence-parallel merging
    (``common.merge_softmax_segments``; SURVEY.md §5.7: the multi-device
    generalization of the reference's reduce_segments).
    """
    num_seqs, num_q_heads, head_size = q.shape
    n_layers, num_blocks, _, num_kv_heads, block_size, head_pad = (
        kv_cache.shape
    )
    qpk = num_q_heads // num_kv_heads
    assert qpk * num_kv_heads == num_q_heads
    qpk_pad = max(8, round_up(qpk, 8))

    if not chunk_pages:
        chunk_pages = _default_chunk_pages(
            max_seq_len, block_size, num_kv_heads, head_pad,
            kv_cache.dtype.itemsize, pipeline_depth,
        )
    max_pages = cdiv(max_seq_len, block_size)
    chunk_pages = min(chunk_pages, max_pages)
    num_chunks = cdiv(max_pages, chunk_pages)
    chunk_tokens = chunk_pages * block_size

    cdt = _compute_dtype(kv_cache.dtype)
    qr = q.reshape(num_seqs, num_kv_heads, qpk, head_size).astype(cdt)
    # lane-padded cache head dim: pad q with zeros (no effect on scores;
    # the padded output tail is sliced off below)
    qr = jnp.pad(
        qr,
        (
            (0, 0), (0, 0), (0, qpk_pad - qpk),
            (0, head_pad - head_size),
        ),
    )

    kernel = functools.partial(
        _ragged_decode_kernel,
        scale=scale,
        block_size=block_size,
        chunk_pages=chunk_pages,
        sliding_window=sliding_window,
        logits_soft_cap=logits_soft_cap,
        k_scale=k_scale,
        v_scale=v_scale,
        return_partials=return_partials,
        local_chunk_size=local_chunk_size,
        has_alibi=alibi_slopes is not None,
        stickbreaking=stickbreaking,
        attend_current=attend_current,
        pipeline_depth=pipeline_depth,
        debug_oob=kernel_debug(),
    )

    def q_map(s, c, *prefetch):
        del c, prefetch
        return (s, 0, 0, 0)

    o_spec = pl.BlockSpec((1, num_kv_heads, qpk_pad, head_pad), q_map)
    o_shape = jax.ShapeDtypeStruct(
        (num_seqs, num_kv_heads, qpk_pad, head_pad),
        jnp.float32 if return_partials else q.dtype,
    )
    out_specs: object = o_spec
    out_shape: object = o_shape
    if return_partials:
        ml_spec = pl.BlockSpec((1, num_kv_heads, qpk_pad, 128), q_map)
        ml_shape = jax.ShapeDtypeStruct(
            (num_seqs, num_kv_heads, qpk_pad, 128), jnp.float32
        )
        out_specs = [o_spec, ml_spec, ml_spec]
        out_shape = [o_shape, ml_shape, ml_shape]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_seqs, num_chunks),
        in_specs=[
            pl.BlockSpec((1, num_kv_heads, qpk_pad, head_pad), q_map),
            pl.BlockSpec(memory_space=pl.ANY),  # cache stays in HBM
        ] + ([
            pl.BlockSpec(
                (num_kv_heads, qpk_pad, 128),
                lambda s, c, *prefetch: (0, 0, 0),
            )
        ] if alibi_slopes is not None else []),
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM(
                (pipeline_depth, 2, num_kv_heads, chunk_tokens, head_pad),
                kv_cache.dtype,
            ),
            pltpu.SemaphoreType.DMA((pipeline_depth, chunk_pages)),
        ] + [
            pltpu.VMEM((num_kv_heads, qpk_pad, 128), jnp.float32),
            pltpu.VMEM((num_kv_heads, qpk_pad, 128), jnp.float32),
            pltpu.VMEM((num_kv_heads, qpk_pad, head_pad), jnp.float32),
        ],
    )

    kv_bytes = kv_cache.dtype.itemsize
    cost = pl.CostEstimate(
        flops=4 * num_seqs * num_q_heads * max_seq_len * head_size,
        bytes_accessed=(
            2 * num_kv_heads * max_seq_len * head_size * kv_bytes * num_seqs
        ),
        transcendentals=num_seqs * num_q_heads * max_seq_len,
    )

    scalars = (
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        seq_lens, block_table,
    )

    result = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=use_interpret(),
    )(
        *scalars,
        qr,
        kv_cache,
        *(
            () if alibi_slopes is None else (
                jnp.broadcast_to(
                    jnp.pad(
                        alibi_slopes.astype(jnp.float32).reshape(
                            num_kv_heads, qpk
                        ),
                        ((0, 0), (0, qpk_pad - qpk)),
                    )[:, :, None],
                    (num_kv_heads, qpk_pad, 128),
                ),
            )
        ),
    )

    if return_partials:
        acc, m, l = result
        acc = acc[:, :, :qpk, :head_size].reshape(
            num_seqs, num_q_heads, head_size
        )
        m = m[:, :, :qpk, 0].reshape(num_seqs, num_q_heads)
        l = l[:, :, :qpk, 0].reshape(num_seqs, num_q_heads)
        return acc, m, l

    out = result[:, :, :qpk, :head_size].reshape(
        num_seqs, num_q_heads, head_size
    )
    return out.astype(q.dtype)


def stickbreaking_decode_attention(
    q: jax.Array,  # [num_seqs, num_q_heads, head_size]
    kv_cache: jax.Array,
    layer_idx: jax.Array,
    seq_lens: jax.Array,
    block_table: jax.Array,
    *,
    scale: float,
    max_seq_len: int,
    attend_current: bool = False,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
    chunk_pages: int = 0,
) -> jax.Array:
    """Stick-breaking paged decode attention — Pallas kernel variant.

    Softmax-free weighting ``p_j = sigmoid(z_j) * prod_{k>j}
    (1 - sigmoid(z_k))`` (reference legacy/fused_gqa_paged/
    sb_jit_func.py:119-175): the decode kernel runs its chunk pipeline
    in REVERSE position order carrying the suffix log-mass
    ``sum log(1 - sigmoid(z))`` across chunks — the stick-breaking
    analog of the flash (max, expsum) carry.  Unnormalized, like the
    reference (mass beyond the visible window is dropped).  Oracle:
    ``ops.refs.ref_stickbreaking_decode`` / ``xla_stickbreaking_decode``.
    """
    return _paged_decode_impl(
        q, kv_cache, layer_idx, seq_lens, block_table,
        scale=scale, max_seq_len=max_seq_len,
        k_scale=k_scale, v_scale=v_scale,
        chunk_pages=chunk_pages
        or _default_chunk_pages(
            max_seq_len, kv_cache.shape[4], kv_cache.shape[3],
            kv_cache.shape[5], kv_cache.dtype.itemsize,
        ),
        stickbreaking=True, attend_current=attend_current,
    )


# ---------------------------------------------------------------------------
# Autotuned public entry: chunk_tokens (the DMA chunk size, the analog of
# the reference's tuned BLOCK_N/num-segment split for the 3D decode kernel
# — triton_unified_attention.py:232-266, legacy 3D NUM_SEGMENTS) resolved
# by the dejavu layer; explicit chunk_pages bypasses.
# ---------------------------------------------------------------------------

from vllm_triton_backend_tpu.autotune import ConfigSpace, autotune  # noqa: E402
from vllm_triton_backend_tpu.utils import next_power_of_2  # noqa: E402

DECODE_CONFIG_SPACE = ConfigSpace(
    space={
        "chunk_tokens": [128, 256, 512, 1024],
        # in-flight chunk DMA buffers: 2 = classic double buffering;
        # deeper pipelines hide per-page latency variance on scattered
        # (engine-realistic) block tables at the cost of VMEM
        "pipeline_depth": [2, 3, 4],
    },
)


def _decode_fallback(key: tuple) -> dict:
    # whole-sequence chunks up to the VMEM budget: measured (batch 32,
    # ctx 577, int8, v5e) 1024-token chunks beat 512 by 15% — fewer
    # grid steps, same in-flight bytes; _default_chunk_pages clamps to
    # the actual VMEM cap for the head count/dtype at launch
    max_seq_p2 = key[0]
    return {
        "chunk_tokens": min(1024, max(128, max_seq_p2)),
        "pipeline_depth": 2,
    }


@autotune(
    config_space=DECODE_CONFIG_SPACE,
    key=[
        "max_seq_len_p2", "num_seqs_p2", "num_q_heads", "num_kv_heads",
        "head_size", "block_size", "kv_dtype",
    ],
    name="paged_decode_attention",
    fallback_heuristic=_decode_fallback,
    trace_pattern="paged_decode",
)
def _decode_launch(
    q, kv_cache, layer_idx, seq_lens, block_table,
    *,
    scale, max_seq_len, sliding_window, logits_soft_cap, alibi_slopes,
    k_scale, v_scale, return_partials, local_chunk_size,
    # autotune key fields (consumed here)
    max_seq_len_p2, num_seqs_p2, num_q_heads, num_kv_heads, head_size,
    block_size, kv_dtype,
    # tuned knobs (injected by the autotuner)
    chunk_tokens,
    pipeline_depth=2,
):
    # clamp the tuned chunk to the VMEM in-flight-buffer budget for
    # these head counts / dtypes (same budget as _default_chunk_pages)
    cap = _default_chunk_pages(
        max_seq_len, block_size, num_kv_heads, head_size,
        jnp.dtype(kv_dtype).itemsize, pipeline_depth,
    )
    chunk_pages = max(1, min(chunk_tokens // block_size, cap))
    return _paged_decode_impl(
        q, kv_cache, layer_idx, seq_lens, block_table,
        scale=scale, max_seq_len=max_seq_len,
        sliding_window=sliding_window, logits_soft_cap=logits_soft_cap,
        alibi_slopes=alibi_slopes, k_scale=k_scale, v_scale=v_scale,
        return_partials=return_partials, chunk_pages=chunk_pages,
        pipeline_depth=pipeline_depth,
        local_chunk_size=local_chunk_size,
    )


def paged_decode_append_attention(
    q: jax.Array,  # [S, num_q_heads, head_size]
    key: jax.Array,  # [S, Hkv, head_size] current token K (unquantized)
    value: jax.Array,  # [S, Hkv, head_size]
    kv_cache: jax.Array,
    layer_idx: jax.Array,
    owns: jax.Array,  # scalar bool/int: layer owns its KV slot
    seq_lens: jax.Array,  # [S] int32, INCLUDING the current token
    block_table: jax.Array,
    slot_mapping: jax.Array,  # [S] int32, -1 = dead (trash page)
    *,
    scale: float,
    max_seq_len: int,
    sliding_window: int = 0,
    logits_soft_cap: float = 0.0,
    alibi_slopes: jax.Array | None = None,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
    local_chunk_size: int = 0,
    chunk_pages: int = 0,
    pipeline_depth: int = 0,  # 0 -> autotuned
) -> tuple[jax.Array, jax.Array]:
    """Append-attend: the decode hot path's cache write + attention.

    Write-then-attend, exactly the reference's order
    (backend/triton_attn.py:393-405): the current tokens' K/V rows are
    scattered into their page slots by ONE Pallas launch
    (``cache_ops.scatter_kv_windows`` — replaces the S per-token DUS
    chains that cost ~0.5 ms/step at batch 16), then the plain decode
    kernel attends through the cache at the full ``seq_lens``.

    History: round 2 fused the write INTO the attention kernel.  That
    first failed Mosaic compile on every packed dtype (the singleton-
    sublane write), and once fixed, measured SLOWER than this split —
    an aliased HBM output makes Mosaic serialize the attention kernel's
    cross-step DMA pipeline (95.7 us vs 88.1 us per layer at batch 32,
    int8, ctx 577).  The alias is now confined to the tiny scatter
    kernel and the attention kernel stays pure.

    ``owns`` is 0 for KV-sharing layers (reference triton_attn.py:
    393-395): the owner layer already wrote the current token this
    step, so this layer's write is redirected to the trash page and the
    token is read from the cache like any other.

    Returns ``(attn_out, kv_cache)`` — the cache buffer is aliased and
    updated in place.
    """
    from vllm_triton_backend_tpu.ops.pallas.cache_ops import (
        scatter_kv_windows,
    )

    slots = jnp.where(
        jnp.asarray(owns, jnp.int32) == 1,
        slot_mapping.astype(jnp.int32),
        -1,
    )
    kv_cache = scatter_kv_windows(
        kv_cache, layer_idx, key, value, slots, k_scale, v_scale
    )
    out = paged_decode_attention(
        q, kv_cache, layer_idx, seq_lens, block_table,
        scale=scale, max_seq_len=max_seq_len,
        sliding_window=sliding_window, logits_soft_cap=logits_soft_cap,
        alibi_slopes=alibi_slopes, k_scale=k_scale, v_scale=v_scale,
        chunk_pages=chunk_pages, local_chunk_size=local_chunk_size,
        pipeline_depth=pipeline_depth,
    )
    return out, kv_cache


def paged_decode_attention(
    q: jax.Array,
    kv_cache: jax.Array,
    layer_idx: jax.Array,
    seq_lens: jax.Array,
    block_table: jax.Array,
    *,
    scale: float,
    max_seq_len: int,
    sliding_window: int = 0,
    logits_soft_cap: float = 0.0,
    alibi_slopes: jax.Array | None = None,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
    return_partials: bool = False,
    chunk_pages: int = 0,  # 0 -> autotuned
    local_chunk_size: int = 0,
    pipeline_depth: int = 0,  # 0 -> autotuned (with chunk_pages: 2)
) -> jax.Array:
    """Autotuned entry — see :func:`_paged_decode_impl` for semantics."""
    if chunk_pages:
        return _paged_decode_impl(
            q, kv_cache, layer_idx, seq_lens, block_table,
            scale=scale, max_seq_len=max_seq_len,
            sliding_window=sliding_window, logits_soft_cap=logits_soft_cap,
            alibi_slopes=alibi_slopes, k_scale=k_scale, v_scale=v_scale,
            return_partials=return_partials, chunk_pages=chunk_pages,
            local_chunk_size=local_chunk_size,
            pipeline_depth=pipeline_depth or 2,
        )
    _, _, _, num_kv_heads, block_size, head_pad = kv_cache.shape
    return _decode_launch(
        q, kv_cache, layer_idx, seq_lens, block_table,
        scale=scale, max_seq_len=max_seq_len,
        sliding_window=sliding_window, logits_soft_cap=logits_soft_cap,
        alibi_slopes=alibi_slopes, k_scale=k_scale, v_scale=v_scale,
        return_partials=return_partials, local_chunk_size=local_chunk_size,
        max_seq_len_p2=next_power_of_2(max_seq_len),
        num_seqs_p2=next_power_of_2(q.shape[0]),
        num_q_heads=q.shape[1],
        num_kv_heads=num_kv_heads,
        head_size=head_pad,
        block_size=block_size,
        kv_dtype=str(kv_cache.dtype),
    )
