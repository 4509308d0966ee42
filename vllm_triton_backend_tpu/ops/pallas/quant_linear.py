"""Weight-only quantized linears (INT8 / FP8-e4m3) — Pallas TPU kernel.

Role parity: the reference's north-star demands INT8/FP8 weight-only
linears with fused dequant (SURVEY.md §7 item 7; BASELINE.md staged config
3).  There is no reference kernel to port (vLLM's quant linears are CUDA);
the design is TPU-native:

* Decode is weight-bandwidth-bound: storing W as int8/fp8 halves (vs bf16)
  the HBM bytes per step, which is the entire win.  The MXU still computes
  in bf16/f32, so the kernel's job is: stream quantized weight tiles
  HBM→VMEM (auto-pipelined by the grid), dequantize in-register with the
  per-output-channel scale, matmul on the MXU, accumulate over K tiles in
  f32 scratch.
* Per-output-channel symmetric scales (absmax / 127 for int8, / 448 for
  e4m3) — applied *after* the K-loop (scales distribute over the K sum),
  so dequant cost is O(T*N), not O(K*N).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_triton_backend_tpu.ops.pallas.common import use_interpret
from vllm_triton_backend_tpu.utils import round_up


class QuantizedLinear(NamedTuple):
    """Weight-only quantized linear parameters ([in, out] layout)."""

    w_q: jax.Array  # [K, N] int8 or float8_e4m3fn
    scales: jax.Array  # [N] f32 per-output-channel


def quantize_weights(
    w: jax.Array, dtype: str = "int8", pad_to: int | None = None
) -> QuantizedLinear:
    """Per-output-channel symmetric quantization of a dense [K, N] weight.

    ``pad_to`` rounds N up to a multiple (zero columns, zero scales ->
    exactly-zero outputs in the pad).  Padding at QUANTIZE time matters
    for big non-multiple N (the lm_head's vocab): padding inside the
    matmul would re-materialize the whole padded int8 weight in HBM on
    every call (measured 612 us/step for granite's 4096x49155 lm_head).
    """
    if pad_to is not None and w.shape[-1] % pad_to:
        w = jnp.pad(
            w, ((0, 0), (0, pad_to - w.shape[-1] % pad_to))
        )
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=0)  # [N]
    if dtype == "int8-w8a8":
        dtype = "int8"  # same int8 weights; a8 is a runtime step flag
    if dtype == "int8":
        scales = jnp.maximum(absmax / 127.0, 1e-8)
        q = jnp.clip(jnp.round(wf / scales), -127, 127).astype(jnp.int8)
    elif dtype in ("fp8", "float8_e4m3"):
        scales = jnp.maximum(absmax / 448.0, 1e-8)
        q = (wf / scales).astype(jnp.float8_e4m3fn)
    else:
        raise ValueError(f"unsupported quant dtype {dtype}")
    return QuantizedLinear(w_q=q, scales=scales)


def _mm_body(x_tile, w_tile, acc_ref, a8: bool):
    """One K-step of the accumulation.

    ``a8`` (W8A8): ``x_tile`` is ALREADY int8 (pre-quantized once per
    call by :func:`_prequant_tokens` — quantizing inside the K-loop
    would redo the VPU work once per N block).  The int8 x int8 dot
    runs on the INT8 MXU (2x the bf16 rate on v5e: 394 vs 197
    T(FL)OPS) and accumulates exactly in int32; the per-token scale is
    applied once at the end (it distributes over the K sum).  The
    reference's analog of compute-side quantization is its Q-side fp8
    path (triton_attn.py:407-421).
    """
    if a8:
        acc_ref[...] += jax.lax.dot_general(
            x_tile, w_tile,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return
    # dequant cast int8/fp8 -> the activation compute dtype: with bf16
    # activations (the production path), integers up to 256 and every
    # e4m3 value are exact in bf16 and bf16 x bf16 with f32 accumulation
    # runs the MXU at twice the f32 rate (VERDICT r1 item 7); f32
    # activations keep exact f32 math (CPU tests / explicit f32 runs).
    cdt = jnp.float32 if x_tile.dtype == jnp.float32 else jnp.bfloat16
    acc_ref[...] += jax.lax.dot_general(
        x_tile.astype(cdt), w_tile.astype(cdt),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


class PrequantAct(NamedTuple):
    """Activations already quantized for the a8 path (int8 + per-token
    scale).  ``linear``/``linear_at`` accept this in place of ``x`` so a
    producer kernel (ops/pallas/act_quant.silu_mul_quant) can hand its
    int8 output straight to the matmul without a bf16 round trip."""

    x8: jax.Array  # [T, K] int8
    sx: jax.Array  # [T, 1] f32


def _prequant_tokens(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-token symmetric int8 quantization of activations [T, K] ->
    (x8 [T, K] int8, sx [T, 1] f32).  One pass per matmul call (reads x
    once) instead of once per (N block x K tile) inside the kernel;
    per-token granularity is the standard W8A8 choice (vLLM's per-token
    dynamic scheme).  Prefill-size batches go through the Pallas
    ``quant_rows`` kernel — the XLA fusion ran ~30x over the traffic
    floor at [2048, 4096] (1.8 ms measured; docs/decode_step_profile.md
    round 5) — while small (decode-size) batches keep the XLA pass,
    which fuses into its neighbors for free."""
    if x.shape[0] >= 512:
        from vllm_triton_backend_tpu.ops.pallas.act_quant import (
            quant_rows,
        )

        return quant_rows(x)
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-6
    ) * (1.0 / 127.0)
    x8 = jnp.round(xf / sx).astype(jnp.int8)
    return x8, sx


def _qmm_kernel(*refs, n_k: int, a8: bool):
    if a8:
        x_ref, sx_ref, w_ref, s_ref, o_ref, acc_ref = refs
    else:
        x_ref, w_ref, s_ref, o_ref, acc_ref = refs
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    _mm_body(x_ref[...], w_ref[...], acc_ref, a8)

    @pl.when(k == n_k - 1)
    def _finish():
        if a8:
            o_ref[...] = (
                acc_ref[...].astype(jnp.float32) * sx_ref[...] * s_ref[0]
            ).astype(o_ref.dtype)
        else:
            o_ref[...] = (acc_ref[...] * s_ref[0]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_n", "block_k", "a8")
)
def quant_matmul(
    x: jax.Array,  # [T, K] activations (bf16/f32; x8 carrier w/ prequant)
    qw: QuantizedLinear,  # w_q [K, N], scales [N]
    block_n: int = 512,
    block_k: int = 512,
    a8: bool = False,
    prequant: "PrequantAct | None" = None,
) -> jax.Array:
    """x @ dequant(w_q) with fused per-channel scaling."""
    t, k_dim = x.shape
    k2, n = qw.w_q.shape
    assert k_dim == k2
    block_n = min(block_n, round_up(n, 128))
    block_k = min(block_k, round_up(k_dim, 256))
    n_pad = round_up(n, block_n)
    k_pad = round_up(k_dim, block_k)
    t_pad = round_up(t, 8)

    if prequant is not None:
        a8 = True
        out_dt = jnp.bfloat16
    else:
        a8 = a8 and _a8_supported(str(qw.w_q.dtype), str(x.dtype))
        out_dt = x.dtype
    xp = x
    if t_pad != t or k_pad != k_dim:
        xp = jnp.pad(x, ((0, t_pad - t), (0, k_pad - k_dim)))
    wp = qw.w_q
    sp = qw.scales.astype(jnp.float32)
    if n_pad != n or k_pad != k_dim:
        wp = jnp.pad(wp, ((0, k_pad - k_dim), (0, n_pad - n)))
        sp = jnp.pad(sp, (0, n_pad - n))
    sp = sp.reshape(1, n_pad)

    n_k = k_pad // block_k
    grid = (n_pad // block_n, n_k)

    in_specs = [pl.BlockSpec((t_pad, block_k), lambda i, k: (0, k))]
    inputs = [xp]
    if a8:
        if prequant is not None:
            xp, sx = prequant.x8, prequant.sx
            if t_pad != t or k_pad != k_dim:
                xp = jnp.pad(
                    xp, ((0, t_pad - t), (0, k_pad - k_dim))
                )
                sx = jnp.pad(sx, ((0, t_pad - t), (0, 0)))
        else:
            xp, sx = _prequant_tokens(xp)
        in_specs = [
            pl.BlockSpec((t_pad, block_k), lambda i, k: (0, k)),
            pl.BlockSpec((t_pad, 1), lambda i, k: (0, 0)),
        ]
        inputs = [xp, sx]
    in_specs += [
        pl.BlockSpec((block_k, block_n), lambda i, k: (k, i)),
        pl.BlockSpec((1, block_n), lambda i, k: (0, i)),
    ]
    inputs += [wp, sp]

    out = pl.pallas_call(
        functools.partial(_qmm_kernel, n_k=n_k, a8=a8),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((t_pad, block_n), lambda i, k: (0, i)),
        out_shape=jax.ShapeDtypeStruct((t_pad, n_pad), out_dt),
        scratch_shapes=[
            pltpu.VMEM(
                (t_pad, block_n), jnp.int32 if a8 else jnp.float32
            )
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * k_pad * n_pad,
            bytes_accessed=(
                k_pad * n_pad * qw.w_q.dtype.itemsize
                + t_pad * k_pad * x.dtype.itemsize
                + t_pad * n_pad * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=use_interpret(),
    )(*inputs)
    return out[:t, :n]


def _qmm_stacked_kernel(lyr_ref, *refs, n_k: int, a8: bool):
    del lyr_ref  # consumed by the index maps
    if a8:
        x_ref, sx_ref, w_ref, s_ref, o_ref, acc_ref = refs
    else:
        x_ref, w_ref, s_ref, o_ref, acc_ref = refs
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    _mm_body(x_ref[...], w_ref[0], acc_ref, a8)

    @pl.when(k == n_k - 1)
    def _finish():
        if a8:
            o_ref[...] = (
                acc_ref[...].astype(jnp.float32) * sx_ref[...] * s_ref[0]
            ).astype(o_ref.dtype)
        else:
            o_ref[...] = (acc_ref[...] * s_ref[0]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_n", "block_k", "a8")
)
def quant_matmul_stacked(
    x: jax.Array,  # [T, K] activations (bf16/f32; x8 carrier w/ prequant)
    qw: QuantizedLinear,  # w_q [L, K, N] stacked, scales [L, N]
    layer_idx: jax.Array,  # scalar int32
    block_n: int = 512,
    block_k: int = 512,
    a8: bool = False,
    prequant: PrequantAct | None = None,
) -> jax.Array:
    """x @ dequant(w_q[layer_idx]) reading tiles straight from the
    STACKED weight array via a scalar-prefetched layer index.

    Why this exists: inside the decoder's layer ``lax.scan``, slicing a
    layer's weights out of the stacked array and feeding the slice to an
    opaque pallas custom-call makes XLA MATERIALIZE the slice — a full
    HBM copy of every weight every step (measured 11 ms/step on
    granite-8B int8, reading all weights twice).  Indexing the layer in
    the kernel's BlockSpec index map streams each tile exactly once.
    Requires K % block_k == 0 and N % block_n == 0 (callers fall back to
    :func:`quant_matmul` on a slice otherwise).
    """
    t, k_dim = x.shape
    n_layers, k2, n = qw.w_q.shape
    assert k_dim == k2
    if prequant is not None:  # int8 weights x bf16 acts by construction
        a8 = True
        out_dt = jnp.bfloat16
    else:
        a8 = a8 and _a8_supported(str(qw.w_q.dtype), str(x.dtype))
        out_dt = x.dtype
    block_n = min(block_n, n)
    block_k = min(block_k, k_dim)
    assert n % block_n == 0 and k_dim % block_k == 0
    t_pad = round_up(t, 8)
    xp = jnp.pad(x, ((0, t_pad - t), (0, 0))) if t_pad != t else x
    sp = qw.scales.astype(jnp.float32).reshape(n_layers, 1, n)

    n_k = k_dim // block_k
    grid = (n // block_n, n_k)

    in_specs = [pl.BlockSpec((t_pad, block_k), lambda i, k, lyr: (0, k))]
    inputs = [xp]
    if a8:
        if prequant is not None:
            xp, sx = prequant.x8, prequant.sx
            if t_pad != t:
                xp = jnp.pad(xp, ((0, t_pad - t), (0, 0)))
                sx = jnp.pad(sx, ((0, t_pad - t), (0, 0)))
        else:
            xp, sx = _prequant_tokens(xp)
        in_specs = [
            pl.BlockSpec((t_pad, block_k), lambda i, k, lyr: (0, k)),
            pl.BlockSpec((t_pad, 1), lambda i, k, lyr: (0, 0)),
        ]
        inputs = [xp, sx]
    in_specs += [
        pl.BlockSpec(
            (1, block_k, block_n),
            lambda i, k, lyr: (lyr[0], k, i),
        ),
        pl.BlockSpec(
            (1, 1, block_n), lambda i, k, lyr: (lyr[0], 0, i)
        ),
    ]
    inputs += [qw.w_q, sp]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (t_pad, block_n), lambda i, k, lyr: (0, i)
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (t_pad, block_n), jnp.int32 if a8 else jnp.float32
            )
        ],
    )
    out = pl.pallas_call(
        functools.partial(_qmm_stacked_kernel, n_k=n_k, a8=a8),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, n), out_dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * k_dim * n,
            bytes_accessed=(
                k_dim * n * qw.w_q.dtype.itemsize
                + t_pad * k_dim * x.dtype.itemsize
                + t_pad * n * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=use_interpret(),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1), *inputs
    )
    return out[:t]


# ---------------------------------------------------------------------------
# Autotuned tile sizes.  The analog of the reference's tuned BLOCK_M/N/K for
# its quantized GEMMs (SURVEY.md §2.3): decode is weight-bandwidth-bound and
# the tile shape sets how much of that bandwidth the grid actually sustains —
# measured on a v5e (xplane device durations, granite-8B gate/up 4096x12800
# int8): (block_k=2048, block_n=1280) runs 73.7 us vs 114.4 us at the old
# fixed (512, 512) — 87% vs 56% of the HBM weight-streaming ideal.  Tuned
# values are snapped to stored-dim divisors and shrunk to a VMEM budget, so
# every point in the space is launchable for every shape.
# ---------------------------------------------------------------------------

from vllm_triton_backend_tpu.autotune import ConfigSpace, autotune  # noqa: E402
from vllm_triton_backend_tpu.utils import next_power_of_2  # noqa: E402

QMM_CONFIG_SPACE = ConfigSpace(
    space={
        "block_n": [256, 512, 1024, 1280, 2048],
        "block_k": [512, 1024, 2048, 4096],
    },
)

# XLA's scoped-vmem limit for custom calls is 16 MiB by default (the
# hard error is "Scoped allocation ... exceeded scoped vmem limit", seen
# at t=2048 with 2048x1024 tiles); stay under it with headroom for the
# kernel's own temporaries.
_VMEM_BUDGET = 12 * 1024 * 1024


def _snap_block(dim: int, want: int, quantum: int) -> int:
    """Largest multiple of ``quantum`` <= ``want`` that divides ``dim``.

    Falls back to ``min(want, dim)`` when ``dim`` has no such divisor
    (unaligned test shapes — those take :func:`quant_matmul`'s runtime-pad
    path, where any block size is legal)."""
    if dim <= quantum or dim % quantum:
        return min(want, dim)
    want = min(want, dim)
    for b in range(want - want % quantum, 0, -quantum):
        if dim % b == 0:
            return b
    return dim


def _fit_blocks(
    t_pad: int, k_dim: int, n: int, block_n: int, block_k: int,
    w_item: int, x_item: int,
) -> tuple[int, int]:
    """Snap tuned blocks to stored-dim divisors, shrink to the VMEM budget."""
    bn = _snap_block(n, block_n, 128)
    bk = _snap_block(k_dim, block_k, 256)

    def vmem(bn, bk):
        return (
            2 * bk * bn * w_item  # double-buffered weight tiles
            + 2 * t_pad * bk * x_item  # double-buffered activation tiles
            # f32 accumulator + double-buffered out tiles
            + t_pad * bn * (4 + 2 * x_item)
        )

    while vmem(bn, bk) > _VMEM_BUDGET:
        if bk >= bn and bk > 256:
            nxt = _snap_block(k_dim, bk // 2, 256)
            bk = nxt if nxt < bk else max(256, bk // 2)
        elif bn > 128:
            nxt = _snap_block(n, bn // 2, 128)
            bn = nxt if nxt < bn else max(128, bn // 2)
        else:
            break
    return bn, bk


# W8A8: quantize activations per-token/per-K-tile in-kernel and run the
# matmul on the INT8 MXU (394 TOPS on v5e vs 197 bf16 TFLOPS).  The
# decision is an EXPLICIT caller flag (``a8=`` on ``linear``/
# ``linear_at``), threaded from the engine via ForwardExtras.w8a8: the
# engine enables it only for prefill/mixed steps of a model configured
# with quantization="int8-w8a8" — decode is weight-bandwidth-bound (the
# int8 weight READ already sets its floor, so a8 buys nothing there) and
# stays on the bf16 dequant path with identical numerics.


def _a8_supported(w_dtype: str, x_dtype: str) -> bool:
    """a8 needs int8 weights (shares the int8 MXU operand) and bf16
    activations (the production dtype; f32 activations mean a CPU test
    or an explicit full-precision run — keep those exact)."""
    return w_dtype == "int8" and x_dtype == "bfloat16"


def _qmm_fallback(key: tuple) -> dict:
    # device truth (v5e, granite-8B int8): near-full-K tiles with a wide N
    # block keep the weight stream at ~87% of HBM ideal; snapping at launch
    # makes the choice legal for every shape
    return {"block_n": 1280, "block_k": 2048}


# ``a8`` is part of the tuning key: the int8-MXU path's optimal tiles
# differ from the bf16 dequant path's, and a shared key would let one
# path's persisted configs poison the other's.
_QMM_KEY = ["t_p2", "k_dim", "n", "w_dtype", "x_dtype", "a8"]


@autotune(
    config_space=QMM_CONFIG_SPACE,
    key=_QMM_KEY,
    name="quant_matmul",
    fallback_heuristic=_qmm_fallback,
    trace_pattern="quant_matmul",
    # Mosaic compiles dominate a tuning sweep through the tunneled
    # runtime (~20 s/config); the default 120 s cap would cover a
    # quarter of the space
    search_max_t=600.0,
)
def _qmm_launch(
    x, qw, prequant=None, *,
    t_p2, k_dim, n, w_dtype, x_dtype, a8, block_n, block_k,
):
    t_pad = round_up(x.shape[0], 8)
    bn, bk = _fit_blocks(
        t_pad, k_dim, n, block_n, block_k,
        jnp.dtype(w_dtype).itemsize,
        1 if a8 else jnp.dtype(x_dtype).itemsize,
    )
    return quant_matmul(
        x, qw, block_n=bn, block_k=bk, a8=a8, prequant=prequant
    )


@autotune(
    config_space=QMM_CONFIG_SPACE,
    key=_QMM_KEY,
    name="quant_matmul_stacked",
    fallback_heuristic=_qmm_fallback,
    trace_pattern="quant_matmul",
    search_max_t=600.0,
)
def _qmm_stacked_launch(
    x, qw, layer_idx, prequant=None, *,
    t_p2, k_dim, n, w_dtype, x_dtype, a8, block_n, block_k,
):
    t_pad = round_up(x.shape[0], 8)
    bn, bk = _fit_blocks(
        t_pad, k_dim, n, block_n, block_k,
        jnp.dtype(w_dtype).itemsize,
        1 if a8 else jnp.dtype(x_dtype).itemsize,
    )
    return quant_matmul_stacked(
        x, qw, layer_idx, block_n=bn, block_k=bk, a8=a8,
        prequant=prequant,
    )


def linear_at(
    x: jax.Array, w_stacked, layer_idx: jax.Array, a8: bool = False
) -> jax.Array:
    """Layer-indexed matmul against STACKED weights [L, K, N] (used
    inside the decoder's layer scan).  ``a8`` requests the int8-MXU
    activation-quantized path (ignored unless int8 weights × bf16
    activations).  ``x`` may be a :class:`PrequantAct` (already-int8
    activations from a producer kernel); requires int8 stacked weights."""
    prequant = None
    if isinstance(x, PrequantAct):
        prequant, x = x, x.x8  # shape carrier; statics keyed as bf16
    if isinstance(w_stacked, QuantizedLinear):
        k_dim, n = w_stacked.w_q.shape[1:]
        w_dtype = str(w_stacked.w_q.dtype)
        x_dtype = "bfloat16" if prequant is not None else str(x.dtype)
        if n % 128 == 0 and k_dim % 256 == 0:
            return _qmm_stacked_launch(
                x, w_stacked, layer_idx, prequant,
                t_p2=next_power_of_2(x.shape[0]), k_dim=k_dim, n=n,
                w_dtype=w_dtype, x_dtype=x_dtype,
                a8=(a8 or prequant is not None)
                and _a8_supported(w_dtype, x_dtype),
            )
        sliced = QuantizedLinear(
            w_q=jax.lax.dynamic_index_in_dim(
                w_stacked.w_q, layer_idx, keepdims=False
            ),
            scales=jax.lax.dynamic_index_in_dim(
                w_stacked.scales, layer_idx, keepdims=False
            ),
        )
        return linear(prequant if prequant is not None else x,
                      sliced, a8=a8)
    if prequant is not None:  # dense weights: dequantize the carrier
        x = (
            prequant.x8.astype(jnp.float32) * prequant.sx
        ).astype(jnp.bfloat16)
    return x @ jax.lax.dynamic_index_in_dim(
        w_stacked, layer_idx, keepdims=False
    )


def linear(x: jax.Array, w, a8: bool = False) -> jax.Array:
    """Dense-or-quantized dispatch: the model's single matmul entry.
    ``x`` may be a :class:`PrequantAct` (int8 weights only)."""
    prequant = None
    if isinstance(x, PrequantAct):
        prequant, x = x, x.x8
    if isinstance(w, QuantizedLinear):
        k_dim, n = w.w_q.shape
        w_dtype = str(w.w_q.dtype)
        x_dtype = "bfloat16" if prequant is not None else str(x.dtype)
        return _qmm_launch(
            x, w, prequant,
            t_p2=next_power_of_2(x.shape[0]), k_dim=k_dim, n=n,
            w_dtype=w_dtype, x_dtype=x_dtype,
            a8=(a8 or prequant is not None)
            and _a8_supported(w_dtype, x_dtype),
        )
    if prequant is not None:
        x = (
            prequant.x8.astype(jnp.float32) * prequant.sx
        ).astype(jnp.bfloat16)
    return x @ w
