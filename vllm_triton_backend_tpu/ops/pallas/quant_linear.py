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


def quantize_weights(w: jax.Array, dtype: str = "int8") -> QuantizedLinear:
    """Per-output-channel symmetric quantization of a dense [K, N] weight."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=0)  # [N]
    if dtype == "int8":
        scales = jnp.maximum(absmax / 127.0, 1e-8)
        q = jnp.clip(jnp.round(wf / scales), -127, 127).astype(jnp.int8)
    elif dtype in ("fp8", "float8_e4m3"):
        scales = jnp.maximum(absmax / 448.0, 1e-8)
        q = (wf / scales).astype(jnp.float8_e4m3fn)
    else:
        raise ValueError(f"unsupported quant dtype {dtype}")
    return QuantizedLinear(w_q=q, scales=scales)


def _qmm_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # dequant cast int8/fp8 -> the activation compute dtype: with bf16
    # activations (the production path), integers up to 256 and every
    # e4m3 value are exact in bf16 and bf16 x bf16 with f32 accumulation
    # runs the MXU at twice the f32 rate (VERDICT r1 item 7); f32
    # activations keep exact f32 math (CPU tests / explicit f32 runs).
    cdt = (
        jnp.float32 if x_ref.dtype == jnp.float32 else jnp.bfloat16
    )
    w = w_ref[...].astype(cdt)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...].astype(cdt), w,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k - 1)
    def _finish():
        o_ref[...] = (acc_ref[...] * s_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k"))
def quant_matmul(
    x: jax.Array,  # [T, K] activations (bf16/f32)
    qw: QuantizedLinear,  # w_q [K, N], scales [N]
    block_n: int = 512,
    block_k: int = 512,
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

    out = pl.pallas_call(
        functools.partial(_qmm_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_pad, block_k), lambda i, k: (0, k)),
            pl.BlockSpec((block_k, block_n), lambda i, k: (k, i)),
            pl.BlockSpec((1, block_n), lambda i, k: (0, i)),
        ],
        out_specs=pl.BlockSpec((t_pad, block_n), lambda i, k: (0, i)),
        out_shape=jax.ShapeDtypeStruct((t_pad, n_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((t_pad, block_n), jnp.float32)],
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
    )(xp, wp, sp)
    return out[:t, :n]


def _qmm_stacked_kernel(
    lyr_ref, x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int
):
    del lyr_ref  # consumed by the index maps
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    cdt = (
        jnp.float32 if x_ref.dtype == jnp.float32 else jnp.bfloat16
    )
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...].astype(cdt), w_ref[0].astype(cdt),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k - 1)
    def _finish():
        o_ref[...] = (acc_ref[...] * s_ref[0]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_n", "block_k")
)
def quant_matmul_stacked(
    x: jax.Array,  # [T, K] activations (bf16/f32)
    qw: QuantizedLinear,  # w_q [L, K, N] stacked, scales [L, N]
    layer_idx: jax.Array,  # scalar int32
    block_n: int = 512,
    block_k: int = 512,
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
    block_n = min(block_n, n)
    block_k = min(block_k, k_dim)
    assert n % block_n == 0 and k_dim % block_k == 0
    t_pad = round_up(t, 8)
    xp = jnp.pad(x, ((0, t_pad - t), (0, 0))) if t_pad != t else x
    sp = qw.scales.astype(jnp.float32).reshape(n_layers, 1, n)

    n_k = k_dim // block_k
    grid = (n // block_n, n_k)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_pad, block_k), lambda i, k, lyr: (0, k)),
            pl.BlockSpec(
                (1, block_k, block_n),
                lambda i, k, lyr: (lyr[0], k, i),
            ),
            pl.BlockSpec(
                (1, 1, block_n), lambda i, k, lyr: (lyr[0], 0, i)
            ),
        ],
        out_specs=pl.BlockSpec(
            (t_pad, block_n), lambda i, k, lyr: (0, i)
        ),
        scratch_shapes=[pltpu.VMEM((t_pad, block_n), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_qmm_stacked_kernel, n_k=n_k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, n), x.dtype),
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
        jnp.asarray(layer_idx, jnp.int32).reshape(1), xp, qw.w_q, sp
    )
    return out[:t]


def linear_at(x: jax.Array, w_stacked, layer_idx: jax.Array) -> jax.Array:
    """Layer-indexed matmul against STACKED weights [L, K, N] (used
    inside the decoder's layer scan)."""
    if isinstance(w_stacked, QuantizedLinear):
        k_dim, n = w_stacked.w_q.shape[1:]
        if n % 128 == 0 and k_dim % 256 == 0:
            bn = next(
                b for b in (512, 256, 128) if n % b == 0
            )
            bk = next(b for b in (512, 256) if k_dim % b == 0)
            return quant_matmul_stacked(
                x, w_stacked, layer_idx, block_n=bn, block_k=bk
            )
        sliced = QuantizedLinear(
            w_q=jax.lax.dynamic_index_in_dim(
                w_stacked.w_q, layer_idx, keepdims=False
            ),
            scales=jax.lax.dynamic_index_in_dim(
                w_stacked.scales, layer_idx, keepdims=False
            ),
        )
        return quant_matmul(x, sliced)
    return x @ jax.lax.dynamic_index_in_dim(
        w_stacked, layer_idx, keepdims=False
    )


def linear(x: jax.Array, w) -> jax.Array:
    """Dense-or-quantized dispatch: the model's single matmul entry."""
    if isinstance(w, QuantizedLinear):
        return quant_matmul(x, w)
    return x @ w
