"""W8A8 activation-prequant kernels for the prefill phase.

Round-5 profiling of the pure-prefill engine step (granite W8A8, 2048
tokens, docs/decode_step_profile.md) found the step's non-matmul budget
dominated by XLA fusions running 10-30x over the HBM bandwidth floor:

* the a8 quantize chain of the down-proj input — row-amax over the
  [2048, 25600] gate|up output (3.9 ms) + the silu*mul*quantize fusion
  (5.2 ms) — against a ~0.2 ms traffic floor;
* the per-matmul activation quantize fusions (0.6-1.8 ms each).

These are bandwidth-trivial elementwise/row-reduction ops; the fix is
small Pallas kernels that stream T-row blocks through VMEM once.  The
reference has no analog kernels (its Triton matmuls fuse activation
quantization into the GEMM prologue; on TPU the MXU kernel wants
pre-quantized int8 lanes, so the quantize lives in its own
bandwidth-bound pass).

All kernels are knob-free (no autotuned launch parameters): the grid is
a row-block sweep and the block shapes are fixed by dtype tiling.
Numerics mirror the XLA paths they replace (f32 compute, round-half-even
to int8, the same 1e-6 amax floor) so the oracle tolerances are
unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_triton_backend_tpu.ops.pallas.common import use_interpret
from vllm_triton_backend_tpu.utils import round_up

_AMAX_FLOOR = 1e-6

# XLA's scoped-vmem limit for custom calls is 16 MiB; stay under it with
# headroom for double-buffered blocks + the kernel's f32 temporaries
# (observed: block_t=128 over [T, 25600] hit 18.68M > 16M on v5e)
_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_block_t(row_bytes: int, want: int = 256) -> int:
    """Largest power-of-2 row-block (>= 16, bf16 sublane quantum) whose
    double-buffered blocks + temporaries fit the scoped-vmem budget."""
    bt = want
    while bt > 16 and bt * row_bytes > _VMEM_BUDGET:
        bt //= 2
    return bt


def _quant_rows_kernel(x_ref, x8_ref, sx_ref):
    xf = x_ref[...].astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    sx = jnp.maximum(amax, _AMAX_FLOOR) * (1.0 / 127.0)
    x8_ref[...] = jnp.round(xf / sx).astype(jnp.int8)
    sx_ref[...] = sx


@functools.partial(jax.jit, static_argnames=("block_t",))
def quant_rows(
    x: jax.Array,  # [T, K] bf16/f32
    block_t: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Per-token symmetric int8 quantization: (x8 [T, K], sx [T, 1] f32).

    Drop-in replacement for the XLA ``_prequant_tokens`` pass in
    ops/pallas/quant_linear.py (same numerics); used on prefill-size
    token batches where the XLA fusion ran ~30x over the traffic floor.
    """
    t, k = x.shape
    if block_t is None:
        # double-buffered in/out + the kernel's f32 temporaries
        block_t = _pick_block_t(k * (2 * x.dtype.itemsize + 2 + 8))
    t_pad = round_up(t, block_t)
    xp = jnp.pad(x, ((0, t_pad - t), (0, 0))) if t_pad != t else x
    x8, sx = pl.pallas_call(
        _quant_rows_kernel,
        grid=(t_pad // block_t,),
        in_specs=[pl.BlockSpec((block_t, k), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((block_t, k), lambda i: (i, 0)),
            pl.BlockSpec((block_t, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, k), jnp.int8),
            jax.ShapeDtypeStruct((t_pad, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * t_pad * k,
            bytes_accessed=t_pad * k * (x.dtype.itemsize + 1) + 4 * t_pad,
            transcendentals=0,
        ),
        interpret=use_interpret(),
    )(xp)
    return x8[:t], sx[:t]


def _silu_mul_quant_kernel(gu_ref, p8_ref, sx_ref, *, inter, gelu):
    g = gu_ref[:, :inter].astype(jnp.float32)
    u = gu_ref[:, inter:]
    if gelu:
        act = jax.nn.gelu(g, approximate=True)
    else:
        act = jax.nn.silu(g)
    # mirror the XLA path's dtype chain exactly: the f32 activation is
    # rounded to the compute dtype and multiplied in bf16 before the
    # quantize pass re-reads it as f32 (llama.py mlp + _prequant_tokens)
    p = (act.astype(gu_ref.dtype) * u).astype(jnp.float32)
    amax = jnp.max(jnp.abs(p), axis=1, keepdims=True)
    sx = jnp.maximum(amax, _AMAX_FLOOR) * (1.0 / 127.0)
    p8_ref[...] = jnp.round(p / sx).astype(jnp.int8)
    sx_ref[...] = sx


@functools.partial(jax.jit, static_argnames=("gelu", "block_t"))
def silu_mul_quant(
    gu: jax.Array,  # [T, 2*inter] gate|up concat (bf16)
    gelu: bool = False,
    block_t: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """act(gate) * up fused with per-token int8 quantization.

    Consumes the gate|up-concat matmul output directly and produces the
    down-proj's pre-quantized input: (p8 [T, inter] int8, sx [T, 1] f32).
    Replaces the two slowest fusions of the W8A8 prefill step (row-amax
    over [T, 2I] + silu*mul*quantize: 9.1 ms -> traffic-bound).
    """
    t, two_i = gu.shape
    inter = two_i // 2
    if block_t is None:
        # dbl-buffered [bt, 2I] in + [bt, I] out + one f32 temp row
        block_t = _pick_block_t(
            two_i * 2 * gu.dtype.itemsize + inter * (2 + 4)
        )
    t_pad = round_up(t, block_t)
    gup = jnp.pad(gu, ((0, t_pad - t), (0, 0))) if t_pad != t else gu
    p8, sx = pl.pallas_call(
        functools.partial(
            _silu_mul_quant_kernel, inter=inter, gelu=gelu
        ),
        grid=(t_pad // block_t,),
        in_specs=[pl.BlockSpec((block_t, two_i), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((block_t, inter), lambda i: (i, 0)),
            pl.BlockSpec((block_t, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, inter), jnp.int8),
            jax.ShapeDtypeStruct((t_pad, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * t_pad * inter,
            bytes_accessed=t_pad * two_i * gu.dtype.itemsize
            + t_pad * inter + 4 * t_pad,
            transcendentals=t_pad * inter,
        ),
        interpret=use_interpret(),
    )(gup)
    return p8[:t], sx[:t]


# NOTE: a rotate-half RoPE kernel (per-head 64-lane sub-slices of a
# VMEM-resident T-block) was built and measured here in round 5: 274 us
# per [2048, 32, 128] call vs ~55 us for the XLA split/concat it meant
# to replace — the half-register lane slices defeat Mosaic's vectorizer.
# Removed after the measured negative result (docs/decode_step_profile.md).
