"""Mamba selective-SSM ops — Pallas TPU kernel + XLA scan.

TPU re-design of the reference's SSM pair (SURVEY.md §2.2):

* ``selective_state_update`` — single-token recurrence for decode
  (reference kernels/mamba_ssm.py:106-257): softplus-discretized dt,
  ``state' = state * exp(A*dt) + dt * B * x``, ``out = Σ_dstate state'*C
  (+ D*x) (* silu(z))``.  The *paged* state indirection
  (``state_batch_indices`` with PAD_SLOT_ID skip, mamba_ssm.py:174-179) —
  the SSM analog of the attention block table — is realized with a
  scalar-prefetch index map, exactly like the attention kernels' page
  gather.  Grid = (batch, heads); each program owns one [dim, dstate]
  state tile in VMEM (MXU/VPU-aligned for the standard mamba2 shapes
  dim=64, dstate=128).
* ``selective_scan`` — varlen multi-token prefill scan.  The reference
  delegates this to native CUDA (``ops.selective_scan_fwd``,
  mamba_ssm.py:487-501); the TPU-native equivalent is a first-order linear
  recurrence, expressed as ``jax.lax.associative_scan`` over time so XLA
  parallelizes it (log-depth) instead of a sequential loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_triton_backend_tpu.ops.pallas.common import use_interpret

PAD_SLOT_ID = -1


def _softplus(x):
    return jnp.where(x <= 20.0, jnp.log1p(jnp.exp(x)), x)


def _ssu_kernel(
    # scalar prefetch
    idx_ref,  # [batch] int32 state slot per batch row (SMEM)
    # inputs (per grid step)
    state_ref,  # [1, HB, dim, dstate] paged state (aliased output)
    x_ref,  # [1, HB, 1, dim]
    dt_ref,  # [1, HB, 1, dim]
    a_ref,  # [HB, dim, dstate]
    b_ref,  # [1, GB, 1, dstate]
    c_ref,  # [1, GB, 1, dstate]
    d_ref,  # [1, HB, 1, dim]
    z_ref,  # [1, HB, 1, dim]
    dtb_ref,  # [1, HB, 1, dim]
    # outputs
    ostate_ref,  # [1, HB, dim, dstate] (input_output_aliased to state)
    out_ref,  # [1, HB, 1, dim]
    *,
    dt_softplus: bool,
    has_d: bool,
    has_z: bool,
    has_dt_bias: bool,
    heads_per_group: int,
):
    """One grid step = one (batch row, HEAD BLOCK).

    Round-5 redesign: the first version's (batch, heads) grid moved one
    [dim, dstate] tile (32 KB at mamba2 shapes) per step — up to 8k
    grid steps whose fixed cost capped the kernel at ~130 GB/s
    (17% of the measured HBM ceiling).  Blocking HB heads per step
    amortizes the step cost over HB tiles in one DMA each way."""
    b = pl.program_id(0)
    slot = idx_ref[b]
    hb = state_ref.shape[1]

    x = x_ref[0, :, 0, :].astype(jnp.float32)  # [HB, dim]
    dt = dt_ref[0, :, 0, :].astype(jnp.float32)  # [HB, dim]
    if has_dt_bias:
        dt = dt + dtb_ref[0, :, 0, :].astype(jnp.float32)
    if dt_softplus:
        dt = _softplus(dt)
    a = a_ref[...].astype(jnp.float32)  # [HB, dim, dstate]
    bb = b_ref[0, :, 0, :].astype(jnp.float32)  # [GB, dstate]
    c = c_ref[0, :, 0, :].astype(jnp.float32)  # [GB, dstate]
    if heads_per_group > 1:
        bb = jnp.repeat(bb, heads_per_group, axis=0)[:hb]
        c = jnp.repeat(c, heads_per_group, axis=0)[:hb]

    state = state_ref[0].astype(jnp.float32)  # [HB, dim, dstate]
    da = jnp.exp(a * dt[:, :, None])  # [HB, dim, dstate]
    dbx = (dt * x)[:, :, None] * bb[:, None, :]  # [HB, dim, dstate]
    new_state = state * da + dbx

    out = jnp.sum(new_state * c[:, None, :], axis=2)  # [HB, dim]
    if has_d:
        out = out + d_ref[0, :, 0, :].astype(jnp.float32) * x
    if has_z:
        z = z_ref[0, :, 0, :].astype(jnp.float32)
        out = out * (z * jax.nn.sigmoid(z))

    # PAD_SLOT_ID rows write nothing (state untouched, out zeroed) —
    # reference mamba_ssm.py:174-179,213-215 skip semantics.
    live = slot >= 0

    @pl.when(live)
    def _():
        ostate_ref[0] = new_state.astype(ostate_ref.dtype)
        out_ref[0, :, 0, :] = out.astype(out_ref.dtype)

    @pl.when(jnp.logical_not(live))
    def _():
        ostate_ref[0] = state_ref[0]
        out_ref[0, :, 0, :] = jnp.zeros_like(out_ref[0, :, 0, :])


@functools.partial(
    jax.jit,
    static_argnames=("dt_softplus",),
    donate_argnames=("state",),
)
def selective_state_update(
    state: jax.Array,  # [num_slots, nheads, dim, dstate] paged states
    x: jax.Array,  # [batch, nheads, dim]
    dt: jax.Array,  # [batch, nheads, dim]
    A: jax.Array,  # [nheads, dim, dstate]
    B: jax.Array,  # [batch, ngroups, dstate]
    C: jax.Array,  # [batch, ngroups, dstate]
    D: jax.Array | None = None,  # [nheads, dim]
    z: jax.Array | None = None,  # [batch, nheads, dim]
    dt_bias: jax.Array | None = None,  # [nheads, dim]
    dt_softplus: bool = False,
    state_batch_indices: jax.Array | None = None,  # [batch] int32
) -> tuple[jax.Array, jax.Array]:
    """One decode step of the selective SSM over paged states.

    Returns ``(out [batch, nheads, dim], new_state)``.  ``state`` is
    donated and updated in place at ``state_batch_indices`` (identity
    mapping when None); PAD_SLOT_ID (-1) rows are skipped.
    """
    batch, nheads, dim = x.shape
    dstate = state.shape[-1]
    ngroups = B.shape[1]
    heads_per_group = nheads // ngroups

    if state_batch_indices is None:
        state_batch_indices = jnp.arange(batch, dtype=jnp.int32)

    has_d = D is not None
    has_z = z is not None
    has_dtb = dt_bias is not None
    f32 = jnp.float32
    zeros_hd = jnp.zeros((nheads, dim), f32)
    d_in = (D.astype(f32) if has_d else zeros_hd).reshape(1, nheads, 1, dim)
    dtb_in = (
        dt_bias.astype(f32) if has_dtb else zeros_hd
    ).reshape(1, nheads, 1, dim)
    z_in = (
        z.astype(f32) if has_z else jnp.zeros((batch, nheads, dim), f32)
    ).reshape(batch, nheads, 1, dim)

    # Head block: the largest divisor of nheads whose [HB, dim, dstate]
    # f32 state tile stays ~<=1 MiB (double-buffered in+out tiles plus A
    # and intermediates must fit scoped VMEM), aligned to the B/C group
    # structure (block spans whole groups, or divides one group).
    budget = (1024 * 1024) // max(1, dim * dstate * 4)
    hb = 1
    for cand in range(min(nheads, max(1, budget)), 0, -1):
        if nheads % cand:
            continue
        if cand % heads_per_group == 0 or heads_per_group % cand == 0:
            hb = cand
            break
    gb = max(1, hb // heads_per_group)

    kernel = functools.partial(
        _ssu_kernel,
        dt_softplus=dt_softplus,
        has_d=has_d,
        has_z=has_z,
        has_dt_bias=has_dtb,
        heads_per_group=heads_per_group,
    )

    def state_map(b, h, idx):
        # clamp pad rows to slot 0; the kernel skips the write
        return (jnp.maximum(idx[b], 0), h, 0, 0)

    def bh_map(b, h, idx):
        del idx
        return (b, h, 0, 0)

    def h_map(b, h, idx):
        del b, idx
        return (h, 0, 0)

    def hd_map(b, h, idx):
        # per-head [1, nheads, 1, dim] tensors (D, dt_bias broadcasts)
        del b, idx
        return (0, h, 0, 0)

    def group_map(b, h, idx):
        del idx
        return (b, (h * hb) // heads_per_group // gb, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch, nheads // hb),
        in_specs=[
            pl.BlockSpec((1, hb, dim, dstate), state_map),
            pl.BlockSpec((1, hb, 1, dim), bh_map),
            pl.BlockSpec((1, hb, 1, dim), bh_map),
            pl.BlockSpec((hb, dim, dstate), h_map),
            pl.BlockSpec((1, gb, 1, dstate), group_map),
            pl.BlockSpec((1, gb, 1, dstate), group_map),
            pl.BlockSpec((1, hb, 1, dim), hd_map),
            pl.BlockSpec((1, hb, 1, dim), bh_map),
            pl.BlockSpec((1, hb, 1, dim), hd_map),
        ],
        out_specs=[
            pl.BlockSpec((1, hb, dim, dstate), state_map),
            pl.BlockSpec((1, hb, 1, dim), bh_map),
        ],
    )

    new_state, out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(state.shape, state.dtype),
            jax.ShapeDtypeStruct((batch, nheads, 1, dim), x.dtype),
        ],
        input_output_aliases={1: 0},  # state (after prefetch arg) -> ostate
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=use_interpret(),
    )(
        state_batch_indices,
        state,
        x.reshape(batch, nheads, 1, dim),
        dt.reshape(batch, nheads, 1, dim),
        A,
        B.reshape(batch, ngroups, 1, dstate),
        C.reshape(batch, ngroups, 1, dstate),
        d_in,
        z_in,
        dtb_in,
    )
    return out.reshape(batch, nheads, dim), new_state


def selective_scan(
    u: jax.Array,  # [batch, dim, seqlen]
    delta: jax.Array,  # [batch, dim, seqlen]
    A: jax.Array,  # [dim, dstate]
    B: jax.Array,  # [batch, ngroups, dstate, seqlen]
    C: jax.Array,  # [batch, ngroups, dstate, seqlen]
    D: jax.Array | None = None,  # [dim]
    z: jax.Array | None = None,  # [batch, dim, seqlen]
    delta_bias: jax.Array | None = None,  # [dim]
    delta_softplus: bool = False,
    initial_state: jax.Array | None = None,  # [batch, dim, dstate]
) -> tuple[jax.Array, jax.Array]:
    """Multi-token selective scan (prefill).  Returns (out, final_state).

    Linear recurrence h_t = dA_t * h_{t-1} + dB_t, parallelized with
    ``associative_scan`` over time — the TPU-native stand-in for the
    reference's native CUDA ``selective_scan_fwd`` (mamba_ssm.py:487-501).
    """
    batch, dim, seqlen = u.shape
    ngroups = B.shape[1]
    dpg = dim // ngroups

    uf = u.astype(jnp.float32)
    d = delta.astype(jnp.float32)
    if delta_bias is not None:
        d = d + delta_bias.astype(jnp.float32)[None, :, None]
    if delta_softplus:
        d = _softplus(d)

    # expand groups to dim: B/C [batch, dim, dstate, seqlen]
    Bx = jnp.repeat(B.astype(jnp.float32), dpg, axis=1)
    Cx = jnp.repeat(C.astype(jnp.float32), dpg, axis=1)

    dA = jnp.exp(
        A.astype(jnp.float32)[None, :, :, None] * d[:, :, None, :]
    )  # [b, dim, dstate, t]
    dBu = d[:, :, None, :] * Bx * uf[:, :, None, :]

    if initial_state is not None:
        # fold h0 into the first step: h_1 = dA_1 h0 + dBu_1
        dBu = dBu.at[..., 0].add(
            dA[..., 0] * initial_state.astype(jnp.float32)
        )

    def combine(a, b):
        (a1, b1), (a2, b2) = a, b
        return (a1 * a2, b1 * a2 + b2)

    _, h = jax.lax.associative_scan(
        combine, (dA, dBu), axis=-1
    )  # h: [b, dim, dstate, t]

    out = jnp.sum(h * Cx, axis=2)  # [b, dim, t]
    if D is not None:
        out = out + D.astype(jnp.float32)[None, :, None] * uf
    if z is not None:
        zf = z.astype(jnp.float32)
        out = out * (zf * jax.nn.sigmoid(zf))
    return out.astype(u.dtype), h[..., -1].astype(jnp.float32)
