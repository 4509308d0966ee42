"""Mamba SSM kernels vs oracles (reference test_mamba_ssm analog,
scripts/benchmark.py:1507)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_triton_backend_tpu.ops.pallas.mamba import (
    selective_scan,
    selective_state_update,
)
from vllm_triton_backend_tpu.ops.refs import (
    ref_selective_scan,
    ref_selective_state_update,
)


def _ssu_case(
    batch=3,
    nheads=4,
    dim=16,
    dstate=128,
    ngroups=2,
    with_d=True,
    with_z=True,
    with_bias=True,
    softplus=True,
    num_slots=None,
    indices=None,
    seed=0,
):
    rng = np.random.default_rng(seed)
    num_slots = num_slots or batch
    state = rng.standard_normal(
        (num_slots, nheads, dim, dstate)
    ).astype(np.float32) * 0.3
    x = rng.standard_normal((batch, nheads, dim)).astype(np.float32)
    dt = rng.standard_normal((batch, nheads, dim)).astype(np.float32) * 0.5
    A = -np.abs(rng.standard_normal((nheads, dim, dstate))).astype(
        np.float32
    )
    B = rng.standard_normal((batch, ngroups, dstate)).astype(np.float32)
    C = rng.standard_normal((batch, ngroups, dstate)).astype(np.float32)
    D = (
        rng.standard_normal((nheads, dim)).astype(np.float32)
        if with_d else None
    )
    z = (
        rng.standard_normal((batch, nheads, dim)).astype(np.float32)
        if with_z else None
    )
    dtb = (
        rng.standard_normal((nheads, dim)).astype(np.float32) * 0.2
        if with_bias else None
    )

    ref_state = state.copy()
    ref_out = ref_selective_state_update(
        ref_state, x, dt, A, B, C, D, z, dtb,
        dt_softplus=softplus, state_batch_indices=indices,
    )
    out, new_state = selective_state_update(
        jnp.asarray(state), jnp.asarray(x), jnp.asarray(dt),
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(C),
        None if D is None else jnp.asarray(D),
        None if z is None else jnp.asarray(z),
        None if dtb is None else jnp.asarray(dtb),
        dt_softplus=softplus,
        state_batch_indices=(
            None if indices is None else jnp.asarray(indices, jnp.int32)
        ),
    )
    np.testing.assert_allclose(
        np.asarray(out), ref_out, atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(new_state), ref_state, atol=2e-3, rtol=1e-3
    )


def test_ssu_basic():
    _ssu_case()


def test_ssu_no_optional_inputs():
    _ssu_case(with_d=False, with_z=False, with_bias=False, softplus=False)


def test_ssu_mha_groups():
    _ssu_case(nheads=4, ngroups=4)


def test_ssu_paged_states_with_padding():
    # states live in a bigger pool; one pad row must be skipped untouched
    idx = np.asarray([5, -1, 2], np.int32)
    _ssu_case(batch=3, num_slots=8, indices=idx)


def test_selective_scan_matches_sequential():
    rng = np.random.default_rng(0)
    b, dim, t, dstate, ng = 2, 8, 24, 16, 2
    u = rng.standard_normal((b, dim, t)).astype(np.float32)
    delta = rng.standard_normal((b, dim, t)).astype(np.float32) * 0.4
    A = -np.abs(rng.standard_normal((dim, dstate))).astype(np.float32)
    B = rng.standard_normal((b, ng, dstate, t)).astype(np.float32)
    C = rng.standard_normal((b, ng, dstate, t)).astype(np.float32)
    D = rng.standard_normal(dim).astype(np.float32)
    z = rng.standard_normal((b, dim, t)).astype(np.float32)
    db = rng.standard_normal(dim).astype(np.float32) * 0.2
    h0 = rng.standard_normal((b, dim, dstate)).astype(np.float32) * 0.3

    ref_out, ref_h = ref_selective_scan(
        u, delta, A, B, C, D, z, db, True, h0
    )
    out, h = selective_scan(
        jnp.asarray(u), jnp.asarray(delta), jnp.asarray(A),
        jnp.asarray(B), jnp.asarray(C), jnp.asarray(D), jnp.asarray(z),
        jnp.asarray(db), True, jnp.asarray(h0),
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(h), ref_h, atol=2e-3, rtol=1e-3)


def test_scan_then_update_consistency():
    """Scanning T tokens == scanning T-1 then one state-update step."""
    rng = np.random.default_rng(1)
    b, nheads, dim, t, dstate = 2, 1, 8, 10, 16
    u = rng.standard_normal((b, dim, t)).astype(np.float32)
    delta = np.abs(rng.standard_normal((b, dim, t))).astype(np.float32)
    A = -np.abs(rng.standard_normal((dim, dstate))).astype(np.float32)
    B = rng.standard_normal((b, 1, dstate, t)).astype(np.float32)
    C = rng.standard_normal((b, 1, dstate, t)).astype(np.float32)

    full_out, full_h = selective_scan(
        jnp.asarray(u), jnp.asarray(delta), jnp.asarray(A),
        jnp.asarray(B), jnp.asarray(C),
    )
    part_out, part_h = selective_scan(
        jnp.asarray(u[..., :-1]), jnp.asarray(delta[..., :-1]),
        jnp.asarray(A), jnp.asarray(B[..., :-1]), jnp.asarray(C[..., :-1]),
    )
    # one decode step from the partial state
    out, new_state = selective_state_update(
        jnp.asarray(part_h).reshape(b, nheads, dim, dstate),
        jnp.asarray(u[..., -1]).reshape(b, nheads, dim),
        jnp.asarray(delta[..., -1]).reshape(b, nheads, dim),
        jnp.asarray(A).reshape(nheads, dim, dstate),
        jnp.asarray(B[:, :, :, -1]),
        jnp.asarray(C[:, :, :, -1]),
    )
    np.testing.assert_allclose(
        np.asarray(out).reshape(b, dim),
        np.asarray(full_out[..., -1]),
        atol=2e-3, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(new_state).reshape(b, dim, dstate),
        np.asarray(full_h),
        atol=2e-3, rtol=1e-3,
    )
