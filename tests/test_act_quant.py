"""Prefill activation-glue Pallas kernels (ops/pallas/act_quant).

Round-5 kernels replacing XLA fusions that ran 10-75x over the HBM
traffic floor in the pure-prefill step (docs/decode_step_profile.md):
per-token int8 prequant, fused act(gate)*up+quant, and rotate-half RoPE.
Each is checked against the exact XLA formulation it replaces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_triton_backend_tpu.ops.pallas.act_quant import (
    quant_rows,
    silu_mul_quant,
)
from vllm_triton_backend_tpu.ops.pallas.quant_linear import (
    PrequantAct,
    linear,
    quantize_weights,
)


def _xla_prequant(x):
    xf = np.asarray(x, np.float32)
    sx = np.maximum(np.abs(xf).max(1, keepdims=True), 1e-6) / 127.0
    # numpy rounds half-to-even like XLA
    return np.round(xf / sx).astype(np.int8), sx


@pytest.mark.parametrize("t,k", [(512, 256), (520, 384), (2048, 512)])
@pytest.mark.parametrize("dtype", ["bfloat16", "float32"])
def test_quant_rows_matches_xla_prequant(t, k, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(t, k)).astype(np.float32) * 3
    ).astype(dtype)
    x8, sx = quant_rows(x)
    assert x8.shape == (t, k) and sx.shape == (t, 1)
    ref8, refs = _xla_prequant(x)
    np.testing.assert_allclose(np.asarray(sx), refs, rtol=1e-6)
    # f32 division order may flip round-to-even ties by one LSB
    assert np.abs(np.asarray(x8, np.int32) - ref8).max() <= 1


def test_quant_rows_zero_row_floor():
    x = jnp.zeros((512, 256), jnp.bfloat16)
    x8, sx = quant_rows(x)
    assert np.all(np.asarray(x8) == 0)
    np.testing.assert_allclose(np.asarray(sx), 1e-6 / 127.0, rtol=1e-6)


@pytest.mark.parametrize("gelu", [False, True])
def test_silu_mul_quant_matches_xla_chain(gelu):
    rng = np.random.default_rng(1)
    t, inter = 260, 256
    gu = jnp.asarray(
        rng.normal(size=(t, 2 * inter)).astype(np.float32)
    ).astype(jnp.bfloat16)
    p8, sp = silu_mul_quant(gu, gelu=gelu)
    # the XLA chain it replaces (models/llama.py mlp + _prequant_tokens)
    act_fn = (
        lambda g: jax.nn.gelu(g, approximate=True)
    ) if gelu else jax.nn.silu
    gate = act_fn(gu[:, :inter].astype(jnp.float32))
    p = (gate.astype(jnp.bfloat16) * gu[:, inter:]).astype(jnp.float32)
    ref8, refs = _xla_prequant(np.asarray(p))
    # XLA's allow_excess_precision may skip the intermediate bf16
    # rounding of the product in either path — compare at bf16 ulp
    np.testing.assert_allclose(np.asarray(sp), refs, rtol=2 ** -8)
    assert np.abs(np.asarray(p8, np.int32) - ref8).max() <= 2


def test_prequant_act_feeds_linear():
    """PrequantAct through linear() matches quantize-then-a8-matmul."""
    rng = np.random.default_rng(2)
    t, k, n = 512, 256, 384
    x = jnp.asarray(
        rng.normal(size=(t, k)).astype(np.float32)
    ).astype(jnp.bfloat16)
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.1
    qw = quantize_weights(jnp.asarray(w), "int8")
    via_pq = np.asarray(
        linear(PrequantAct(*quant_rows(x)), qw), np.float32
    )
    direct = np.asarray(linear(x, qw, a8=True), np.float32)
    scale = np.abs(direct).max() + 1e-6
    assert np.abs(via_pq - direct).max() / scale < 2e-2
    assert via_pq.dtype == np.float32  # cast above; output was bf16


