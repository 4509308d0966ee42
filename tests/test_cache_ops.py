"""reshape_and_cache vs the numpy oracle (incl. quantize-on-write + pad skip)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_triton_backend_tpu.ops.pallas.cache_ops import reshape_and_cache
from vllm_triton_backend_tpu.ops.refs import ref_reshape_and_cache


@pytest.mark.parametrize("with_pad", [False, True])
def test_reshape_and_cache_matches_ref(with_pad):
    rng = np.random.default_rng(0)
    Hkv, B, bs, hd, T = 2, 8, 16, 64, 10
    k_cache = np.zeros((Hkv, B, bs, hd), np.float32)
    v_cache = np.zeros_like(k_cache)
    key = rng.standard_normal((T, Hkv, hd)).astype(np.float32)
    value = rng.standard_normal((T, Hkv, hd)).astype(np.float32)
    slots = rng.choice(B * bs, size=T, replace=False).astype(np.int32)
    if with_pad:
        slots[3] = -1
        slots[7] = -1

    ref_k, ref_v = ref_reshape_and_cache(
        key, value, k_cache.copy(), v_cache.copy(), slots
    )
    out_k, out_v = reshape_and_cache(
        jnp.asarray(key), jnp.asarray(value),
        jnp.asarray(k_cache), jnp.asarray(v_cache), jnp.asarray(slots),
    )
    np.testing.assert_allclose(np.asarray(out_k), ref_k, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_v), ref_v, atol=1e-6)


def test_quantize_on_write_fp8():
    rng = np.random.default_rng(1)
    Hkv, B, bs, hd, T = 1, 4, 16, 64, 5
    k_cache = jnp.zeros((Hkv, B, bs, hd), jnp.float8_e4m3fn)
    v_cache = jnp.zeros_like(k_cache)
    key = rng.standard_normal((T, Hkv, hd)).astype(np.float32)
    value = rng.standard_normal((T, Hkv, hd)).astype(np.float32)
    slots = np.arange(T, dtype=np.int32)
    k_scale, v_scale = 0.5, 0.25
    out_k, out_v = reshape_and_cache(
        jnp.asarray(key), jnp.asarray(value), k_cache, v_cache,
        jnp.asarray(slots), k_scale=k_scale, v_scale=v_scale,
    )
    # dequantize-and-compare at fp8 tolerance (reference test.py:283-316)
    got_k = np.asarray(out_k.astype(jnp.float32))[0, 0, :T] * k_scale
    got_v = np.asarray(out_v.astype(jnp.float32))[0, 0, :T] * v_scale
    np.testing.assert_allclose(got_k, key[:, 0], atol=0.12, rtol=0.12)
    np.testing.assert_allclose(got_v, value[:, 0], atol=0.12, rtol=0.12)
