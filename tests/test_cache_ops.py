"""reshape_and_cache vs the numpy oracle (incl. quantize-on-write + pad skip)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_triton_backend_tpu.ops.pallas.cache_ops import reshape_and_cache
from vllm_triton_backend_tpu.ops.refs import ref_reshape_and_cache


@pytest.mark.parametrize("with_pad", [False, True])
def test_reshape_and_cache_matches_ref(with_pad):
    rng = np.random.default_rng(0)
    L, Hkv, B, bs, hd, T = 3, 2, 8, 16, 64, 10
    layer = 1
    # B usable pages + the reserved trash page (last)
    kv_cache = np.zeros((L, B + 1, 2, Hkv, bs, hd), np.float32)
    key = rng.standard_normal((T, Hkv, hd)).astype(np.float32)
    value = rng.standard_normal((T, Hkv, hd)).astype(np.float32)
    slots = rng.choice(B * bs, size=T, replace=False).astype(np.int32)
    if with_pad:
        slots[3] = -1
        slots[7] = -1

    ref = ref_reshape_and_cache(key, value, kv_cache[layer].copy(), slots)
    out = reshape_and_cache(
        jnp.asarray(kv_cache), jnp.int32(layer),
        jnp.asarray(key), jnp.asarray(value), jnp.asarray(slots),
    )
    # dead slots land in the trash page, which no block table references;
    # compare the usable pages against the oracle's dropped-slot semantics
    np.testing.assert_allclose(
        np.asarray(out)[layer, :B], ref[:B], atol=1e-6
    )
    # other layers untouched
    np.testing.assert_allclose(np.asarray(out)[0], 0.0)
    np.testing.assert_allclose(np.asarray(out)[2], 0.0)


def test_reshape_and_cache_run_path_matches_ref():
    """Large flat batch (> token-path threshold): scheduler-format slot
    mapping — per-sequence contiguous slot runs + trailing -1 padding."""
    rng = np.random.default_rng(2)
    L, Hkv, B, bs, hd = 2, 2, 32, 16, 64
    layer = 0
    kv_cache = np.zeros((L, B + 1, 2, Hkv, bs, hd), np.float32)
    # 3 sequences with ragged lengths over non-adjacent pages, then pad
    T = 128
    slots = np.full(T, -1, np.int32)
    t = 0
    for pages, start_off, n in (
        ([5, 9, 2], 3, 40),   # mid-page start, crosses two page bounds
        ([17, 11], 0, 20),
        ([30], 7, 9),         # single partial page
    ):
        for j in range(n):
            pos = start_off + j
            slots[t] = pages[pos // bs] * bs + pos % bs
            t += 1
    key = rng.standard_normal((T, Hkv, hd)).astype(np.float32)
    value = rng.standard_normal((T, Hkv, hd)).astype(np.float32)

    ref = ref_reshape_and_cache(key, value, kv_cache[layer].copy(), slots)
    out = reshape_and_cache(
        jnp.asarray(kv_cache), jnp.int32(layer),
        jnp.asarray(key), jnp.asarray(value), jnp.asarray(slots),
    )
    np.testing.assert_allclose(
        np.asarray(out)[layer, :B], ref[:B], atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(out)[1], 0.0)


def test_quantize_on_write_fp8():
    rng = np.random.default_rng(1)
    Hkv, B, bs, hd, T = 1, 4, 16, 64, 5
    kv_cache = jnp.zeros((1, B, 2, Hkv, bs, hd), jnp.float8_e4m3fn)
    key = rng.standard_normal((T, Hkv, hd)).astype(np.float32)
    value = rng.standard_normal((T, Hkv, hd)).astype(np.float32)
    slots = np.arange(T, dtype=np.int32)
    k_scale, v_scale = 0.5, 0.25
    out = reshape_and_cache(
        kv_cache, jnp.int32(0),
        jnp.asarray(key), jnp.asarray(value),
        jnp.asarray(slots), k_scale=k_scale, v_scale=v_scale,
    )
    # dequantize-and-compare at fp8 tolerance (reference test.py:283-316)
    outf = np.asarray(out.astype(jnp.float32))
    got_k = outf[0, 0, 0, 0, :T] * k_scale
    got_v = outf[0, 0, 1, 0, :T] * v_scale
    np.testing.assert_allclose(got_k, key[:, 0], atol=0.12, rtol=0.12)
    np.testing.assert_allclose(got_v, value[:, 0], atol=0.12, rtol=0.12)
