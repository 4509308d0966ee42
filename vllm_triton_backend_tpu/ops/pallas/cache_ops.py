"""Paged KV-cache write: scatter new token K/V into cache pages.

TPU-native equivalent of the reference's native CUDA op
``torch.ops._C_cache_ops.reshape_and_cache_flash`` with quantize-on-write
scales (reference backend/triton_attn.py:396-405; SURVEY.md §2.4).

Design note: on TPU this is expressed as an XLA scatter over the flattened
slot axis rather than a hand-written kernel.  The op moves
``2 * num_tokens * num_kv_heads * head_size`` elements; XLA lowers the
scatter to a dynamic-update at HBM bandwidth and — crucially — when the
cache buffers are donated it updates in place (no copy of the multi-GiB
cache).  A Pallas DMA kernel adds nothing here because there is no compute
to fuse beyond the dtype cast/scale, which XLA fuses into the scatter
already.  (Revisit if profiling shows otherwise.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reshape_and_cache(
    key: jax.Array,  # [num_tokens, num_kv_heads, head_size]
    value: jax.Array,  # [num_tokens, num_kv_heads, head_size]
    k_cache: jax.Array,  # [num_kv_heads, num_blocks, block_size, head_size]
    v_cache: jax.Array,
    slot_mapping: jax.Array,  # [num_tokens] int32; -1 = skip (pad)
    k_scale: jax.Array | float = 1.0,
    v_scale: jax.Array | float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Returns the updated (k_cache, v_cache).

    Quantize-on-write: when the cache dtype is narrower than the input
    (fp8/int8), values are divided by the scale before the cast, matching
    the reference's k/v_scale semantics.  Padded slots (-1) are dropped —
    with ``mode="drop"`` negative indices are treated as out-of-bounds, the
    scatter analog of the reference's PAD_SLOT_ID skip.
    """
    num_kv_heads, num_blocks, block_size, head_size = k_cache.shape
    flat_k = k_cache.reshape(num_kv_heads, num_blocks * block_size, head_size)
    flat_v = v_cache.reshape(num_kv_heads, num_blocks * block_size, head_size)

    def quantize(x, scale, dtype):
        if dtype == x.dtype:
            return x
        x = x.astype(jnp.float32) / scale
        if jnp.issubdtype(dtype, jnp.integer):
            info = jnp.iinfo(dtype)
            x = jnp.clip(jnp.round(x), info.min, info.max)
        else:
            finfo = jnp.finfo(dtype)
            x = jnp.clip(x, float(finfo.min), float(finfo.max))
        return x.astype(dtype)

    k_q = quantize(key, k_scale, k_cache.dtype).swapaxes(0, 1)  # [Hkv, T, hd]
    v_q = quantize(value, v_scale, v_cache.dtype).swapaxes(0, 1)

    # Negative indices would wrap (numpy semantics); remap pad slots to an
    # out-of-bounds index so mode="drop" skips them.
    num_slots = num_blocks * block_size
    slots = jnp.where(slot_mapping < 0, num_slots, slot_mapping)
    flat_k = flat_k.at[:, slots, :].set(k_q, mode="drop")
    flat_v = flat_v.at[:, slots, :].set(v_q, mode="drop")
    return (
        flat_k.reshape(k_cache.shape),
        flat_v.reshape(v_cache.shape),
    )
