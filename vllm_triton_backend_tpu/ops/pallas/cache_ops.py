"""Paged KV-cache write: scatter new token K/V into cache pages.

TPU-native equivalent of the reference's native CUDA op
``torch.ops._C_cache_ops.reshape_and_cache_flash`` with quantize-on-write
scales (reference backend/triton_attn.py:396-405; SURVEY.md §2.4).

Cache layout (fused, page-contiguous):
    ``kv_cache[L, num_blocks, 2, num_kv_heads, block_size, head_size]``
One page — K and V of every head — is one contiguous slab, the DMA unit of
the attention kernels.  The write is an XLA scatter of
``num_tokens x 2 x Hkv x head`` elements addressed by (layer, page, offset);
the decoder threads the cache through its layer-``scan`` carry, so the
scatter updates the donated buffer in place (no copy of the multi-GiB
cache — the first version returned per-layer caches as scan ys, which made
XLA materialize a full cache copy every step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_kv(x: jax.Array, scale, dtype) -> jax.Array:
    """Quantize-on-write: divide by scale, clip, cast (identity when the
    cache dtype matches the input)."""
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


def reshape_and_cache(
    kv_cache: jax.Array,  # [L, num_blocks, 2, Hkv, block_size, head]
    layer_idx: jax.Array,  # scalar int32
    key: jax.Array,  # [num_tokens, num_kv_heads, head_size]
    value: jax.Array,  # [num_tokens, num_kv_heads, head_size]
    slot_mapping: jax.Array,  # [num_tokens] int32; -1 = skip (pad)
    k_scale: jax.Array | float = 1.0,
    v_scale: jax.Array | float = 1.0,
) -> jax.Array:
    """Returns the updated kv_cache (in place when the buffer is donated).

    Padded slots (-1) are dropped — their page index is remapped out of
    bounds so ``mode="drop"`` skips them, the scatter analog of the
    reference's PAD_SLOT_ID skip.
    """
    n_layers, num_blocks, _, num_kv_heads, block_size, head_pad = (
        kv_cache.shape
    )
    dtype = kv_cache.dtype
    if key.shape[-1] != head_pad:  # cache head dim is lane-padded
        pad = ((0, 0), (0, 0), (0, head_pad - key.shape[-1]))
        key = jnp.pad(key, pad)
        value = jnp.pad(value, pad)
    upd = jnp.stack(
        (quantize_kv(key, k_scale, dtype), quantize_kv(value, v_scale, dtype)),
        axis=1,
    )  # [T, 2, Hkv, head_pad]
    pages = jnp.where(slot_mapping < 0, num_blocks, slot_mapping // block_size)
    offs = jnp.where(slot_mapping < 0, 0, slot_mapping % block_size)
    return kv_cache.at[layer_idx, pages, :, :, offs].set(upd, mode="drop")
