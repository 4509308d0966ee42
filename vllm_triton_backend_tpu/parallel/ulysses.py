"""Ulysses-style sequence parallelism: all-to-all head<->sequence swap.

Complementary to ring attention (parallel/context.py): instead of rotating
KV around the ring, one ``all_to_all`` re-shards [seq-shard, all-heads] ->
[all-seq, head-shard], each chip computes full-sequence causal attention
for its head group, and a second ``all_to_all`` restores the sequence
sharding.  Two collectives total (vs P-1 ring steps) — the better choice
when heads >> chips and the sequence fits per-chip memory after the swap.

Run inside ``shard_map`` over a named axis; head count must be divisible
by the axis size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ulysses_prefill_attention(
    q: jax.Array,  # [C, Hq, hd] local sequence chunk, all heads
    k: jax.Array,  # [C, Hkv, hd]
    v: jax.Array,  # [C, Hkv, hd]
    axis_name: str,
    *,
    scale: float,
) -> jax.Array:
    """Causal prefill attention over sequence-sharded inputs (Ulysses)."""
    p = jax.lax.axis_size(axis_name)
    c, hq, hd = q.shape
    hkv = k.shape[1]
    assert hq % p == 0 and hkv % p == 0, "heads must divide the axis"
    qpk = hq // hkv

    # [C, H, hd] -> [P, C, H/P, hd] -> all_to_all -> [P, C, H/P, hd]
    # where afterwards axis 0 indexes SEQUENCE chunks (gathered) and the
    # head axis is the local shard.
    def seq_to_head(x):
        h = x.shape[1]
        xs = x.reshape(c, p, h // p, hd).transpose(1, 0, 2, 3)
        xs = jax.lax.all_to_all(
            xs, axis_name, split_axis=0, concat_axis=0, tiled=False
        )
        # [P, C, h/P, hd] -> [P*C, h/P, hd] (global sequence, local heads)
        return xs.reshape(p * c, h // p, hd)

    qh = seq_to_head(q).astype(jnp.float32)  # [T, Hq/P, hd]
    kh = seq_to_head(k).astype(jnp.float32)  # [T, Hkv/P, hd]
    vh = seq_to_head(v).astype(jnp.float32)

    kh = jnp.repeat(kh, qpk, axis=1)  # GQA expand to q heads
    vh = jnp.repeat(vh, qpk, axis=1)

    t = p * c
    scores = jnp.einsum("qhd,khd->qhk", qh, kh) * scale
    causal = (
        jnp.arange(t)[None, :] <= jnp.arange(t)[:, None]
    )  # [T, T]
    scores = jnp.where(causal[:, None, :], scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("qhk,khd->qhd", w, vh)  # [T, Hq/P, hd]

    # inverse all_to_all: [T, Hq/P, hd] -> local seq chunk, all heads
    outs = out.reshape(p, c, hq // p, hd)
    outs = jax.lax.all_to_all(
        outs, axis_name, split_axis=0, concat_axis=0, tiled=False
    )
    # axis 0 now indexes head shards: -> [C, Hq, hd]
    return (
        outs.transpose(1, 0, 2, 3).reshape(c, hq, hd).astype(q.dtype)
    )
