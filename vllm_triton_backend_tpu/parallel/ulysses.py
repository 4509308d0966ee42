"""Ulysses-style sequence parallelism: all-to-all head<->sequence swap.

Complementary to ring attention (parallel/context.py): instead of rotating
KV around the ring, one ``all_to_all`` re-shards [seq-shard, all-heads] ->
[all-seq, head-shard], each chip computes full-sequence causal attention
for its head group, and a second ``all_to_all`` restores the sequence
sharding.  Two collectives total (vs P-1 ring steps) — the better choice
when heads >> chips and the sequence fits per-chip memory after the swap.

Run inside ``shard_map`` over a named axis; head count must be divisible
by the axis size.

Status: a library-level building block (dense prefill over sequence-
sharded activations, flash-chunked — usable at long context).  The
ENGINE's sequence-parallel serving mode is ring/CP
(``ParallelConfig(context_parallel=N)``, parallel/context.py), which
integrates with the paged cache; Ulysses is the alternative collective
pattern for workloads where heads >> chips, exercised by
tests/test_parallel.py.
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

    from vllm_triton_backend_tpu.ops.pallas.common import MASK_VALUE
    from vllm_triton_backend_tpu.parallel.context import (
        _chunk_flash_update,
    )

    qh = seq_to_head(q).astype(jnp.float32)  # [T, Hq/P, hd]
    kh = seq_to_head(k).astype(jnp.float32)  # [T, Hkv/P, hd]
    vh = seq_to_head(v).astype(jnp.float32)

    kh = jnp.repeat(kh, qpk, axis=1)  # GQA expand to q heads
    vh = jnp.repeat(vh, qpk, axis=1)

    # chunked flash over the KV axis (reusing the ring-attention update,
    # context.py): O(T * chunk) score working set instead of a dense
    # [T, T] matrix — usable at the long contexts that motivate
    # sequence parallelism.  Chunk = the per-chip sequence chunk.
    t = p * c
    hql = qh.shape[1]
    q_pos = jnp.arange(t)
    m0 = jnp.full((t, hql), MASK_VALUE, jnp.float32)
    l0 = jnp.zeros((t, hql), jnp.float32)
    a0 = jnp.zeros((t, hql, hd), jnp.float32)

    kc = kh.reshape(p, c, hql, hd)
    vc = vh.reshape(p, c, hql, hd)

    def fold(carry, ck):
        m, l, acc = carry
        kj, vj, j = ck
        k_pos = j * c + jnp.arange(c)
        mask = k_pos[None, :] <= q_pos[:, None]  # [T, C]
        m, l, acc = _chunk_flash_update(
            qh, kj, vj, scale, mask, m, l, acc
        )
        return (m, l, acc), None

    (m, l, acc), _ = jax.lax.scan(
        fold, (m0, l0, a0),
        (kc, vc, jnp.arange(p)),
    )
    safe = jnp.where(l == 0.0, 1.0, l)
    out = jnp.where(
        (l == 0.0)[..., None], 0.0, acc / safe[..., None]
    )  # [T, Hq/P, hd]

    # inverse all_to_all: [T, Hq/P, hd] -> local seq chunk, all heads
    outs = out.reshape(p, c, hq // p, hd)
    outs = jax.lax.all_to_all(
        outs, axis_name, split_axis=0, concat_axis=0, tiled=False
    )
    # axis 0 now indexes head shards: -> [C, Hq, hd]
    return (
        outs.transpose(1, 0, 2, 3).reshape(c, hq, hd).astype(q.dtype)
    )
