"""Context parallelism: KV sharded by sequence across chips.

SURVEY.md §5.7: the reference scales sequence length *within one GPU* via
split-KV kernels whose partials are merged by ``reduce_segments``
(triton_unified_attention.py:527-836).  Across chips the same
(max, expsum, acc) merge becomes sequence parallelism:

* ``cp_decode_attention`` — each chip runs the paged decode kernel over its
  local KV shard with ``return_partials=True``, then one tiny ``all_gather``
  of per-row (acc, m, l) partials (O(S * Hq * head) — independent of
  context length!) and a log-sum-exp merge.  This is mathematically
  identical to the reference's in-GPU ``reduce_segments``, lifted onto the
  ICI axis.
* ``ring_prefill_attention`` — classic ring attention for long-context
  prefill over dense per-chip KV chunks: KV shards rotate around the ring
  via ``ppermute`` while each chip folds the visiting chunk into its
  running flash partials; communication overlaps with the next chunk's
  compute under XLA's async collectives.

Both run inside ``shard_map`` over a named mesh axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_triton_backend_tpu.ops.pallas.common import MASK_VALUE
from vllm_triton_backend_tpu.ops.pallas.decode_attention import (
    paged_decode_attention,
)


def _merge_partials(acc, m, l, axis_name):
    """Cross-chip log-sum-exp merge of flash partials.

    ``acc [.., hd]`` unnormalized, ``m/l [..]`` running max/expsum per q
    row — mathematically the reference's ``reduce_segments``
    (triton_unified_attention.py:757-836) on the mesh axis; the gathered
    partials are O(rows * heads), independent of context length."""
    m_all = jax.lax.all_gather(m, axis_name)  # [P, ...]
    l_all = jax.lax.all_gather(l, axis_name)
    acc_all = jax.lax.all_gather(acc, axis_name)
    m_max = jnp.max(m_all, axis=0)
    alpha = jnp.exp(m_all - m_max[None])
    l_tot = jnp.sum(l_all * alpha, axis=0)
    acc_tot = jnp.sum(acc_all * alpha[..., None], axis=0)
    safe = jnp.where(l_tot == 0.0, 1.0, l_tot)
    return jnp.where(
        (l_tot == 0.0)[..., None], 0.0, acc_tot / safe[..., None]
    )


def cp_prefill_attention(
    q: jax.Array,  # [T, Hq, hd] flat ragged batch (replicated)
    kv_cache: jax.Array,  # [L, local_blocks, 2, Hkv, bs, hd] local shard
    layer_idx: jax.Array,
    query_start_loc: jax.Array,  # [S+1] GLOBAL
    seq_lens: jax.Array,  # [S] GLOBAL total kv lengths
    local_block_table: jax.Array,  # [S, pages_per_chip] local page ids
    axis_name: str,
    chunk_len: int,  # kv positions per chip (static)
    *,
    scale: float,
    max_query_len: int,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
) -> jax.Array:
    """Sequence-parallel prefill attention (call under shard_map).

    Chip ``c`` holds positions ``[c*chunk_len, (c+1)*chunk_len)`` of every
    sequence.  Each chip runs the paged prefill kernel over its local KV
    with shifted causal coordinates — ``seq_lens`` becomes the sequence's
    causal extent relative to this chip's window (may exceed the local
    length or go non-positive; ``kv_len_cap`` bounds what is actually
    present) — then one tiny all_gather merges the flash partials.
    """
    from vllm_triton_backend_tpu.ops.pallas.prefill_attention import (
        prefill_attention,
    )

    c = jax.lax.axis_index(axis_name)
    local_seq = seq_lens - c * chunk_len  # causal coordinate shift
    cap = jnp.clip(local_seq, 0, chunk_len)
    acc, m, l = prefill_attention(
        q, kv_cache, layer_idx, query_start_loc, local_seq,
        local_block_table,
        scale=scale, max_query_len=max_query_len, max_seq_len=chunk_len,
        k_scale=k_scale, v_scale=v_scale,
        kv_len_cap=cap, return_partials=True,
    )
    return _merge_partials(acc, m, l, axis_name).astype(q.dtype)


def cp_decode_attention(
    q: jax.Array,  # [S, Hq, hd] (replicated across the seq axis)
    kv_cache: jax.Array,  # [L, local_blocks, 2, Hkv, bs, hd] local shard
    layer_idx: jax.Array,  # scalar int32
    local_seq_lens: jax.Array,  # [S] kv tokens held by THIS chip
    local_block_table: jax.Array,  # [S, max_blocks] local page ids
    axis_name: str,
    *,
    scale: float,
    max_seq_len: int,  # per-chip kv bucket
    k_scale: float = 1.0,
    v_scale: float = 1.0,
) -> jax.Array:
    """Sequence-parallel paged decode attention (call under shard_map)."""
    acc, m, l = paged_decode_attention(
        q, kv_cache, layer_idx, local_seq_lens, local_block_table,
        scale=scale, max_seq_len=max_seq_len,
        k_scale=k_scale, v_scale=v_scale,
        return_partials=True,
    )
    # gather tiny per-row partials across the sequence axis
    m_all = jax.lax.all_gather(m, axis_name)  # [P, S, Hq]
    l_all = jax.lax.all_gather(l, axis_name)
    acc_all = jax.lax.all_gather(acc, axis_name)  # [P, S, Hq, hd]

    m_max = jnp.max(m_all, axis=0)  # [S, Hq]
    alpha = jnp.exp(m_all - m_max[None])  # [P, S, Hq]
    l_tot = jnp.sum(l_all * alpha, axis=0)  # [S, Hq]
    acc_tot = jnp.sum(acc_all * alpha[..., None], axis=0)  # [S, Hq, hd]
    safe = jnp.where(l_tot == 0.0, 1.0, l_tot)
    out = jnp.where(
        (l_tot == 0.0)[..., None], 0.0, acc_tot / safe[..., None]
    )
    return out.astype(q.dtype)


def _chunk_flash_update(q, k, v, scale, mask, m, l, acc):
    """Fold one KV chunk into running flash partials (f32)."""
    s = jnp.einsum("qhd,khd->qhk", q, k) * scale  # [Q, H, K]
    s = jnp.where(mask[:, None, :], s, MASK_VALUE)
    m_cur = jnp.max(s, axis=-1)  # [Q, H]
    m_new = jnp.maximum(m, m_cur)
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new[..., None])
    p = jnp.where(mask[:, None, :], p, 0.0)
    l_new = l * alpha + jnp.sum(p, axis=-1)
    acc_new = acc * alpha[..., None] + jnp.einsum("qhk,khd->qhd", p, v)
    return m_new, l_new, acc_new


def ring_prefill_attention(
    q: jax.Array,  # [C, Hq, hd] local query chunk (f32/bf16)
    k: jax.Array,  # [C, Hkv, hd] local key chunk
    v: jax.Array,  # [C, Hkv, hd] local value chunk
    axis_name: str,
    *,
    scale: float,
) -> jax.Array:
    """Causal ring attention over sequence-sharded dense K/V.

    Chip p owns positions [p*C, (p+1)*C).  Each of P ring steps the KV
    chunk moves to the next chip (``ppermute``) while the local flash
    partials fold in the visiting chunk, masked by absolute causality.
    """
    p_idx = jax.lax.axis_index(axis_name)
    p_total = jax.lax.axis_size(axis_name)
    c, num_q_heads, hd = q.shape
    num_kv_heads = k.shape[1]
    qpk = num_q_heads // num_kv_heads

    qf = q.astype(jnp.float32)
    q_pos = p_idx * c + jnp.arange(c)  # absolute q positions

    def expand(x):  # GQA: kv heads -> q heads
        return jnp.repeat(x.astype(jnp.float32), qpk, axis=1)

    m = jnp.full((c, num_q_heads), MASK_VALUE, jnp.float32)
    l = jnp.zeros((c, num_q_heads), jnp.float32)
    acc = jnp.zeros((c, num_q_heads, hd), jnp.float32)

    perm = [(i, (i + 1) % p_total) for i in range(p_total)]

    def body(step, carry):
        m, l, acc, k_cur, v_cur = carry
        # the visiting chunk originated on chip (p_idx - step) % P
        src = (p_idx - step) % p_total
        k_pos = src * c + jnp.arange(c)
        mask = k_pos[None, :] <= q_pos[:, None]  # [C, C] causal
        m, l, acc = _chunk_flash_update(
            qf, expand(k_cur), expand(v_cur), scale, mask, m, l, acc
        )
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return m, l, acc, k_nxt, v_nxt

    m, l, acc, _, _ = jax.lax.fori_loop(
        0, p_total, body, (m, l, acc, k, v)
    )
    safe = jnp.where(l == 0.0, 1.0, l)
    out = jnp.where((l == 0.0)[..., None], 0.0, acc / safe[..., None])
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Engine-facing CP forward (VERDICT r1 item 5: CP serves actual requests)
# ---------------------------------------------------------------------------

CACHE_SPEC_CP = None  # set lazily (PartitionSpec import kept local)


def make_cp_forward(cfg, mesh, extras, chunk_len: int):
    """Build the jitted context-parallel engine step.

    Mesh has one axis ``"seq"``; weights and the flat batch are
    replicated, the KV-cache blocks axis is sharded (each chip's chunk =
    its local page pool + trash page, as in the DP cache layout).
    Inputs mirror the single-chip forward; ``block_table`` follows the
    CPBlockAllocator virtual-table contract.  Returns
    ``(logits [T, vocab] replicated, kv_cache)``.
    """
    import jax.numpy as jnp  # noqa: F401 (kept for parity with siblings)
    from jax.sharding import PartitionSpec as P

    from vllm_triton_backend_tpu.models.llama import forward_fn
    from vllm_triton_backend_tpu.ops.metadata import AttentionMetadata

    cache_spec = P(None, "seq")

    def step(
        params, token_ids, positions, kv_cache,
        qsl, seq_lens, block_table, slot_mapping,
    ):
        meta = AttentionMetadata(
            query_start_loc=qsl,
            seq_lens=seq_lens,
            block_table=block_table,
            slot_mapping=slot_mapping,
            num_seqs=seq_lens.shape[0],
        )
        return forward_fn(
            params, cfg, token_ids, positions, kv_cache, meta, extras,
            cp_axis="seq", cp_chunk_len=chunk_len,
        )

    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(), P(), cache_spec, P(), P(), P(), P()),
        out_specs=(P(), cache_spec),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(3,))


def make_cp_mesh(num_chips: int, devices=None):
    import numpy as np
    from jax.sharding import Mesh

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices[:num_chips]), axis_names=("seq",))
