"""Pure-math reference oracles — the correctness contract for all kernels.

Numpy re-implementations (float32 accumulation) of the semantics the
reference encodes as PyTorch oracles (reference scripts/vllm_utils.py:
``ref_masked_attention`` :101-113, ``ref_single_query_cached_kv_attention``
:116-167, ``ref_multi_query_kv_attention`` :170-208, ``ref_prefix_prefill``
:211-374, ``ref_reshape_and_cache_flash`` :377-429).  These run on host and
are deliberately naive: gather pages token-by-token through the block table,
materialize the mask, softmax in f32.

Cache layout here is the TPU-native one:
  k_cache, v_cache: [num_kv_heads, num_blocks, block_size, head_size]
"""

from __future__ import annotations

import numpy as np


def ref_masked_attention(
    q: np.ndarray,  # [num_q, num_heads, head]
    k: np.ndarray,  # [num_k, num_heads, head]
    v: np.ndarray,  # [num_k, num_heads, head]
    scale: float,
    mask: np.ndarray | None = None,  # [num_q, num_k] additive or bool
    logits_soft_cap: float = 0.0,
) -> np.ndarray:
    qf = q.astype(np.float64)
    kf = k.astype(np.float64)
    vf = v.astype(np.float64)
    scores = np.einsum("qhd,khd->hqk", qf, kf) * scale
    if logits_soft_cap > 0.0:
        scores = logits_soft_cap * np.tanh(scores / logits_soft_cap)
    if mask is not None:
        if mask.dtype == bool:
            scores = np.where(mask[None], scores, -np.inf)
        else:
            scores = scores + mask[None]
    scores = scores - scores.max(axis=-1, keepdims=True)
    p = np.exp(scores)
    denom = p.sum(axis=-1, keepdims=True)
    p = np.where(denom > 0, p / np.maximum(denom, 1e-30), 0.0)
    out = np.einsum("hqk,khd->qhd", p, vf)
    return out.astype(q.dtype)


def gather_kv_for_seq(
    k_cache: np.ndarray,  # [Hkv, num_blocks, bs, hd]
    v_cache: np.ndarray,
    block_row: np.ndarray,  # [max_blocks]
    seq_len: int,
    block_size: int,
):
    """Reconstruct contiguous K/V [seq_len, Hkv, hd] through the block table."""
    num_kv_heads, _, bs, hd = k_cache.shape
    assert bs == block_size
    ks = np.empty((seq_len, num_kv_heads, hd), dtype=np.float32)
    vs = np.empty_like(ks)
    for pos in range(seq_len):
        page = int(block_row[pos // block_size])
        off = pos % block_size
        ks[pos] = k_cache[:, page, off, :].astype(np.float32)
        vs[pos] = v_cache[:, page, off, :].astype(np.float32)
    return ks, vs


def _build_mask(
    query_len: int,
    seq_len: int,
    sliding_window: int = 0,
    alibi_slopes: np.ndarray | None = None,
    num_heads: int = 1,
) -> np.ndarray:
    """Additive mask [num_heads_or_1, query_len, seq_len].

    New token i sits at absolute position (seq_len - query_len + i) and may
    attend to absolute positions <= its own (causal over context + self),
    optionally limited to the last ``sliding_window`` positions (reference
    passes window as (w-1, 0), backend/triton_attn.py:314-317 — key allowed
    iff q_pos - k_pos < w).
    """
    ctx = seq_len - query_len
    qpos = ctx + np.arange(query_len)[:, None]
    kpos = np.arange(seq_len)[None, :]
    allowed = kpos <= qpos
    if sliding_window > 0:
        allowed &= (qpos - kpos) < sliding_window
    mask = np.where(allowed, 0.0, -np.inf)[None]
    if alibi_slopes is not None:
        bias = (kpos - qpos).astype(np.float32)  # <= 0 where allowed
        mask = mask + alibi_slopes[:, None, None] * bias[None]
        mask = np.broadcast_to(mask, (num_heads, query_len, seq_len)).copy()
    return mask


def ref_paged_attention(
    q: np.ndarray,  # [total_tokens, num_q_heads, head]
    k_cache: np.ndarray,  # [Hkv, num_blocks, bs, hd]
    v_cache: np.ndarray,
    query_start_loc: np.ndarray,  # [num_seqs+1]
    seq_lens: np.ndarray,  # [num_seqs]
    block_table: np.ndarray,  # [num_seqs, max_blocks]
    scale: float,
    num_seqs: int | None = None,
    sliding_window: int = 0,
    logits_soft_cap: float = 0.0,
    alibi_slopes: np.ndarray | None = None,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
) -> np.ndarray:
    """Unified oracle: decode, full prefill, and chunked/prefix prefill.

    Assumes new tokens' K/V have already been written into the cache (the
    reference makes the same assumption: cache write happens before
    ``unified_attention``, backend/triton_attn.py:396,446).
    """
    num_q_heads = q.shape[1]
    num_kv_heads = k_cache.shape[0]
    q_per_kv = num_q_heads // num_kv_heads
    block_size = k_cache.shape[2]
    out = np.zeros_like(q, dtype=np.float32)
    n = num_seqs if num_seqs is not None else len(seq_lens)
    for i in range(n):
        q0, q1 = int(query_start_loc[i]), int(query_start_loc[i + 1])
        query_len = q1 - q0
        if query_len == 0:
            continue
        seq_len = int(seq_lens[i])
        ks, vs = gather_kv_for_seq(
            k_cache, v_cache, block_table[i], seq_len, block_size
        )
        ks = ks * k_scale
        vs = vs * v_scale
        # expand GQA kv heads to q heads
        ks = np.repeat(ks, q_per_kv, axis=1)
        vs = np.repeat(vs, q_per_kv, axis=1)
        mask = _build_mask(
            query_len, seq_len, sliding_window, alibi_slopes, num_q_heads
        )
        out[q0:q1] = ref_masked_attention(
            q[q0:q1].astype(np.float32), ks, vs, scale,
            mask=mask[0] if (alibi_slopes is None) else None,
            logits_soft_cap=logits_soft_cap,
        ) if alibi_slopes is None else _ref_attention_per_head(
            q[q0:q1].astype(np.float32), ks, vs, scale, mask, logits_soft_cap
        )
    return out.astype(q.dtype)


def _ref_attention_per_head(q, k, v, scale, mask, logits_soft_cap):
    """Per-head additive-mask attention (used for ALiBi)."""
    scores = np.einsum("qhd,khd->hqk", q, k) * scale
    if logits_soft_cap > 0.0:
        scores = logits_soft_cap * np.tanh(scores / logits_soft_cap)
    scores = scores + mask
    scores = scores - scores.max(axis=-1, keepdims=True)
    p = np.exp(scores)
    denom = p.sum(axis=-1, keepdims=True)
    p = np.where(denom > 0, p / np.maximum(denom, 1e-30), 0.0)
    return np.einsum("hqk,khd->qhd", p, v)


def ref_reshape_and_cache(
    key: np.ndarray,  # [num_tokens, Hkv, hd]
    value: np.ndarray,
    k_cache: np.ndarray,  # [Hkv, num_blocks, bs, hd] (mutated)
    v_cache: np.ndarray,
    slot_mapping: np.ndarray,  # [num_tokens]
    k_scale: float = 1.0,
    v_scale: float = 1.0,
):
    """Scatter new token K/V into the paged cache (oracle for cache_ops).

    Reference semantics: ``reshape_and_cache_flash`` with quantize-on-write
    scales (reference backend/triton_attn.py:396-405; oracle
    scripts/vllm_utils.py:377-429).  Slots of PAD_SLOT_ID (-1) are skipped.
    """
    block_size = k_cache.shape[2]
    for t, slot in enumerate(slot_mapping):
        slot = int(slot)
        if slot < 0:
            continue
        page, off = slot // block_size, slot % block_size
        k_cache[:, page, off, :] = (key[t] / k_scale).astype(k_cache.dtype)
        v_cache[:, page, off, :] = (value[t] / v_scale).astype(v_cache.dtype)
    return k_cache, v_cache
