"""Pure-math reference oracles — the correctness contract for all kernels.

Numpy re-implementations (float32 accumulation) of the semantics the
reference encodes as PyTorch oracles (reference scripts/vllm_utils.py:
``ref_masked_attention`` :101-113, ``ref_single_query_cached_kv_attention``
:116-167, ``ref_multi_query_kv_attention`` :170-208, ``ref_prefix_prefill``
:211-374, ``ref_reshape_and_cache_flash`` :377-429).  These run on host and
are deliberately naive: gather pages token-by-token through the block table,
materialize the mask, softmax in f32.

Cache layout here is the TPU-native fused one (one page = one contiguous
DMA slab holding K and V of every head):
  kv_cache: [num_blocks, 2, num_kv_heads, block_size, head_size]
(the per-layer view of the model-level ``[L, ...]`` cache).
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
    kv_cache: np.ndarray,  # [num_blocks, 2, Hkv, bs, hd]
    block_row: np.ndarray,  # [max_blocks]
    seq_len: int,
    block_size: int,
):
    """Reconstruct contiguous K/V [seq_len, Hkv, hd] through the block table."""
    _, _, num_kv_heads, bs, hd = kv_cache.shape
    assert bs == block_size
    ks = np.empty((seq_len, num_kv_heads, hd), dtype=np.float32)
    vs = np.empty_like(ks)
    for pos in range(seq_len):
        page = int(block_row[pos // block_size])
        off = pos % block_size
        ks[pos] = kv_cache[page, 0, :, off, :].astype(np.float32)
        vs[pos] = kv_cache[page, 1, :, off, :].astype(np.float32)
    return ks, vs


def _build_mask(
    query_len: int,
    seq_len: int,
    sliding_window: int = 0,
    alibi_slopes: np.ndarray | None = None,
    num_heads: int = 1,
    local_chunk_size: int = 0,
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
    if local_chunk_size > 0:
        # chunked local attention (the reference's iRoPE local-attention
        # virtual batches, backend/triton_attn.py:156-190): a token only
        # attends within its own chunk
        allowed &= (kpos // local_chunk_size) == (qpos // local_chunk_size)
    mask = np.where(allowed, 0.0, -np.inf)[None]
    if alibi_slopes is not None:
        bias = (kpos - qpos).astype(np.float32)  # <= 0 where allowed
        mask = mask + alibi_slopes[:, None, None] * bias[None]
        mask = np.broadcast_to(mask, (num_heads, query_len, seq_len)).copy()
    return mask


def ref_paged_attention(
    q: np.ndarray,  # [total_tokens, num_q_heads, head]
    kv_cache: np.ndarray,  # [num_blocks, 2, Hkv, bs, hd]
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
    local_chunk_size: int = 0,
) -> np.ndarray:
    """Unified oracle: decode, full prefill, and chunked/prefix prefill.

    Assumes new tokens' K/V have already been written into the cache (the
    reference makes the same assumption: cache write happens before
    ``unified_attention``, backend/triton_attn.py:396,446).
    """
    num_q_heads = q.shape[1]
    num_kv_heads = kv_cache.shape[2]
    q_per_kv = num_q_heads // num_kv_heads
    block_size = kv_cache.shape[3]
    out = np.zeros_like(q, dtype=np.float32)
    n = num_seqs if num_seqs is not None else len(seq_lens)
    for i in range(n):
        q0, q1 = int(query_start_loc[i]), int(query_start_loc[i + 1])
        query_len = q1 - q0
        if query_len == 0:
            continue
        seq_len = int(seq_lens[i])
        ks, vs = gather_kv_for_seq(
            kv_cache, block_table[i], seq_len, block_size
        )
        ks = ks * k_scale
        vs = vs * v_scale
        # expand GQA kv heads to q heads
        ks = np.repeat(ks, q_per_kv, axis=1)
        vs = np.repeat(vs, q_per_kv, axis=1)
        mask = _build_mask(
            query_len, seq_len, sliding_window, alibi_slopes, num_q_heads,
            local_chunk_size,
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


def ref_selective_state_update(
    state: np.ndarray,  # [num_slots, nheads, dim, dstate] (mutated)
    x: np.ndarray,  # [batch, nheads, dim]
    dt: np.ndarray,
    A: np.ndarray,  # [nheads, dim, dstate]
    B: np.ndarray,  # [batch, ngroups, dstate]
    C: np.ndarray,
    D: np.ndarray | None = None,
    z: np.ndarray | None = None,
    dt_bias: np.ndarray | None = None,
    dt_softplus: bool = False,
    state_batch_indices: np.ndarray | None = None,
) -> np.ndarray:
    """Oracle for the single-token SSM recurrence (reference
    mamba_ssm.py:106-257 semantics, incl. PAD_SLOT_ID skip)."""
    batch, nheads, dim = x.shape
    dstate = state.shape[-1]
    ngroups = B.shape[1]
    hpg = nheads // ngroups
    if state_batch_indices is None:
        state_batch_indices = np.arange(batch)
    out = np.zeros((batch, nheads, dim), np.float32)
    for b in range(batch):
        slot = int(state_batch_indices[b])
        if slot < 0:
            continue
        for h in range(nheads):
            d_ = dt[b, h].astype(np.float64)
            if dt_bias is not None:
                d_ = d_ + dt_bias[h]
            if dt_softplus:
                d_ = np.where(d_ <= 20.0, np.log1p(np.exp(d_)), d_)
            a = A[h].astype(np.float64)  # [dim, dstate]
            bb = B[b, h // hpg].astype(np.float64)  # [dstate]
            c = C[b, h // hpg].astype(np.float64)
            s = state[slot, h].astype(np.float64)
            dA = np.exp(a * d_[:, None])
            s_new = s * dA + (d_ * x[b, h].astype(np.float64))[:, None] * bb
            state[slot, h] = s_new.astype(state.dtype)
            o = (s_new * c[None, :]).sum(axis=1)
            if D is not None:
                o = o + D[h].astype(np.float64) * x[b, h]
            if z is not None:
                zz = z[b, h].astype(np.float64)
                o = o * (zz / (1 + np.exp(-zz)))
            out[b, h] = o.astype(np.float32)
    return out


def ref_selective_scan(
    u: np.ndarray,  # [batch, dim, seqlen]
    delta: np.ndarray,
    A: np.ndarray,  # [dim, dstate]
    B: np.ndarray,  # [batch, ngroups, dstate, seqlen]
    C: np.ndarray,
    D: np.ndarray | None = None,
    z: np.ndarray | None = None,
    delta_bias: np.ndarray | None = None,
    delta_softplus: bool = False,
    initial_state: np.ndarray | None = None,
):
    """Sequential oracle for the multi-token scan (reference delegates to
    CUDA selective_scan_fwd; semantics per mamba_ssm.py:414-507)."""
    batch, dim, seqlen = u.shape
    dstate = A.shape[-1]
    ngroups = B.shape[1]
    dpg = dim // ngroups
    h = (
        initial_state.astype(np.float64).copy()
        if initial_state is not None
        else np.zeros((batch, dim, dstate), np.float64)
    )
    out = np.zeros((batch, dim, seqlen), np.float64)
    d_all = delta.astype(np.float64)
    if delta_bias is not None:
        d_all = d_all + delta_bias.astype(np.float64)[None, :, None]
    if delta_softplus:
        d_all = np.where(d_all <= 20.0, np.log1p(np.exp(d_all)), d_all)
    for t in range(seqlen):
        d_t = d_all[:, :, t]  # [b, dim]
        Bt = np.repeat(B[:, :, :, t].astype(np.float64), dpg, axis=1)
        Ct = np.repeat(C[:, :, :, t].astype(np.float64), dpg, axis=1)
        dA = np.exp(A.astype(np.float64)[None] * d_t[:, :, None])
        h = h * dA + (d_t * u[:, :, t].astype(np.float64))[:, :, None] * Bt
        out[:, :, t] = (h * Ct).sum(axis=2)
    if D is not None:
        out = out + D.astype(np.float64)[None, :, None] * u
    if z is not None:
        zf = z.astype(np.float64)
        out = out * (zf / (1 + np.exp(-zf)))
    return out.astype(np.float32), h.astype(np.float32)


def ref_reshape_and_cache(
    key: np.ndarray,  # [num_tokens, Hkv, hd]
    value: np.ndarray,
    kv_cache: np.ndarray,  # [num_blocks, 2, Hkv, bs, hd] (mutated)
    slot_mapping: np.ndarray,  # [num_tokens]
    k_scale: float = 1.0,
    v_scale: float = 1.0,
):
    """Scatter new token K/V into the paged cache (oracle for cache_ops).

    Reference semantics: ``reshape_and_cache_flash`` with quantize-on-write
    scales (reference backend/triton_attn.py:396-405; oracle
    scripts/vllm_utils.py:377-429).  Slots of PAD_SLOT_ID (-1) are skipped.
    """
    block_size = kv_cache.shape[3]
    for t, slot in enumerate(slot_mapping):
        slot = int(slot)
        if slot < 0:
            continue
        page, off = slot // block_size, slot % block_size
        kv_cache[page, 0, :, off, :] = (key[t] / k_scale).astype(
            kv_cache.dtype
        )
        kv_cache[page, 1, :, off, :] = (value[t] / v_scale).astype(
            kv_cache.dtype
        )
    return kv_cache


def ref_stickbreaking_decode(
    q: np.ndarray,  # [num_seqs, num_q_heads, head]
    kv_cache: np.ndarray,  # [num_blocks, 2, Hkv, bs, hd]
    seq_lens: np.ndarray,  # [num_seqs]
    block_table: np.ndarray,  # [num_seqs, max_blocks]
    scale: float,
    attend_current: bool = False,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
) -> np.ndarray:
    """Stick-breaking attention oracle (decode-only, paged cache).

    The reference ships stick-breaking as an optional variant of its fused
    GQA paged split-KV decode kernel (reference legacy/fused_gqa_paged/
    sb_jit_func.py:119-175, enabled via ``stickbreaking=True`` and asserted
    decode-only, fused_gqa_paged_splitkv.py:442,493).  Instead of softmax,
    attention mass is allocated by breaking a unit stick from the NEWEST
    key backwards:

        beta_j = sigmoid(scale * q.k_j)
        p_j    = beta_j * prod_{k > j} (1 - beta_k)

    computed stably in log space:  log p_j = z_j + sum_{k >= j} -softplus(z_k)
    (an inclusive reverse cumsum; note z - softplus(z) = log sigmoid(z)).
    There is no normalization — sum_j p_j <= 1, remaining mass is dropped.
    ``attend_current`` includes the in-flight token's own key (the
    reference's ATTEND_CURRENT constexpr; default excludes it).
    """
    num_seqs, num_q_heads, _ = q.shape
    num_kv_heads = kv_cache.shape[2]
    q_per_kv = num_q_heads // num_kv_heads
    block_size = kv_cache.shape[3]
    out = np.zeros_like(q, dtype=np.float32)
    for i in range(num_seqs):
        n = int(seq_lens[i]) - (0 if attend_current else 1)
        if n <= 0:
            continue
        ks, vs = gather_kv_for_seq(
            kv_cache, block_table[i], n, block_size
        )
        ks = np.repeat(ks * k_scale, q_per_kv, axis=1)  # [n, Hq, hd]
        vs = np.repeat(vs * v_scale, q_per_kv, axis=1)
        z = np.einsum(
            "hd,khd->hk", q[i].astype(np.float64), ks.astype(np.float64)
        ) * scale
        log_om_beta = -np.logaddexp(0.0, z)  # log(1 - sigmoid(z))
        suffix = np.cumsum(log_om_beta[:, ::-1], axis=1)[:, ::-1]  # incl.
        p = np.exp(z + suffix)  # [Hq, n]
        out[i] = np.einsum("hk,khd->hd", p, vs.astype(np.float64))
    return out.astype(q.dtype)
