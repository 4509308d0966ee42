"""Unified attention dispatcher — the backend's forward entry point.

TPU analog of the reference's host-side dispatcher ``unified_attention``
(reference kernels/triton_unified_attention.py:839-1030): picks the decode
kernel when the batch is decode-only (max_query_len == 1) and the
prefill/mixed kernel otherwise, with a ``force_selection`` override for
benchmarking (the reference's force_selection 2/3 knob, :884,859).

Cache layout (fused, page-contiguous — see ops/pallas/cache_ops.py):
    ``kv_cache[L, num_blocks, 2, num_kv_heads, block_size, head_size]``

Also provides ``xla_paged_attention`` — a pure-XLA gather + masked-softmax
implementation.  It fills the role of the reference's baseline
implementations-under-test (reference scripts/callers/*, SURVEY.md §2.4
"baseline slots"): a correctness cross-check that runs on any backend, and
the slow baseline in benchmarks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vllm_triton_backend_tpu.ops.metadata import AttentionMetadata
from vllm_triton_backend_tpu.ops.pallas.decode_attention import (
    paged_decode_attention,
)
from vllm_triton_backend_tpu.ops.pallas.prefill_attention import (
    prefill_attention,
)


def unified_attention(
    q: jax.Array,  # [num_tokens, num_q_heads, head_size]
    kv_cache: jax.Array,  # [L, num_blocks, 2, Hkv, block_size, head_size]
    layer_idx: jax.Array,  # scalar int32
    metadata: AttentionMetadata,
    *,
    scale: float,
    max_query_len: int,
    max_seq_len: int,
    sliding_window: int = 0,
    logits_soft_cap: float = 0.0,
    alibi_slopes: jax.Array | None = None,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
    local_chunk_size: int = 0,
    force_selection: str | None = None,  # "decode" | "prefill" | None
    mixed_prefill_rows: int = 0,
) -> jax.Array:
    """Attention over the paged cache for a flat (possibly mixed) batch.

    ``max_query_len``/``max_seq_len`` are static bucket bounds (Python ints);
    the actual per-sequence lengths come from ``metadata``.

    ``mixed_prefill_rows`` > 0 enables the SPLIT path for mixed batches
    (the reference's two-launch ``chunked_prefill_paged_decode`` design,
    legacy/triton_chunked_prefill_paged_decode.py:28-117, re-derived for
    TPU): decode rows (query length 1) go through the decode kernel —
    whose 8-row-per-head tiles and page pipeline are engineered for
    them — and the at-most-``mixed_prefill_rows`` real prefill rows are
    COMPACTED into a small dense batch for the prefill kernel.  Without
    the split, every 1-token decode rider pays the prefill kernel's
    q-tile padding (measured: 124 riders at batch 128 made attention
    513 ms of a 972 ms mixed step).  The caller (engine) guarantees the
    true prefill-row count never exceeds this static bound.
    """
    use_decode = max_query_len == 1 if force_selection is None else (
        force_selection == "decode"
    )
    if (
        not use_decode
        and force_selection is None
        and mixed_prefill_rows > 0
    ):
        return _mixed_split_attention(
            q, kv_cache, layer_idx, metadata,
            scale=scale, max_query_len=max_query_len,
            max_seq_len=max_seq_len, sliding_window=sliding_window,
            logits_soft_cap=logits_soft_cap, alibi_slopes=alibi_slopes,
            k_scale=k_scale, v_scale=v_scale,
            local_chunk_size=local_chunk_size,
            num_prefill_rows=mixed_prefill_rows,
        )
    if use_decode:
        # one token per sequence: token order == sequence order.  The
        # flat token batch may be padded BEYOND the seq-table length
        # (token bucket > max_num_seqs) — slice to the sequence rows so
        # the kernel never indexes past seq_lens/block_table, and pad
        # the padding rows back with zeros.
        num_seqs = metadata.seq_lens.shape[0]
        t = q.shape[0]
        out = paged_decode_attention(
            q[:num_seqs],
            kv_cache,
            layer_idx,
            metadata.seq_lens,
            metadata.block_table,
            scale=scale,
            max_seq_len=max_seq_len,
            sliding_window=sliding_window,
            logits_soft_cap=logits_soft_cap,
            alibi_slopes=alibi_slopes,
            k_scale=k_scale,
            v_scale=v_scale,
            local_chunk_size=local_chunk_size,
        )
        if t > num_seqs:
            out = jnp.concatenate(
                [out, jnp.zeros((t - num_seqs,) + out.shape[1:], out.dtype)]
            )
        return out
    return prefill_attention(
        q,
        kv_cache,
        layer_idx,
        metadata.query_start_loc,
        metadata.seq_lens,
        metadata.block_table,
        scale=scale,
        max_query_len=max_query_len,
        max_seq_len=max_seq_len,
        sliding_window=sliding_window,
        logits_soft_cap=logits_soft_cap,
        alibi_slopes=alibi_slopes,
        k_scale=k_scale,
        v_scale=v_scale,
        local_chunk_size=local_chunk_size,
    )


class MixedSplitPlan(NamedTuple):
    """Layer-invariant gather/scatter indices for the mixed SPLIT path.

    Everything here depends only on the step's metadata and static
    bounds — never on the layer — so the model's forward computes it
    ONCE (``plan_mixed_split``) and the 40-layer scan reuses it.
    Before the hoist these 8 s32[token-bucket] fusions re-ran per layer
    inside the scan: 5.4 ms of a 164 ms pure-prefill step (measured,
    docs/decode_step_profile.md round-5).
    """

    dec_take: jax.Array  # [S] flat token index of each row's 1st token
    dec_lens: jax.Array  # [S] seq_lens where qlen==1 else 0
    has_dec: jax.Array  # scalar bool — any real decode rider?
    pf_qsl: jax.Array  # [P+1] compact query_start_loc
    pf_seq_lens: jax.Array  # [P]
    pf_tbl: jax.Array  # [P, max_blocks]
    q2_take: jax.Array  # [T2] gather index into flat q
    pf_scatter: jax.Array  # [T2] flat index to write pf_out (== total -> drop)
    seq_of_t: jax.Array  # [total] row of each flat token
    # scalar bool: no decode riders AND the compaction is the identity
    # permutation (pure-prefill steps — the whole TTFT phase under
    # prefill-priority scheduling).  Lets the attention skip the q
    # gather + out scatter, which cost 6.3 ms/step at the 2048-token
    # prefill shape as near-identity [T, Hq, hd] row moves (measured,
    # docs/decode_step_profile.md round 5).
    identity: jax.Array


def plan_mixed_split(
    metadata: AttentionMetadata,
    total: int,
    num_prefill_rows: int,
    max_query_len: int,
) -> MixedSplitPlan:
    """Precompute the mixed-split compaction plan (see MixedSplitPlan)."""
    num_seqs = metadata.seq_lens.shape[0]
    P = min(num_prefill_rows, num_seqs)
    qsl = metadata.query_start_loc[: num_seqs + 1]
    q_lens = qsl[1:] - qsl[:-1]  # [S]
    is_pf = q_lens > 1

    dec_take = jnp.minimum(qsl[:-1], total - 1)
    dec_lens = jnp.where(q_lens == 1, metadata.seq_lens, 0)

    pf_rows = jnp.where(is_pf, size=P, fill_value=num_seqs - 1)[0]
    pf_valid = (
        jnp.arange(P, dtype=jnp.int32)
        < jnp.sum(is_pf.astype(jnp.int32))
    )
    pf_qlen = jnp.where(pf_valid, jnp.take(q_lens, pf_rows), 0)
    pf_start = jnp.take(qsl[:-1], pf_rows)  # original flat start
    pf_qsl = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(pf_qlen).astype(jnp.int32)]
    )  # [P+1] compact
    pf_seq_lens = jnp.where(
        pf_valid, jnp.take(metadata.seq_lens, pf_rows), 0
    )
    pf_tbl = jnp.take(metadata.block_table, pf_rows, axis=0)

    # compact flat q: T2 tokens; token t2 of compact row p comes from
    # original position pf_start[p] + (t2 - pf_qsl[p])
    T2 = min(total, P * max_query_len)
    t2 = jnp.arange(T2, dtype=jnp.int32)
    p_of = jnp.clip(
        jnp.searchsorted(pf_qsl, t2, side="right") - 1, 0, P - 1
    ).astype(jnp.int32)
    local = t2 - jnp.take(pf_qsl, p_of)
    src = jnp.take(pf_start, p_of) + local
    t2_valid = t2 < pf_qsl[P]
    q2_take = jnp.where(t2_valid, jnp.minimum(src, total - 1), 0)
    pf_scatter = jnp.where(t2_valid, src, total)

    t = jnp.arange(total, dtype=jnp.int32)
    seq_of_t = jnp.clip(
        jnp.searchsorted(qsl, t, side="right") - 1, 0, num_seqs - 1
    ).astype(jnp.int32)
    has_dec = jnp.any(dec_lens > 0)
    if T2 == total:
        # identity compaction: every real token maps to itself (tokens
        # past the last real prefill token are bucket padding whose
        # output is garbage on both paths)
        identity = jnp.logical_and(
            jnp.logical_not(has_dec),
            jnp.all(jnp.where(t2_valid, src == t2, True)),
        )
    else:
        identity = jnp.asarray(False)
    return MixedSplitPlan(
        dec_take=dec_take, dec_lens=dec_lens,
        has_dec=has_dec,
        pf_qsl=pf_qsl, pf_seq_lens=pf_seq_lens, pf_tbl=pf_tbl,
        q2_take=q2_take, pf_scatter=pf_scatter, seq_of_t=seq_of_t,
        identity=identity,
    )


def _mixed_split_attention(
    q: jax.Array,  # [num_tokens, num_q_heads, head_size]
    kv_cache: jax.Array,
    layer_idx: jax.Array,
    metadata: AttentionMetadata,
    *,
    scale: float,
    max_query_len: int,
    max_seq_len: int,
    sliding_window: int,
    logits_soft_cap: float,
    alibi_slopes: jax.Array | None,
    k_scale: float,
    v_scale: float,
    local_chunk_size: int,
    num_prefill_rows: int,  # static upper bound P
) -> jax.Array:
    """Two-launch mixed batch: decode kernel for qlen==1 rows, prefill
    kernel over a COMPACTED P-row sub-batch (see unified_attention).

    All shapes are static: P is a bucketed bound; compaction uses
    fixed-size gathers with masked-out fill rows (seq_len 0 rows cost
    one skipped grid step in either kernel).
    """
    total = q.shape[0]
    plan = metadata.mixed_plan
    if plan is None:  # direct callers / tests without the hoist
        plan = plan_mixed_split(
            metadata, total, num_prefill_rows, max_query_len
        )

    def _prefill(q2):
        return prefill_attention(
            q2, kv_cache, layer_idx, plan.pf_qsl, plan.pf_seq_lens,
            plan.pf_tbl,
            scale=scale, max_query_len=max_query_len,
            max_seq_len=max_seq_len,
            sliding_window=sliding_window,
            logits_soft_cap=logits_soft_cap,
            alibi_slopes=alibi_slopes, k_scale=k_scale, v_scale=v_scale,
            local_chunk_size=local_chunk_size,
        )  # [T2, Hq, hd]

    def _split(q):
        # ---- decode rows: their single token sits at qsl[i] ----
        dec_q = jnp.take(q, plan.dec_take, axis=0)  # [S, Hq, hd]

        def _run_decode(dec_q):
            return paged_decode_attention(
                dec_q, kv_cache, layer_idx, plan.dec_lens,
                metadata.block_table,
                scale=scale, max_seq_len=max_seq_len,
                sliding_window=sliding_window,
                logits_soft_cap=logits_soft_cap,
                alibi_slopes=alibi_slopes, k_scale=k_scale,
                v_scale=v_scale,
                local_chunk_size=local_chunk_size,
            ).astype(q.dtype)

        # mixed steps without riders take the identity branch below;
        # this cond only guards fill-row-only compositions inside _split
        # (e.g. direct callers without the hoisted plan)
        dec_out = jax.lax.cond(
            plan.has_dec, _run_decode,
            lambda dec_q: jnp.zeros(
                dec_q.shape[:1] + q.shape[1:], q.dtype
            ),
            dec_q,
        )  # [S, Hq, hd]

        # ---- prefill rows: compact to P rows ----
        pf_out = _prefill(jnp.take(q, plan.q2_take, axis=0))

        # ---- scatter both back to the flat token order ----
        out = jnp.take(dec_out, plan.seq_of_t, axis=0)  # decode rows
        out = out.at[plan.pf_scatter].set(
            pf_out.astype(out.dtype), mode="drop"
        )  # prefill rows overwrite their token ranges
        return out.astype(q.dtype)

    if plan.q2_take.shape[0] != total:
        return _split(q)
    # pure-prefill steps (the whole TTFT phase under prefill-priority
    # scheduling): the compaction is the identity permutation, so the
    # [T, Hq, hd] q gather + out scatter (6.3 ms/step at the 2048-token
    # shape, measured) are skipped and q feeds the kernel directly
    return jax.lax.cond(
        plan.identity,
        lambda q: _prefill(q).astype(q.dtype),
        _split,
        q,
    )


def xla_paged_attention(
    q: jax.Array,  # [num_tokens, num_q_heads, head_size]
    kv_cache: jax.Array,  # [L, num_blocks, 2, Hkv, block_size, head_size]
    layer_idx: jax.Array,
    metadata: AttentionMetadata,
    *,
    scale: float,
    max_query_len: int,
    max_seq_len: int,
    sliding_window: int = 0,
    logits_soft_cap: float = 0.0,
    alibi_slopes: jax.Array | None = None,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
    local_chunk_size: int = 0,
) -> jax.Array:
    """Pure-XLA paged attention (gathers KV contiguous; O(S * max_seq_len))."""
    total, num_q_heads, head_size = q.shape
    _, _, _, num_kv_heads, block_size, _hp = kv_cache.shape
    qpk = num_q_heads // num_kv_heads
    num_seqs = metadata.seq_lens.shape[0]
    num_blocks_needed = min(
        -(-max_seq_len // block_size), metadata.block_table.shape[1]
    )

    pages = metadata.block_table[:, :num_blocks_needed]  # [S, KB]
    layer = jax.lax.dynamic_index_in_dim(
        kv_cache, layer_idx, axis=0, keepdims=False
    )  # [B, 2, Hkv, bs, hd]
    kv = jnp.take(layer, pages.reshape(-1), axis=0)  # [S*KB, 2, Hkv, bs, hd]
    kv_len = num_blocks_needed * block_size

    def dq(x, sc):
        if x.dtype in (jnp.float32, jnp.bfloat16, jnp.float16):
            return x.astype(jnp.float32)
        return x.astype(jnp.float32) * sc

    kv = kv[..., :head_size].reshape(
        num_seqs, num_blocks_needed, 2, num_kv_heads, block_size, head_size
    )
    kg = dq(kv[:, :, 0], k_scale).transpose(0, 2, 1, 3, 4)
    vg = dq(kv[:, :, 1], v_scale).transpose(0, 2, 1, 3, 4)
    # -> [Hkv, S, kv_len, hd]
    kg = kg.reshape(num_seqs, num_kv_heads, kv_len, head_size).swapaxes(0, 1)
    vg = vg.reshape(num_seqs, num_kv_heads, kv_len, head_size).swapaxes(0, 1)

    # pack ragged q: [S, QPAD, Hq, hd]
    q_pad = max_query_len
    t = jnp.arange(total, dtype=jnp.int32)
    qsl = metadata.query_start_loc[: num_seqs + 1]
    seq_ids = jnp.clip(
        jnp.searchsorted(qsl, t, side="right") - 1, 0, num_seqs - 1
    ).astype(jnp.int32)
    local = t - qsl[seq_ids]
    qp = jnp.zeros((num_seqs, q_pad, num_q_heads, head_size), jnp.float32)
    qp = qp.at[seq_ids, local].set(q.astype(jnp.float32), mode="drop")
    qp = qp.reshape(num_seqs, q_pad, num_kv_heads, qpk, head_size)

    scores = jnp.einsum("sqhgd,hskd->shgqk", qp, kg) * scale
    if logits_soft_cap > 0.0:
        scores = logits_soft_cap * jnp.tanh(scores / logits_soft_cap)

    q_lens = qsl[1:] - qsl[:-1]  # [S]
    ctx = metadata.seq_lens - q_lens
    qpos = ctx[:, None] + jnp.arange(q_pad)[None, :]  # [S, QPAD]
    kpos = jnp.arange(kv_len)[None, :]  # [1, K]
    allowed = kpos[:, None, :] <= qpos[:, :, None]  # [S, QPAD, K]
    allowed &= kpos[:, None, :] < metadata.seq_lens[:, None, None]
    if sliding_window > 0:
        allowed &= (qpos[:, :, None] - kpos[:, None, :]) < sliding_window
    if local_chunk_size > 0:
        allowed &= (
            kpos[:, None, :] // local_chunk_size
            == qpos[:, :, None] // local_chunk_size
        )
    bias = jnp.where(allowed, 0.0, -jnp.inf)[:, None, None]  # [S,1,1,QPAD,K]
    if alibi_slopes is not None:
        slopes = alibi_slopes.reshape(num_kv_heads, qpk)
        dist = (kpos[:, None, :] - qpos[:, :, None]).astype(jnp.float32)
        bias = bias + (
            slopes[None, :, :, None, None] * dist[:, None, None, :, :]
        )
    scores = scores + bias
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - jax.lax.stop_gradient(jnp.where(jnp.isfinite(m), m, 0.0)))
    p = jnp.where(jnp.isfinite(scores), p, 0.0)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = jnp.where(denom > 0, p / jnp.maximum(denom, 1e-30), 0.0)
    out = jnp.einsum("shgqk,hskd->sqhgd", p, vg)
    out = out.reshape(num_seqs, q_pad, num_q_heads, head_size)
    return out[seq_ids, local].astype(q.dtype)


def xla_stickbreaking_decode(
    q: jax.Array,  # [num_seqs, num_q_heads, head_size]
    kv_cache: jax.Array,  # [L, num_blocks, 2, Hkv, block_size, head_pad]
    layer_idx: jax.Array,
    seq_lens: jax.Array,  # [num_seqs]
    block_table: jax.Array,  # [num_seqs, max_blocks]
    *,
    scale: float,
    max_seq_len: int,
    attend_current: bool = False,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
) -> jax.Array:
    """Stick-breaking paged decode attention (softmax-free variant).

    TPU counterpart of the reference's stick-breaking option in the fused
    GQA paged split-KV kernel (reference legacy/fused_gqa_paged/
    sb_jit_func.py:119-175; decode-only, fused_gqa_paged_splitkv.py:493).
    Weight of key j:  p_j = sigmoid(z_j) * prod_{k>j} (1 - sigmoid(z_k)),
    z = scale * q.k — evaluated in log space with an inclusive reverse
    cumsum of -softplus(z); masked keys contribute 0 to the log (i.e.
    factor 1), so padding never eats stick mass.  Unnormalized (mass not
    consumed by the last ``max_seq_len`` keys is dropped), hence no
    (max, expsum) state: partials across KV splits combine additively
    after scaling by exp of the later splits' total -softplus — the same
    shape as the reference's stick-breaking 2nd-stage reduction
    (fused_gqa_paged_splitkv.py:324).
    """
    num_seqs, num_q_heads, head_size = q.shape
    _, _, _, num_kv_heads, block_size, _hp = kv_cache.shape
    qpk = num_q_heads // num_kv_heads
    num_blocks_needed = min(
        -(-max_seq_len // block_size), block_table.shape[1]
    )

    pages = block_table[:, :num_blocks_needed]
    layer = jax.lax.dynamic_index_in_dim(
        kv_cache, layer_idx, axis=0, keepdims=False
    )
    kv = jnp.take(layer, pages.reshape(-1), axis=0)
    kv_len = num_blocks_needed * block_size

    def dq(x, sc):
        if x.dtype in (jnp.float32, jnp.bfloat16, jnp.float16):
            return x.astype(jnp.float32)
        return x.astype(jnp.float32) * sc

    kv = kv[..., :head_size].reshape(
        num_seqs, num_blocks_needed, 2, num_kv_heads, block_size, head_size
    )
    kg = dq(kv[:, :, 0], k_scale).transpose(0, 1, 3, 2, 4).reshape(
        num_seqs, kv_len, num_kv_heads, head_size
    )
    vg = dq(kv[:, :, 1], v_scale).transpose(0, 1, 3, 2, 4).reshape(
        num_seqs, kv_len, num_kv_heads, head_size
    )

    qr = q.astype(jnp.float32).reshape(
        num_seqs, num_kv_heads, qpk, head_size
    )
    z = jnp.einsum("shgd,skhd->shgk", qr, kg) * scale  # [S, Hkv, qpk, K]

    n_keys = seq_lens - (0 if attend_current else 1)  # [S]
    kpos = jnp.arange(kv_len, dtype=jnp.int32)
    valid = kpos[None, :] < n_keys[:, None]  # [S, K]
    valid = valid[:, None, None, :]
    log_om_beta = jnp.where(valid, -jax.nn.softplus(z), 0.0)
    # inclusive reverse cumsum: log p_j = z_j + sum_{k>=j} log(1-beta_k)
    suffix = jnp.cumsum(log_om_beta[..., ::-1], axis=-1)[..., ::-1]
    p = jnp.where(valid, jnp.exp(z + suffix), 0.0)
    out = jnp.einsum("shgk,skhd->shgd", p, vg)
    return out.reshape(num_seqs, num_q_heads, head_size).astype(q.dtype)
