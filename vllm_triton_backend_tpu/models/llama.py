"""Llama-family decoder (TinyLlama / Llama-2/3 / granite-3.x) — pure JAX.

TPU-first design notes (this layer has no reference counterpart to port —
the reference delegates model execution to vLLM's model runner, SURVEY.md §1
L5 — so the design is native JAX):

* **Stacked layer params + ``lax.scan``.** All decoder layers' weights are
  stacked along a leading layer axis and the layer loop is a single
  ``lax.scan`` — one traced layer body regardless of depth, so XLA compiles
  22- or 80-layer models in the time of one layer and the paged KV-cache
  ``[L, ...]`` arrays thread through as scan xs/ys.
* **Flat-token batch.** The forward consumes the scheduler's flat ragged
  token batch ``[num_tokens]`` plus :class:`AttentionMetadata` — the same
  contract the reference's attention backend consumes per step (reference
  backend/triton_attn.py:60-103) — so prefill, chunked prefill, and decode
  are all the same executable per (num_tokens, max_query_len) bucket.
* **bf16 matmuls, f32 norms/softmax.** MXU-friendly: weights and
  activations stay bf16; RMSNorm statistics and attention softmax run f32.
* Granite's scalar multipliers (embedding/residual/attention/logits,
  config.py) reduce to the Llama identity values of 1.0.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vllm_triton_backend_tpu.config import ModelConfig
from vllm_triton_backend_tpu.ops.attention import unified_attention
from vllm_triton_backend_tpu.ops.metadata import AttentionMetadata
from vllm_triton_backend_tpu.ops.pallas.cache_ops import reshape_and_cache
from vllm_triton_backend_tpu.ops.pallas.decode_attention import (
    paged_decode_append_attention,
)
from vllm_triton_backend_tpu.ops.pallas.quant_linear import (
    PrequantAct,
    QuantizedLinear,
    linear,
    linear_at,
    quantize_weights,
)

# Vocab-axis pad multiple for quantized lm_heads: divisor-rich (any TP
# degree <= 1024 shards it evenly) and wide enough that the matmul's tile
# snapping finds big N blocks (granite's 49155 -> 50176 = 49 * 1024).
LM_HEAD_PAD = 1024


class LayerParams(NamedTuple):
    """One decoder layer's weights; in the model pytree these are stacked
    with a leading ``[num_layers]`` axis for ``lax.scan``.

    The quantized path fuses projections to cut kernel launches (decode
    pays ~6 us of fixed cost per launch x 7 matmuls x num_layers):

    * ``qkv_proj`` ``[hidden, G*(qpk+2)*head]`` — grouped layout
      ``[G, qpk q-heads | k | v, head]`` per kv-head group ``G``.  The
      standard GQA head order (q heads ``g*qpk..`` serve kv head ``g``)
      IS the grouped order, so q slices out with a plain reshape and a
      contiguous split over ``G`` stays TP-shardable.
    * ``gate_up_proj`` ``[hidden, intermediate*2]`` — gate|up columns
      CONCATENATED (one launch for both projections; the unpack is two
      contiguous slices — see :func:`fuse_gate_up`).

    When fused fields are set the legacy per-projection fields are None
    (and vice versa); the dense path keeps the unfused fields so the
    TP/PP spec trees stay unchanged."""

    input_norm: jax.Array  # [hidden]
    q_proj: jax.Array  # [hidden, num_heads * head]
    k_proj: jax.Array  # [hidden, num_kv_heads * head]
    v_proj: jax.Array  # [hidden, num_kv_heads * head]
    o_proj: jax.Array  # [num_heads * head, hidden]
    post_attn_norm: jax.Array  # [hidden]
    gate_proj: jax.Array  # [hidden, intermediate]
    up_proj: jax.Array  # [hidden, intermediate]
    down_proj: jax.Array  # [intermediate, hidden]
    qkv_proj: Any = None  # fused quantized [hidden, G*(qpk+2)*head]
    gate_up_proj: Any = None  # fused quantized [hidden, inter*2]
    # Qwen2-family qkv bias, stored in the grouped FUSED column layout
    # [G*(qpk+2)*head] (same layout for the fused and per-projection
    # paths; stays dense under weight quantization)
    qkv_bias: Any = None
    # Mixture-of-Experts MLP (Mixtral-family; cfg.num_local_experts > 0):
    # router [hidden, E] replicated; expert ffn weights stacked on a
    # leading expert axis — gate|up concatenated like gate_up_proj.
    # Sharding the EXPERT axis over ``model`` is expert parallelism
    # (each shard computes its local experts' masked contributions and
    # one psum combines — fills SURVEY §2.6's EP row).  When set, the
    # dense gate/up/down fields are None.
    moe_router: Any = None  # [hidden, E]
    moe_gate_up: Any = None  # [E, hidden, 2*I] gate|up concat
    moe_down: Any = None  # [E, I, hidden]
    # gemma-2 sandwich norms (cfg.sandwich_norms): post_attn_norm then
    # applies to the ATTENTION OUTPUT (not the MLP input); these two
    # cover the pre-/post-feedforward positions
    pre_ffw_norm: Any = None  # [hidden]
    post_ffw_norm: Any = None  # [hidden]
    # Qwen3/Gemma-3 per-head q/k RMSNorm (applied before rope)
    q_norm: Any = None  # [head]
    k_norm: Any = None  # [head]


class LlamaParams(NamedTuple):
    embed: jax.Array  # [vocab, hidden]
    layers: LayerParams  # stacked: leading [num_layers] axis
    final_norm: jax.Array  # [hidden]
    lm_head: jax.Array  # [hidden, vocab] (embed.T if tied)


def init_params(cfg: ModelConfig, key: jax.Array) -> LlamaParams:
    """Random initialization (tests / benchmarks; real weights via hf.py)."""
    dtype = jnp.dtype(cfg.dtype)
    h, inter, hd = cfg.hidden_size, cfg.intermediate_size, cfg.head_size
    nl = cfg.num_layers
    keys = jax.random.split(key, 12)

    def init(k, shape, fan_in):
        return (
            jax.random.normal(k, shape, jnp.float32) * (fan_in**-0.5)
        ).astype(dtype)

    embed = init(keys[0], (cfg.vocab_size, h), h)
    moe = cfg.num_local_experts > 0
    e = cfg.num_local_experts
    layers = LayerParams(
        input_norm=jnp.ones((nl, h), dtype),
        q_proj=init(keys[1], (nl, h, cfg.num_heads * hd), h),
        k_proj=init(keys[2], (nl, h, cfg.num_kv_heads * hd), h),
        v_proj=init(keys[3], (nl, h, cfg.num_kv_heads * hd), h),
        o_proj=init(keys[4], (nl, cfg.num_heads * hd, h), cfg.num_heads * hd),
        post_attn_norm=jnp.ones((nl, h), dtype),
        gate_proj=None if moe else init(keys[5], (nl, h, inter), h),
        up_proj=None if moe else init(keys[6], (nl, h, inter), h),
        down_proj=None if moe else init(keys[7], (nl, inter, h), inter),
        moe_router=(
            init(keys[5], (nl, h, e), h) if moe else None
        ),
        moe_gate_up=(
            init(keys[6], (nl, e, h, 2 * inter), h) if moe else None
        ),
        moe_down=(
            init(keys[7], (nl, e, inter, h), inter) if moe else None
        ),
        qkv_bias=(
            fuse_qkv_bias(
                init(keys[9], (nl, cfg.num_heads * hd), h),
                init(keys[10], (nl, cfg.num_kv_heads * hd), h),
                init(keys[11], (nl, cfg.num_kv_heads * hd), h),
                cfg.num_kv_heads, hd,
            )
            if cfg.attention_bias else None
        ),
        pre_ffw_norm=(
            jnp.ones((nl, h), dtype) if cfg.sandwich_norms else None
        ),
        post_ffw_norm=(
            jnp.ones((nl, h), dtype) if cfg.sandwich_norms else None
        ),
        q_norm=jnp.ones((nl, hd), dtype) if cfg.qk_norm else None,
        k_norm=jnp.ones((nl, hd), dtype) if cfg.qk_norm else None,
    )
    lm_head = embed.T if cfg.tie_word_embeddings else init(
        keys[8], (h, cfg.vocab_size), h
    )
    return LlamaParams(
        embed=embed,
        layers=layers,
        final_norm=jnp.ones((h,), dtype),
        lm_head=lm_head,
    )


def _moe_mlp(lp, cfg: ModelConfig, x: jax.Array, dtype, tp_axis):
    """Mixtral-style sparse MLP (HF semantics: softmax over ALL experts
    -> top-k -> renormalize).  Each (local) expert runs a dense matmul
    over the whole token batch with a per-token routing weight mask —
    decode batches are weight-streaming-bound so the extra FLOPs are
    free; prefill pays E/k extra compute (v1; a megablox-style grouped
    matmul is the known upgrade).  With the expert axis sharded over
    ``tp_axis`` (expert parallelism) each shard computes its local
    experts and the caller psums the combine."""
    t, h = x.shape
    k = cfg.num_experts_per_tok
    probs = jax.nn.softmax(
        (x @ lp.moe_router).astype(jnp.float32), axis=-1
    )  # [T, E_global]
    topw, topi = jax.lax.top_k(probs, k)
    if cfg.moe_renormalize:
        topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    e_local = lp.moe_gate_up.shape[0]
    off = (
        jax.lax.axis_index(tp_axis) * e_local if tp_axis else 0
    )
    out = jnp.zeros((t, h), jnp.float32)
    for el in range(e_local):  # static unroll (E is small)
        ge = off + el
        w_t = jnp.sum(
            jnp.where(topi == ge, topw, 0.0), axis=-1
        )  # [T] f32
        gu = x @ lp.moe_gate_up[el]  # [T, 2*moe_inter] gate|up concat
        mi = gu.shape[-1] // 2
        act = (
            jax.nn.silu(gu[:, :mi].astype(jnp.float32)).astype(dtype)
            * gu[:, mi:]
        )
        out = out + (act @ lp.moe_down[el]).astype(
            jnp.float32
        ) * w_t[:, None]
    return out.astype(x.dtype)


def rms_norm(
    x: jax.Array, weight: jax.Array, eps: float,
    unit_offset: bool = False,
) -> jax.Array:
    """``unit_offset``: gemma stores RMSNorm weights as (w - 1) and
    applies (1 + w) — matmul in f32 like HF (the offset add happens in
    the norm's f32 domain)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    if unit_offset:
        return (
            normed * (1.0 + weight.astype(jnp.float32))
        ).astype(x.dtype)
    return normed.astype(x.dtype) * weight


def _rope_inv_freq(cfg: ModelConfig, base: float | None = None) -> jax.Array:
    """Rotary inverse frequencies, with optional llama3-style scaling.
    With ``base`` given (gemma-3 local-layer freq) the scaling config is
    NOT applied — HF applies rope_scaling to the global rope only."""
    hd = cfg.head_size
    inv_freq = 1.0 / (
        (base or cfg.rope_theta)
        ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd)
    )
    rs = None if base is not None else cfg.rope_scaling
    if isinstance(rs, tuple):
        rs = dict(rs)
    kind = rs and rs.get("rope_type", rs.get("type"))
    if kind == "linear":
        inv_freq = inv_freq / rs["factor"]
    elif kind == "yarn":
        # NTK-by-parts interpolation (transformers
        # _compute_yarn_parameters): low-freq dims interpolate by
        # 1/factor, high-freq dims extrapolate, linear ramp between.
        # The attention_factor is folded into cfg.attention_multiplier
        # at config time (hf.py) — scaling both q_rot and k_rot by s
        # equals scaling the attention scale by s^2.
        import math

        factor = rs["factor"]
        dim = hd
        b_fast = rs.get("beta_fast", 32.0)
        b_slow = rs.get("beta_slow", 1.0)
        orig = rs.get(
            "original_max_position_embeddings",
            cfg.max_position_embeddings,
        )
        theta = base or cfg.rope_theta

        def dim_for(rot):
            return (
                dim * math.log(orig / (rot * 2 * math.pi))
            ) / (2 * math.log(theta))

        low = max(math.floor(dim_for(b_fast)), 0)
        high = min(math.ceil(dim_for(b_slow)), dim // 2 - 1)
        ramp = jnp.clip(
            (jnp.arange(dim // 2, dtype=jnp.float32) - low)
            / max(high - low, 1e-3),
            0.0, 1.0,
        )
        extrap_mask = 1.0 - ramp
        inv_freq = (
            inv_freq / factor * (1.0 - extrap_mask)
            + inv_freq * extrap_mask
        )
    if kind == "llama3":
        factor = rs["factor"]
        low = rs["low_freq_factor"]
        high = rs["high_freq_factor"]
        old_ctx = rs["original_max_position_embeddings"]
        wavelen = 2 * jnp.pi / inv_freq
        smooth = (old_ctx / wavelen - low) / (high - low)
        smooth = jnp.clip(smooth, 0.0, 1.0)
        scaled = inv_freq / factor
        blended = (1 - smooth) * scaled + smooth * inv_freq
        inv_freq = jnp.where(
            wavelen > old_ctx / low,
            scaled,
            jnp.where(wavelen < old_ctx / high, inv_freq, blended),
        )
    return inv_freq


def apply_rope(
    x: jax.Array,  # [T, heads, head_size]
    positions: jax.Array,  # [T] int32
    inv_freq: jax.Array,  # [head_size // 2]
) -> jax.Array:
    if x.shape[0] >= 512:
        return rotate_half_mxu(x, *rope_cos_sin(positions, inv_freq))
    angles = positions[:, None].astype(jnp.float32) * inv_freq[None, :]
    cos = jnp.cos(angles)[:, None, :]  # [T, 1, hd/2]
    sin = jnp.sin(angles)[:, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate(
        (x1 * cos - x2 * sin, x2 * cos + x1 * sin), axis=-1
    )
    return out.astype(x.dtype)


def rope_cos_sin(
    positions: jax.Array, inv_freq: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Materialized (cos, sin) [T, 1, hd] for :func:`rotate_half_mxu`.

    The optimization barrier stops XLA from fusing these into the rope
    multiply-add — fused, the [T, 1, hd] broadcast is rematerialized
    PER ELEMENT, computing H x redundant transcendentals per token
    (measured ~3 ms/step at the 2048-token granite prefill shape)."""
    ang = positions[:, None].astype(jnp.float32) * inv_freq[None, :]
    ang2 = jnp.concatenate([ang, ang], axis=-1)
    return jax.lax.optimization_barrier(
        (jnp.cos(ang2)[:, None, :], jnp.sin(ang2)[:, None, :])
    )


def rotate_half_mxu(
    x: jax.Array,  # [T, H, hd]
    cs: jax.Array,  # [T, 1, hd] f32
    sn: jax.Array,  # [T, 1, hd] f32
) -> jax.Array:
    """Rotate-half RoPE with the rotation on the MXU.

    At prefill sizes the split/concat formulation costs ~8 ms/step at
    [2048, 32, 128] (the half-lane concat defeats XLA's tiled-layout
    assignment; a Pallas kernel measured even slower — per-head 64-lane
    sub-slices defeat Mosaic's vectorizer; both measured round 5).  The
    TPU answer: rotate-half IS a constant signed permutation, so run it
    on the MXU — rot(x) = x @ P with P[i+hd/2, i] = -1,
    P[i-hd/2, i] = +1 — and fold cos/sin as one fused multiply-add.
    The +-1 entries make the bf16 matmul exact, so numerics match the
    split/concat path bit for bit."""
    t, h, hd = x.shape
    hd2 = hd // 2
    perm = np.zeros((hd, hd), np.float32)
    perm[np.arange(hd2) + hd2, np.arange(hd2)] = -1.0
    perm[np.arange(hd2), np.arange(hd2) + hd2] = 1.0
    rot = jnp.dot(
        x.reshape(t * h, hd),  # free reshape (minor dims untouched)
        jnp.asarray(perm, x.dtype),
        preferred_element_type=jnp.float32,
    ).reshape(t, h, hd)
    return (x.astype(jnp.float32) * cs + rot * sn).astype(x.dtype)


class ForwardExtras(NamedTuple):
    """Static knobs threaded into the forward (hashable, jit-static)."""

    max_query_len: int
    max_seq_len: int
    k_scale: float = 1.0
    v_scale: float = 1.0
    # W8A8: run the layer projections' matmuls on the INT8 MXU with
    # in-kernel per-token/per-K-tile activation quantization (2x the bf16
    # rate on v5e).  The engine sets this only on prefill/mixed steps of
    # a model configured with quantization="int8-w8a8" — decode stays on
    # the bf16 dequant path (weight-read-bound; a8 buys nothing there).
    # The lm_head is never a8-quantized (logit numerics).
    w8a8: bool = False
    # > 0: static upper bound on the number of REAL prefill rows in a
    # mixed batch — enables the split attention path (decode rows via
    # the decode kernel + compacted prefill sub-batch; see
    # ops.attention.unified_attention).  The engine buckets the true
    # count up so each bucket compiles once.  0 = whole-batch prefill
    # kernel (pure prefill, or callers that never mix).
    mixed_prefill_rows: int = 0


def forward_fn(
    params: LlamaParams,
    cfg: ModelConfig,
    token_ids: jax.Array,  # [num_tokens] int32
    positions: jax.Array,  # [num_tokens] int32
    kv_cache: jax.Array,  # [L, num_blocks, 2, Hkv, block_size, head]
    metadata: AttentionMetadata,
    extras: ForwardExtras,
    tp_axis: str | None = None,
    logits_indices: jax.Array | None = None,
    cp_axis: str | None = None,
    cp_chunk_len: int = 0,
    tp_overlap: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """One engine step: embeds the flat token batch, runs all layers with
    paged-cache attention, returns (logits [T, vocab], kv_cache).

    ``logits_indices`` ([S] int32) gathers the rows to decode BEFORE the
    final norm + lm_head, so the vocab projection runs on S rows instead
    of the whole flat batch — on an 8B model a 2048-token prefill step
    saves an ~0.8 TFLOP matmul (and its [T, vocab] f32 buffer) that the
    sampler would discard anyway.

    The fused cache rides the layer-``scan`` **carry** — each layer scatters
    its new K/V at its layer index and the attention kernels address
    ``kv_cache[layer, page]`` directly via scalar prefetch.  (Threading
    per-layer caches as scan xs/ys instead makes XLA materialize a full
    cache copy every step — measured at 8 ms/step on TPU v5e for a 0.74 GB
    cache before this restructure.)

    With ``tp_axis`` set (inside ``shard_map`` over a mesh axis of that
    name), ``cfg`` must carry the *per-shard* head counts and the projection
    weights/caches must be the local shards; partial sums after o_proj and
    down_proj are reduced with ``psum`` over the axis and vocab-sharded
    logits are all-gathered (Megatron-style TP, SURVEY.md §2.6 build
    column).  The attention math itself needs no communication: each shard
    owns whole kv-head groups.

    With ``cp_axis`` set (context parallelism, SURVEY.md §5.7), the
    KV-cache blocks axis is sequence-sharded: chip ``c`` owns positions
    ``[c*cp_chunk_len, (c+1)*cp_chunk_len)`` of every sequence.
    ``metadata.block_table`` is the position-ordered VIRTUAL table of
    local page ids (runtime.block_allocator.CPBlockAllocator contract);
    each chip slices its own rows, writes only the tokens it owns, runs
    attention over its local KV shard, and merges flash partials over the
    axis (parallel/context.py).
    """
    dtype = jnp.dtype(cfg.dtype)
    hd = cfg.head_size
    inv_freq = _rope_inv_freq(cfg)

    def maybe_psum(x):
        return jax.lax.psum(x, tp_axis) if tp_axis else x

    def reduce_proj(lin, xin, w):
        """Row-parallel projection + cross-shard reduction.  With
        ``tp_overlap`` (dense weights only) the psum is decomposed into
        the ring reduce-scatter collective_matmul so communication hides
        under the chunked matmuls (parallel/sharded.py)."""
        if (
            tp_axis is not None and tp_overlap
            and not isinstance(w, QuantizedLinear)
        ):
            from vllm_triton_backend_tpu.parallel.sharded import (
                row_parallel_matmul_overlapped,
            )

            return row_parallel_matmul_overlapped(xin, w, tp_axis)
        return maybe_psum(lin(xin, w))

    x = params.embed[token_ids].astype(dtype)
    if cfg.embedding_multiplier != 1.0:
        x = x * cfg.embedding_multiplier

    # Quantized projections stay OUTSIDE the scan, addressed by layer
    # index inside the pallas kernel (quant_linear.linear_at): feeding a
    # per-layer dynamic-slice to an opaque pallas call makes XLA
    # materialize a full HBM copy of every weight every step.  Dense
    # weights ride the scan xs as before — XLA fuses those slices into
    # its own matmul fusions at no cost.
    layers = params.layers
    quantized = isinstance(
        layers.qkv_proj if layers.qkv_proj is not None else layers.q_proj,
        QuantizedLinear,
    )
    if (
        quantized
        and layers.gate_up_proj is not None
        and layers.gate_up_proj.w_q.ndim == 4
    ):
        # TP shards gate_up through its [L, K, 2, inter] view so every
        # shard keeps matched gate|up halves (parallel/sharded.py);
        # flatten the LOCAL shard back to the kernel's [L, K, N] layout
        # (contiguous — a free reshape)
        gu = layers.gate_up_proj
        L_, K_ = gu.w_q.shape[:2]
        layers = layers._replace(
            gate_up_proj=QuantizedLinear(
                w_q=gu.w_q.reshape(L_, K_, -1),
                scales=gu.scales.reshape(L_, -1),
            )
        )

    # Hoist the mixed-split compaction plan OUT of the layer scan: the
    # gather/scatter index math in ops.attention._mixed_split_attention
    # depends only on this step's metadata, but XLA does not hoist
    # loop-invariant code out of ``lax.scan`` — computed per layer it
    # cost 5.4 ms of a 164 ms pure-prefill step (measured, round 5).
    if (
        extras.max_query_len > 1
        and extras.mixed_prefill_rows > 0
        and cp_axis is None
    ):
        from vllm_triton_backend_tpu.ops.attention import plan_mixed_split

        metadata = metadata._replace(
            mixed_plan=plan_mixed_split(
                metadata, token_ids.shape[0],
                extras.mixed_prefill_rows, extras.max_query_len,
            )
        )

    # Hoist RoPE cos/sin out of the layer scan for prefill-size steps:
    # they depend only on positions (layer-invariant unless the model
    # uses per-layer frequencies) but XLA recomputes them inside every
    # scan iteration — and, fused, rematerializes the head broadcast
    # per element (see rope_cos_sin).
    rope_cache = None
    if (
        cfg.sliding_window_pattern is None
        and token_ids.shape[0] >= 512
    ):
        rope_cache = rope_cos_sin(positions, inv_freq)

    def layer_body(carry, xs, sw=cfg.sliding_window, freqs=None):
        inv = inv_freq if freqs is None else freqs
        h_in, kv = carry
        t = token_ids.shape[0]
        if quantized:
            in_norm, post_norm, slot, owns_kv, lidx = xs
            lp = layers._replace(
                input_norm=in_norm, post_attn_norm=post_norm
            )
            lin = functools.partial(
                linear_at, layer_idx=lidx, a8=extras.w8a8
            )
        else:
            # LayerParams slice, cache slot of this layer's KV, owner flag
            lp, slot, owns_kv = xs
            lin = functools.partial(linear, a8=extras.w8a8)

        normed = rms_norm(
            h_in, lp.input_norm, cfg.rms_norm_eps,
            cfg.norm_add_unit_offset,
        )
        qkv_bias = lp.qkv_bias
        if quantized and qkv_bias is not None:
            # quantized weights live outside the scan; the (tiny, dense)
            # bias stays stacked [L, ...] and is sliced per layer here
            qkv_bias = qkv_bias[lidx]
        if quantized and lp.q_norm is not None:
            lp = lp._replace(
                q_norm=lp.q_norm[lidx], k_norm=lp.k_norm[lidx]
            )
        if lp.qkv_proj is not None:
            grp = cfg.num_kv_heads
            qpk = cfg.num_heads // grp
            qkv = lin(normed, lp.qkv_proj)
            if qkv_bias is not None:
                qkv = qkv + qkv_bias
            qkv = qkv.reshape(t, grp, qpk + 2, hd)
            q = qkv[:, :, :qpk].reshape(t, cfg.num_heads, hd)
            k = qkv[:, :, qpk]
            v = qkv[:, :, qpk + 1]
        else:
            q = lin(normed, lp.q_proj).reshape(t, cfg.num_heads, hd)
            k = lin(normed, lp.k_proj).reshape(t, cfg.num_kv_heads, hd)
            v = lin(normed, lp.v_proj).reshape(t, cfg.num_kv_heads, hd)
            if qkv_bias is not None:
                grp = cfg.num_kv_heads
                qpk = cfg.num_heads // grp
                b = qkv_bias.reshape(grp, qpk + 2, hd)
                q = q + b[:, :qpk].reshape(cfg.num_heads, hd)
                k = k + b[:, qpk]
                v = v + b[:, qpk + 1]
        if lp.q_norm is not None:
            # per-head RMSNorm on the head dim (Qwen3/Gemma-3)
            q = rms_norm(
                q, lp.q_norm, cfg.rms_norm_eps, cfg.norm_add_unit_offset
            )
            k = rms_norm(
                k, lp.k_norm, cfg.rms_norm_eps, cfg.norm_add_unit_offset
            )
        if freqs is None and rope_cache is not None:
            q = rotate_half_mxu(q, *rope_cache)
            k = rotate_half_mxu(k, *rope_cache)
        else:
            q = apply_rope(q, positions, inv)
            k = apply_rope(k, positions, inv)

        # KV-sharing layers skip the cache write (slot -1 drops the
        # scatter rows; reference backend/triton_attn.py:393-395)
        write_slots = jnp.where(owns_kv, metadata.slot_mapping, -1)
        if cp_axis is not None:
            from vllm_triton_backend_tpu.parallel.context import (
                cp_decode_attention,
                cp_prefill_attention,
            )

            cidx = jax.lax.axis_index(cp_axis)
            bs = kv.shape[4]
            ppc = cp_chunk_len // bs
            # tokens whose position this chip owns; slots are local ids
            owner = (positions // cp_chunk_len) == cidx
            write_slots = jnp.where(owner, write_slots, -1)
            kv = reshape_and_cache(
                kv, slot, k, v, write_slots,
                extras.k_scale, extras.v_scale,
            )
            local_tbl = jax.lax.dynamic_slice_in_dim(
                metadata.block_table, cidx * ppc, ppc, axis=1
            )
            if extras.max_query_len == 1:
                local_lens = jnp.clip(
                    metadata.seq_lens - cidx * cp_chunk_len,
                    0, cp_chunk_len,
                )
                attn = cp_decode_attention(
                    q, kv, slot, local_lens, local_tbl, cp_axis,
                    scale=cfg.attn_scale, max_seq_len=cp_chunk_len,
                    k_scale=extras.k_scale, v_scale=extras.v_scale,
                )
            else:
                attn = cp_prefill_attention(
                    q, kv, slot, metadata.query_start_loc,
                    metadata.seq_lens, local_tbl, cp_axis, cp_chunk_len,
                    scale=cfg.attn_scale,
                    max_query_len=extras.max_query_len,
                    k_scale=extras.k_scale, v_scale=extras.v_scale,
                )
        elif extras.max_query_len == 1:
            # fused append-attend: the decode hot path folds the S
            # per-token cache writes (launch-bound DUS chains) into the
            # attention kernel — the current token's K/V is attended
            # in-register and DMA'd to its slot by the kernel itself
            # (write-then-attend parity: reference triton_attn.py:393-405)
            num_seqs = metadata.seq_lens.shape[0]
            attn_s, kv = paged_decode_append_attention(
                q[:num_seqs], k[:num_seqs], v[:num_seqs], kv, slot,
                owns_kv, metadata.seq_lens, metadata.block_table,
                write_slots[:num_seqs],
                scale=cfg.attn_scale,
                max_seq_len=extras.max_seq_len,
                sliding_window=sw or 0,
                logits_soft_cap=cfg.logits_soft_cap,
                k_scale=extras.k_scale,
                v_scale=extras.v_scale,
                local_chunk_size=cfg.attention_chunk_size or 0,
            )
            attn = (
                attn_s if t == num_seqs else jnp.concatenate(
                    [
                        attn_s,
                        jnp.zeros(
                            (t - num_seqs,) + attn_s.shape[1:],
                            attn_s.dtype,
                        ),
                    ]
                )
            )
        else:
            kv = reshape_and_cache(
                kv, slot, k, v, write_slots,
                extras.k_scale, extras.v_scale,
            )
            attn = unified_attention(
                q, kv, slot, metadata,
                scale=cfg.attn_scale,
                max_query_len=extras.max_query_len,
                max_seq_len=extras.max_seq_len,
                sliding_window=sw or 0,
                logits_soft_cap=cfg.logits_soft_cap,
                k_scale=extras.k_scale,
                v_scale=extras.v_scale,
                local_chunk_size=cfg.attention_chunk_size or 0,
                mixed_prefill_rows=extras.mixed_prefill_rows,
            )
        attn_out = reduce_proj(
            lin, attn.reshape(t, cfg.num_heads * hd), lp.o_proj
        )
        uo = cfg.norm_add_unit_offset
        if cfg.sandwich_norms:
            # gemma-2 block: post-attn norm applies to the SUBLAYER
            # OUTPUT before the residual; the MLP gets its own pre-norm
            attn_out = rms_norm(
                attn_out, lp.post_attn_norm, cfg.rms_norm_eps, uo
            )
            h_mid = h_in + attn_out * cfg.residual_multiplier
            normed2 = rms_norm(
                h_mid, lp.pre_ffw_norm, cfg.rms_norm_eps, uo
            )
        else:
            h_mid = h_in + attn_out * cfg.residual_multiplier
            normed2 = rms_norm(
                h_mid, lp.post_attn_norm, cfg.rms_norm_eps, uo
            )
        if lp.moe_router is not None:
            mlp = _moe_mlp(lp, cfg, normed2, dtype, tp_axis)
            if tp_axis is not None:  # EP combine across expert shards
                mlp = jax.lax.psum(mlp, tp_axis)
            h_out = h_mid + mlp * cfg.residual_multiplier
            return (h_out, kv), None
        act = (
            functools.partial(jax.nn.gelu, approximate=True)
            if cfg.hidden_act == "gelu_tanh" else jax.nn.silu
        )
        if lp.gate_up_proj is not None:
            gu = lin(normed2, lp.gate_up_proj)  # [T, 2*inter] gate|up
            mi = gu.shape[-1] // 2  # local inter under TP
            down_q = (
                lp.down_proj if isinstance(lp.down_proj, QuantizedLinear)
                else None
            )
            if (
                extras.w8a8
                and t >= 512
                and gu.dtype == jnp.bfloat16
                and down_q is not None
                and down_q.w_q.dtype == jnp.int8
                and cfg.hidden_act in ("silu", "gelu_tanh")
            ):
                # W8A8 prefill: act(gate)*up fused with the down-proj's
                # int8 prequant in one Pallas pass — the XLA amax +
                # silu*mul*quantize fusions over [T, 2*inter] cost
                # 9.1 ms of a 154 ms pure-prefill step (measured,
                # docs/decode_step_profile.md round 5)
                from vllm_triton_backend_tpu.ops.pallas.act_quant import (
                    silu_mul_quant,
                )

                pq = PrequantAct(*silu_mul_quant(
                    gu, gelu=cfg.hidden_act == "gelu_tanh"
                ))
                mlp = reduce_proj(lin, pq, lp.down_proj)
                if cfg.sandwich_norms:
                    mlp = rms_norm(
                        mlp, lp.post_ffw_norm, cfg.rms_norm_eps, uo
                    )
                h_out = h_mid + mlp * cfg.residual_multiplier
                return (h_out, kv), None
            gate = act(gu[:, :mi].astype(jnp.float32))
            up = gu[:, mi:]
        else:
            gate = act(
                lin(normed2, lp.gate_proj).astype(jnp.float32)
            )
            up = lin(normed2, lp.up_proj)
        mlp = reduce_proj(lin, gate.astype(dtype) * up, lp.down_proj)
        if cfg.sandwich_norms:
            mlp = rms_norm(mlp, lp.post_ffw_norm, cfg.rms_norm_eps, uo)
        h_out = h_mid + mlp * cfg.residual_multiplier
        return (h_out, kv), None

    slots, _ = cfg.kv_cache_slots()
    slots_arr = jnp.asarray(slots, jnp.int32)
    owns_arr = (
        jnp.ones(cfg.num_layers, bool) if cfg.kv_sharing is None
        else jnp.asarray(
            [s == l for l, s in enumerate(cfg.kv_sharing)], bool
        )
    )
    if quantized:
        scan_xs = (
            layers.input_norm, layers.post_attn_norm,
            slots_arr, owns_arr,
            jnp.arange(cfg.num_layers, dtype=jnp.int32),
        )
    else:
        scan_xs = (layers, slots_arr, owns_arr)
    pattern = cfg.sliding_window_pattern
    if pattern is None:
        (x, kv_cache), _ = jax.lax.scan(
            layer_body, (x, kv_cache), scan_xs
        )
    else:
        # Per-layer sliding-window PATTERN (gemma-2/3): the scan runs
        # over pattern-period layer BLOCKS with the period's bodies
        # unrolled inside, so each position keeps a STATIC window for
        # the attention kernels.  One traced block regardless of depth.
        period = len(pattern)
        assert cfg.num_layers % period == 0, (
            "num_layers must divide the sliding-window pattern period"
        )

        def reblock(a):
            return a.reshape(
                (cfg.num_layers // period, period) + a.shape[1:]
            )

        blocked_xs = jax.tree.map(reblock, scan_xs)

        # gemma-3: sliding positions rope with the LOCAL base freq
        # (no scaling); global positions keep cfg.rope_theta(+scaling)
        local_freq = (
            _rope_inv_freq(cfg, base=cfg.rope_local_base_freq)
            if cfg.rope_local_base_freq is not None else None
        )

        def block_body(carry, xs_block):
            for p_i in range(period):
                xs_p = jax.tree.map(lambda a: a[p_i], xs_block)
                carry, _ = layer_body(
                    carry, xs_p, sw=pattern[p_i],
                    freqs=(
                        local_freq
                        if pattern[p_i] and local_freq is not None
                        else None
                    ),
                )
            return carry, None

        (x, kv_cache), _ = jax.lax.scan(
            block_body, (x, kv_cache), blocked_xs
        )

    if logits_indices is not None:
        x = x[logits_indices]
    x = rms_norm(
        x, params.final_norm, cfg.rms_norm_eps, cfg.norm_add_unit_offset
    )
    logits = linear(x, params.lm_head).astype(jnp.float32)
    if tp_axis:
        # lm_head is vocab-sharded: gather shards into the full vocab axis
        logits = jax.lax.all_gather(
            logits, tp_axis, axis=1, tiled=True
        )
    if logits.shape[-1] != cfg.vocab_size:
        # quantized lm_head pads the vocab axis to a tile multiple
        # (quantize_weights pad_to); the pad columns are exact zeros —
        # slice them off before they compete in sampling
        logits = logits[:, : cfg.vocab_size]
    if cfg.final_logit_softcap:
        c = cfg.final_logit_softcap
        logits = c * jnp.tanh(logits / c)
    if cfg.logits_scaling != 1.0:
        logits = logits / cfg.logits_scaling
    return logits, kv_cache


forward = functools.partial(
    jax.jit,
    static_argnames=("cfg", "extras"),
    donate_argnames=("kv_cache",),
)(functools.partial(forward_fn, tp_axis=None))


def init_quantized_params(
    cfg: ModelConfig, key: jax.Array, weight_dtype: str = "int8"
) -> LlamaParams:
    """Random init with projections quantized leaf-by-leaf.

    ``init_params`` + ``quantize_params`` materializes the whole bf16
    model first (16 GB for an 8B model — over a v5e's HBM); here each
    stacked projection is quantized immediately after it is drawn, so the
    transient peak is one bf16 leaf (~4 GB for the largest 8B leaf)."""
    dtype = jnp.dtype(cfg.dtype)
    h, inter, hd = cfg.hidden_size, cfg.intermediate_size, cfg.head_size
    nl = cfg.num_layers
    keys = jax.random.split(key, 12)
    qw = jax.jit(
        jax.vmap(functools.partial(quantize_weights, dtype=weight_dtype))
    )

    def init_q(k, shape, fan_in, chunk=8):
        # layer-chunked: quantize_weights upcasts to f32, so a whole
        # stacked 8B-model leaf would transiently need ~3x its bf16 size
        w_parts, s_parts = [], []
        for i0 in range(0, shape[0], chunk):
            n = min(chunk, shape[0] - i0)
            dense = (
                jax.random.normal(
                    jax.random.fold_in(k, i0), (n,) + shape[1:],
                    jnp.float32,
                )
                * (fan_in**-0.5)
            ).astype(dtype)
            q = qw(dense)
            dense.delete()
            w_parts.append(q.w_q)
            s_parts.append(q.scales)
        return QuantizedLinear(
            w_q=jnp.concatenate(w_parts), scales=jnp.concatenate(s_parts)
        )

    embed = (
        jax.random.normal(keys[0], (cfg.vocab_size, h), jnp.float32)
        * (h**-0.5)
    ).astype(dtype)
    # fused qkv / gate+up (see LayerParams docstring); a random draw of
    # the fused matrix is distributionally identical to drawing the
    # parts separately
    n_qkv = (cfg.num_heads + 2 * cfg.num_kv_heads) * hd
    layers = LayerParams(
        input_norm=jnp.ones((nl, h), dtype),
        q_proj=None,
        k_proj=None,
        v_proj=None,
        o_proj=init_q(
            keys[4], (nl, cfg.num_heads * hd, h), cfg.num_heads * hd
        ),
        post_attn_norm=jnp.ones((nl, h), dtype),
        gate_proj=None,
        up_proj=None,
        down_proj=init_q(keys[7], (nl, inter, h), inter),
        qkv_proj=init_q(keys[1], (nl, h, n_qkv), h),
        gate_up_proj=init_q(keys[5], (nl, h, 2 * inter), h),
        qkv_bias=(
            (
                jax.random.normal(
                    keys[9], (nl, n_qkv), jnp.float32
                ) * (h**-0.5)
            ).astype(dtype)
            if cfg.attention_bias else None
        ),
    )
    # lm_head: pad the vocab axis to a tile multiple AT QUANTIZE TIME —
    # padding inside the matmul would make XLA re-materialize the whole
    # padded int8 weight in HBM every step (measured 612 us/step for
    # granite's 4096x49155 head); forward slices the zero logits back off
    if cfg.tie_word_embeddings:
        lm_head = jax.jit(functools.partial(
            quantize_weights, dtype=weight_dtype, pad_to=LM_HEAD_PAD
        ))(embed.T)
    else:
        dense_head = (
            jax.random.normal(
                keys[8], (h, cfg.vocab_size), jnp.float32
            ) * (h**-0.5)
        ).astype(dtype)
        lm_head = jax.jit(functools.partial(
            quantize_weights, dtype=weight_dtype, pad_to=LM_HEAD_PAD
        ))(dense_head)
        dense_head.delete()
    return LlamaParams(
        embed=embed,
        layers=layers,
        final_norm=jnp.ones((h,), dtype),
        lm_head=lm_head,
    )


def fuse_qkv(
    wq: jax.Array,  # [..., h, num_heads * hd]
    wk: jax.Array,  # [..., h, num_kv_heads * hd]
    wv: jax.Array,  # [..., h, num_kv_heads * hd]
    num_kv_heads: int,
    head_size: int,
) -> jax.Array:
    """Pack q/k/v into the grouped fused layout (LayerParams docstring):
    per kv-head group g: [qpk q-heads of g | k_g | v_g], each head_size
    wide.  Standard GQA order (q heads g*qpk.. serve kv g) makes the q
    slice a plain reshape on the way back out."""
    *lead, h, nq = wq.shape
    grp, hd = num_kv_heads, head_size
    qpk = nq // hd // grp
    q = wq.reshape(*lead, h, grp, qpk, hd)
    k = wk.reshape(*lead, h, grp, 1, hd)
    v = wv.reshape(*lead, h, grp, 1, hd)
    return jnp.concatenate((q, k, v), axis=-2).reshape(*lead, h, -1)


def fuse_qkv_bias(
    bq: jax.Array,  # [..., num_heads * hd]
    bk: jax.Array,  # [..., num_kv_heads * hd]
    bv: jax.Array,  # [..., num_kv_heads * hd]
    num_kv_heads: int,
    head_size: int,
) -> jax.Array:
    """Pack qkv biases into :func:`fuse_qkv`'s grouped column layout."""
    return fuse_qkv(
        bq[..., None, :], bk[..., None, :], bv[..., None, :],
        num_kv_heads, head_size,
    )[..., 0, :]


def fuse_gate_up(wg: jax.Array, wu: jax.Array) -> jax.Array:
    """Concatenate gate|up columns into one [..., 2*inter] projection.

    Concat (not element-interleave): the unpack after the matmul is two
    CONTIGUOUS column slices — the round-3 interleaved layout forced a
    [T, inter, 2] relayout copy chain behind every MLP (measured ~20 ms
    of a 2048-token prefill step, ~0.9 ms of a batch-128 decode step).
    A future column-sharded TP layout shards a [..., 2, inter] VIEW on
    its last axis so each shard keeps matched gate/up halves."""
    return jnp.concatenate((wg, wu), axis=-1)


def quantize_params(
    params: LlamaParams,
    dtype: str = "int8",
    cfg: ModelConfig | None = None,
) -> LlamaParams:
    """Weight-only quantization of all projection matrices (embed and norms
    stay dense).  Works on the stacked [L, K, N] layer weights via vmap.

    With ``cfg`` given, q/k/v and gate/up are packed into the fused
    launch-saving layouts (see LayerParams docstring); without it the
    legacy one-kernel-per-projection layout is kept (the grouped packing
    needs num_kv_heads/head_size, which shapes alone don't determine)."""
    qw = functools.partial(quantize_weights, dtype=dtype)
    stacked = jax.vmap(qw)
    lyr = params.layers
    assert lyr.moe_router is None, (
        "weight-only quantized MoE experts: later phase"
    )
    assert lyr.pre_ffw_norm is None, (
        "quantized sandwich-norm (gemma-2) models: later phase"
    )
    if cfg is not None:
        layers = lyr._replace(
            q_proj=None,
            k_proj=None,
            v_proj=None,
            o_proj=stacked(lyr.o_proj),
            gate_proj=None,
            up_proj=None,
            down_proj=stacked(lyr.down_proj),
            qkv_proj=stacked(
                fuse_qkv(
                    lyr.q_proj, lyr.k_proj, lyr.v_proj,
                    cfg.num_kv_heads, cfg.head_size,
                )
            ),
            gate_up_proj=stacked(
                fuse_gate_up(lyr.gate_proj, lyr.up_proj)
            ),
        )
    else:
        layers = lyr._replace(
            q_proj=stacked(lyr.q_proj),
            k_proj=stacked(lyr.k_proj),
            v_proj=stacked(lyr.v_proj),
            o_proj=stacked(lyr.o_proj),
            gate_proj=stacked(lyr.gate_proj),
            up_proj=stacked(lyr.up_proj),
            down_proj=stacked(lyr.down_proj),
        )
    return params._replace(
        layers=layers,
        lm_head=quantize_weights(
            params.lm_head, dtype=dtype, pad_to=LM_HEAD_PAD
        ),
    )


def make_kv_caches(
    cfg: ModelConfig,
    num_blocks: int,
    block_size: int,
    cache_dtype: Any = None,
    data_shards: int = 1,
) -> jax.Array:
    """Allocate the zeroed fused paged KV cache
    ``[L, num_blocks + data_shards, 2, Hkv, block_size, head_pad]`` (one
    page = one contiguous K+V slab for all heads — the kernels' DMA unit).

    Each data shard's chunk ends with a reserved **trash page**: the block
    allocator hands out local pages ``0..num_blocks/data_shards-1`` only,
    and ``reshape_and_cache`` redirects padded slots (-1) to the last
    local page so cache writes are pure in-place stores (see
    ops/pallas/cache_ops.py).  With ``data_shards > 1`` the blocks axis
    is ``num_blocks/data_shards + 1`` pages per shard, contiguous per
    shard, so sharding over the replica axis gives every shard its own
    trash page as its local last page.

    The head dim is padded up to the 128-lane width: Mosaic requires the
    minor dim of manually-DMA'd slices to be lane-aligned, so a head_size
    of 64 stores 128 (the pad region is zeros and contributes nothing to
    the attention math; hd >= 128 models pay nothing).  The kernel
    wrappers pad q / slice outputs transparently.
    """
    from vllm_triton_backend_tpu.utils import round_up

    dtype = cache_dtype or jnp.dtype(cfg.dtype)
    _, n_cache_layers = cfg.kv_cache_slots()
    assert num_blocks % data_shards == 0, (
        "num_blocks must divide evenly across data shards"
    )
    shape = (
        n_cache_layers, num_blocks + data_shards, 2, cfg.num_kv_heads,
        block_size, round_up(cfg.head_size, 128),
    )
    return jnp.zeros(shape, dtype)
