"""Hybrid decoder: attention and Mamba(SSM) layers in one model.

The reference ships the Mamba kernel pair precisely so vLLM's SSM/hybrid
model families run on the Triton backend (SURVEY.md §2.2 mamba_ssm.py).
Here the model family is native: ``layers_block_type`` picks "attention"
or "mamba" per layer (pure-Mamba and granite-4.0-style hybrids are both
just configurations).

State handling mirrors the paged KV-cache design: each Mamba layer has
a *state pool* ``conv_state [Lm, slots, di, k-1]`` + ``ssm_state
[Lm, slots, di, dstate]`` indexed by a per-sequence slot id (the
reference's ``state_batch_indices`` indirection, mamba_ssm.py:174-179).
**Slot 0 is reserved for padding**: rows with ``state_indices == -1``
clamp their reads/writes to slot 0, so the allocator must never hand
slot 0 to a live sequence (duplicate-index scatters from padded rows
would otherwise clobber it with stale values).

Ragged batches: tokens are packed per-sequence ([S, QPAD]) as in the
prefill attention path; SSM correctness under padding comes from forcing
``dt = -inf -> softplus 0`` on padded positions (state unchanged:
``exp(A*0) = 1``, ``dBu = 0``) and gathering conv tails from the last
valid positions.  Decode-only batches use the ``selective_state_update``
Pallas kernel; prefill/mixed use the associative-scan path with initial
states.

Layers are a Python loop (not ``lax.scan``): blocks are heterogeneous.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from vllm_triton_backend_tpu.config import ModelConfig
from vllm_triton_backend_tpu.models.llama import (
    ForwardExtras,
    LayerParams,
    _rope_inv_freq,
    apply_rope,
    rms_norm,
)
from vllm_triton_backend_tpu.ops.attention import unified_attention
from vllm_triton_backend_tpu.ops.metadata import AttentionMetadata
from vllm_triton_backend_tpu.ops.pallas.cache_ops import reshape_and_cache
from vllm_triton_backend_tpu.ops.pallas.decode_attention import (
    paged_decode_append_attention,
)
from vllm_triton_backend_tpu.ops.pallas.mamba import (
    selective_scan,
    selective_state_update,
)
from vllm_triton_backend_tpu.ops.pallas.quant_linear import linear


class MambaLayerParams(NamedTuple):
    norm: jax.Array  # [h]
    in_proj: jax.Array  # [h, 2*di]  (x and z halves)
    conv_w: jax.Array  # [di, kernel]
    conv_b: jax.Array  # [di]
    x_proj: jax.Array  # [di, dt_rank + 2*dstate]
    dt_proj: jax.Array  # [dt_rank, di]
    dt_bias: jax.Array  # [di]
    A_log: jax.Array  # [di, dstate]
    D: jax.Array  # [di]
    out_proj: jax.Array  # [di, h]


class HybridParams(NamedTuple):
    embed: jax.Array
    layers: tuple  # per-layer LayerParams | MambaLayerParams
    final_norm: jax.Array
    lm_head: jax.Array


def block_types(cfg: ModelConfig) -> tuple[str, ...]:
    if cfg.layers_block_type is not None:
        assert len(cfg.layers_block_type) == cfg.num_layers
        return tuple(cfg.layers_block_type)
    kind = "mamba" if cfg.architecture == "mamba" else "attention"
    return (kind,) * cfg.num_layers


def d_inner(cfg: ModelConfig) -> int:
    return cfg.mamba_expand * cfg.hidden_size


def dt_rank(cfg: ModelConfig) -> int:
    if cfg.mamba_dt_rank:
        return cfg.mamba_dt_rank
    return -(-cfg.hidden_size // 16)


def init_params(cfg: ModelConfig, key: jax.Array) -> HybridParams:
    dtype = jnp.dtype(cfg.dtype)
    h, hd = cfg.hidden_size, cfg.head_size
    di, ds, dr = d_inner(cfg), cfg.mamba_state_size, dt_rank(cfg)
    kk = cfg.mamba_conv_kernel
    keys = iter(jax.random.split(key, 12 * cfg.num_layers + 2))

    def init(shape, fan_in):
        return (
            jax.random.normal(next(keys), shape, jnp.float32)
            * (fan_in**-0.5)
        ).astype(dtype)

    layers = []
    for kind in block_types(cfg):
        if kind == "attention":
            layers.append(
                LayerParams(
                    input_norm=jnp.ones((h,), dtype),
                    q_proj=init((h, cfg.num_heads * hd), h),
                    k_proj=init((h, cfg.num_kv_heads * hd), h),
                    v_proj=init((h, cfg.num_kv_heads * hd), h),
                    o_proj=init((cfg.num_heads * hd, h), cfg.num_heads * hd),
                    post_attn_norm=jnp.ones((h,), dtype),
                    gate_proj=init((h, cfg.intermediate_size), h),
                    up_proj=init((h, cfg.intermediate_size), h),
                    down_proj=init(
                        (cfg.intermediate_size, h), cfg.intermediate_size
                    ),
                )
            )
        else:
            # S4D-real init for A (mamba default): A = -(1..dstate)
            a = jnp.tile(
                jnp.arange(1, ds + 1, dtype=jnp.float32)[None, :], (di, 1)
            )
            layers.append(
                MambaLayerParams(
                    norm=jnp.ones((h,), dtype),
                    in_proj=init((h, 2 * di), h),
                    conv_w=init((di, kk), kk),
                    conv_b=jnp.zeros((di,), dtype),
                    x_proj=init((di, dr + 2 * ds), di),
                    dt_proj=init((dr, di), dr),
                    dt_bias=jnp.full(
                        (di,), jnp.log(jnp.expm1(0.01)), dtype
                    ),
                    A_log=jnp.log(a),
                    D=jnp.ones((di,), jnp.float32),
                    out_proj=init((di, h), di),
                )
            )
    embed = init((cfg.vocab_size, h), h)
    lm_head = embed.T if cfg.tie_word_embeddings else init(
        (h, cfg.vocab_size), h
    )
    return HybridParams(
        embed=embed,
        layers=tuple(layers),
        final_norm=jnp.ones((h,), dtype),
        lm_head=lm_head,
    )


def make_kv_caches(
    cfg: ModelConfig,
    num_blocks: int,
    block_size: int,
    cache_dtype: Any = None,
    data_shards: int = 1,
) -> jax.Array:
    """Fused KV cache sized to the number of ATTENTION layers only
    (head dim lane-padded + per-data-shard trailing trash page as in
    llama.make_kv_caches)."""
    from vllm_triton_backend_tpu.utils import round_up

    dtype = cache_dtype or jnp.dtype(cfg.dtype)
    n_attn = sum(1 for t in block_types(cfg) if t == "attention")
    shape = (
        max(n_attn, 1), num_blocks + data_shards, 2, cfg.num_kv_heads,
        block_size, round_up(cfg.head_size, 128),
    )
    return jnp.zeros(shape, dtype)


def make_state_pools(
    cfg: ModelConfig, num_slots: int
) -> tuple[jax.Array, jax.Array]:
    """conv_state [Lm, slots, di, k-1], ssm_state [Lm, slots, di, ds]."""
    n_mamba = sum(1 for t in block_types(cfg) if t == "mamba")
    di, ds = d_inner(cfg), cfg.mamba_state_size
    kk = cfg.mamba_conv_kernel
    return (
        jnp.zeros((max(n_mamba, 1), num_slots, di, kk - 1), jnp.float32),
        jnp.zeros((max(n_mamba, 1), num_slots, di, ds), jnp.float32),
    )


def _pack(x, seq_ids, local, num_seqs, q_pad):
    packed = jnp.zeros((num_seqs, q_pad) + x.shape[1:], x.dtype)
    return packed.at[seq_ids, local].set(x, mode="drop")


def _mamba_mixer(
    lp: MambaLayerParams,
    cfg: ModelConfig,
    x_flat: jax.Array,  # [T, h] normed input
    metadata: AttentionMetadata,
    extras: ForwardExtras,
    conv_state: jax.Array,  # [slots, di, k-1] this layer
    ssm_state: jax.Array,  # [slots, di, ds]
    state_indices: jax.Array,  # [S] int32 slot per seq (-1 pad)
    seq_ids: jax.Array,
    local: jax.Array,
    q_lens: jax.Array,  # [S]
    tp_axis: str | None = None,
):
    """One Mamba layer over the flat ragged batch.  Returns
    (out_flat [T, h], conv_state, ssm_state).

    Tensor parallelism (``tp_axis`` set inside a ``shard_map``): the
    channel dim ``d_inner`` is sharded — in_proj/dt_proj column-parallel,
    conv/A/D/dt_bias/state pools per-channel local, x_proj and out_proj
    row-parallel with a ``psum`` each.  ``di`` is therefore derived from
    the *local* param shard, never from cfg.
    """
    ds, dr = cfg.mamba_state_size, dt_rank(cfg)
    di = lp.conv_w.shape[0]  # local channels (d_inner / tp under TP)

    def maybe_psum(x):
        return jax.lax.psum(x, tp_axis) if tp_axis else x
    kk = cfg.mamba_conv_kernel
    t_total = x_flat.shape[0]
    num_seqs = q_lens.shape[0]
    dtype = x_flat.dtype

    xz = linear(x_flat, lp.in_proj)  # [T, 2*di]
    x_in, z = jnp.split(xz, 2, axis=-1)

    decode_only = extras.max_query_len == 1
    safe_idx = jnp.maximum(state_indices, 0)

    if decode_only:
        # one token per sequence, token order == seq order; the flat token
        # bucket may be longer than S — rows past num_seqs are padding
        x_tok = x_in[:num_seqs].astype(jnp.float32)  # [S, di]
        cs = conv_state[safe_idx]  # [S, di, k-1]
        window = jnp.concatenate(
            [cs, x_tok[:, :, None]], axis=-1
        )  # [S, di, k]
        conv_out = jnp.sum(
            window * lp.conv_w.astype(jnp.float32)[None], axis=-1
        ) + lp.conv_b.astype(jnp.float32)
        xc = jax.nn.silu(conv_out)  # [S, di]
        new_cs = window[:, :, 1:]

        # x_proj is row-parallel under TP: partial sums over local channels
        dbc = maybe_psum(xc.astype(dtype) @ lp.x_proj)  # [S, dr+2ds]
        dt = dbc[:, :dr] @ lp.dt_proj  # [S, di]
        B = dbc[:, dr : dr + ds].astype(jnp.float32)
        C = dbc[:, dr + ds :].astype(jnp.float32)
        A = -jnp.exp(lp.A_log)  # [di, ds]

        y, new_ssm = selective_state_update(
            ssm_state[:, None],  # [slots, 1, di, ds] (nheads=1)
            xc[:, None, :],  # [S, 1, di]
            dt.astype(jnp.float32)[:, None, :],
            A[None],  # [1, di, ds]
            B[:, None, :],
            C[:, None, :],
            D=lp.D[None],
            z=z[:num_seqs].astype(jnp.float32)[:, None, :],
            dt_bias=lp.dt_bias.astype(jnp.float32)[None],
            dt_softplus=True,
            state_batch_indices=state_indices,
        )
        y = y[:, 0, :]  # [S, di]
        live = (state_indices >= 0)[:, None]
        conv_state = conv_state.at[safe_idx].set(
            jnp.where(live[:, :, None], new_cs, conv_state[safe_idx])
        )
        out_s = maybe_psum(linear(y.astype(dtype), lp.out_proj))  # [S, h]
        out = jnp.zeros((t_total, out_s.shape[1]), dtype)
        out = out.at[:num_seqs].set(out_s)
        return out, conv_state, new_ssm[:, 0]

    # ---- prefill / mixed: packed scan with initial states ----
    q_pad = x_in.shape[0] and max(1, extras.max_query_len)
    # pad q_pad up so gather/scatter shapes are static
    xp = _pack(x_in, seq_ids, local, num_seqs, q_pad)  # [S, Q, di]
    zp = _pack(z, seq_ids, local, num_seqs, q_pad)
    valid = (
        jnp.arange(q_pad)[None, :] < q_lens[:, None]
    )  # [S, Q]

    xp_t = xp.astype(jnp.float32).transpose(0, 2, 1)  # [S, di, Q]
    xp_t = jnp.where(valid[:, None, :], xp_t, 0.0)
    # A sequence starting from context 0 (fresh or preempted-recompute)
    # begins from zero states regardless of stale slot contents — slots
    # never need host-side zeroing on assignment.
    ctx_len = metadata.seq_lens[:num_seqs] - q_lens
    fresh = (ctx_len == 0)[:, None, None]
    cs0 = jnp.where(fresh, 0.0, conv_state[safe_idx])  # [S, di, k-1]
    # NOTE: chunked prefill carries the conv tail of the previous chunk
    seq_in = jnp.concatenate([cs0, xp_t], axis=-1)  # [S, di, k-1+Q]
    # causal depthwise conv: output[t] = sum_j w[j]*in[t+j]
    conv = sum(
        seq_in[:, :, j : j + q_pad]
        * lp.conv_w.astype(jnp.float32)[None, :, j : j + 1]
        for j in range(kk)
    ) + lp.conv_b.astype(jnp.float32)[None, :, None]
    xc = jax.nn.silu(conv)  # [S, di, Q]
    xc = jnp.where(valid[:, None, :], xc, 0.0)
    # new conv tail = last (k-1) *valid* inputs per sequence
    tail_idx = (
        q_lens[:, None] + jnp.arange(kk - 1)[None, :]
    )  # positions q_len..q_len+k-2 in seq_in
    new_cs = jnp.take_along_axis(
        seq_in, tail_idx[:, None, :].repeat(di, 1), axis=-1
    )

    dbc = maybe_psum(
        jnp.einsum("sdq,de->sqe", xc.astype(dtype), lp.x_proj)
    )  # [S, Q, dr+2ds]
    dt = jnp.einsum("sqr,rd->sdq", dbc[:, :, :dr], lp.dt_proj)
    B = dbc[:, :, dr : dr + ds].astype(jnp.float32).transpose(0, 2, 1)
    C = dbc[:, :, dr + ds :].astype(jnp.float32).transpose(0, 2, 1)
    A = -jnp.exp(lp.A_log)
    # force dt -> "no-op" on padding: softplus(-30) ~ 0
    dt = jnp.where(valid[:, None, :], dt.astype(jnp.float32), -30.0)
    zp_t = zp.astype(jnp.float32).transpose(0, 2, 1)

    y, final_ssm = selective_scan(
        xc,  # u [S, di, Q]
        dt,
        A,
        B[:, None],  # [S, 1, ds, Q]
        C[:, None],
        D=lp.D,
        z=zp_t,
        delta_bias=lp.dt_bias.astype(jnp.float32),
        delta_softplus=True,
        initial_state=jnp.where(fresh, 0.0, ssm_state[safe_idx]),
    )
    live = (state_indices >= 0)[:, None, None]
    conv_state = conv_state.at[safe_idx].set(
        jnp.where(live, new_cs, conv_state[safe_idx])
    )
    ssm_state = ssm_state.at[safe_idx].set(
        jnp.where(live, final_ssm, ssm_state[safe_idx])
    )
    # unpack [S, di, Q] -> flat [T, di]
    y_flat = y.transpose(0, 2, 1)[seq_ids, local]
    out = maybe_psum(linear(y_flat.astype(dtype), lp.out_proj))
    return out, conv_state, ssm_state


def forward_fn(
    params: HybridParams,
    cfg: ModelConfig,
    token_ids: jax.Array,
    positions: jax.Array,
    kv_cache: jax.Array,  # [La, blocks, 2, Hkv, bs, hd]
    conv_state: jax.Array,  # [Lm, slots, di, k-1]
    ssm_state: jax.Array,  # [Lm, slots, di, ds]
    state_indices: jax.Array,  # [S] int32
    metadata: AttentionMetadata,
    extras: ForwardExtras,
    tp_axis: str | None = None,
):
    """Hybrid forward.  Attention layers consume the fused kv cache (in
    block-type order), Mamba layers consume the state pools.  Returns
    (logits, kv_cache, conv_state, ssm_state).

    With ``tp_axis`` set (inside ``shard_map``), ``cfg`` carries per-shard
    head counts and params/caches/state pools are the local shards
    (parallel/sharded.py hybrid specs); communication is one ``psum`` per
    projection-reduction (o_proj, down_proj, mamba x_proj/out_proj) plus
    the vocab all-gather — Megatron-style TP generalized to SSM channel
    sharding (SURVEY.md §2.6 build column).
    """
    dtype = jnp.dtype(cfg.dtype)
    hd = cfg.head_size
    inv_freq = _rope_inv_freq(cfg)
    t = token_ids.shape[0]
    num_seqs = metadata.seq_lens.shape[0]

    def maybe_psum(x):
        return jax.lax.psum(x, tp_axis) if tp_axis else x

    # ragged bookkeeping shared by mamba layers
    tk = jnp.arange(t, dtype=jnp.int32)
    qsl = metadata.query_start_loc[: num_seqs + 1]
    seq_ids = jnp.clip(
        jnp.searchsorted(qsl, tk, side="right") - 1, 0, num_seqs - 1
    ).astype(jnp.int32)
    local = tk - qsl[seq_ids]
    q_lens = qsl[1:] - qsl[:-1]

    x = params.embed[token_ids].astype(dtype)
    if cfg.embedding_multiplier != 1.0:
        x = x * cfg.embedding_multiplier

    attn_i = 0
    mamba_i = 0
    for kind, lp in zip(block_types(cfg), params.layers):
        if kind == "attention":
            normed = rms_norm(x, lp.input_norm, cfg.rms_norm_eps)
            q = linear(normed, lp.q_proj).reshape(t, cfg.num_heads, hd)
            k = linear(normed, lp.k_proj).reshape(t, cfg.num_kv_heads, hd)
            v = linear(normed, lp.v_proj).reshape(t, cfg.num_kv_heads, hd)
            q = apply_rope(q, positions, inv_freq)
            k = apply_rope(k, positions, inv_freq)
            if extras.max_query_len == 1:
                # fused append-attend (see models/llama.py decode path)
                attn_s, kv_cache = paged_decode_append_attention(
                    q[:num_seqs], k[:num_seqs], v[:num_seqs],
                    kv_cache, jnp.int32(attn_i), jnp.int32(1),
                    metadata.seq_lens, metadata.block_table,
                    metadata.slot_mapping[:num_seqs],
                    scale=cfg.attn_scale,
                    max_seq_len=extras.max_seq_len,
                    sliding_window=cfg.sliding_window or 0,
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
                kv_cache = reshape_and_cache(
                    kv_cache, jnp.int32(attn_i), k, v,
                    metadata.slot_mapping, extras.k_scale, extras.v_scale,
                )
                attn = unified_attention(
                    q, kv_cache, jnp.int32(attn_i), metadata,
                    scale=cfg.attn_scale,
                    max_query_len=extras.max_query_len,
                    max_seq_len=extras.max_seq_len,
                    sliding_window=cfg.sliding_window or 0,
                    logits_soft_cap=cfg.logits_soft_cap,
                    k_scale=extras.k_scale,
                    v_scale=extras.v_scale,
                    local_chunk_size=cfg.attention_chunk_size or 0,
                )
            attn_out = maybe_psum(
                linear(attn.reshape(t, cfg.num_heads * hd), lp.o_proj)
            )
            x = x + attn_out * cfg.residual_multiplier
            normed2 = rms_norm(x, lp.post_attn_norm, cfg.rms_norm_eps)
            gate = jax.nn.silu(
                linear(normed2, lp.gate_proj).astype(jnp.float32)
            )
            mlp = maybe_psum(
                linear(
                    gate.astype(dtype) * linear(normed2, lp.up_proj),
                    lp.down_proj,
                )
            )
            x = x + mlp * cfg.residual_multiplier
            attn_i += 1
        else:
            normed = rms_norm(x, lp.norm, cfg.rms_norm_eps)
            out, new_conv, new_ssm = _mamba_mixer(
                lp, cfg, normed, metadata, extras,
                conv_state[mamba_i], ssm_state[mamba_i], state_indices,
                seq_ids, local, q_lens, tp_axis=tp_axis,
            )
            conv_state = conv_state.at[mamba_i].set(new_conv)
            ssm_state = ssm_state.at[mamba_i].set(new_ssm)
            x = x + out * cfg.residual_multiplier
            mamba_i += 1

    x = rms_norm(x, params.final_norm, cfg.rms_norm_eps)
    logits = linear(x, params.lm_head).astype(jnp.float32)
    if tp_axis:
        # lm_head is vocab-sharded: gather shards into the full vocab axis
        logits = jax.lax.all_gather(logits, tp_axis, axis=1, tiled=True)
    if cfg.logits_scaling != 1.0:
        logits = logits / cfg.logits_scaling
    return logits, kv_cache, conv_state, ssm_state


forward = jax.jit(
    forward_fn,
    static_argnames=("cfg", "extras", "tp_axis"),
    donate_argnames=("kv_cache", "conv_state", "ssm_state"),
)
