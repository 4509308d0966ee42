"""Pipeline parallelism: layers sharded into stages over a mesh axis.

SURVEY.md §2.6 marks PP "optional later phase" for the reference (vLLM
provides it at L5); here it is native.  GPipe-style inference pipeline
under ``shard_map`` over a ``stage`` mesh axis:

* The layer stack is split contiguously into ``S`` stages; each stage's
  stacked layer params and its slice of the paged KV-cache live on that
  stage's devices (sharded ``P("stage")`` on the leading axis).
* The token batch is split into ``M`` microbatches (by sequences).  A
  clock loop of ``M + S - 1`` ticks runs: on tick ``t`` stage ``s``
  processes microbatch ``t - s`` (when in range) and hands its activations
  to stage ``s+1`` via ``ppermute`` — communication overlaps with the next
  tick's compute under XLA async collectives.
* Embedding runs on every stage (replicated weights, negligible cost);
  only stage 0's result enters the pipe.  The last stage's hidden states
  are recovered with a ``psum`` mask trick and logits are computed
  replicated.

Composable with TP: pass ``tp > 1`` to :func:`make_pp_mesh` for a 2-D
mesh ("stage", "model") — layer stacks shard over "stage", head/ffn dims
over "model" (Megatron TP inside each stage: psum after o-proj and
down-proj, vocab-sharded lm_head all-gathered), the KV-cache shards over
both (layer axis x kv-head axis).  The engine serves
``ParallelConfig(pipeline_parallel=S, tensor_parallel=T)`` through this
path — the 70B-class config (TP within a host, PP across).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vllm_triton_backend_tpu.config import ModelConfig
from vllm_triton_backend_tpu.models.llama import (
    ForwardExtras,
    LayerParams,
    LlamaParams,
    _moe_mlp,
    _rope_inv_freq,
    apply_rope,
    rms_norm,
)
from vllm_triton_backend_tpu.ops.attention import unified_attention
from vllm_triton_backend_tpu.ops.metadata import AttentionMetadata
from vllm_triton_backend_tpu.ops.pallas.cache_ops import reshape_and_cache
from vllm_triton_backend_tpu.ops.pallas.quant_linear import linear

def pp_param_specs(
    tp: bool = False, attention_bias: bool = False, moe: bool = False,
    sandwich_norms: bool = False, qk_norm: bool = False,
) -> LlamaParams:
    """Layer stacks shard over "stage"; with ``tp`` the projections also
    shard over "model" (column for qkv/gate/up, row for o/down — the
    sharded.py Megatron layout with a leading stacked-layer axis)."""
    col = P("stage", None, "model") if tp else P("stage")
    row = P("stage", "model", None) if tp else P("stage")
    kw = dict(
        input_norm=P("stage"),
        q_proj=col,
        k_proj=col,
        v_proj=col,
        o_proj=row,
        post_attn_norm=P("stage"),
        gate_proj=col,
        up_proj=col,
        down_proj=row,
    )
    if attention_bias:
        kw["qkv_bias"] = P("stage", "model") if tp else P("stage")
    if sandwich_norms:
        kw["pre_ffw_norm"] = P("stage")
        kw["post_ffw_norm"] = P("stage")
    if qk_norm:
        kw["q_norm"] = P("stage")
        kw["k_norm"] = P("stage")
    if moe:
        kw.update(
            moe_router=P("stage"),
            moe_gate_up=P("stage", "model") if tp else P("stage"),
            moe_down=P("stage", "model") if tp else P("stage"),
            # dense MLP leaves absent on MoE models
            gate_proj=None,
            up_proj=None,
            down_proj=None,
        )
    return LlamaParams(
        embed=P(),
        layers=LayerParams(**kw),
        final_norm=P(),
        lm_head=P(None, "model") if tp else P(),
    )


PARAM_SPECS_PP = pp_param_specs()

CACHE_SPEC_PP = P("stage")
CACHE_SPEC_PP_TP = P("stage", None, None, "model")


def make_pp_mesh(num_stages: int, tp: int = 1, devices=None) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    if tp > 1:
        return Mesh(
            np.asarray(devices[: num_stages * tp]).reshape(
                num_stages, tp
            ),
            axis_names=("stage", "model"),
        )
    return Mesh(
        np.asarray(devices[:num_stages]), axis_names=("stage",)
    )


def shard_params_pp(params: LlamaParams, mesh: Mesh) -> LlamaParams:
    specs = pp_param_specs(
        tp="model" in mesh.axis_names,
        attention_bias=params.layers.qkv_bias is not None,
        moe=params.layers.moe_router is not None,
        sandwich_norms=params.layers.pre_ffw_norm is not None,
        qk_norm=params.layers.q_norm is not None,
    )
    return jax.tree.map(
        lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec)),
        params,
        specs,
    )


def _stage_forward(
    layers: LayerParams,  # stacked [L/S, ...] local slice
    cfg: ModelConfig,  # per-shard head counts when tp_axis is set
    x: jax.Array,  # [Tm, h]
    positions: jax.Array,  # [Tm]
    kv_cache: jax.Array,  # [L/S, blocks, 2, Hkv, bs, hd] local slice
    meta: AttentionMetadata,
    extras: ForwardExtras,
    tp_axis: str | None = None,
):
    dtype = jnp.dtype(cfg.dtype)
    hd = cfg.head_size
    inv_freq = _rope_inv_freq(cfg)
    t = x.shape[0]
    n_local = kv_cache.shape[0]

    def reduce(y):
        return jax.lax.psum(y, tp_axis) if tp_axis else y

    def layer_body(carry, xs):
        h_in, kv = carry
        lp, lidx = xs  # lidx is LOCAL to this stage's cache slice
        normed = rms_norm(h_in, lp.input_norm, cfg.rms_norm_eps)
        q = linear(normed, lp.q_proj).reshape(t, cfg.num_heads, hd)
        k = linear(normed, lp.k_proj).reshape(t, cfg.num_kv_heads, hd)
        v = linear(normed, lp.v_proj).reshape(t, cfg.num_kv_heads, hd)
        if lp.qkv_bias is not None:
            grp, qpk = cfg.num_kv_heads, cfg.num_heads // cfg.num_kv_heads
            b = lp.qkv_bias.reshape(grp, qpk + 2, hd)
            q = q + b[:, :qpk].reshape(cfg.num_heads, hd)
            k = k + b[:, qpk]
            v = v + b[:, qpk + 1]
        if lp.q_norm is not None:
            q = rms_norm(q, lp.q_norm, cfg.rms_norm_eps)
            k = rms_norm(k, lp.k_norm, cfg.rms_norm_eps)
        q = apply_rope(q, positions, inv_freq)
        k = apply_rope(k, positions, inv_freq)
        kv = reshape_and_cache(
            kv, lidx, k, v, meta.slot_mapping,
            extras.k_scale, extras.v_scale,
        )
        attn = unified_attention(
            q, kv, lidx, meta,
            scale=cfg.attn_scale,
            max_query_len=extras.max_query_len,
            max_seq_len=extras.max_seq_len,
            sliding_window=cfg.sliding_window or 0,
            logits_soft_cap=cfg.logits_soft_cap,
            k_scale=extras.k_scale,
            v_scale=extras.v_scale,
            local_chunk_size=cfg.attention_chunk_size or 0,
        )
        h_mid = h_in + reduce(linear(attn.reshape(t, -1), lp.o_proj))
        normed2 = rms_norm(h_mid, lp.post_attn_norm, cfg.rms_norm_eps)
        if lp.moe_router is not None:
            mlp = reduce(_moe_mlp(lp, cfg, normed2, dtype, tp_axis))
            return (h_mid + mlp, kv), None
        gate = jax.nn.silu(linear(normed2, lp.gate_proj).astype(jnp.float32))
        mlp = reduce(linear(
            gate.astype(dtype) * linear(normed2, lp.up_proj), lp.down_proj
        ))
        return (h_mid + mlp, kv), None

    (x, kv_cache), _ = jax.lax.scan(
        layer_body, (x, kv_cache),
        (layers, jnp.arange(n_local, dtype=jnp.int32)),
    )
    return x, kv_cache


def make_pp_forward(
    cfg: ModelConfig,
    mesh: Mesh,
    extras: ForwardExtras,
    num_microbatches: int,
):
    assert not cfg.sandwich_norms and cfg.sliding_window_pattern is None, (
        "gemma-2-style blocks through pipeline parallelism: later phase"
    )
    """Build the jitted pipeline forward.

    Inputs carry a leading microbatch axis ``[M, ...]`` (replicated):
      token_ids [M, Tm], positions [M, Tm], query_start_loc [M, Sm+1],
      seq_lens [M, Sm], block_table [M, Sm, B], slot_mapping [M, Tm].
    Microbatches must reference disjoint cache pages.  Returns
    ``(logits [M, Tm, vocab], kv_cache)``.
    """
    num_stages = mesh.shape["stage"]
    assert cfg.num_layers % num_stages == 0
    m = num_microbatches
    tp = mesh.shape.get("model", 1)
    tp_axis = "model" if tp > 1 else None
    if tp > 1:
        from vllm_triton_backend_tpu.parallel.sharded import (
            local_model_config,
        )

        cfg = local_model_config(cfg, tp)

    def step(
        params, token_ids, positions, kv_cache,
        qsl, seq_lens, block_table, slot_mapping,
    ):
        stage = jax.lax.axis_index("stage")
        # shard_map hands each stage its local [L/S, ...] slices directly
        layers = params.layers
        kv = kv_cache
        tm = token_ids.shape[1]
        h = cfg.hidden_size
        dtype = jnp.dtype(cfg.dtype)

        embeds = params.embed[token_ids].astype(dtype)  # [M, Tm, h]
        if cfg.embedding_multiplier != 1.0:
            embeds = embeds * cfg.embedding_multiplier

        out_buf = jnp.zeros((m, tm, h), dtype)
        x_cur = jnp.zeros((tm, h), dtype)
        perm = [(i, i + 1) for i in range(num_stages - 1)]

        def tick(t, carry):
            x_cur, out_buf, kv = carry
            mb = t - stage  # microbatch this stage works on
            active = jnp.logical_and(mb >= 0, mb < m)
            mb_c = jnp.clip(mb, 0, m - 1)
            # stage 0 injects a fresh microbatch from the embeddings
            x_in = jnp.where(
                stage == 0, embeds[jnp.clip(t, 0, m - 1)], x_cur
            )
            meta = AttentionMetadata(
                query_start_loc=qsl[mb_c],
                seq_lens=seq_lens[mb_c],
                block_table=block_table[mb_c],
                slot_mapping=jnp.where(
                    active, slot_mapping[mb_c], -1
                ),
                num_seqs=jnp.int32(seq_lens.shape[1]),
            )
            y, kv2 = _stage_forward(
                layers, cfg, x_in, positions[mb_c], kv, meta, extras,
                tp_axis=tp_axis,
            )
            # inactive stages must not mutate their cache
            kv = jnp.where(active, kv2, kv)
            # last stage stores its finished microbatch
            out_buf = jnp.where(
                jnp.logical_and(stage == num_stages - 1, active)[None],
                out_buf.at[mb_c].set(y),
                out_buf,
            )
            # hand activations to the next stage
            x_next = jax.lax.ppermute(y, "stage", perm)
            return x_next, out_buf, kv

        x_cur, out_buf, kv = jax.lax.fori_loop(
            0, m + num_stages - 1, tick, (x_cur, out_buf, kv)
        )
        # replicate the last stage's outputs to all stages
        out_buf = jax.lax.psum(
            jnp.where((stage == num_stages - 1)[None], out_buf, 0.0)
            .astype(jnp.float32),
            "stage",
        ).astype(dtype)

        hid = rms_norm(out_buf, params.final_norm, cfg.rms_norm_eps)
        logits = linear(
            hid.reshape(m * tm, h), params.lm_head
        ).astype(jnp.float32)
        if tp_axis:
            # vocab-sharded lm_head: gather the full vocab axis
            logits = jax.lax.all_gather(
                logits, tp_axis, axis=1, tiled=True
            )
        if cfg.logits_scaling != 1.0:
            logits = logits / cfg.logits_scaling
        return logits.reshape(m, tm, -1), kv

    batch_spec = P()
    cache_spec = CACHE_SPEC_PP_TP if tp_axis else CACHE_SPEC_PP
    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(
            pp_param_specs(
                tp=tp > 1,
                attention_bias=cfg.attention_bias,
                moe=cfg.num_local_experts > 0,
                sandwich_norms=cfg.sandwich_norms,
                qk_norm=cfg.qk_norm,
            ), batch_spec, batch_spec, cache_spec,
            batch_spec, batch_spec, batch_spec, batch_spec,
        ),
        out_specs=(P(), cache_spec),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(3,))
