"""Sharded model execution: Megatron-style TP + replica DP via shard_map.

Sharding layout (the scaling-book TP recipe; SURVEY.md §2.6 build column):

  weights   q/k/v/gate/up_proj  [L, h, out]    out-dim over ``model``
            o_proj/down_proj    [L, in, h]     in-dim  over ``model``
            lm_head             [h, vocab]     vocab   over ``model``
            embed / norms       replicated
  kv-cache  [L, blocks, 2, Hkv, bs, hd]        Hkv over ``model``,
                                               blocks over ``data``
  batch     leading [data] axis: each data shard runs its own scheduler
            batch (independent sequences, own page pool)

Inside the ``shard_map`` each shard runs the ordinary single-chip
``forward_fn`` (models/llama.py) with per-shard head counts; the only
communication is one ``psum`` after o_proj, one after down_proj, and a
vocab ``all_gather`` for logits — all compiler-scheduled over ICI.  The
Pallas attention kernels run unchanged on local heads: TP needs zero
changes to the kernels (the reference's plugin is likewise TP-oblivious,
seeing per-rank head counts only — SURVEY.md §2.6).
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
    forward_fn,
)
from vllm_triton_backend_tpu.ops.pallas.quant_linear import QuantizedLinear
from vllm_triton_backend_tpu.ops.metadata import AttentionMetadata

PARAM_SPECS = LlamaParams(
    embed=P(None, None),
    layers=LayerParams(
        input_norm=P(None, None),
        q_proj=P(None, None, "model"),
        k_proj=P(None, None, "model"),
        v_proj=P(None, None, "model"),
        o_proj=P(None, "model", None),
        post_attn_norm=P(None, None),
        gate_proj=P(None, None, "model"),
        up_proj=P(None, None, "model"),
        down_proj=P(None, "model", None),
    ),
    final_norm=P(None),
    lm_head=P(None, "model"),
)

CACHE_SPEC = P(None, "data", None, "model", None, None)


def param_specs(
    attention_bias: bool = False, moe: bool = False,
    sandwich_norms: bool = False, qk_norm: bool = False,
    fused_quant: bool = False,
) -> LlamaParams:
    """PARAM_SPECS, extended with the optional leaves the model carries
    (spec trees must match the param pytree structure — ``None`` fields
    are structurally absent).  The fused grouped bias column layout
    shards over ``model`` exactly like qkv_proj; MoE expert stacks shard
    their EXPERT axis over ``model`` (expert parallelism — each shard
    computes its local experts, one psum combines) with the router
    replicated."""
    extra = {}
    if attention_bias:
        extra["qkv_bias"] = P(None, "model")
    if sandwich_norms:
        extra["pre_ffw_norm"] = P(None, None)
        extra["post_ffw_norm"] = P(None, None)
    if qk_norm:
        extra["q_norm"] = P(None, None)
        extra["k_norm"] = P(None, None)
    if moe:
        extra["moe_router"] = P(None, None, None)
        extra["moe_gate_up"] = P(None, "model", None, None)
        extra["moe_down"] = P(None, "model", None, None)
        # dense MLP leaves are structurally absent on MoE models
        extra["gate_proj"] = None
        extra["up_proj"] = None
        extra["down_proj"] = None
    specs = PARAM_SPECS
    if fused_quant:
        # Quantized fused layouts (QuantizedLinear leaves; see
        # LayerParams docstring + shard_quantized_params):
        #  * qkv_proj columns are grouped per kv head -> a contiguous
        #    column split lands on group boundaries (tp | num_kv_heads
        #    is enforced by local_model_config);
        #  * gate_up_proj is RESHAPED to [L, K, 2, inter] at shard time
        #    so the last-axis split keeps matched gate/up halves per
        #    shard (the local forward flattens it back);
        #  * o/down are row-parallel: weight K-axis sharded, per-output
        #    scales replicated (scales distribute over the psum);
        #  * lm_head is vocab-sharded incl. its scales (forward gathers
        #    logits; LM_HEAD_PAD keeps the split even).
        extra.update(
            q_proj=None, k_proj=None, v_proj=None,
            gate_proj=None, up_proj=None,
            qkv_proj=QuantizedLinear(
                w_q=P(None, None, "model"), scales=P(None, "model")
            ),
            gate_up_proj=QuantizedLinear(
                w_q=P(None, None, None, "model"),
                scales=P(None, None, "model"),
            ),
            o_proj=QuantizedLinear(
                w_q=P(None, "model", None), scales=P(None, None)
            ),
            down_proj=QuantizedLinear(
                w_q=P(None, "model", None), scales=P(None, None)
            ),
        )
        specs = specs._replace(
            lm_head=QuantizedLinear(
                w_q=P(None, "model"), scales=P("model")
            )
        )
    if not extra and specs is PARAM_SPECS:
        return PARAM_SPECS
    return specs._replace(
        layers=specs.layers._replace(**extra)
    )


def row_parallel_matmul_overlapped(
    x: jax.Array,  # [T, K_local] local activations
    w: jax.Array,  # [K_local, N] local weight shard
    axis_name: str,
) -> jax.Array:
    """``psum(x @ w)`` as a ring reduce-scatter interleaved with chunked
    matmuls + a final all-gather — the ``collective_matmul`` overlap
    pattern (SURVEY.md §5.8: decode-step collectives hidden under
    compute; the north star's explicit demand).

    The monolithic ``psum`` after o_proj/down_proj serializes: the full
    matmul must finish before any byte moves.  Here output-column chunk
    ``c`` circulates the ring accumulating each rank's partial while the
    NEXT chunk's matmul runs — the ``ppermute`` is data-independent of
    that matmul, so XLA's async collectives overlap the two.  Chunk
    ``c`` finishes reduced on rank ``c``; one tiled all-gather
    reassembles the columns.  Requires ``N % axis_size == 0``.
    """
    p = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    n = w.shape[1]
    assert n % p == 0, "output dim must divide the model axis"
    nc = n // p
    perm = [(i, (i + 1) % p) for i in range(p)]

    def chunk_mm(c):
        wc = jax.lax.dynamic_slice_in_dim(w, c * nc, nc, axis=1)
        return x @ wc

    carry = None
    for s in range(p):
        # chunk routed so it ends fully-reduced on its owner rank
        c = jnp.remainder(idx - s - 1, p)
        part = chunk_mm(c)
        carry = part if carry is None else carry + part
        if s < p - 1:
            carry = jax.lax.ppermute(carry, axis_name, perm)
    # rank i now owns reduced chunk i; gather columns in rank order
    return jax.lax.all_gather(carry, axis_name, axis=1, tiled=True)


def _is_fused_quant(params: LlamaParams) -> bool:
    return isinstance(params.layers.qkv_proj, QuantizedLinear)


def shard_params(params: LlamaParams, mesh: Mesh) -> LlamaParams:
    """Place a (host or single-device) param pytree onto the mesh.

    Quantized fused-layout params (the production int8/fp8 models —
    e.g. a 70 GB llama-70B int8 served TP=8 on one v5e host) are
    handled natively: gate_up is staged through its [L, K, 2, inter]
    view so each shard keeps matched gate|up halves."""
    fused_quant = _is_fused_quant(params)
    if fused_quant:
        gu = params.layers.gate_up_proj
        L, K, n2 = gu.w_q.shape
        params = params._replace(
            layers=params.layers._replace(
                gate_up_proj=QuantizedLinear(
                    w_q=gu.w_q.reshape(L, K, 2, n2 // 2),
                    scales=gu.scales.reshape(L, 2, n2 // 2),
                )
            )
        )
    multihost = mesh_spans_processes(mesh)

    def put(x, spec):
        if multihost and isinstance(x, jax.Array):
            # cross-process device_put needs a host (or global) source
            import numpy as np

            x = np.asarray(x)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(
        put,
        params,
        param_specs(
            params.layers.qkv_bias is not None,
            params.layers.moe_router is not None,
            params.layers.pre_ffw_norm is not None,
            params.layers.q_norm is not None,
            fused_quant=fused_quant,
        ),
    )


def shard_caches(kv_cache, mesh: Mesh):
    if mesh_spans_processes(mesh) and isinstance(kv_cache, jax.Array):
        # cross-process device_put needs a host (or global) source;
        # every process holds the identical zeroed cache
        import numpy as np

        kv_cache = np.asarray(kv_cache)
    return jax.device_put(kv_cache, NamedSharding(mesh, CACHE_SPEC))


def local_model_config(cfg: ModelConfig, tp: int) -> ModelConfig:
    """Per-shard head counts for a model axis of size ``tp``."""
    if cfg.num_kv_heads % tp or cfg.num_heads % tp:
        raise ValueError(
            f"model axis {tp} must divide heads "
            f"({cfg.num_heads}, kv {cfg.num_kv_heads})"
        )
    return dataclasses.replace(
        cfg,
        num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp,
        head_dim=cfg.head_size,  # pin: head size must not change
    )


def mesh_spans_processes(mesh: Mesh) -> bool:
    """True when the mesh covers devices of more than one JAX process
    (multi-host).  Engine paths use this to switch to SPMD discipline:
    explicit global placement of per-step host batches and replicated
    (host-readable) sampled outputs."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


def _global_put(mesh: Mesh):
    """Per-step input placement for multi-host SPMD engine loops.

    Under a process-spanning mesh, jit cannot auto-shard a host batch
    (implicit cross-process resharding is disallowed) — every process
    must pass the IDENTICAL full array and place it explicitly.  The
    engine's SPMD contract guarantees identical host state, so each
    call here forms the global array from this process's copy.
    Already-global arrays (session carries fed back in) pass through.
    """
    import numpy as np

    def put(x, spec):
        if isinstance(x, jax.Array) and len(x.sharding.device_set) > 1:
            return x  # already global on (a superset of) this mesh
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(
            x.dtype, jax.dtypes.prng_key
        ):
            kd = jax.device_put(
                np.asarray(jax.random.key_data(x)),
                NamedSharding(mesh, P()),
            )
            return jax.random.wrap_key_data(kd)
        return jax.device_put(np.asarray(x), NamedSharding(mesh, spec))

    return put


def make_sharded_forward(
    cfg: ModelConfig, mesh: Mesh, extras: ForwardExtras,
    tp_overlap: bool = False,
    multihost: bool = False,
):
    """Build the jitted multi-chip step.

    Returns ``step(params, token_ids, positions, kv_cache, *meta)``
    where the batch arrays carry a leading ``[data]`` replica axis:

      token_ids/positions/slot_mapping [D, T], query_start_loc [D, S+1],
      seq_lens [D, S], block_table [D, S, B] — each data shard's scheduler
      emits one row (block-table page ids are *local* to that shard's pool).

    Output logits are [D, T, vocab] (replicated over model).
    """
    tp = mesh.shape["model"]
    lcfg = local_model_config(cfg, tp)
    specs = param_specs(
        cfg.attention_bias, cfg.num_local_experts > 0,
        cfg.sandwich_norms, cfg.qk_norm,
        # fused-quant param trees are declared by the model config
        # (the engine sets it from the params when unset)
        fused_quant=cfg.quantization != "none",
    )
    if cfg.num_local_experts:
        assert cfg.num_local_experts % tp == 0, (
            "expert count must divide the model axis"
        )

    def step(
        params, token_ids, positions, kv_cache,
        query_start_loc, seq_lens, block_table, slot_mapping,
    ):
        meta = AttentionMetadata(
            query_start_loc=query_start_loc[0],
            seq_lens=seq_lens[0],
            block_table=block_table[0],
            slot_mapping=slot_mapping[0],
            num_seqs=jnp.int32(seq_lens.shape[1]),
        )
        logits, kv = forward_fn(
            params, lcfg, token_ids[0], positions[0], kv_cache,
            meta, extras, tp_axis="model", tp_overlap=tp_overlap,
        )
        if multihost:
            # replicate logits across the data axis so EVERY host can
            # read them (sampling is host-local under SPMD serving)
            return jax.lax.all_gather(logits, "data"), kv
        return logits[None], kv

    batch_spec = P("data")
    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(
            specs, batch_spec, batch_spec, CACHE_SPEC,
            batch_spec, batch_spec, batch_spec, batch_spec,
        ),
        out_specs=(P() if multihost else P("data"), CACHE_SPEC),
        check_vma=False,
    )
    jitted = jax.jit(mapped, donate_argnums=(3,))
    if not multihost:
        return jitted
    put = _global_put(mesh)
    b = P("data")

    def step_mh(
        params, token_ids, positions, kv_cache,
        query_start_loc, seq_lens, block_table, slot_mapping,
    ):
        return jitted(
            params, put(token_ids, b), put(positions, b), kv_cache,
            put(query_start_loc, b), put(seq_lens, b),
            put(block_table, b), put(slot_mapping, b),
        )

    return step_mh


def make_sharded_decode_steps(
    cfg: ModelConfig,
    mesh: Mesh,
    extras: ForwardExtras,
    num_steps: int,
    block_size: int,
    greedy_only: bool = False,
    tp_overlap: bool = False,
    with_logprob: bool = False,
    multihost: bool = False,
):
    """TP/DP-sharded fused multi-step decode (runtime/multistep.py analog).

    Batch arrays carry the leading [data] replica axis as in
    :func:`make_sharded_forward`; sampling runs identically on every model
    shard from replicated logits and the shared RNG key, so the sampled
    tokens are replicated without extra communication.  Returns
    ``step(params, tokens[D,S], seq_lens[D,S], block_table[D,S,B],
    live[D,S], max_lens[D,S], kv_cache, st (SamplingTensors [D,S]), key)
    -> (sampled [D,K,S], logprobs [D,K,S] | None, next_tokens,
    final_lens, next_key, kv_cache)``.
    """
    import jax.numpy as jnp

    from vllm_triton_backend_tpu.runtime.sampler import sample

    tp = mesh.shape["model"]
    lcfg = local_model_config(cfg, tp)
    specs = param_specs(
        cfg.attention_bias, cfg.num_local_experts > 0,
        cfg.sandwich_norms, cfg.qk_norm,
        # fused-quant param trees are declared by the model config
        # (the engine sets it from the params when unset)
        fused_quant=cfg.quantization != "none",
    )
    if cfg.num_local_experts:
        assert cfg.num_local_experts % tp == 0, (
            "expert count must divide the model axis"
        )

    from vllm_triton_backend_tpu.runtime.sampler import SamplingTensors

    def step(
        params, tokens, seq_lens, block_table, live, max_lens,
        kv_cache, st, rng_key,
    ):
        toks0, lens0, tbl = tokens[0], seq_lens[0], block_table[0]
        lv, ml = live[0], max_lens[0]
        st0 = SamplingTensors(*(a[0] for a in st))
        num_seqs = toks0.shape[0]
        qsl = jnp.arange(num_seqs + 1, dtype=jnp.int32)

        def body(carry, _):
            toks, lens, kv, key = carry
            key, sub = jax.random.split(key)
            still = jnp.logical_and(lv, lens < ml)
            pos = lens - 1
            page = jnp.take_along_axis(
                tbl, (pos // block_size)[:, None], axis=1
            )[:, 0]
            slots = jnp.where(
                still, page * block_size + pos % block_size, -1
            ).astype(jnp.int32)
            meta = AttentionMetadata(
                query_start_loc=qsl,
                seq_lens=lens,
                block_table=tbl,
                slot_mapping=slots,
                num_seqs=jnp.int32(num_seqs),
            )
            logits, kv = forward_fn(
                params, lcfg, toks, pos, kv, meta, extras,
                tp_axis="model", tp_overlap=tp_overlap,
            )
            res = sample(
                logits, st0, sub,
                greedy_only=greedy_only, with_logprob=with_logprob,
            )
            nxt, lp = res if with_logprob else (res, jnp.float32(0))
            nxt = jnp.where(still, nxt, toks)
            lens = jnp.where(still, lens + 1, lens)
            return (nxt, lens, kv, key), (nxt, lp)

        (toks0, lens0, kv_cache, rng_key), (sampled, lps) = jax.lax.scan(
            body, (toks0, lens0, kv_cache, rng_key), None,
            length=num_steps,
        )
        if multihost:
            # replicate the sampled tokens over the data axis so every
            # host's engine loop can read them (SPMD serving)
            return (
                jax.lax.all_gather(sampled, "data"),
                jax.lax.all_gather(lps, "data") if with_logprob else None,
                toks0[None], lens0[None], rng_key, kv_cache,
            )
        return (
            sampled[None],
            lps[None] if with_logprob else None,
            toks0[None], lens0[None], rng_key, kv_cache,
        )

    b = P("data")
    sampled_spec = P() if multihost else b
    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(
            specs, b, b, b, b, b, CACHE_SPEC, b, P(),
        ),
        out_specs=(
            sampled_spec, sampled_spec if with_logprob else None,
            b, b, P(), CACHE_SPEC,
        ),
        check_vma=False,
    )
    jitted = jax.jit(mapped, donate_argnums=(6,))
    if not multihost:
        return jitted
    put = _global_put(mesh)

    def step_mh(
        params, tokens, seq_lens, block_table, live, max_lens,
        kv_cache, st, rng_key,
    ):
        st = SamplingTensors(*(put(a, b) for a in st))
        return jitted(
            params, put(tokens, b), put(seq_lens, b),
            put(block_table, b), put(live, b), put(max_lens, b),
            kv_cache, st, put(rng_key, P()),
        )

    return step_mh


# ---------------------------------------------------------------------------
# Hybrid (attention + Mamba) tensor parallelism
# ---------------------------------------------------------------------------
#
# Attention layers shard exactly like llama's (per-layer specs, no leading
# stacked-L axis: hybrid layers are a heterogeneous Python tuple).  Mamba
# layers shard the channel dim d_inner: in_proj/dt_proj column-parallel,
# conv/A/D/dt_bias and the state pools per-channel local, x_proj/out_proj
# row-parallel (psum inside models/hybrid._mamba_mixer).  The fused x|z
# in_proj needs a one-time column permutation so each shard's local columns
# are [x_shard, z_shard] and the in-shard split stays a contiguous halving
# (the Megatron fused-weight trick).

_ATTN_LAYER_SPECS = LayerParams(
    input_norm=P(None),
    q_proj=P(None, "model"),
    k_proj=P(None, "model"),
    v_proj=P(None, "model"),
    o_proj=P("model", None),
    post_attn_norm=P(None),
    gate_proj=P(None, "model"),
    up_proj=P(None, "model"),
    down_proj=P("model", None),
)

# state pools [Lm, slots, di, *]: channel dim over ``model``; the slots
# axis shards over ``data`` (each replica owns a contiguous local slot
# range with its own reserved dead slot 0, like the page-pool slices)
STATE_POOL_SPEC = P(None, "data", "model", None)


def _mamba_layer_specs():
    from vllm_triton_backend_tpu.models.hybrid import MambaLayerParams

    return MambaLayerParams(
        norm=P(None),
        in_proj=P(None, "model"),
        conv_w=P("model", None),
        conv_b=P("model"),
        x_proj=P("model", None),
        dt_proj=P(None, "model"),
        dt_bias=P("model"),
        A_log=P("model", None),
        D=P("model"),
        out_proj=P("model", None),
    )


def hybrid_param_specs(cfg: ModelConfig):
    from vllm_triton_backend_tpu.models.hybrid import (
        HybridParams,
        block_types,
    )

    mamba_specs = _mamba_layer_specs()
    return HybridParams(
        embed=P(None, None),
        layers=tuple(
            _ATTN_LAYER_SPECS if kind == "attention" else mamba_specs
            for kind in block_types(cfg)
        ),
        final_norm=P(None),
        lm_head=P(None, "model"),
    )


def _permute_fused_in_proj(w, tp: int):
    """[h, 2*di] x|z-fused weight -> per-shard-grouped [x_s | z_s] columns."""
    h, two_di = w.shape
    di = two_di // 2
    return (
        w.reshape(h, 2, tp, di // tp)
        .transpose(0, 2, 1, 3)
        .reshape(h, two_di)
    )


def local_hybrid_config(cfg: ModelConfig, tp: int) -> ModelConfig:
    from vllm_triton_backend_tpu.models.hybrid import d_inner, dt_rank

    lcfg = local_model_config(cfg, tp)
    if d_inner(cfg) % tp:
        raise ValueError(
            f"model axis {tp} must divide mamba d_inner {d_inner(cfg)}"
        )
    # dt_rank / d_state stay global (replicated after the x_proj psum);
    # pin them so the per-shard hidden_size never changes their value.
    return dataclasses.replace(
        lcfg, mamba_dt_rank=dt_rank(cfg)
    )


def shard_hybrid_params(params, mesh: Mesh, cfg: ModelConfig):
    from vllm_triton_backend_tpu.models.hybrid import MambaLayerParams

    tp = mesh.shape["model"]
    layers = tuple(
        lp._replace(in_proj=_permute_fused_in_proj(lp.in_proj, tp))
        if isinstance(lp, MambaLayerParams)
        else lp
        for lp in params.layers
    )
    params = params._replace(layers=layers)
    return jax.tree.map(
        lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec)),
        params,
        hybrid_param_specs(cfg),
    )


def shard_state_pools(conv_state, ssm_state, mesh: Mesh):
    s = NamedSharding(mesh, STATE_POOL_SPEC)
    return jax.device_put(conv_state, s), jax.device_put(ssm_state, s)


def make_sharded_hybrid_forward(
    cfg: ModelConfig, mesh: Mesh, extras: ForwardExtras
):
    """Jitted multi-chip hybrid step (make_sharded_forward analog).

    Batch arrays carry a leading [data] replica axis; state pools and the
    kv cache are channel-/head-sharded over ``model``.  Returns
    ``step(params, token_ids, positions, kv_cache, conv_state, ssm_state,
    state_indices, query_start_loc, seq_lens, block_table, slot_mapping)
    -> (logits [D, T, vocab], kv_cache, conv_state, ssm_state)``.
    """
    from vllm_triton_backend_tpu.models import hybrid

    tp = mesh.shape["model"]
    lcfg = local_hybrid_config(cfg, tp)
    specs = hybrid_param_specs(cfg)

    def step(
        params, token_ids, positions, kv_cache, conv_state, ssm_state,
        state_indices, query_start_loc, seq_lens, block_table,
        slot_mapping,
    ):
        meta = AttentionMetadata(
            query_start_loc=query_start_loc[0],
            seq_lens=seq_lens[0],
            block_table=block_table[0],
            slot_mapping=slot_mapping[0],
            num_seqs=jnp.int32(seq_lens.shape[1]),
        )
        logits, kv, cs, ss = hybrid.forward_fn(
            params, lcfg, token_ids[0], positions[0], kv_cache,
            conv_state, ssm_state, state_indices[0], meta, extras,
            tp_axis="model",
        )
        return logits[None], kv, cs, ss

    b = P("data")
    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(
            specs, b, b, CACHE_SPEC, STATE_POOL_SPEC, STATE_POOL_SPEC,
            b, b, b, b, b,
        ),
        out_specs=(
            P("data"), CACHE_SPEC, STATE_POOL_SPEC, STATE_POOL_SPEC,
        ),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(3, 4, 5))


def make_sharded_hybrid_decode_steps(
    cfg: ModelConfig,
    mesh: Mesh,
    extras: ForwardExtras,
    num_steps: int,
    block_size: int,
    greedy_only: bool = False,
    with_logprob: bool = False,
):
    """TP-sharded fused multi-step decode for hybrid models — the
    :func:`make_sharded_decode_steps` analog with the conv/SSM state
    pools riding the scan carry (runtime/multistep.hybrid_decode_steps
    is the single-chip twin).

    Returns ``step(params, tokens[D,S], seq_lens[D,S], block_table
    [D,S,B], live[D,S], max_lens[D,S], kv_cache, conv_state, ssm_state,
    state_indices[D,S], st (SamplingTensors [D,S]), key) -> (sampled
    [D,K,S], logprobs [D,K,S] | None, next_tokens, final_lens, next_key,
    kv_cache, conv_state, ssm_state)``.
    """
    import jax.numpy as jnp

    from vllm_triton_backend_tpu.models import hybrid
    from vllm_triton_backend_tpu.runtime.sampler import (
        SamplingTensors,
        sample,
    )

    tp = mesh.shape["model"]
    lcfg = local_hybrid_config(cfg, tp)
    specs = hybrid_param_specs(cfg)

    def step(
        params, tokens, seq_lens, block_table, live, max_lens,
        kv_cache, conv_state, ssm_state, state_indices,
        st, rng_key,
    ):
        toks0, lens0, tbl = tokens[0], seq_lens[0], block_table[0]
        lv, ml, sidx0 = live[0], max_lens[0], state_indices[0]
        st0 = SamplingTensors(*(a[0] for a in st))
        num_seqs = toks0.shape[0]
        qsl = jnp.arange(num_seqs + 1, dtype=jnp.int32)

        def body(carry, _):
            toks, lens, kv, conv, ssm, key = carry
            key, sub = jax.random.split(key)
            still = jnp.logical_and(lv, lens < ml)
            pos = lens - 1
            page = jnp.take_along_axis(
                tbl, (pos // block_size)[:, None], axis=1
            )[:, 0]
            slots = jnp.where(
                still, page * block_size + pos % block_size, -1
            ).astype(jnp.int32)
            sidx = jnp.where(still, sidx0, -1).astype(jnp.int32)
            meta = AttentionMetadata(
                query_start_loc=qsl,
                seq_lens=lens,
                block_table=tbl,
                slot_mapping=slots,
                num_seqs=jnp.int32(num_seqs),
            )
            logits, kv, conv, ssm = hybrid.forward_fn(
                params, lcfg, toks, pos, kv, conv, ssm, sidx, meta,
                extras, tp_axis="model",
            )
            res = sample(
                logits, st0, sub,
                greedy_only=greedy_only, with_logprob=with_logprob,
            )
            nxt, lp = res if with_logprob else (res, jnp.float32(0))
            nxt = jnp.where(still, nxt, toks)
            lens = jnp.where(still, lens + 1, lens)
            return (nxt, lens, kv, conv, ssm, key), (nxt, lp)

        (
            (toks0, lens0, kv_cache, conv_state, ssm_state, rng_key),
            (sampled, lps),
        ) = jax.lax.scan(
            body,
            (toks0, lens0, kv_cache, conv_state, ssm_state, rng_key),
            None,
            length=num_steps,
        )
        return (
            sampled[None],
            lps[None] if with_logprob else None,
            toks0[None], lens0[None], rng_key,
            kv_cache, conv_state, ssm_state,
        )

    b = P("data")
    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(
            specs, b, b, b, b, b,
            CACHE_SPEC, STATE_POOL_SPEC, STATE_POOL_SPEC,
            b, b, P(),
        ),
        out_specs=(
            b, b if with_logprob else None, b, b, P(),
            CACHE_SPEC, STATE_POOL_SPEC, STATE_POOL_SPEC,
        ),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(6, 7, 8))
