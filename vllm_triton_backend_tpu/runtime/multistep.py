"""Fused multi-step decode: K engine steps in ONE device dispatch.

TPU-native throughput feature with no reference counterpart (the
reference's per-step host loop is vLLM's, hidden behind CUDA graphs —
SURVEY.md §1 L5).  On TPU the equivalent of "CUDA-graph the whole step" is
to *compile* the whole step — and once the step is compiled, K steps can be
``lax.scan``-ed into one executable:

  for each of K steps (on device, zero host round-trips):
    slot    = block_table[s, len // bs] * bs + len % bs
    logits  = forward(tokens, positions=len, slot_mapping=slot)
    token   = sample(logits)          (per-seq temperature/top-k/top-p)
    len    += 1  for live sequences

The host gets back [K, S] sampled tokens and applies stop conditions after
the fact (tokens past a stop are discarded; the over-written KV slots
belong to pages owned by the finished sequence, so they are reclaimed on
free).  The scheduler pre-allocates K slots per sequence before the call.

This amortizes host scheduling, H2D metadata transfers, and dispatch
latency over K tokens — the dominant cost of small-batch decode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vllm_triton_backend_tpu.config import ModelConfig
from vllm_triton_backend_tpu.models.llama import ForwardExtras, forward_fn
from vllm_triton_backend_tpu.ops.metadata import AttentionMetadata
from vllm_triton_backend_tpu.runtime.sampler import sample


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "extras", "greedy_only", "with_logprob", "with_seeds",
    ),
    donate_argnames=("kv_cache",),
)
def engine_step(
    params,
    cfg: ModelConfig,
    token_ids: jax.Array,  # [T] int32
    positions: jax.Array,  # [T] int32
    kv_cache: jax.Array,
    query_start_loc: jax.Array,
    seq_lens: jax.Array,
    block_table: jax.Array,
    slot_mapping: jax.Array,
    logits_indices: jax.Array,  # [S] int32 last-token index per seq
    st,  # SamplingTensors [S]
    rng_key: jax.Array,
    extras: ForwardExtras,
    greedy_only: bool = False,
    with_logprob: bool = False,
    pt=None,  # PenaltyTensors [S] | None
    with_seeds: bool = False,
    logit_adj=None,  # [S, vocab] additive (allowed-ids mask / biases)
):
    """One fully-fused engine step: forward + last-token gather + sample.

    The per-step host work reduces to H2D enqueues, ONE dispatch, and one
    D2H of the sampled tokens — each eager op between jit calls costs a
    host-device round trip, which dominates small-step latency.
    Returns (sampled [S], next_key, kv_cache) — with ``with_logprob``,
    (sampled, logprobs [S], next_key, kv_cache).
    """
    meta = AttentionMetadata(
        query_start_loc=query_start_loc,
        seq_lens=seq_lens,
        block_table=block_table,
        slot_mapping=slot_mapping,
        num_seqs=jnp.int32(seq_lens.shape[0]),
    )
    logits, kv_cache = forward_fn(
        params, cfg, token_ids, positions, kv_cache, meta, extras,
        logits_indices=logits_indices,
    )
    if logit_adj is not None:
        logits = logits + logit_adj
    if pt is not None:
        from vllm_triton_backend_tpu.runtime.sampler import (
            apply_penalties,
        )

        logits = apply_penalties(logits, pt)
    rng_key, sub = jax.random.split(rng_key)
    out = sample(
        logits, st, sub,
        greedy_only=greedy_only, with_logprob=with_logprob,
        with_seeds=with_seeds,
        seed_ctr=seq_lens if with_seeds else None,
    )
    if with_logprob:
        sampled, lp = out
        return sampled, lp, rng_key, kv_cache
    return out, rng_key, kv_cache


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "extras", "num_steps", "block_size", "greedy_only",
        "with_logprob",
    ),
    donate_argnames=("kv_cache",),
)
def decode_steps(
    params,
    cfg: ModelConfig,
    tokens: jax.Array,  # [S] int32 current last token per seq
    seq_lens: jax.Array,  # [S] int32 length INCLUDING current token
    block_table: jax.Array,  # [S, max_blocks] int32
    live: jax.Array,  # [S] bool — padding rows False
    max_lens: jax.Array,  # [S] int32 per-seq length ceiling (reserved)
    kv_cache: jax.Array,
    st,  # SamplingTensors [S]
    rng_key: jax.Array,
    extras: ForwardExtras,
    num_steps: int,
    block_size: int,
    greedy_only: bool = False,
    with_logprob: bool = False,
):
    """Returns (sampled [K, S], logprobs [K, S] | None, next_tokens [S],
    final_seq_lens, next_key, kv_cache).

    ``tokens[s]`` is the token to feed at the first step (the previously
    sampled one, already counted in ``seq_lens``, not yet in the cache).
    ``next_tokens``/``final_seq_lens``/``next_key`` are returned so a
    *session* of chained chunks needs ZERO host-side device ops between
    launches — every tiny op (slice, key split) costs a host round trip.

    ``max_lens`` freezes a row once its length reaches the ceiling: no
    cache write, no length advance.  Without it a sequence that finishes
    mid-session keeps decoding until the host notices (one chunk late) —
    positions past its reserved pages index block-table zeros, i.e.
    OTHER sequences' page 0.  It also lets the host reserve pages
    per-session-budget instead of full-horizon (VERDICT r1 item 9).
    """
    num_seqs = tokens.shape[0]
    qsl = jnp.arange(num_seqs + 1, dtype=jnp.int32)

    def body(carry, _):
        toks, lens, kv, key = carry
        key, sub = jax.random.split(key)
        still = jnp.logical_and(live, lens < max_lens)
        pos = lens - 1  # current token's position
        page = jnp.take_along_axis(
            block_table, (pos // block_size)[:, None], axis=1
        )[:, 0]
        slots = jnp.where(
            still, page * block_size + pos % block_size, -1
        ).astype(jnp.int32)
        meta = AttentionMetadata(
            query_start_loc=qsl,
            seq_lens=lens,
            block_table=block_table,
            slot_mapping=slots,
            num_seqs=jnp.int32(num_seqs),
        )
        logits, kv = forward_fn(
            params, cfg, toks, pos, kv, meta, extras
        )
        res = sample(
            logits, st, sub,
            greedy_only=greedy_only, with_logprob=with_logprob,
        )
        nxt, lp = res if with_logprob else (res, jnp.float32(0))
        nxt = jnp.where(still, nxt, toks)
        lens = jnp.where(still, lens + 1, lens)
        return (nxt, lens, kv, key), (nxt, lp)

    (tokens, seq_lens, kv_cache, rng_key), (sampled, lps) = jax.lax.scan(
        body, (tokens, seq_lens, kv_cache, rng_key), None,
        length=num_steps,
    )
    return (
        sampled, lps if with_logprob else None,
        tokens, seq_lens, rng_key, kv_cache,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "extras", "num_steps", "block_size", "greedy_only",
        "with_logprob",
    ),
    donate_argnames=("kv_cache", "conv_state", "ssm_state"),
)
def hybrid_decode_steps(
    params,
    cfg: ModelConfig,
    tokens: jax.Array,  # [S] int32 current last token per seq
    seq_lens: jax.Array,  # [S] int32 length INCLUDING current token
    block_table: jax.Array,  # [S, max_blocks] int32
    live: jax.Array,  # [S] bool
    max_lens: jax.Array,  # [S] int32
    kv_cache: jax.Array,
    conv_state: jax.Array,  # [Lm, slots, di, k-1]
    ssm_state: jax.Array,  # [Lm, slots, di, ds]
    state_indices: jax.Array,  # [S] int32 per-seq SSM slot (-1 = dead)
    st,  # SamplingTensors [S]
    rng_key: jax.Array,
    extras: ForwardExtras,
    num_steps: int,
    block_size: int,
    greedy_only: bool = False,
    with_logprob: bool = False,
):
    """Fused K-step decode for hybrid (attention + Mamba) models —
    :func:`decode_steps` with the SSM state pools in the scan carry.

    Frozen rows (length at ``max_lens``) redirect BOTH their KV slot
    (``-1`` -> trash page) and their SSM state slot (``-1`` -> reserved
    dead slot 0) so neither pool advances.  Returns
    (sampled [K, S], logprobs [K, S] | None, next_tokens, final_seq_lens,
    next_key, kv_cache, conv_state, ssm_state).
    """
    from vllm_triton_backend_tpu.models import hybrid

    num_seqs = tokens.shape[0]
    qsl = jnp.arange(num_seqs + 1, dtype=jnp.int32)

    def body(carry, _):
        toks, lens, kv, conv, ssm, key = carry
        key, sub = jax.random.split(key)
        still = jnp.logical_and(live, lens < max_lens)
        pos = lens - 1
        page = jnp.take_along_axis(
            block_table, (pos // block_size)[:, None], axis=1
        )[:, 0]
        slots = jnp.where(
            still, page * block_size + pos % block_size, -1
        ).astype(jnp.int32)
        sidx = jnp.where(still, state_indices, -1).astype(jnp.int32)
        meta = AttentionMetadata(
            query_start_loc=qsl,
            seq_lens=lens,
            block_table=block_table,
            slot_mapping=slots,
            num_seqs=jnp.int32(num_seqs),
        )
        logits, kv, conv, ssm = hybrid.forward_fn(
            params, cfg, toks, pos, kv, conv, ssm, sidx, meta, extras
        )
        res = sample(
            logits, st, sub,
            greedy_only=greedy_only, with_logprob=with_logprob,
        )
        nxt, lp = res if with_logprob else (res, jnp.float32(0))
        nxt = jnp.where(still, nxt, toks)
        lens = jnp.where(still, lens + 1, lens)
        return (nxt, lens, kv, conv, ssm, key), (nxt, lp)

    (
        (tokens, seq_lens, kv_cache, conv_state, ssm_state, rng_key),
        (sampled, lps),
    ) = jax.lax.scan(
        body,
        (tokens, seq_lens, kv_cache, conv_state, ssm_state, rng_key),
        None,
        length=num_steps,
    )
    return (
        sampled, lps if with_logprob else None,
        tokens, seq_lens, rng_key,
        kv_cache, conv_state, ssm_state,
    )
