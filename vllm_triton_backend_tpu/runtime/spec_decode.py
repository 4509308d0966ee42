"""Speculative decoding — draft-model propose, target verify, LOSSLESS
under greedy decoding.

No reference counterpart (the reference delegates serving to vLLM; spec
decode is a vLLM engine feature) — native here, built entirely from
machinery this engine already has:

* **Draft proposal** is the existing fused K-step decode scan
  (``runtime/multistep.decode_steps``) running the small draft model
  greedily on its own paged KV cache.
* **Target verification** is ONE standard mixed-batch forward: every
  sequence contributes ``k`` tokens (the current token + k-1 drafts),
  which is exactly the chunked-prefill executable shape — the same
  prefill attention kernel, the same static (num_tokens, qlen) bucket.
* **Cache self-healing**: draft and target share the scheduler's block
  tables (same page geometry, separate cache arrays sized to each
  model).  Rejected positions hold stale K/V, but every cache write
  happens at ``position == seq_len - 1`` BEFORE that position is ever
  attended, so the next round's writes overwrite rejected slots before
  any read — no rollback pass exists because none is needed.

Greedy losslessness: the verify pass computes the target's argmax at
every fed position; the emitted tokens are the target's own choices
(t_0..t_a where a = accepted-draft prefix length), so output is
token-identical to running the target alone — the draft only changes
how many tokens each step yields (1..k).

Numerics caveat (the standard batch-variance caveat every spec-decode
implementation carries): "the target's own argmax" is computed by the
qlen=k verify executable, while the non-spec baseline uses the qlen=1
decode executable.  In exact arithmetic they agree identically (the
f32 test suite pins this); under bf16, near-tied logits can argmax
differently between the two executables — outputs then differ from the
non-spec run the way any batching/bucketing change can, while remaining
the target model's own greedy choices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vllm_triton_backend_tpu.config import ModelConfig
from vllm_triton_backend_tpu.models.llama import ForwardExtras, forward_fn
from vllm_triton_backend_tpu.ops.metadata import AttentionMetadata


def ngram_propose(
    tokens: list[int], k: int, max_n: int = 3
) -> list[int] | None:
    """Prompt-lookup proposal (vLLM's ngram speculator): find the most
    recent earlier occurrence of the longest suffix n-gram (n = max_n
    down to 1) and propose the k tokens that followed it.  Host-side,
    draft-model-free; a wrong proposal costs nothing but acceptance
    (the verifier emits the target's own tokens regardless)."""
    t = len(tokens)
    for n in range(min(max_n, t - 1), 0, -1):
        suffix = tokens[t - n:]
        # most recent match first
        for start in range(t - n - 1, -1, -1):
            if tokens[start : start + n] == suffix:
                cont = tokens[start + n : start + n + k]
                if cont:
                    # pad short continuations by repeating the last
                    return (cont + [cont[-1]] * k)[:k]
    return None


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "extras", "k", "block_size"),
    donate_argnames=("kv_cache",),
)
def verify_step(
    params,
    cfg: ModelConfig,
    cur_tokens: jax.Array,  # [S] int32 last sampled token per seq
    drafts: jax.Array,  # [k-1, S] int32 draft proposals
    seq_lens: jax.Array,  # [S] int32 length INCLUDING cur token
    block_table: jax.Array,  # [S, max_blocks]
    live: jax.Array,  # [S] bool
    kv_cache: jax.Array,
    extras: ForwardExtras,  # max_query_len == k
    k: int,
    block_size: int,
):
    """Target forward over [cur, d_0..d_{k-2}] per sequence; returns
    (target_tokens [S, k] — the target's greedy choice at every fed
    position, n_accepted [S] — length of the matching draft prefix,
    kv_cache).  Emitting t_0..t_{n_acc} (n_acc+1 tokens) reproduces
    target-only greedy decoding exactly."""
    s = cur_tokens.shape[0]
    fed = jnp.concatenate([cur_tokens[None], drafts], axis=0)  # [k, S]
    tokens = fed.T.reshape(-1)  # [S*k], per-seq contiguous
    offs = jnp.arange(k, dtype=jnp.int32)
    positions = (
        (seq_lens - 1)[:, None] + offs[None, :]
    ).reshape(-1)
    qsl = jnp.arange(s + 1, dtype=jnp.int32) * k
    vis_lens = jnp.where(live, seq_lens + (k - 1), seq_lens)
    page = jnp.take_along_axis(
        block_table,
        (positions.reshape(s, k) // block_size),
        axis=1,
    )
    slots = jnp.where(
        live[:, None],
        page * block_size + positions.reshape(s, k) % block_size,
        -1,
    ).reshape(-1).astype(jnp.int32)
    meta = AttentionMetadata(
        query_start_loc=qsl,
        seq_lens=vis_lens,
        block_table=block_table,
        slot_mapping=slots,
        num_seqs=jnp.int32(s),
    )
    logits, kv_cache = forward_fn(
        params, cfg, tokens, positions, kv_cache, meta, extras
    )
    tgt = jnp.argmax(logits, axis=-1).astype(jnp.int32).reshape(s, k)
    match = drafts.T == tgt[:, : k - 1]  # [S, k-1]
    n_acc = jnp.sum(
        jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1
    )
    return tgt, n_acc, kv_cache


def rejection_accept(
    p: jax.Array,  # [S, k, V] target dist at each fed position
    q: jax.Array,  # [S, k-1, V] draft PROPOSAL dist at each position
    drafts: jax.Array,  # [S, k-1] proposed tokens (sampled from q)
    key: jax.Array,
):
    """Lossless-in-distribution speculative acceptance (Leviathan et
    al.): accept d_j with prob min(1, p_j(d_j)/q_j(d_j)); at the first
    rejection sample from the residual ``normalize(max(p - q, 0))``;
    when every draft is accepted, the bonus token samples from the last
    target dist directly (residual with q = 0).  Returns
    (tokens [S, k] — column j < n_acc holds d_j, column n_acc the
    resampled/bonus token — and n_acc [S]).

    Marginal of the emitted token at every position is EXACTLY p_j —
    the draft only changes how many tokens a round yields.
    """
    s, k, v = p.shape
    ku, kr = jax.random.split(key)
    u = jax.random.uniform(ku, (s, k - 1))
    p_d = jnp.take_along_axis(
        p[:, : k - 1], drafts[..., None], axis=-1
    )[..., 0]
    q_d = jnp.take_along_axis(q, drafts[..., None], axis=-1)[..., 0]
    ok = u * jnp.maximum(q_d, 1e-20) < p_d
    n_acc = jnp.sum(
        jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1
    )  # [S]
    # residual dist at the first-rejected position (or bonus at k-1)
    idx = jnp.minimum(n_acc, k - 1)
    p_at = jnp.take_along_axis(p, idx[:, None, None], axis=1)[:, 0]
    q_pad = jnp.concatenate(
        [q, jnp.zeros((s, 1, v), q.dtype)], axis=1
    )
    q_at = jnp.take_along_axis(q_pad, idx[:, None, None], axis=1)[:, 0]
    resid = jnp.maximum(p_at - q_at, 0.0)
    # all-rejected-by-construction guard: if resid sums to ~0 (p == q
    # exactly), fall back to p itself
    rs = jnp.sum(resid, axis=-1, keepdims=True)
    resid = jnp.where(rs > 1e-20, resid / jnp.maximum(rs, 1e-20), p_at)
    final = jax.random.categorical(
        kr, jnp.log(jnp.maximum(resid, 1e-30)), axis=-1
    ).astype(jnp.int32)
    cols = jnp.arange(k, dtype=jnp.int32)[None, :]
    d_pad = jnp.concatenate(
        [drafts, jnp.zeros((s, 1), jnp.int32)], axis=1
    )
    tokens = jnp.where(
        cols < n_acc[:, None], d_pad,
        jnp.where(cols == n_acc[:, None], final[:, None], 0),
    )
    return tokens, n_acc


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "extras", "k", "block_size"),
    donate_argnames=("kv_cache",),
)
def verify_step_stochastic(
    params,
    cfg: ModelConfig,
    cur_tokens: jax.Array,  # [S]
    drafts: jax.Array,  # [k-1, S]
    q_dists: jax.Array,  # [k-1, S, V] draft proposal dists
    temperature: jax.Array,  # [S] (0 = greedy row)
    seq_lens: jax.Array,
    block_table: jax.Array,
    live: jax.Array,
    kv_cache: jax.Array,
    rng_key: jax.Array,
    extras: ForwardExtras,
    k: int,
    block_size: int,
):
    """Stochastic verify: target forward over the fed tokens, tempered
    target dists, rejection acceptance.  Greedy rows (t == 0) use a
    one-hot target dist — the rejection rule then degenerates to exact
    argmax-prefix matching, so mixed greedy/stochastic batches share
    this one executable."""
    s = cur_tokens.shape[0]
    fed = jnp.concatenate([cur_tokens[None], drafts], axis=0)
    tokens = fed.T.reshape(-1)
    offs = jnp.arange(k, dtype=jnp.int32)
    positions = ((seq_lens - 1)[:, None] + offs[None, :]).reshape(-1)
    qsl = jnp.arange(s + 1, dtype=jnp.int32) * k
    vis_lens = jnp.where(live, seq_lens + (k - 1), seq_lens)
    page = jnp.take_along_axis(
        block_table, positions.reshape(s, k) // block_size, axis=1
    )
    slots = jnp.where(
        live[:, None],
        page * block_size + positions.reshape(s, k) % block_size,
        -1,
    ).reshape(-1).astype(jnp.int32)
    meta = AttentionMetadata(
        query_start_loc=qsl,
        seq_lens=vis_lens,
        block_table=block_table,
        slot_mapping=slots,
        num_seqs=jnp.int32(s),
    )
    logits, kv_cache = forward_fn(
        params, cfg, tokens, positions, kv_cache, meta, extras
    )
    tokens_out, n_acc = _accept_from_logits(
        logits, drafts, temperature, q_dists, rng_key, k
    )
    return tokens_out, n_acc, kv_cache


def _accept_from_logits(
    logits: jax.Array,  # [S*k, V] verify-pass logits, per-seq contiguous
    drafts: jax.Array,  # [k-1, S]
    temperature: jax.Array,  # [S]
    q_dists: jax.Array,  # [k-1, S, V]
    rng_key: jax.Array,
    k: int,
):
    s = drafts.shape[1]
    v = logits.shape[-1]
    logits = logits.reshape(s, k, v)
    t = jnp.maximum(temperature, 1e-6)[:, None, None]
    p = jax.nn.softmax(logits.astype(jnp.float32) / t, axis=-1)
    greedy_rows = (temperature <= 0.0)[:, None, None]
    one_hot = jax.nn.one_hot(
        jnp.argmax(logits, axis=-1), v, dtype=jnp.float32
    )
    p = jnp.where(greedy_rows, one_hot, p)
    return rejection_accept(
        p, q_dists.transpose(1, 0, 2), drafts.T, rng_key
    )


@functools.partial(jax.jit, static_argnames=("k", "stochastic"))
def spec_accept(
    logits: jax.Array,  # [S*k, V] from ANY verify forward (e.g. TP)
    drafts: jax.Array,  # [k-1, S]
    temperature: jax.Array,  # [S]
    q_dists: jax.Array | None,  # [k-1, S, V]; None for pure greedy
    rng_key: jax.Array,
    k: int,
    stochastic: bool = False,
):
    """Acceptance as a standalone jit, for engine paths whose verify
    forward lives elsewhere (TP shard_map): greedy prefix-match or
    rejection sampling on the verify logits."""
    if stochastic:
        return _accept_from_logits(
            logits, drafts, temperature, q_dists, rng_key, k
        )
    s = drafts.shape[1]
    tgt = jnp.argmax(logits, axis=-1).astype(jnp.int32).reshape(s, k)
    match = drafts.T == tgt[:, : k - 1]
    n_acc = jnp.sum(
        jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1
    )
    return tgt, n_acc


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "extras", "num_steps", "block_size"),
    donate_argnames=("kv_cache",),
)
def draft_steps_stochastic(
    params,
    cfg: ModelConfig,
    tokens: jax.Array,  # [S]
    seq_lens: jax.Array,  # [S]
    block_table: jax.Array,
    live: jax.Array,
    kv_cache: jax.Array,
    temperature: jax.Array,  # [S]
    rng_key: jax.Array,
    extras: ForwardExtras,
    num_steps: int,  # k: k-1 proposals + 1 write-only lookahead step
    block_size: int,
):
    """Draft proposal scan that also CAPTURES the proposal distribution
    q_j per step (rejection sampling needs p/q and the residual).
    Greedy rows propose their argmax with a one-hot q.  Returns
    (sampled [K, S], dists [K, S, V] f32, kv_cache)."""
    num_seqs = tokens.shape[0]
    qsl = jnp.arange(num_seqs + 1, dtype=jnp.int32)
    t3 = jnp.maximum(temperature, 1e-6)[:, None]
    greedy_rows = (temperature <= 0.0)[:, None]

    def body(carry, _):
        toks, lens, kv, key = carry
        key, sub = jax.random.split(key)
        pos = lens - 1
        page = jnp.take_along_axis(
            block_table, (pos // block_size)[:, None], axis=1
        )[:, 0]
        slots = jnp.where(
            live, page * block_size + pos % block_size, -1
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
        v = logits.shape[-1]
        q = jax.nn.softmax(logits.astype(jnp.float32) / t3, axis=-1)
        one_hot = jax.nn.one_hot(
            jnp.argmax(logits, axis=-1), v, dtype=jnp.float32
        )
        q = jnp.where(greedy_rows, one_hot, q)
        nxt = jax.random.categorical(
            sub, jnp.log(jnp.maximum(q, 1e-30)), axis=-1
        ).astype(jnp.int32)
        nxt = jnp.where(live, nxt, toks)
        lens = jnp.where(live, lens + 1, lens)
        return (nxt, lens, kv, key), (nxt, q)

    (tokens, seq_lens, kv_cache, rng_key), (sampled, dists) = (
        jax.lax.scan(
            body, (tokens, seq_lens, kv_cache, rng_key), None,
            length=num_steps,
        )
    )
    return sampled, dists, kv_cache


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg_t", "cfg_d", "extras_d", "extras_v", "k", "rounds",
        "block_size",
    ),
    donate_argnames=("kv_t", "kv_d"),
)
def spec_rounds(
    params_t,
    params_d,
    cfg_t: ModelConfig,
    cfg_d: ModelConfig,
    tokens: jax.Array,  # [S] current token per seq
    seq_lens: jax.Array,  # [S] length INCLUDING current token
    block_table: jax.Array,  # [S, max_blocks]
    live: jax.Array,  # [S] bool
    max_lens: jax.Array,  # [S] per-seq ceiling (reserved pages)
    kv_t: jax.Array,
    kv_d: jax.Array,
    extras_d: ForwardExtras,  # draft step (max_query_len == 1)
    extras_v: ForwardExtras,  # verify step (max_query_len == k)
    k: int,
    rounds: int,
    block_size: int,
):
    """R speculative rounds fused into ONE device dispatch (greedy,
    draft-model).  The measured per-round host cost is what made spec
    decoding lose 5.6-7.7x to the fused plain sessions
    (docs/spec_decode_tpu.md); this is the session treatment applied to
    speculation: draft-k -> verify -> accept chained by ``lax.scan``
    with zero host round-trips.

    Correctness rests on the same write-then-attend self-healing
    invariant as the host-orchestrated round (module docstring), which
    holds ACROSS chained rounds: every attended position is (re)written
    by the round that first attends it, so rejected positions' stale
    K/V in either cache is never read.

    A row FREEZES for a round when ``seq_lens + k - 1 > max_lens``
    (its verify would write past its reserved pages): no writes, no
    length advance — ``active[r]`` reports it so the host emits zero
    tokens for that (row, round).

    Returns (tgt [R, S, k] target tokens at each fed position,
    n_acc [R, S], active [R, S] bool, next_tokens [S], final_lens [S],
    kv_t, kv_d).
    """
    num_seqs = tokens.shape[0]
    qsl1 = jnp.arange(num_seqs + 1, dtype=jnp.int32)
    offs = jnp.arange(k, dtype=jnp.int32)

    def one_round(carry, _):
        toks, lens, kv_t, kv_d = carry
        active = jnp.logical_and(live, lens + (k - 1) <= max_lens)

        # ---- draft: k greedy steps (k-1 proposals + write-only
        # lookahead; see _step_spec's draft comment) ----
        def draft_body(dc, _):
            dt, dl, kvd = dc
            pos = dl - 1
            page = jnp.take_along_axis(
                block_table, (pos // block_size)[:, None], axis=1
            )[:, 0]
            slots = jnp.where(
                active, page * block_size + pos % block_size, -1
            ).astype(jnp.int32)
            meta = AttentionMetadata(
                query_start_loc=qsl1,
                seq_lens=dl,
                block_table=block_table,
                slot_mapping=slots,
                num_seqs=jnp.int32(num_seqs),
            )
            logits, kvd = forward_fn(
                params_d, cfg_d, dt, pos, kvd, meta, extras_d
            )
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(active, nxt, dt)
            dl = jnp.where(active, dl + 1, dl)
            return (nxt, dl, kvd), nxt

        (_, _, kv_d), drafts_all = jax.lax.scan(
            draft_body, (toks, lens, kv_d), None, length=k
        )
        drafts = drafts_all[: k - 1]  # [k-1, S]

        # ---- verify: target forward over [cur, d_0..d_{k-2}] ----
        fed = jnp.concatenate([toks[None], drafts], axis=0)  # [k, S]
        flat = fed.T.reshape(-1)
        positions = ((lens - 1)[:, None] + offs[None, :]).reshape(-1)
        qslk = jnp.arange(num_seqs + 1, dtype=jnp.int32) * k
        vis = jnp.where(active, lens + (k - 1), jnp.zeros_like(lens))
        page = jnp.take_along_axis(
            block_table, positions.reshape(num_seqs, k) // block_size,
            axis=1,
        )
        slots = jnp.where(
            active[:, None],
            page * block_size
            + positions.reshape(num_seqs, k) % block_size,
            -1,
        ).reshape(-1).astype(jnp.int32)
        meta = AttentionMetadata(
            query_start_loc=qslk,
            seq_lens=vis,
            block_table=block_table,
            slot_mapping=slots,
            num_seqs=jnp.int32(num_seqs),
        )
        logits, kv_t = forward_fn(
            params_t, cfg_t, flat, positions, kv_t, meta, extras_v
        )
        tgt = jnp.argmax(logits, axis=-1).astype(jnp.int32).reshape(
            num_seqs, k
        )
        match = drafts.T == tgt[:, : k - 1]
        n_acc = jnp.sum(
            jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1
        )
        n_acc = jnp.where(active, n_acc, 0)

        nxt = jnp.take_along_axis(tgt, n_acc[:, None], axis=1)[:, 0]
        toks = jnp.where(active, nxt, toks)
        lens = jnp.where(active, lens + n_acc + 1, lens)
        return (toks, lens, kv_t, kv_d), (tgt, n_acc, active)

    (tokens, seq_lens, kv_t, kv_d), (tgt_r, acc_r, act_r) = (
        jax.lax.scan(
            one_round, (tokens, seq_lens, kv_t, kv_d), None,
            length=rounds,
        )
    )
    return tgt_r, acc_r, act_r, tokens, seq_lens, kv_t, kv_d
