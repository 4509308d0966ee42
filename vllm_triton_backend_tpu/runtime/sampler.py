"""Token sampler — greedy / temperature / top-k / top-p / min-p,
repetition / presence / frequency penalties, logprobs.  Batched + jittable.

The reference inherits sampling from vLLM's engine (SURVEY.md §1 L5); here
it is native, with vLLM's SamplingParams feature surface.  Design: one
jitted function over the whole batch with *per-sequence* parameter vectors
bundled into a :class:`SamplingTensors` pytree (temperature/top_p/top_k/
min_p as arrays), so mixed sampling configs share one executable — no
per-request retrace.  Greedy is temperature == 0 (the reference smoke
test's SamplingParams(temperature=0), reference scripts/
offline_inference.py:74).

Penalties are a separate, *optional* jitted pass (:func:`apply_penalties`)
over padded token-history arrays — they need the request's generated (and,
for repetition, prompt) token ids on device, so the engine only builds
those arrays when some request actually sets a penalty; the fused
multi-step decode sessions stay penalty-free-fast-path-only (a request
with penalties routes through the per-step loop).

Logprob reporting: ``with_logprob=True`` additionally returns the chosen
token's logprob under the temperature-scaled (and penalty-adjusted, when
the caller applied penalties) distribution BEFORE top-k/top-p truncation —
greedy rows report under the unscaled distribution.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling configuration (host-side)."""

    temperature: float = 0.0  # 0 -> greedy
    top_p: float = 1.0
    top_k: int = 0  # 0 -> disabled
    min_p: float = 0.0  # 0 -> disabled
    repetition_penalty: float = 1.0  # 1 -> disabled
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    max_tokens: int = 128
    # restrict sampling to this token set (vLLM allowed_token_ids)
    allowed_token_ids: tuple[int, ...] = field(default_factory=tuple)
    # additive per-token logit biases (OpenAI logit_bias)
    logit_bias: tuple[tuple[int, float], ...] = field(
        default_factory=tuple
    )
    stop_token_ids: tuple[int, ...] = field(default_factory=tuple)
    stop: tuple[str, ...] = field(default_factory=tuple)  # stop strings
    ignore_eos: bool = False
    logprobs: bool = False  # report chosen-token logprob per step
    seed: int | None = None

    @property
    def has_penalties(self) -> bool:
        return (
            self.repetition_penalty != 1.0
            or self.presence_penalty != 0.0
            or self.frequency_penalty != 0.0
        )

    @property
    def has_logit_adjustments(self) -> bool:
        return bool(self.allowed_token_ids) or bool(self.logit_bias)


class SamplingTensors(NamedTuple):
    """Per-sequence sampling parameter vectors — a jax pytree, so it
    passes through jit/scan/shard_map as one argument."""

    temperature: jax.Array  # [S] f32; 0 => greedy
    top_p: jax.Array  # [S] f32
    top_k: jax.Array  # [S] i32; 0 => disabled
    min_p: jax.Array  # [S] f32; 0 => disabled
    seed: jax.Array  # [S] i32; -1 => unseeded (shared engine RNG)


def make_sampling_tensors(
    params_list: list[SamplingParams], pad_to: int | None = None
):
    """Host-side: bundle per-request SamplingParams into padded numpy
    vectors (padding rows are greedy/no-op)."""
    import numpy as np

    n = pad_to or len(params_list)
    temp = np.zeros(n, np.float32)
    top_p = np.ones(n, np.float32)
    top_k = np.zeros(n, np.int32)
    min_p = np.zeros(n, np.float32)
    seed = np.full(n, -1, np.int32)
    for i, p in enumerate(params_list):
        temp[i] = p.temperature
        top_p[i] = p.top_p
        top_k[i] = p.top_k
        min_p[i] = p.min_p
        if p.seed is not None:
            seed[i] = p.seed
    return SamplingTensors(temp, top_p, top_k, min_p, seed)


def device_sampling_tensors(st: SamplingTensors) -> SamplingTensors:
    return SamplingTensors(*(jnp.asarray(a) for a in st))


@functools.partial(
    jax.jit,
    static_argnames=(
        "vocab_padded", "greedy_only", "with_logprob", "with_seeds",
    ),
)
def sample(
    logits: jax.Array,  # [num_seqs, vocab] f32 (last-token logits)
    st: SamplingTensors,  # [S] vectors
    key: jax.Array,
    vocab_padded: int | None = None,
    greedy_only: bool = False,
    with_logprob: bool = False,
    with_seeds: bool = False,
    seed_ctr: jax.Array | None = None,  # [S] i32 per-row draw counter
):
    """Sample one token per sequence. Returns [num_seqs] int32, or
    (tokens, logprobs [num_seqs] f32) when ``with_logprob``.

    ``greedy_only`` is a STATIC host-known flag: when every request in the
    batch has temperature 0 the caller sets it and the stochastic path —
    including the full-vocab sort, ~4 ms/step for [16, 32k] on TPU v5e —
    is never traced.  The stochastic path itself sorts ONCE and derives
    the top-k, top-p and min-p thresholds from that sorted copy (the
    first version sorted three times).
    """
    temperature, top_p, top_k, min_p, seed = st
    num_seqs, vocab = logits.shape
    if vocab_padded and vocab_padded > vocab:
        pad = jnp.full(
            (num_seqs, vocab_padded - vocab), -jnp.inf, logits.dtype
        )
        logits = jnp.concatenate([logits, pad], axis=-1)
        vocab = vocab_padded

    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if greedy_only:
        if not with_logprob:
            return greedy
        lp = jax.nn.log_softmax(logits, axis=-1)
        return greedy, jnp.take_along_axis(
            lp, greedy[:, None], axis=-1
        )[:, 0]

    # --- scaled logits for stochastic path ---
    t = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits / t

    # ONE descending sort serves all three filters.  Top-k keeps ranks
    # < k; masking ranks >= k on the sorted copy is identical to masking
    # values below the k-th largest on the unsorted copy.
    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]  # [S, V]
    ranks = jnp.arange(vocab, dtype=jnp.int32)[None, :]
    k_on = (top_k > 0)[:, None]
    keep_k_sorted = ~k_on | (ranks < top_k[:, None])
    k_idx = jnp.clip(top_k - 1, 0, vocab - 1)
    kth = jnp.take_along_axis(sorted_desc, k_idx[:, None], axis=-1)

    # top-p (nucleus) on the k-filtered sorted distribution: smallest
    # prefix with cumulative mass >= top_p, mapped back via threshold.
    probs_sorted = jax.nn.softmax(
        jnp.where(keep_k_sorted, sorted_desc, -jnp.inf), axis=-1
    )
    cumsum = jnp.cumsum(probs_sorted, axis=-1)
    cutoff = jnp.sum(cumsum < top_p[:, None], axis=-1)  # [S]
    cutoff = jnp.clip(cutoff, 0, vocab - 1)
    thresh = jnp.take_along_axis(sorted_desc, cutoff[:, None], axis=-1)

    # min-p: prob_i >= min_p * prob_max  <=>  scaled_i >= log(min_p) +
    # scaled_max (shared softmax denominator cancels) — no extra softmax.
    minp_thresh = (
        jnp.log(jnp.maximum(min_p, 1e-10))[:, None] + sorted_desc[:, :1]
    )

    mask = (
        (k_on & (scaled < kth))
        | ((top_p < 1.0)[:, None] & (scaled < thresh))
        | ((min_p > 0.0)[:, None] & (scaled < minp_thresh))
    )
    filtered = jnp.where(mask, -jnp.inf, scaled)

    sampled = jax.random.categorical(
        key, filtered, axis=-1
    ).astype(jnp.int32)
    if with_seeds:
        # per-request reproducible draws (SamplingParams.seed, the vLLM
        # ``seed`` semantic): row i draws with fold_in(key(seed_i),
        # ctr_i) where ctr is the sequence length at this step — the
        # draw depends only on the request's own history, never on
        # batch composition or the engine's shared RNG stream.
        ctr = (
            seed_ctr if seed_ctr is not None
            else jnp.zeros_like(seed)
        )

        def row_draw(lg, sd, c):
            k = jax.random.fold_in(jax.random.key(sd), c)
            return jax.random.categorical(k, lg).astype(jnp.int32)

        seeded_sampled = jax.vmap(row_draw)(filtered, seed, ctr)
        sampled = jnp.where(seed >= 0, seeded_sampled, sampled)
    out = jnp.where(temperature <= 0.0, greedy, sampled)
    if not with_logprob:
        return out
    # logprob of the chosen token: scaled (pre-filter) distribution for
    # stochastic rows, raw distribution for greedy rows
    lp_src = jnp.where(
        (temperature <= 0.0)[:, None], logits, scaled
    )
    lp = jax.nn.log_softmax(lp_src, axis=-1)
    return out, jnp.take_along_axis(lp, out[:, None], axis=-1)[:, 0]


class PenaltyTensors(NamedTuple):
    """Device-side token-history state for penalty application.

    ``out_tokens``/``prompt_tokens`` are right-padded with ``vocab`` (an
    out-of-range id that scatters into a dropped row)."""

    repetition: jax.Array  # [S] f32; 1 -> disabled
    presence: jax.Array  # [S] f32
    frequency: jax.Array  # [S] f32
    out_tokens: jax.Array  # [S, P] i32 generated ids, padded
    prompt_tokens: jax.Array  # [S, Q] i32 prompt ids, padded


def make_penalty_tensors(
    reqs, pad_to: int, vocab: int, out_pad: int, prompt_pad: int
):
    """Host-side: padded token-history arrays for :func:`apply_penalties`.
    ``reqs`` is a list of scheduler Requests (``sampling``,
    ``output_token_ids``, ``prompt_token_ids``)."""
    import numpy as np

    rep = np.ones(pad_to, np.float32)
    pres = np.zeros(pad_to, np.float32)
    freq = np.zeros(pad_to, np.float32)
    out_t = np.full((pad_to, out_pad), vocab, np.int32)
    prm_t = np.full((pad_to, prompt_pad), vocab, np.int32)
    for i, r in enumerate(reqs):
        sp = r.sampling
        rep[i] = sp.repetition_penalty
        pres[i] = sp.presence_penalty
        freq[i] = sp.frequency_penalty
        o = r.output_token_ids[-out_pad:] if out_pad else []
        out_t[i, : len(o)] = o
        p = r.prompt_token_ids[-prompt_pad:] if prompt_pad else []
        prm_t[i, : len(p)] = p
    return PenaltyTensors(rep, pres, freq, out_t, prm_t)


@jax.jit
def apply_penalties(
    logits: jax.Array,  # [S, vocab] f32
    pt: PenaltyTensors,
) -> jax.Array:
    """vLLM-semantics penalties (vllm/model_executor/layers/utils.py):

    * repetition: tokens in prompt ∪ output — positive logits divided by
      the penalty, negative multiplied.
    * presence: subtract once for every token present in the output.
    * frequency: subtract penalty × output-occurrence count.

    Token histories arrive as padded id arrays; counts are built with one
    scatter-add into a [S, vocab+1] buffer whose last row absorbs padding.
    """
    s, vocab = logits.shape
    rep, pres, freq, out_tokens, prompt_tokens = pt

    def count(tok):  # [S, N] ids -> [S, vocab] occurrence counts
        # ids outside [0, vocab) (padding sentinels; also robust when
        # logits carry extra pre-padded vocab columns) scatter zero into
        # a sacrificial column
        valid = (tok >= 0) & (tok < vocab)
        cnt = jnp.zeros((s, vocab + 1), jnp.float32)
        cnt = cnt.at[
            jnp.arange(s, dtype=jnp.int32)[:, None],
            jnp.where(valid, tok, vocab),
        ].add(valid.astype(jnp.float32))
        return cnt[:, :vocab]

    out_cnt = count(out_tokens)
    seen = (out_cnt > 0) | (count(prompt_tokens) > 0)
    rep_w = jnp.where(seen, rep[:, None], 1.0)
    logits = jnp.where(
        logits > 0, logits / rep_w, logits * rep_w
    )
    logits = logits - pres[:, None] * (out_cnt > 0)
    logits = logits - freq[:, None] * out_cnt
    return logits


def make_logit_adjustments(reqs, pad_to: int, vocab: int):
    """Host-side dense [S, vocab] additive adjustment from
    allowed_token_ids (disallowed -> -inf) and logit_bias — applied to
    logits before sampling (and before the greedy argmax)."""
    import numpy as np

    adj = np.zeros((pad_to, vocab), np.float32)
    for i, r in enumerate(reqs):
        sp = r.sampling
        if sp.allowed_token_ids:
            adj[i] = -np.inf
            ids = [t for t in sp.allowed_token_ids if 0 <= t < vocab]
            adj[i, ids] = 0.0
        for t, b in sp.logit_bias:
            if 0 <= t < vocab:
                adj[i, t] += b
    return adj


@functools.partial(
    jax.jit, static_argnames=("greedy_only", "with_logprob", "with_seeds")
)
def sample_replicas(
    logits: jax.Array,  # [D, T, vocab] f32 (per-replica flat batches)
    logits_indices: jax.Array,  # [D, S] int32 last-token row per seq
    st: SamplingTensors,  # [D, S] vectors
    key: jax.Array,
    greedy_only: bool = False,
    with_logprob: bool = False,
    pt: PenaltyTensors | None = None,  # [D, S] / [D, S, N] leaves
    with_seeds: bool = False,
    seed_ctr: jax.Array | None = None,  # [D, S]
    logit_adj: jax.Array | None = None,  # [D, S, vocab] additive
):
    """Sample across stacked data-replica batches in ONE device call
    (per-replica host loops would pay a D2H round trip each)."""
    d, t, vocab = logits.shape
    s = logits_indices.shape[1]
    gathered = jnp.take_along_axis(
        logits, logits_indices[:, :, None], axis=1
    )  # [D, S, vocab]
    rows = gathered.reshape(d * s, vocab)
    if logit_adj is not None:
        rows = rows + logit_adj.reshape(d * s, vocab)
    if pt is not None:
        rows = apply_penalties(
            rows,
            PenaltyTensors(
                *(a.reshape((d * s,) + a.shape[2:]) for a in pt)
            ),
        )
    flat = sample(
        rows,
        SamplingTensors(*(a.reshape(-1) for a in st)),
        key,
        greedy_only=greedy_only,
        with_logprob=with_logprob,
        with_seeds=with_seeds,
        seed_ctr=(
            seed_ctr.reshape(-1) if seed_ctr is not None else None
        ),
    )
    if with_logprob:
        toks, lp = flat
        return toks.reshape(d, s), lp.reshape(d, s)
    return flat.reshape(d, s)


def sample_batch(
    logits: jax.Array,
    params_list: list[SamplingParams],
    key: jax.Array,
) -> jax.Array:
    """Host-side convenience: build parameter vectors from a list of
    per-request SamplingParams and invoke the jitted sampler."""
    st = device_sampling_tensors(make_sampling_tensors(params_list))
    return sample(logits, st, key)
