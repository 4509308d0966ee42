"""Token sampler — greedy / temperature / top-k / top-p, batched + jittable.

The reference inherits sampling from vLLM's engine (SURVEY.md §1 L5); here it
is native.  Design: one jitted function over the whole batch with *per-
sequence* parameter vectors (temperature/top_p/top_k as arrays), so mixed
sampling configs share one executable — no per-request retrace.  Greedy is
temperature == 0 (the reference smoke test's SamplingParams(temperature=0),
reference scripts/offline_inference.py:74).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling configuration (host-side)."""

    temperature: float = 0.0  # 0 -> greedy
    top_p: float = 1.0
    top_k: int = 0  # 0 -> disabled
    max_tokens: int = 128
    stop_token_ids: tuple[int, ...] = field(default_factory=tuple)
    ignore_eos: bool = False
    seed: int | None = None


@functools.partial(
    jax.jit, static_argnames=("vocab_padded", "greedy_only")
)
def sample(
    logits: jax.Array,  # [num_seqs, vocab] f32 (last-token logits)
    temperature: jax.Array,  # [num_seqs] f32; 0 => greedy
    top_p: jax.Array,  # [num_seqs] f32
    top_k: jax.Array,  # [num_seqs] int32; 0 => disabled
    key: jax.Array,
    vocab_padded: int | None = None,
    greedy_only: bool = False,
) -> jax.Array:
    """Sample one token per sequence. Returns [num_seqs] int32.

    ``greedy_only`` is a STATIC host-known flag: when every request in the
    batch has temperature 0 the caller sets it and the stochastic path —
    including the full-vocab sort, ~4 ms/step for [16, 32k] on TPU v5e —
    is never traced.  The stochastic path itself sorts ONCE and derives
    both the top-k and top-p thresholds from that sorted copy (the first
    version sorted three times).
    """
    num_seqs, vocab = logits.shape
    if vocab_padded and vocab_padded > vocab:
        pad = jnp.full(
            (num_seqs, vocab_padded - vocab), -jnp.inf, logits.dtype
        )
        logits = jnp.concatenate([logits, pad], axis=-1)
        vocab = vocab_padded

    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if greedy_only:
        return greedy

    # --- scaled logits for stochastic path ---
    t = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits / t

    # ONE descending sort serves both filters.  Top-k keeps ranks < k;
    # masking ranks >= k on the sorted copy is identical to masking
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

    mask = (k_on & (scaled < kth)) | (
        (top_p < 1.0)[:, None] & (scaled < thresh)
    )
    scaled = jnp.where(mask, -jnp.inf, scaled)

    sampled = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy, sampled)


@functools.partial(jax.jit, static_argnames=("greedy_only",))
def sample_replicas(
    logits: jax.Array,  # [D, T, vocab] f32 (per-replica flat batches)
    logits_indices: jax.Array,  # [D, S] int32 last-token row per seq
    temperature: jax.Array,  # [D, S]
    top_p: jax.Array,  # [D, S]
    top_k: jax.Array,  # [D, S]
    key: jax.Array,
    greedy_only: bool = False,
) -> jax.Array:
    """Sample across stacked data-replica batches in ONE device call
    (per-replica host loops would pay a D2H round trip each)."""
    d, t, vocab = logits.shape
    s = logits_indices.shape[1]
    gathered = jnp.take_along_axis(
        logits, logits_indices[:, :, None], axis=1
    )  # [D, S, vocab]
    flat = sample(
        gathered.reshape(d * s, vocab),
        temperature.reshape(-1),
        top_p.reshape(-1),
        top_k.reshape(-1),
        key,
        greedy_only=greedy_only,
    )
    return flat.reshape(d, s)


def sample_batch(
    logits: jax.Array,
    params_list: list[SamplingParams],
    key: jax.Array,
) -> jax.Array:
    """Host-side convenience: build parameter vectors from a list of
    per-request SamplingParams and invoke the jitted sampler."""
    temp = jnp.asarray([p.temperature for p in params_list], jnp.float32)
    top_p = jnp.asarray([p.top_p for p in params_list], jnp.float32)
    top_k = jnp.asarray([p.top_k for p in params_list], jnp.int32)
    return sample(logits, temp, top_p, top_k, key)
