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


@functools.partial(jax.jit, static_argnames=("vocab_padded",))
def sample(
    logits: jax.Array,  # [num_seqs, vocab] f32 (last-token logits)
    temperature: jax.Array,  # [num_seqs] f32; 0 => greedy
    top_p: jax.Array,  # [num_seqs] f32
    top_k: jax.Array,  # [num_seqs] int32; 0 => disabled
    key: jax.Array,
    vocab_padded: int | None = None,
) -> jax.Array:
    """Sample one token per sequence. Returns [num_seqs] int32."""
    num_seqs, vocab = logits.shape
    if vocab_padded and vocab_padded > vocab:
        pad = jnp.full(
            (num_seqs, vocab_padded - vocab), -jnp.inf, logits.dtype
        )
        logits = jnp.concatenate([logits, pad], axis=-1)
        vocab = vocab_padded

    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # --- scaled logits for stochastic path ---
    t = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits / t

    # top-k: mask logits below the k-th largest (k==0 disables)
    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]  # [S, V] descending
    k_idx = jnp.clip(top_k - 1, 0, vocab - 1)
    kth = jnp.take_along_axis(sorted_desc, k_idx[:, None], axis=-1)
    k_mask = jnp.where(
        (top_k > 0)[:, None], scaled < kth, jnp.zeros_like(scaled, bool)
    )
    scaled = jnp.where(k_mask, -jnp.inf, scaled)

    # top-p (nucleus): keep the smallest prefix of the sorted probs with
    # cumulative mass >= top_p; implemented on sorted copy then mapped back
    # via threshold value.
    probs_sorted = jax.nn.softmax(
        jnp.sort(scaled, axis=-1)[:, ::-1], axis=-1
    )
    cumsum = jnp.cumsum(probs_sorted, axis=-1)
    # first index where cumsum >= top_p (inclusive)
    cutoff = jnp.sum(cumsum < top_p[:, None], axis=-1)  # [S]
    cutoff = jnp.clip(cutoff, 0, vocab - 1)
    thresh = jnp.take_along_axis(
        jnp.sort(scaled, axis=-1)[:, ::-1], cutoff[:, None], axis=-1
    )
    p_mask = jnp.where(
        (top_p < 1.0)[:, None], scaled < thresh, jnp.zeros_like(scaled, bool)
    )
    scaled = jnp.where(p_mask, -jnp.inf, scaled)

    sampled = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy, sampled)


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
