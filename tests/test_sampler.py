"""Sampler correctness: greedy, temperature, top-k, top-p masking."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_triton_backend_tpu.runtime.sampler import (
    SamplingParams,
    sample,
    sample_batch,
)


def _logits(rows):
    return jnp.asarray(np.array(rows, dtype=np.float32))


def test_greedy():
    logits = _logits([[0.1, 5.0, 0.2, 0.3], [2.0, 0.0, 9.0, -1.0]])
    toks = sample_batch(
        logits, [SamplingParams(), SamplingParams()], jax.random.key(0)
    )
    assert toks.tolist() == [1, 2]


def test_top_k_restricts_support():
    # with top_k=2 only the two largest logits may ever be sampled
    logits = _logits([[10.0, 9.0, 1.0, 0.0]] * 1)
    seen = set()
    for s in range(50):
        t = sample(
            logits,
            jnp.asarray([1.0]),
            jnp.asarray([1.0]),
            jnp.asarray([2], jnp.int32),
            jax.random.key(s),
        )
        seen.add(int(t[0]))
    assert seen <= {0, 1}


def test_top_p_restricts_support():
    # probs ~ [0.97, 0.01, ...]; top_p=0.5 keeps only token 0
    logits = _logits([[10.0, 5.0, 4.0, 3.0]])
    for s in range(20):
        t = sample(
            logits,
            jnp.asarray([1.0]),
            jnp.asarray([0.5]),
            jnp.asarray([0], jnp.int32),
            jax.random.key(s),
        )
        assert int(t[0]) == 0


def test_mixed_batch_greedy_and_sampled():
    logits = _logits([[0.0, 8.0, 0.0, 0.0]] * 3)
    temp = jnp.asarray([0.0, 1.0, 0.0])
    toks = sample(
        logits, temp, jnp.asarray([1.0] * 3), jnp.asarray([0] * 3, jnp.int32),
        jax.random.key(1),
    )
    assert int(toks[0]) == 1 and int(toks[2]) == 1


def test_temperature_flattens():
    """High temperature must sample low-prob tokens eventually."""
    logits = _logits([[2.0, 1.0, 0.5, 0.0]])
    seen = set()
    for s in range(100):
        t = sample(
            logits,
            jnp.asarray([100.0]),
            jnp.asarray([1.0]),
            jnp.asarray([0], jnp.int32),
            jax.random.key(s),
        )
        seen.add(int(t[0]))
    assert len(seen) >= 3
