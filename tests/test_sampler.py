"""Sampler correctness: greedy, temperature, top-k, top-p, min-p,
penalties, logprobs."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_triton_backend_tpu.runtime.sampler import (
    PenaltyTensors,
    SamplingParams,
    SamplingTensors,
    apply_penalties,
    make_penalty_tensors,
    make_sampling_tensors,
    sample,
    sample_batch,
)


def _logits(rows):
    return jnp.asarray(np.array(rows, dtype=np.float32))


def _st(temp, top_p=None, top_k=None, min_p=None, seed=None):
    n = len(temp)
    return SamplingTensors(
        jnp.asarray(temp, jnp.float32),
        jnp.asarray(top_p if top_p is not None else [1.0] * n, jnp.float32),
        jnp.asarray(top_k if top_k is not None else [0] * n, jnp.int32),
        jnp.asarray(min_p if min_p is not None else [0.0] * n, jnp.float32),
        jnp.asarray(seed if seed is not None else [-1] * n, jnp.int32),
    )


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
        t = sample(logits, _st([1.0], top_k=[2]), jax.random.key(s))
        seen.add(int(t[0]))
    assert seen <= {0, 1}


def test_top_p_restricts_support():
    # probs ~ [0.97, 0.01, ...]; top_p=0.5 keeps only token 0
    logits = _logits([[10.0, 5.0, 4.0, 3.0]])
    for s in range(20):
        t = sample(logits, _st([1.0], top_p=[0.5]), jax.random.key(s))
        assert int(t[0]) == 0


def test_min_p_restricts_support():
    # probs ~ softmax([3, 3, 0, 0]): tokens 2/3 are ~5% of max; with
    # min_p=0.5 only the two near-max tokens survive
    logits = _logits([[3.0, 3.0, 0.0, 0.0]])
    seen = set()
    for s in range(60):
        t = sample(logits, _st([1.0], min_p=[0.5]), jax.random.key(s))
        seen.add(int(t[0]))
    assert seen <= {0, 1}
    # min_p=0 (disabled) must eventually sample the small tokens too
    seen = set()
    for s in range(200):
        t = sample(logits, _st([1.0]), jax.random.key(s))
        seen.add(int(t[0]))
    assert len(seen) >= 3


def test_mixed_batch_greedy_and_sampled():
    logits = _logits([[0.0, 8.0, 0.0, 0.0]] * 3)
    toks = sample(logits, _st([0.0, 1.0, 0.0]), jax.random.key(1))
    assert int(toks[0]) == 1 and int(toks[2]) == 1


def test_temperature_flattens():
    """High temperature must sample low-prob tokens eventually."""
    logits = _logits([[2.0, 1.0, 0.5, 0.0]])
    seen = set()
    for s in range(100):
        t = sample(logits, _st([100.0]), jax.random.key(s))
        seen.add(int(t[0]))
    assert len(seen) >= 3


def test_logprobs_greedy_matches_log_softmax():
    logits = _logits([[0.1, 5.0, 0.2, 0.3]])
    toks, lp = sample(
        logits, _st([0.0]), jax.random.key(0), with_logprob=True
    )
    expect = jax.nn.log_softmax(logits, axis=-1)[0, int(toks[0])]
    assert abs(float(lp[0]) - float(expect)) < 1e-5


def test_logprobs_stochastic_uses_scaled_distribution():
    logits = _logits([[2.0, 1.0, 0.0, -1.0]])
    temp = 2.0
    toks, lp = sample(
        logits, _st([temp]), jax.random.key(3), with_logprob=True
    )
    expect = jax.nn.log_softmax(logits / temp, axis=-1)[0, int(toks[0])]
    assert abs(float(lp[0]) - float(expect)) < 1e-5


# ---------------- penalties ----------------


class _Req:
    def __init__(self, sampling, out, prompt):
        self.sampling = sampling
        self.output_token_ids = out
        self.prompt_token_ids = prompt


def _pt(reqs, vocab, out_pad=8, prompt_pad=8):
    pt = make_penalty_tensors(reqs, len(reqs), vocab, out_pad, prompt_pad)
    return PenaltyTensors(*(jnp.asarray(a) for a in pt))


def test_presence_penalty_subtracts_once():
    logits = _logits([[1.0, 1.0, 1.0, 1.0]])
    r = _Req(
        SamplingParams(presence_penalty=0.5), out=[2, 2, 2], prompt=[0]
    )
    out = apply_penalties(logits, _pt([r], vocab=4))
    out = np.asarray(out)
    # presence: only token 2 penalized, once, despite 3 occurrences;
    # prompt token 0 NOT penalized (presence is output-only)
    np.testing.assert_allclose(out[0], [1.0, 1.0, 0.5, 1.0], rtol=1e-6)


def test_frequency_penalty_counts_occurrences():
    logits = _logits([[1.0, 1.0, 1.0, 1.0]])
    r = _Req(
        SamplingParams(frequency_penalty=0.25), out=[2, 2, 1], prompt=[0]
    )
    out = np.asarray(apply_penalties(logits, _pt([r], vocab=4)))
    np.testing.assert_allclose(out[0], [1.0, 0.75, 0.5, 1.0], rtol=1e-6)


def test_repetition_penalty_covers_prompt_and_output():
    logits = _logits([[2.0, -2.0, 2.0, 2.0]])
    r = _Req(
        SamplingParams(repetition_penalty=2.0), out=[1], prompt=[0]
    )
    out = np.asarray(apply_penalties(logits, _pt([r], vocab=4)))
    # token 0 (prompt): 2/2=1; token 1 (output, negative): -2*2=-4;
    # tokens 2,3 unseen: unchanged
    np.testing.assert_allclose(out[0], [1.0, -4.0, 2.0, 2.0], rtol=1e-6)


def test_penalties_batch_rows_independent():
    logits = _logits([[1.0, 1.0], [1.0, 1.0]])
    r0 = _Req(SamplingParams(presence_penalty=1.0), out=[0], prompt=[])
    r1 = _Req(SamplingParams(), out=[0], prompt=[])
    out = np.asarray(apply_penalties(logits, _pt([r0, r1], vocab=2)))
    np.testing.assert_allclose(out[0], [0.0, 1.0], rtol=1e-6)
    np.testing.assert_allclose(out[1], [1.0, 1.0], rtol=1e-6)


def test_make_sampling_tensors_padding():
    st = make_sampling_tensors(
        [SamplingParams(temperature=0.7, top_k=5, min_p=0.1)], pad_to=4
    )
    assert st.temperature.shape == (4,)
    assert st.temperature[0] == np.float32(0.7)
    assert st.top_k[0] == 5 and st.top_k[1] == 0
    assert st.min_p[0] == np.float32(0.1) and st.min_p[3] == 0.0


def test_seeded_rows_reproducible_and_key_independent():
    """A seeded row's draw depends only on (seed, ctr) — not on the
    shared engine key; unseeded rows still follow the shared key."""
    logits = _logits([[1.0, 1.0, 1.0, 1.0]] * 2)
    st = _st([1.0, 1.0], seed=[42, -1])
    ctr = jnp.asarray([7, 7], jnp.int32)
    a = sample(
        logits, st, jax.random.key(0),
        with_seeds=True, seed_ctr=ctr,
    )
    b = sample(
        logits, st, jax.random.key(999),  # different shared key
        with_seeds=True, seed_ctr=ctr,
    )
    assert int(a[0]) == int(b[0])  # seeded row unchanged
    # different counter -> (eventually) different draw for seeded row
    seen = {
        int(
            sample(
                logits, st, jax.random.key(0),
                with_seeds=True,
                seed_ctr=jnp.asarray([c, c], jnp.int32),
            )[0]
        )
        for c in range(20)
    }
    assert len(seen) > 1
