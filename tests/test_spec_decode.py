"""Speculative decoding: lossless greedy equality with a draft model.

The contract (runtime/spec_decode.py): output tokens are the TARGET's
own greedy choices regardless of draft quality — a perfect draft only
makes steps emit more tokens.  Both extremes are pinned: draft == target
(acceptance ~100%) and an unrelated random draft (low acceptance) must
both reproduce the draft-free engine exactly.
"""

import jax
import numpy as np
import pytest

from vllm_triton_backend_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)
from vllm_triton_backend_tpu.models.llama import init_params
from vllm_triton_backend_tpu.runtime.engine import LLMEngine
from vllm_triton_backend_tpu.runtime.sampler import SamplingParams


@pytest.fixture(scope="module")
def setup():
    cfg = EngineConfig(
        model=ModelConfig.tiny(dtype="float32"),
        cache=CacheConfig(block_size=16, num_blocks=96),
        scheduler=SchedulerConfig(
            max_num_seqs=4,
            max_num_batched_tokens=64,
            max_model_len=128,
            token_buckets=(8, 16, 32, 64),
        ),
    )
    params = init_params(cfg.model, jax.random.key(0))
    return cfg, params


def _run(cfg, params, prompts, n_new, **engine_kw):
    engine = LLMEngine(cfg, params=params, **engine_kw)
    for p in prompts:
        engine.add_request(p, SamplingParams(max_tokens=n_new))
    out = {}
    steps = 0
    while engine.has_unfinished():
        for o in engine.step():
            out[o.req_id] = o.output_token_ids
        steps += 1
        assert steps < 500
    return out, engine


def _prompts(cfg, seed=5):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, cfg.model.vocab_size, size=n).tolist()
        for n in (9, 21, 14)
    ]


def test_spec_decode_same_draft_lossless_and_accepting(setup):
    cfg, params = setup
    prompts = _prompts(cfg)
    base, _ = _run(cfg, params, prompts, n_new=24)
    spec, eng = _run(
        cfg, params, prompts, n_new=24,
        draft_params=params, draft_config=cfg.model, spec_k=4,
    )
    assert spec == base, "spec decode changed greedy output"
    st = eng._spec_stats
    assert st["rounds"] > 0, "spec path never engaged"
    # a perfect draft should be accepted nearly always
    assert st["accepted"] / max(1, st["drafted"]) > 0.9, st


def test_spec_decode_bad_draft_still_lossless(setup):
    cfg, params = setup
    prompts = _prompts(cfg, seed=6)
    draft_params = init_params(cfg.model, jax.random.key(999))
    base, _ = _run(cfg, params, prompts, n_new=16)
    spec, eng = _run(
        cfg, params, prompts, n_new=16,
        draft_params=draft_params, draft_config=cfg.model, spec_k=4,
    )
    assert spec == base, "bad draft corrupted greedy output"
    st = eng._spec_stats
    assert st["rounds"] > 0


def test_spec_decode_smaller_draft_model(setup):
    """Realistic shape: the draft is a SMALLER model (own hidden size,
    fewer layers) sharing only the page geometry."""
    cfg, params = setup
    import dataclasses as dc

    draft_cfg = dc.replace(
        ModelConfig.tiny(dtype="float32"),
        num_layers=1, hidden_size=128, intermediate_size=256,
        num_heads=2, num_kv_heads=1,
    )
    draft_params = init_params(draft_cfg, jax.random.key(3))
    prompts = _prompts(cfg, seed=7)
    base, _ = _run(cfg, params, prompts, n_new=16)
    spec, eng = _run(
        cfg, params, prompts, n_new=16,
        draft_params=draft_params, draft_config=draft_cfg, spec_k=3,
    )
    assert spec == base
    assert eng._spec_stats["rounds"] > 0


def test_spec_decode_with_stop_tokens(setup):
    """Stops inside an accepted run must truncate exactly as the
    baseline does (the _process_chunk budget path)."""
    cfg, params = setup
    prompts = _prompts(cfg, seed=8)[:1]
    base, _ = _run(cfg, params, prompts, n_new=24)
    stop_tok = base["req-0"][5]  # stop mid-stream

    def run(**kw):
        engine = LLMEngine(cfg, params=params, **kw)
        engine.add_request(
            prompts[0],
            SamplingParams(max_tokens=24, stop_token_ids=(stop_tok,)),
        )
        out = None
        while engine.has_unfinished():
            for o in engine.step():
                out = o
        return out

    b = run()
    s = run(draft_params=params, draft_config=cfg.model, spec_k=4)
    assert s.output_token_ids == b.output_token_ids
    assert s.finish_reason == "stopped"


def test_ngram_spec_lossless(setup):
    """Prompt-lookup (draft-free) speculation: lossless greedy equality;
    repetitive prompts give real acceptance."""
    cfg, params = setup
    # repetitive prompt -> greedy continuation loops -> ngram matches
    prompts = [[7, 8, 9, 7, 8, 9, 7, 8, 9, 7, 8]]
    base, _ = _run(cfg, params, prompts, n_new=24)
    spec, eng = _run(
        cfg, params, prompts, n_new=24, spec_ngram=True, spec_k=4,
    )
    assert spec == base
    assert eng._spec_stats["rounds"] > 0
    # random prompts must also stay lossless (acceptance may be ~0)
    prompts = _prompts(cfg, seed=9)
    base, _ = _run(cfg, params, prompts, n_new=12)
    spec, _ = _run(
        cfg, params, prompts, n_new=12, spec_ngram=True, spec_k=4,
    )
    assert spec == base


def test_ngram_propose_semantics():
    from vllm_triton_backend_tpu.runtime.spec_decode import ngram_propose

    # suffix [5, 6] seen earlier; continuation [7, 8]
    assert ngram_propose([5, 6, 7, 8, 1, 5, 6], k=2) == [7, 8]
    # longest n-gram wins over shorter, most recent match first
    toks = [1, 2, 3, 9, 1, 2, 3, 4, 1, 2, 3]
    assert ngram_propose(toks, k=1) == [4]
    # no match -> None
    assert ngram_propose([1, 2, 3], k=2) is None
    # short continuation pads by repeating the tail
    assert ngram_propose([4, 4], k=3) == [4, 4, 4]


def test_rejection_accept_marginal_is_target_dist():
    """The emitted FIRST token's marginal must be exactly p_0 regardless
    of the proposal q (lossless-in-distribution contract), measured
    empirically over many fixed seeds."""
    import jax.numpy as jnp

    from vllm_triton_backend_tpu.runtime.spec_decode import (
        rejection_accept,
    )

    v, k = 4, 3
    p0 = np.array([0.5, 0.25, 0.125, 0.125], np.float32)
    p = jnp.asarray(np.tile(p0, (1, k, 1)))
    q0 = np.array([0.1, 0.2, 0.3, 0.4], np.float32)  # very wrong draft
    q = jnp.asarray(np.tile(q0, (1, k - 1, 1)))

    counts = np.zeros(v)
    n = 3000
    rng = np.random.default_rng(0)
    for s in range(n):
        d = rng.choice(v, size=(1, k - 1), p=q0).astype(np.int32)
        toks, n_acc = rejection_accept(
            p, q, jnp.asarray(d), jax.random.key(s)
        )
        counts[int(np.asarray(toks)[0, 0])] += 1
    emp = counts / n
    np.testing.assert_allclose(emp, p0, atol=0.03)


def test_rejection_accept_perfect_draft_accepts():
    import jax.numpy as jnp

    from vllm_triton_backend_tpu.runtime.spec_decode import (
        rejection_accept,
    )

    v, k = 8, 4
    dist = np.full(v, 1.0 / v, np.float32)
    p = jnp.asarray(np.tile(dist, (1, k, 1)))
    q = jnp.asarray(np.tile(dist, (1, k - 1, 1)))
    acc = 0
    for s in range(200):
        d = np.random.default_rng(s).integers(
            0, v, (1, k - 1)
        ).astype(np.int32)
        _, n_acc = rejection_accept(p, q, jnp.asarray(d), jax.random.key(s))
        acc += int(np.asarray(n_acc)[0])
    # p == q -> ratio 1 -> always accept
    assert acc == 200 * (k - 1)


def test_spec_decode_stochastic_runs_and_near_greedy_matches(setup):
    """temperature ~0 stochastic spec == greedy baseline (rejection
    sampling degenerates to argmax); a real temperature run completes
    with the spec path engaged and respects max_tokens."""
    cfg, params = setup
    prompts = _prompts(cfg, seed=10)
    base, _ = _run(cfg, params, prompts, n_new=16)

    def run_t(t, **kw):
        engine = LLMEngine(cfg, params=params, **kw)
        for p in prompts:
            engine.add_request(
                p, SamplingParams(temperature=t, max_tokens=16)
            )
        out = {}
        while engine.has_unfinished():
            for o in engine.step():
                out[o.req_id] = o.output_token_ids
        return out, engine

    near, eng = run_t(
        1e-6, draft_params=params, draft_config=cfg.model, spec_k=4
    )
    assert near == base
    assert eng._spec_stats["rounds"] > 0

    hot, eng2 = run_t(
        0.8, draft_params=params, draft_config=cfg.model, spec_k=4
    )
    assert eng2._spec_stats["rounds"] > 0
    assert all(len(v) == 16 for v in hot.values())


def test_spec_decode_tp_lossless(setup):
    """Spec decode on a TP=2 engine: sharded verify via the TP prefill
    executable, replicated draft — exact greedy equality vs the TP
    baseline, and stochastic rounds engage."""
    from vllm_triton_backend_tpu.config import ParallelConfig

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    cfg, params = setup
    tp_cfg = cfg.replace(parallel=ParallelConfig(tensor_parallel=2))
    prompts = _prompts(cfg, seed=11)
    base, _ = _run(tp_cfg, params, prompts, n_new=16)
    spec, eng = _run(
        tp_cfg, params, prompts, n_new=16,
        draft_params=params, draft_config=cfg.model, spec_k=4,
    )
    assert spec == base
    st = eng._spec_stats
    assert st["rounds"] > 0
    assert st["accepted"] / max(1, st["drafted"]) > 0.9, st
    # ngram + TP also lossless
    spec2, eng2 = _run(
        tp_cfg, params, prompts, n_new=16, spec_ngram=True, spec_k=3,
    )
    assert spec2 == base
    assert eng2._spec_stats["rounds"] > 0


def test_acceptance_gate_suspends_weak_draft(setup, monkeypatch):
    """VERDICT r4 #7: with a weak draft, the rolling-acceptance gate
    suspends speculation (falling back to plain decode paths) and the
    output stays lossless; after the re-probe horizon spec re-engages."""
    monkeypatch.setenv("VTB_SPEC_GATE_WINDOW", "3")
    monkeypatch.setenv("VTB_SPEC_GATE_MIN_DRAFTED", "6")
    monkeypatch.setenv("VTB_SPEC_REPROBE_STEPS", "6")
    cfg, params = setup
    prompts = _prompts(cfg, seed=11)
    draft_params = init_params(cfg.model, jax.random.key(12345))
    base, _ = _run(cfg, params, prompts, n_new=40)
    spec, eng = _run(
        cfg, params, prompts, n_new=40,
        draft_params=draft_params, draft_config=cfg.model, spec_k=4,
    )
    assert spec == base, "gated spec decode changed greedy output"
    # the random draft's acceptance is near zero: the gate must have
    # tripped at least once
    assert eng._spec_suspended_until > 0, (
        "acceptance gate never suspended a near-zero-acceptance draft"
    )
    st = eng._spec_stats
    acc = st["accepted"] / max(1, st["drafted"])
    assert acc < 0.5, f"random draft unexpectedly accepted: {acc}"


def test_acceptance_gate_stays_open_for_good_draft(setup, monkeypatch):
    """A perfect draft must never trip the gate."""
    monkeypatch.setenv("VTB_SPEC_GATE_WINDOW", "3")
    monkeypatch.setenv("VTB_SPEC_GATE_MIN_DRAFTED", "6")
    cfg, params = setup
    prompts = _prompts(cfg, seed=13)
    spec, eng = _run(
        cfg, params, prompts, n_new=40,
        draft_params=params, draft_config=cfg.model, spec_k=4,
    )
    assert eng._spec_suspended_until == 0, (
        "gate suspended a perfect draft"
    )
