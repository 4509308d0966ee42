"""Failure detection / recovery (SURVEY §5.3).

Three layers, matching the survey's "health-check + replica restart at
the serving layer" demand:

* ``LLMEngine.recover()`` — device fault mid-generation: all in-flight
  requests requeue for recompute and the final greedy output is
  IDENTICAL to a fault-free run (requests keep their generated tokens).
* ``EngineWorker`` — the serving loop catches a step exception, recovers
  in-process, and the client still gets the right completion.
* ``Supervisor`` — process-level crash/hang: child restarted with
  backoff; clean exits are not resurrected.
"""

import sys

import jax
import numpy as np
import pytest

from vllm_triton_backend_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)
from vllm_triton_backend_tpu.entrypoints.supervisor import Supervisor
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


def _drive(engine, prompts, n_new, fault_at=None):
    """Run the engine to completion; optionally simulate a device fault
    (recover()) after step ``fault_at``."""
    for p in prompts:
        engine.add_request(p, SamplingParams(max_tokens=n_new))
    results, steps = {}, 0
    while engine.has_unfinished():
        for out in engine.step():
            results[out.req_id] = out.output_token_ids
        steps += 1
        if fault_at is not None and steps == fault_at:
            requeued = engine.recover()
            assert requeued > 0, "fault injected with nothing in flight"
            fault_at = None
        assert steps < 500, "no progress after recovery (deadlock?)"
    return results


@pytest.mark.parametrize("multistep", [0, 32])
def test_engine_recover_mid_flight(setup, multistep):
    cfg, params = setup
    rng = np.random.default_rng(2)
    prompts = [
        rng.integers(0, cfg.model.vocab_size, size=n).tolist()
        for n in (9, 21, 14)
    ]
    n_new = 12

    clean = _drive(
        LLMEngine(cfg, params=params, multistep=multistep),
        prompts, n_new,
    )

    engine = LLMEngine(cfg, params=params, multistep=multistep)
    old_cache = engine.kv_cache
    # fault right after the prefill step, with every request in flight
    faulted = _drive(engine, prompts, n_new, fault_at=1)
    assert engine.kv_cache is not old_cache, "device cache not rebuilt"
    assert faulted == clean, "recovery changed generated tokens"


def test_engine_recover_resets_prefix_cache(setup):
    """Post-fault page contents are suspect: the prefix cache must not
    serve pre-fault pages."""
    cfg, params = setup
    rng = np.random.default_rng(3)
    base = rng.integers(0, cfg.model.vocab_size, size=40).tolist()

    engine = LLMEngine(cfg, params=params)
    clean = _drive(engine, [base], 4)
    engine.recover()
    # same prompt again: must recompute (0 cached), same output
    sb = engine.scheduler.allocator.allocate("probe", base)
    assert sb.num_cached_tokens == 0
    engine.scheduler.allocator.free("probe")
    again = _drive(engine, [base], 4)
    assert list(clean.values()) == list(again.values())


def test_worker_recovers_from_step_fault(setup):
    """The serving loop heals a step exception without dropping the
    request (openai_server.EngineWorker)."""
    from vllm_triton_backend_tpu.entrypoints.openai_server import (
        EngineWorker,
    )

    cfg, params = setup
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, cfg.model.vocab_size, size=11).tolist()

    expect = _drive(LLMEngine(cfg, params=params), [prompt], 8)

    engine = LLMEngine(cfg, params=params)
    real_step = engine.step
    calls = {"n": 0}

    def flaky_step():
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected device fault")
        return real_step()

    engine.step = flaky_step
    worker = EngineWorker(engine)
    worker.start()
    try:
        _, out_q = worker.submit(prompt, SamplingParams(max_tokens=8))
        deltas: list[int] = []
        while True:
            kind, payload = out_q.get(timeout=120)
            if kind == "done":
                break
            deltas.extend(payload)
    finally:
        worker.stop()
    assert worker.metrics["recoveries_total"] == 1
    assert deltas == list(expect.values())[0]


# ---------------- process supervisor ----------------


def test_supervisor_restarts_crashed_child(tmp_path):
    marker = tmp_path / "runs.txt"
    cmd = [
        sys.executable, "-c",
        "import sys; open(sys.argv[1], 'a').write('x'); sys.exit(1)",
        str(marker),
    ]
    sup = Supervisor(
        cmd, poll_interval=0.05, max_restarts=2, backoff=0.01
    )
    rc = sup.run()
    assert rc == 1
    assert sup.restarts == 2
    assert marker.read_text() == "xxx"  # initial run + 2 restarts


def test_supervisor_leaves_clean_exit(tmp_path):
    marker = tmp_path / "runs.txt"
    cmd = [
        sys.executable, "-c",
        "import sys; open(sys.argv[1], 'a').write('x')",
        str(marker),
    ]
    sup = Supervisor(cmd, poll_interval=0.05, max_restarts=5)
    assert sup.run() == 0
    assert sup.restarts == 0
    assert marker.read_text() == "x"
