"""Engine-level tests: allocator, scheduler, continuous-batching e2e.

The gold check: greedy generation through the full engine (continuous
batching, chunked prefill, prefix caching) must produce exactly the same
tokens as a naive one-request-at-a-time decode loop over the same model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_triton_backend_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)
from vllm_triton_backend_tpu.models.llama import (
    ForwardExtras,
    forward,
    init_params,
    make_kv_caches,
)
from vllm_triton_backend_tpu.ops.metadata import make_metadata
from vllm_triton_backend_tpu.runtime.block_allocator import BlockAllocator
from vllm_triton_backend_tpu.runtime.engine import LLMEngine
from vllm_triton_backend_tpu.runtime.sampler import SamplingParams
from vllm_triton_backend_tpu.runtime.scheduler import (
    Request,
    Scheduler,
)


# ---------------- allocator ----------------


def test_allocator_alloc_free():
    a = BlockAllocator(num_blocks=8, block_size=4)
    sb = a.allocate("s1", list(range(10)))  # 3 pages
    assert len(sb.pages) == 3
    assert a.num_free_blocks == 5
    a.free("s1")
    assert a.num_free_blocks == 8


def test_allocator_prefix_cache_hit():
    a = BlockAllocator(num_blocks=16, block_size=4)
    prompt = list(range(12))
    a.allocate("s1", prompt)
    a.publish_full_blocks("s1", prompt)
    sb2 = a.allocate("s2", prompt + [99])
    # 3 full blocks published; all 3 reusable (13-token prompt)
    assert sb2.num_cached_tokens == 12
    assert sb2.pages[:3] == a.block_table("s1")[:3]
    # divergent prompt must not match beyond the shared prefix
    sb3 = a.allocate("s3", [7] + prompt)
    assert sb3.num_cached_tokens == 0


def test_allocator_whole_prompt_cached_leaves_one_block():
    """A fully-cached prompt must still recompute >= 1 token for logits."""
    a = BlockAllocator(num_blocks=16, block_size=4)
    prompt = list(range(8))
    a.allocate("s1", prompt)
    a.publish_full_blocks("s1", prompt)
    sb = a.allocate("s2", prompt)
    assert sb.num_cached_tokens == 4  # not 8


def test_allocator_eviction_reuses_cached_pages():
    a = BlockAllocator(num_blocks=4, block_size=4)
    a.allocate("s1", list(range(8)))
    a.publish_full_blocks("s1", list(range(8)))
    a.free("s1")  # pages go evictable, content retained
    assert a.num_free_blocks == 4
    # new allocation larger than free list forces eviction
    a.allocate("s2", list(range(100, 116)))
    assert a.num_free_blocks == 0


def test_allocator_exhaustion_raises():
    a = BlockAllocator(num_blocks=2, block_size=4)
    a.allocate("s1", list(range(8)))
    with pytest.raises(MemoryError):
        a.allocate("s2", [1, 2, 3, 4, 5])


# ---------------- scheduler ----------------


def _mk_scheduler(max_tokens=16, max_seqs=4, blocks=64, bs=4, chunked=True):
    return Scheduler(
        SchedulerConfig(
            max_num_seqs=max_seqs,
            max_num_batched_tokens=max_tokens,
            max_model_len=64,
            enable_chunked_prefill=chunked,
            token_buckets=(8, 16, 32),
        ),
        CacheConfig(block_size=bs, num_blocks=blocks),
    )


def test_scheduler_chunked_prefill():
    s = _mk_scheduler(max_tokens=8)
    s.add_request(Request("r1", list(range(20)), SamplingParams()))
    b1 = s.schedule()
    assert b1.num_tokens == 8 and b1.num_seqs == 1
    s.update(b1, np.zeros(4, np.int32), None)
    b2 = s.schedule()
    assert b2.num_tokens == 8
    assert b2.seq_lens[0] == 16
    s.update(b2, np.zeros(4, np.int32), None)
    b3 = s.schedule()
    assert b3.num_tokens == 4  # last prompt chunk
    s.update(b3, np.asarray([42, 0, 0, 0], np.int32), None)
    assert s.requests["r1"].output_token_ids == [42]


def test_scheduler_mixed_batch_and_slots():
    s = _mk_scheduler(max_tokens=16)
    s.add_request(Request("a", list(range(5)), SamplingParams()))
    b = s.schedule()
    s.update(b, np.asarray([7] * 4, np.int32), None)
    s.add_request(Request("b", list(range(50, 56)), SamplingParams()))
    b2 = s.schedule()  # decode of a (1 tok) + prefill of b (6 tok)
    assert b2.num_seqs == 2
    assert b2.num_tokens == 7
    # slot mapping of a's decode token: position 5
    pages_a = s.allocator.block_table("a")
    assert b2.slot_mapping[0] == pages_a[1] * 4 + 1


def test_scheduler_prefill_priority_defers_decodes():
    """With prefill_priority, decode rows wait while prompts queue —
    keeping batch rows in lockstep for the fused decode session."""
    import dataclasses

    s = _mk_scheduler(max_tokens=16)
    s.config = dataclasses.replace(s.config, prefill_priority=True)
    s.add_request(Request("a", list(range(5)), SamplingParams()))
    b = s.schedule()
    s.update(b, np.asarray([7] * 4, np.int32), None)
    s.add_request(Request("b", list(range(50, 56)), SamplingParams()))
    b2 = s.schedule()  # ONLY b's prefill; a's decode deferred
    assert b2.num_seqs == 1
    assert b2.req_ids == ["b"]
    s.update(b2, np.asarray([9] * 4, np.int32), None)
    b3 = s.schedule()  # queue drained: both decode
    assert b3.num_seqs == 2


def test_scheduler_prefill_priority_falls_back_when_blocked():
    """If no prefill can be scheduled (page pool exhausted), the
    deferred decodes still run — no livelock."""
    import dataclasses

    s = _mk_scheduler(max_tokens=16, blocks=3, bs=4)
    s.config = dataclasses.replace(s.config, prefill_priority=True)
    s.add_request(Request("a", list(range(8)), SamplingParams()))
    b = s.schedule()
    s.update(b, np.asarray([7] * 4, np.int32), None)
    # queue a prompt too big for the remaining single page
    s.add_request(Request("big", list(range(100, 140)), SamplingParams()))
    b2 = s.schedule()
    assert b2.num_seqs == 1 and b2.req_ids == ["a"]  # decode fallback


# ---------------- engine e2e ----------------


@pytest.fixture(scope="module")
def tiny_engine_setup():
    cfg = EngineConfig(
        model=ModelConfig.tiny(dtype="float32"),
        cache=CacheConfig(block_size=16, num_blocks=128),
        scheduler=SchedulerConfig(
            max_num_seqs=4,
            max_num_batched_tokens=64,
            max_model_len=128,
            token_buckets=(8, 16, 32, 64),
        ),
    )
    params = init_params(cfg.model, jax.random.key(0))
    return cfg, params


def naive_greedy(cfg, params, prompt, n_new):
    """One-request reference decode loop (no engine)."""
    mc, cc = cfg.model, cfg.cache
    kv_cache = make_kv_caches(mc, cc.num_blocks, cc.block_size)
    bt = np.arange(8, dtype=np.int32).reshape(1, 8)
    toks = list(prompt)
    ctx = 0
    out = []
    step_tokens = toks
    while len(out) < n_new:
        meta = make_metadata([len(step_tokens)], [ctx], bt, cc.block_size)
        extras = ForwardExtras(
            max_query_len=1 if len(step_tokens) == 1 else 64,
            max_seq_len=128,
        )
        logits, kv_cache = forward(
            params, mc,
            jnp.asarray(step_tokens, jnp.int32),
            jnp.arange(ctx, ctx + len(step_tokens), dtype=jnp.int32),
            kv_cache, meta, extras,
        )
        nxt = int(jnp.argmax(logits[-1]))
        out.append(nxt)
        ctx += len(step_tokens)
        step_tokens = [nxt]
    return out


def test_engine_matches_naive_loop(tiny_engine_setup):
    cfg, params = tiny_engine_setup
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(0, cfg.model.vocab_size, size=n).tolist()
        for n in (5, 23, 12)
    ]
    n_new = 6

    engine = LLMEngine(cfg, params=params)
    for p in prompts:
        engine.add_request(p, SamplingParams(max_tokens=n_new))
    results = {}
    while engine.has_unfinished():
        for out in engine.step():
            results[out.req_id] = out.output_token_ids

    for i, p in enumerate(prompts):
        expect = naive_greedy(cfg, params, p, n_new)
        assert results[f"req-{i}"] == expect, f"prompt {i} diverged"


def test_engine_prefix_cache_reuse(tiny_engine_setup):
    """Second request sharing a long prefix must give identical output."""
    cfg, params = tiny_engine_setup
    rng = np.random.default_rng(1)
    base = rng.integers(0, cfg.model.vocab_size, size=40).tolist()

    engine = LLMEngine(cfg, params=params)
    r1 = engine.add_request(base, SamplingParams(max_tokens=4))
    results = {}
    while engine.has_unfinished():
        for out in engine.step():
            results[out.req_id] = out.output_token_ids
    # same prompt again: hits the prefix cache (only last block recomputed)
    r2 = engine.add_request(base, SamplingParams(max_tokens=4))
    while engine.has_unfinished():
        for out in engine.step():
            results[out.req_id] = out.output_token_ids
    assert results[r1] == results[r2]
    assert engine.scheduler.requests[r2].num_computed_tokens >= 32


def test_session_survives_pool_pressure():
    """Per-chunk session reservation (VERDICT r1 item 9): with a pool too
    small for full-horizon preallocation the fused decode session must
    still engage (partial budget) and produce the same greedy tokens as
    a roomy pool."""
    from vllm_triton_backend_tpu.models.llama import init_params

    mc = ModelConfig.tiny(dtype="float32")
    params = init_params(mc, jax.random.key(0))
    sched = SchedulerConfig(
        max_num_seqs=2, max_num_batched_tokens=32,
        max_model_len=64, token_buckets=(8, 16, 32),
    )
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, mc.vocab_size, size=8).tolist()
               for _ in range(2)]

    def run(num_blocks):
        cfg = EngineConfig(
            model=mc,
            cache=CacheConfig(block_size=16, num_blocks=num_blocks),
            scheduler=sched,
        )
        eng = LLMEngine(cfg, params=params, multistep=8)
        for p in prompts:
            eng.add_request(p, SamplingParams(max_tokens=40))
        growth = []
        out = {}
        while eng.has_unfinished():
            before = sum(
                len(r.output_token_ids)
                for r in eng.all_requests().values()
            )
            for o in eng.step():
                out[o.req_id] = o.output_token_ids
            after = sum(
                len(r.output_token_ids)
                for r in eng.all_requests().values()
            )
            growth.append(after - before)
        return out, growth

    roomy, _ = run(64)
    tight, growth = run(5)  # full horizon needs 6 new pages; only 3 free
    assert roomy == tight
    # at least one step call advanced by a whole fused chunk (8/seq)
    assert max(growth) >= 16, growth


def test_auto_num_blocks():
    """num_blocks=0 auto-sizes the page pool (gpu_memory_utilization
    analog); on the CPU test mesh (no memory stats) it falls back to the
    deterministic small pool and the engine serves normally."""
    mc = ModelConfig.tiny(dtype="float32")
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(block_size=16, num_blocks=0),
        scheduler=SchedulerConfig(
            max_num_seqs=4,
            max_num_batched_tokens=64,
            max_model_len=128,
            token_buckets=(8, 16, 32, 64),
        ),
    )
    eng = LLMEngine(cfg, params=init_params(mc, jax.random.key(0)))
    assert eng.config.cache.num_blocks > 0
    eng.add_request([1, 2, 3, 4], SamplingParams(max_tokens=5))
    out = {}
    while eng.has_unfinished():
        for o in eng.step():
            out[o.req_id] = o.output_token_ids
    (ids,) = out.values()
    assert len(ids) == 5


def test_debug_metadata_guard(monkeypatch):
    """VTB_DEBUG=1 host sanitizer (SURVEY §5.2): malformed block tables
    fail with precise indices instead of an opaque device fault."""
    monkeypatch.setenv("VTB_DEBUG", "1")
    s = _mk_scheduler(max_tokens=16)
    s.add_request(Request("a", list(range(5)), SamplingParams()))
    b = s.schedule()  # valid batch passes the guard
    assert b.num_seqs == 1

    import dataclasses

    from vllm_triton_backend_tpu.utils.debug import check_batch_metadata

    # corrupt a copy of the batch: page id outside the pool
    bad_tbl = b.block_table.copy()
    bad_tbl[0, 0] = 10_000
    bad = dataclasses.replace(b, block_table=bad_tbl)
    with pytest.raises(ValueError, match="block_table"):
        check_batch_metadata(bad, s.allocator.num_blocks, s.block_size)
    # slot outside the cache
    bad_slots = b.slot_mapping.copy()
    bad_slots[0] = 10_000_000
    bad = dataclasses.replace(b, slot_mapping=bad_slots)
    with pytest.raises(ValueError, match="slot_mapping"):
        check_batch_metadata(bad, s.allocator.num_blocks, s.block_size)


def test_engine_warmup_drains_clean():
    """warmup() pre-compiles the serving executables by serving real
    requests and must leave the engine idle with nothing leaked."""
    cfg = EngineConfig(
        model=ModelConfig.tiny(dtype="float32"),
        cache=CacheConfig(block_size=16, num_blocks=96),
        scheduler=SchedulerConfig(
            max_num_seqs=4,
            max_num_batched_tokens=64,
            max_model_len=128,
            token_buckets=(16, 32, 64),
        ),
    )
    engine = LLMEngine(cfg, multistep=8)
    dt = engine.warmup()
    assert dt > 0
    assert not engine.has_unfinished()
    # the pool must be fully reclaimed after the warmup traffic
    assert engine.scheduler.allocator.num_free_blocks == 96
    # and a real request still serves normally afterwards
    engine.add_request(list(range(20)), SamplingParams(max_tokens=4))
    steps = 0
    while engine.has_unfinished() and steps < 100:
        engine.step()
        steps += 1
    out = [r for r in engine.all_requests().values()]
    assert any(len(r.output_token_ids) == 4 for r in out)


def test_deferred_prefill_pipeline_matches_synchronous():
    """Round 5: with prefill_priority, offline engines defer each
    prefill step's D2H/commit one step (scheduler.advance plans the next
    chunk from counts alone).  Outputs must be token-exact vs the
    synchronous engine, including stop-token and max_tokens finishes."""
    import dataclasses

    import jax
    import numpy as np

    from vllm_triton_backend_tpu.config import (
        CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
    )
    from vllm_triton_backend_tpu.models.llama import init_params
    from vllm_triton_backend_tpu.runtime.engine import LLMEngine
    from vllm_triton_backend_tpu.runtime.sampler import SamplingParams

    cfg = EngineConfig(
        model=ModelConfig.tiny(dtype="float32"),
        cache=CacheConfig(block_size=16, num_blocks=96),
        scheduler=SchedulerConfig(
            max_num_seqs=4,
            max_num_batched_tokens=32,  # chunks 70-token prompts
            max_model_len=128,
            token_buckets=(8, 16, 32),
            prefill_priority=True,
        ),
    )
    params = init_params(cfg.model, jax.random.key(0))
    rng = np.random.default_rng(9)
    prompts = [
        rng.integers(0, cfg.model.vocab_size, size=n).tolist()
        for n in (70, 45, 33, 12)
    ]

    def run(poll_hook):
        engine = LLMEngine(cfg, params=params, multistep=4)
        engine.poll_new_work = poll_hook  # None -> deferral eligible
        for i, p in enumerate(prompts):
            engine.add_request(
                p, SamplingParams(max_tokens=10), req_id=f"r{i}"
            )
        out, steps = {}, 0
        deferred = 0
        while engine.has_unfinished():
            deferred += engine._pending_step is not None
            for o in engine.step():
                out[o.req_id] = o.output_token_ids
            steps += 1
            assert steps < 200
        assert engine._pending_step is None  # fully drained
        return out, deferred

    sync, _ = run(lambda: False and None or False)  # poll set: no defer
    piped, n_def = run(None)
    assert n_def > 0, "deferral never engaged"
    assert piped == sync, f"pipeline diverged:\n{piped}\nvs\n{sync}"
