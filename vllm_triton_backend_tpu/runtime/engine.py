"""The inference engine: model runner + scheduler + sampler in a step loop.

Replaces the reference's host framework (vLLM engine, SURVEY.md §1 L5).
``LLMEngine.step()`` is the production unit of work (the analog of vLLM's
``execute_model`` step the reference's metadata builder feeds, reference
backend/triton_attn.py:130-227): schedule → forward (jit, bucketed static
shapes) → sample → update request states.  ``LLM`` is the offline
user-facing wrapper (the ``offline_inference.py`` analog, reference
scripts/offline_inference.py:43-75).
"""

from __future__ import annotations

import itertools
import logging
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from vllm_triton_backend_tpu.config import EngineConfig
from vllm_triton_backend_tpu.models import llama
from vllm_triton_backend_tpu.models.llama import ForwardExtras
from vllm_triton_backend_tpu.ops.metadata import AttentionMetadata
from vllm_triton_backend_tpu.ops.pallas.quant_linear import QuantizedLinear
from vllm_triton_backend_tpu.runtime.multistep import decode_steps, engine_step
from vllm_triton_backend_tpu.runtime.sampler import SamplingParams, sample
from vllm_triton_backend_tpu.runtime.dp_engine import (
    DataParallelMixin,
    _reserve_session_tokens,
)
from vllm_triton_backend_tpu.runtime.spec_engine import SpecDecodeMixin
from vllm_triton_backend_tpu.runtime.scheduler import (
    Request,
    RequestStatus,
    ScheduledBatch,
    Scheduler,
)
from vllm_triton_backend_tpu.utils import get_dtype, next_power_of_2


@dataclass
class RequestOutput:
    req_id: str
    prompt_token_ids: list[int]
    output_token_ids: list[int]
    finish_reason: str
    text: str | None = None
    # chosen-token logprobs, 1:1 with output_token_ids (only when the
    # request set SamplingParams.logprobs)
    logprobs: list[float] | None = None


def _auto_num_blocks(mc, cc, cache_dtype, utilization, shards) -> int:
    """Auto-size the KV page pool from free device memory — the vLLM
    ``gpu_memory_utilization`` analog (the reference inherits this from
    vLLM at L5).  ``utilization`` caps the fraction of total device
    memory the engine may hold AFTER weights (``bytes_in_use`` at call
    time — params must be materialized first); the remainder is left for
    activations/logits.  Falls back to a safe small pool when the
    platform exposes no memory stats (the CPU test mesh)."""
    from vllm_triton_backend_tpu.utils import round_up

    _, n_layers = mc.kv_cache_slots()
    head_pad = max(128, round_up(mc.head_size, 128))
    page_bytes = (
        n_layers * 2 * mc.num_kv_heads * cc.block_size * head_pad
        * jnp.dtype(cache_dtype).itemsize
    )
    stats = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        pass
    limit = stats.get("bytes_limit")
    in_use = stats.get("bytes_in_use", 0)
    if not limit:
        n = 256  # no memory introspection: deterministic small pool
    else:
        free = int(limit * utilization) - in_use
        n = max(0, free // page_bytes - shards)
    return max(shards, n - n % shards)



class LLMEngine(SpecDecodeMixin, DataParallelMixin):
    def __init__(
        self,
        config: EngineConfig,
        params=None,
        eos_token_id: int | None = None,
        rng_seed: int = 0,
        multistep: int = 32,
        kv_scales: tuple[float, float] | None = None,
        draft_params=None,
        draft_config=None,
        spec_k: int = 4,
        spec_ngram: bool = False,
        spec_ngram_n: int = 3,
    ):
        """``draft_params``/``draft_config``: enable draft-model
        speculative decoding (runtime/spec_decode.py) — lossless under
        greedy; ``spec_k`` tokens per round (1 current + k-1 drafts).
        ``spec_ngram``: draft-FREE prompt-lookup speculation (vLLM's
        ngram speculator) — proposals come from suffix n-gram matches in
        the request's own tokens, verified by the same target pass."""
        self.config = config
        mc, cc = config.model, config.cache
        # Hybrid/SSM models: per-layer state pools + no prefix caching
        # (SSM state is not content-addressable).
        self.is_hybrid = (
            mc.architecture in ("mamba", "hybrid")
            or mc.layers_block_type is not None
        )
        sched_config = config.scheduler
        if self.is_hybrid:
            from vllm_triton_backend_tpu.models import hybrid

            self._hybrid = hybrid
            if params is None:
                params = hybrid.init_params(mc, jax.random.key(config.seed))
            import dataclasses as _dc

            sched_config = _dc.replace(
                sched_config, enable_prefix_caching=False
            )
            # Slot 0 is RESERVED as the dead/padding slot: the model clamps
            # state_indices == -1 to slot 0, and padded batch rows scatter
            # (stale) values there — a real request in slot 0 would race
            # with those duplicate-index writes.
            self._n_state_slots = 2 * sched_config.max_num_seqs + 3
            # local slot per request; replica-local free lists (one list
            # when dp == 1) — built after self.dp is known, see below
            self._slot_of: dict[str, int] = {}
        elif params is None:
            params = llama.init_params(mc, jax.random.key(config.seed))
        self.params = params
        cache_dtype = (
            jnp.dtype(mc.dtype)
            if cc.cache_dtype == "auto"
            else get_dtype(cc.cache_dtype)
        )
        if cc.num_blocks == 0:
            # auto-size the page pool from free device memory — the
            # vLLM ``gpu_memory_utilization`` knob (the reference gets
            # this from vLLM at L5; first-class here)
            import dataclasses as _dc

            n = _auto_num_blocks(
                mc, cc, cache_dtype,
                utilization=cc.memory_utilization,
                shards=max(
                    config.parallel.data_parallel,
                    config.parallel.context_parallel,
                ),
            )
            cc = _dc.replace(cc, num_blocks=n)
            config = _dc.replace(config, cache=cc)
            self.config = config
        self._cache_dtype = cache_dtype
        # Data parallelism: dp replica schedulers, each owning its own
        # page pool over a contiguous slice of the cache's blocks axis
        # (VERDICT r1 item 5: DP is a replica scheduler over the data
        # axis, not just a dryrun).
        self.dp = config.parallel.data_parallel
        self.tp = config.parallel.tensor_parallel
        self.pp = config.parallel.pipeline_parallel
        if self.dp > 1:
            assert cc.num_blocks % self.dp == 0
        if self.pp > 1:
            assert self.dp == 1 and not self.is_hybrid, (
                "pipeline parallel composes with dp in a later phase"
            )
            assert mc.num_layers % self.pp == 0
        self.cp = config.parallel.context_parallel
        if self.cp > 1:
            assert (
                self.dp == 1 and self.tp == 1 and self.pp == 1
                and not self.is_hybrid
            ), "context parallel composes with dp/tp/pp in a later phase"
            assert cc.num_blocks % self.cp == 0
            self.cp_chunk_len = sched_config.max_model_len // self.cp
            assert self.cp_chunk_len * self.cp == sched_config.max_model_len
            assert self.cp_chunk_len % cc.block_size == 0
        # Quantized fused-layout params under TP need the config to say
        # so (the shard_map spec trees are built from the config alone);
        # infer it from the params when the caller didn't set it.
        if (
            not self.is_hybrid
            and mc.quantization == "none"
            and params is not None
            and isinstance(
                getattr(params.layers, "qkv_proj", None), QuantizedLinear
            )
        ):
            import dataclasses as _dc

            wq = str(params.layers.qkv_proj.w_q.dtype)
            mc = _dc.replace(
                mc, quantization="int8" if wq == "int8" else "fp8"
            )
            self.config = config = config.replace(model=mc)

        # Tensor parallelism: shard weights/caches over the (dp, tp) mesh
        # and step through the shard_map forward (parallel/sharded.py).
        # Multi-host SPMD serving (SURVEY.md §5.8 / VERDICT r4 #2):
        # every process runs the SAME engine loop over the same request
        # stream (the caller's contract — add_request must be called
        # identically on every host), device arrays are global over a
        # process-spanning mesh, and sampled outputs are replicated so
        # each host's scheduler advances identically.  The model axis
        # stays within each host's devices (TP over ICI, DP over DCN).
        self.multihost = jax.process_count() > 1
        if self.multihost:
            assert not self.is_hybrid and self.pp == 1 and self.cp == 1, (
                "multi-host serving composes with hybrid/pp/cp in a "
                "later phase"
            )
        if (self.tp > 1 or self.dp > 1) and self.pp == 1:
            from vllm_triton_backend_tpu.parallel import (
                make_mesh,
                shard_params,
            )

            if self.multihost:
                from vllm_triton_backend_tpu.parallel.multihost import (
                    make_multihost_mesh,
                )

                self.mesh = make_multihost_mesh(model=self.tp)
                got = dict(self.mesh.shape)
                assert got == {"data": self.dp, "model": self.tp}, (
                    f"multihost mesh {got} != engine dp={self.dp} "
                    f"tp={self.tp}"
                )
            else:
                self.mesh = make_mesh(data=self.dp, model=self.tp)
            if self.is_hybrid:
                from vllm_triton_backend_tpu.parallel.sharded import (
                    shard_hybrid_params,
                )

                self.params = params = shard_hybrid_params(
                    params, self.mesh, mc
                )
            else:
                self.params = params = shard_params(params, self.mesh)
            self._tp_steps: dict = {}  # extras -> jitted sharded step
            self._tp_decode_steps: dict = {}  # (extras, k) -> jitted
        elif self.pp > 1:
            from vllm_triton_backend_tpu.parallel.pipeline import (
                make_pp_mesh,
                shard_params_pp,
            )

            self.mesh = make_pp_mesh(self.pp, tp=self.tp)
            self.params = params = shard_params_pp(params, self.mesh)
            self._pp_steps: dict = {}  # (extras, M) -> jitted pp forward
        elif self.cp > 1:
            from vllm_triton_backend_tpu.parallel.context import (
                make_cp_mesh,
            )

            self.mesh = make_cp_mesh(self.cp)
            self._cp_steps: dict = {}  # extras -> jitted cp forward
        if self.is_hybrid:
            self._free_slots = [
                list(range(1, self._n_state_slots))
                for _ in range(self.dp)
            ]
        self._build_caches()
        # one scheduler per data replica, each over its local block slice
        local_cc = cc
        if self.dp > 1:
            import dataclasses as _dc

            local_cc = _dc.replace(cc, num_blocks=cc.num_blocks // self.dp)
        if self.cp > 1:
            from vllm_triton_backend_tpu.runtime.block_allocator import (
                CPBlockAllocator,
            )

            cp_alloc = CPBlockAllocator(
                self.cp, cc.num_blocks // self.cp, cc.block_size,
                self.cp_chunk_len,
            )
            self.schedulers = [
                Scheduler(sched_config, cc, allocator=cp_alloc)
            ]
        else:
            self.schedulers = [
                Scheduler(sched_config, local_cc)
                for _ in range(self.dp)
            ]
        self.scheduler = self.schedulers[0]
        self._next_replica = 0
        self.eos_token_id = eos_token_id
        self._key = jax.random.key(rng_seed)
        self._id_counter = itertools.count()
        # fused multi-step decode chunk size (0/1 disables)
        self.multistep = multistep
        # Serving hook: when set (entrypoints.openai_server), the fused
        # decode session polls it at every chunk boundary and returns
        # early when new work arrived — without it a session runs to
        # completion of all running requests inside ONE step() call,
        # and arrivals wait multiple seconds (measured TTFT p99 5-10 s
        # at concurrency 2-4).  Chunk granularity bounds the added TTFT
        # to K decode steps.
        self.poll_new_work = None
        # Deferred prefill-pipeline step (batch, sampled_dev, lp_dev):
        # see _defer_prefill_ok / _flush_pending
        self._pending_step = None
        # Streaming low-latency mode (entrypoints.openai_server sets
        # this per step from live stream count x concurrency): caps the
        # fused-session chunk size so SSE deltas approach per-token
        # granularity at low concurrency — cap 1 routes to plain
        # one-token steps (ITL == TPOT), cap 2 halves chunk bursts.
        # None = throughput mode (full session ladder).
        self.session_k_cap: int | None = None
        # kv scales for quantized caches: explicit (calibrated via
        # runtime.calibration.calibrate_kv_scales — absmax over a
        # calibration batch, gated by eval_ppl) or heuristic defaults
        # assuming O(1)-magnitude K/V activations (fp8-e4m3 has the range
        # for scale 1.0; int8 maps the fixed-point range to ~[-8, 8]).
        if kv_scales is not None:
            self.k_scale, self.v_scale = kv_scales
        elif cc.cache_dtype == "int8":
            self.k_scale = self.v_scale = 1.0 / 16.0
        else:
            self.k_scale = self.v_scale = 1.0
        # ---- speculative decoding (draft model) ----
        self._spec_stats = {"rounds": 0, "drafted": 0, "accepted": 0}
        # Acceptance-gated speculation (VERDICT r4 #7): speculation is a
        # measured LOSS below a break-even acceptance (fused rounds run
        # 2.5-3.6x slower than plain sessions at acceptance ~0,
        # docs/spec_decode_tpu.md), so the engine protects itself — a
        # rolling window of recent rounds' acceptance suspends spec when
        # it predicts a loss and re-probes periodically.  Break-even
        # model: a round costs ~C plain-steps and emits 1 + a*(k-1)
        # tokens -> worth it iff a > (C-1)/(k-1); C~2.2 measured for
        # fused ngram rounds gives floor ~0.35 at k=4.
        self._spec_window: list[tuple[int, int]] = []  # (drafted, acc)
        self._spec_suspended_until = 0
        self._step_counter = 0
        self.spec_accept_floor = float(
            os.environ.get("VTB_SPEC_ACCEPT_FLOOR", "0.35")
        )
        self.spec_reprobe_steps = int(
            os.environ.get("VTB_SPEC_REPROBE_STEPS", "512")
        )
        # evidence the gate needs before judging: >= 2 rounds AND >=
        # this many drafted tokens in the window (one 2-round probe at
        # serving batch sizes; a batch-1 stream needs ~11 rounds)
        self.spec_gate_window = int(
            os.environ.get("VTB_SPEC_GATE_WINDOW", "32")
        )
        self.spec_gate_min_drafted = int(
            os.environ.get("VTB_SPEC_GATE_MIN_DRAFTED", "64")
        )
        self._spec_gate_log = logging.getLogger(__name__)
        self.draft_params = draft_params
        self.draft_config = draft_config
        self.spec_k = spec_k
        self.spec_ngram = spec_ngram
        self.spec_ngram_n = spec_ngram_n
        if draft_params is not None or spec_ngram:
            # TP targets verify through the sharded prefill step; the
            # (small) draft stays replicated.  dp/pp/cp: later phase.
            assert (
                self.dp == 1 and self.pp == 1
                and self.cp == 1 and not self.is_hybrid
            ), "speculative decoding: TP/single-chip llama engines"
        if draft_params is not None:
            assert draft_config is not None
            # the draft shares the scheduler's block tables: same page
            # geometry, its own cache array sized to the draft model
            self.draft_cache = llama.make_kv_caches(
                draft_config, cc.num_blocks, cc.block_size,
                self._cache_dtype,
            )

    def _hyb_free_slot(self, req_id: str, replica: int) -> None:
        slot = self._slot_of.pop(req_id, None)
        if slot is not None:
            self._free_slots[replica].append(slot)

    def abort_request(self, req_id: str) -> Request | None:
        """Stop a request wherever it lives (any replica scheduler);
        frees its pages (and hybrid SSM slot).  Returns the request, or
        None if unknown/already finished."""
        for ri, sched in enumerate(self.schedulers):
            req = sched.requests.get(req_id)
            if req is None:
                continue
            sched.abort_request(req_id)
            if self.is_hybrid:
                self._hyb_free_slot(req_id, ri)
            return req
        return None

    # ---------------- device state / failure recovery ----------------

    def _build_caches(self) -> None:
        """(Re)create the device-side KV cache — and, for hybrid models,
        the conv/SSM state pools — and apply the engine's sharding mode.

        Called once from ``__init__`` and again by :meth:`recover`: after
        a device fault the old buffers may be corrupt, donated-away, or
        gone entirely (runtime restart), so recovery rebuilds them from
        scratch rather than trying to salvage contents.
        """
        mc, cc = self.config.model, self.config.cache
        make_caches = (
            self._hybrid.make_kv_caches if self.is_hybrid
            else llama.make_kv_caches
        )
        # dp and cp both shard the blocks axis contiguously: each shard's
        # chunk = its local page pool + its own trash page
        block_shards = max(self.dp, self.cp)
        kv = make_caches(
            mc, cc.num_blocks, cc.block_size, self._cache_dtype,
            data_shards=block_shards,
        )
        if self.is_hybrid:
            # slots axis = dp contiguous replica-local ranges (each with
            # its own reserved dead slot 0), sharded over ``data``
            conv, ssm = self._hybrid.make_state_pools(
                mc, self.dp * self._n_state_slots
            )
            if self.tp > 1 or self.dp > 1:
                from vllm_triton_backend_tpu.parallel.sharded import (
                    shard_state_pools,
                )

                conv, ssm = shard_state_pools(conv, ssm, self.mesh)
            self.conv_state, self.ssm_state = conv, ssm
        if (self.tp > 1 or self.dp > 1) and self.pp == 1:
            from vllm_triton_backend_tpu.parallel import shard_caches

            kv = shard_caches(kv, self.mesh)
        elif self.pp > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            cache_spec = (
                P("stage", None, None, "model") if self.tp > 1
                else P("stage")
            )
            kv = jax.device_put(kv, NamedSharding(self.mesh, cache_spec))
        elif self.cp > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            kv = jax.device_put(
                kv, NamedSharding(self.mesh, P(None, "seq"))
            )
        self.kv_cache = kv

    def recover(self) -> int:
        """Failure recovery (SURVEY §5.3 — the reference leaves this to
        vLLM; native here): call after :meth:`step` raises.

        Drops ALL device-side sequence state (KV pages, prefix cache,
        hybrid SSM slots) and requeues every in-flight request for full
        recompute — requests keep their already-generated tokens and
        re-prefill prompt+generated on re-admission, so callers observe
        a latency blip, not lost output.  Returns the number of requests
        requeued.  The serving layer (`entrypoints.openai_server`) calls
        this automatically and counts it in ``/metrics``.
        """
        n = 0
        self._pending_step = None  # its device buffers may be corrupt
        if self.cp > 1:
            from vllm_triton_backend_tpu.runtime.block_allocator import (
                CPBlockAllocator,
            )

            cc = self.config.cache
            n += self.schedulers[0].reset_for_recovery(
                CPBlockAllocator(
                    self.cp, cc.num_blocks // self.cp, cc.block_size,
                    self.cp_chunk_len,
                )
            )
        else:
            for sched in self.schedulers:
                n += sched.reset_for_recovery()
        if self.is_hybrid:
            self._slot_of.clear()
            self._free_slots = [
                list(range(1, self._n_state_slots))
                for _ in range(self.dp)
            ]
        self._build_caches()
        return n

    def warmup(
        self,
        prompt_lens: tuple[int, ...] | None = None,
        mixed_rows: tuple[int, ...] = (1, 8, 16, 32),
    ) -> float:
        """Pre-compile the serving executables BEFORE accepting traffic —
        the CUDA-graph-capture-at-init analog (the bucket set is known at
        server start; without this, the first request at each new
        (token-bucket, extras) shape pays a multi-second XLA compile,
        which shows up as 7-8 s TTFT p99 outliers at low concurrency).

        Drives REAL requests through the engine so every layer of the
        serving path compiles: pure-prefill steps at each token bucket,
        mixed prefill+decode compositions (``mixed_rows`` prefill-row
        buckets riding with a decoding request), and the fused decode
        session at the engine's chunk size.  Returns seconds spent.

        Reference analog: vLLM captures CUDA graphs for every batch
        bucket at init (the reference relies on that at L5,
        SURVEY.md §2.1 build_for_cudagraph_capture row).
        """
        import time as _time

        from vllm_triton_backend_tpu.runtime.sampler import SamplingParams

        assert not self.has_unfinished(), "warmup needs an idle engine"
        t0 = _time.perf_counter()
        sc = self.scheduler.config
        vocab = self.config.model.vocab_size
        rng = np.random.default_rng(0)
        budget = sc.max_num_batched_tokens
        if prompt_lens is None:
            prompt_lens = tuple(
                b for b in sorted(set(sc.token_buckets))
                if b <= min(budget, sc.max_model_len - self.multistep - 2)
            ) or (min(8, sc.max_model_len // 2),)

        def drain():
            steps = 0
            while self.has_unfinished() and steps < 10_000:
                self.step()
                steps += 1

        def prompt(n):
            return rng.integers(0, vocab, size=max(1, n)).tolist()

        # 1. pure-prefill buckets + the fused decode session at each K
        #    of the session ladder (engine._session_chunk_budget):
        #    max_tokens = K+1 starts a session with chunk size exactly K
        k_ladder = sorted(
            {self.multistep, max(2, self.multistep // 4), 2}
        )
        for i, plen in enumerate(prompt_lens):
            k = k_ladder[min(i, len(k_ladder) - 1)]
            self.add_request(
                prompt(plen), SamplingParams(max_tokens=k + 1)
            )
            drain()
        for k in k_ladder:  # any K not covered above
            self.add_request(
                prompt(prompt_lens[0]),
                SamplingParams(max_tokens=k + 1),
            )
            drain()
        # streaming low-latency path (session_k_cap=1 routes decode
        # through plain one-token steps): compile it too, or the first
        # streamed request at low concurrency pays the XLA compile
        prev_cap = self.session_k_cap
        self.session_k_cap = 1
        try:
            self.add_request(
                prompt(prompt_lens[0]), SamplingParams(max_tokens=4)
            )
            drain()
        finally:
            self.session_k_cap = prev_cap
        # 2. mixed compositions: a decoding request + n prompts sized to
        #    land in each (mixed_prefill_rows bucket x token bucket)
        headroom = max(2, sc.max_model_len - self.multistep - 4)
        combos = [
            (n_pf, max(2, min(budget // max(n_pf, 1), headroom)))
            for n_pf in mixed_rows
        ]
        combos += [
            (1, min(tb - 1, headroom))
            for tb in sorted(set(sc.token_buckets))
            if 1 < tb <= budget
        ]
        for n_pf, per in combos:
            if n_pf + 1 > sc.max_num_seqs:
                continue
            self.add_request(
                prompt(prompt_lens[0]),
                SamplingParams(max_tokens=self.multistep + 2),
            )
            self.step()  # prefill the anchor; it decodes from now on
            for _ in range(n_pf):
                self.add_request(
                    prompt(per), SamplingParams(max_tokens=2)
                )
            drain()
        return _time.perf_counter() - t0

    # ---------------- request API ----------------

    def add_request(
        self,
        prompt_token_ids: list[int],
        sampling: SamplingParams | None = None,
        req_id: str | None = None,
        priority: int = 0,
    ) -> str:
        """``priority``: vLLM semantics — lower value is served earlier
        (admission order and preemption-victim choice); default 0 keeps
        plain FCFS."""
        req_id = req_id or f"req-{next(self._id_counter)}"
        # round-robin replica placement (least-loaded tiebreak)
        sched = min(
            self.schedulers,
            key=lambda s: (len(s.waiting) + len(s.running)),
        )
        sched.add_request(
            Request(
                req_id, list(prompt_token_ids),
                sampling or SamplingParams(), priority=priority,
            )
        )
        return req_id

    def has_unfinished(self) -> bool:
        return any(s.has_unfinished() for s in self.schedulers)

    def all_requests(self) -> dict[str, Request]:
        """All requests across every data-replica scheduler."""
        out: dict[str, Request] = {}
        for s in self.schedulers:
            out.update(s.requests)
        return out

    def stats(self) -> dict:
        """Engine observability snapshot (SURVEY.md §5.5 parity): request
        states, token counters, KV page-pool utilization."""
        total_blocks = self.config.cache.num_blocks
        free = sum(s.allocator.num_free_blocks for s in self.schedulers)
        reqs = self.all_requests()
        return {
            "running": sum(len(s.running) for s in self.schedulers),
            "waiting": sum(len(s.waiting) for s in self.schedulers),
            "finished": sum(1 for r in reqs.values() if r.is_finished),
            "generated_tokens": sum(
                len(r.output_token_ids) for r in reqs.values()
            ),
            "kv_blocks_total": total_blocks,
            "kv_blocks_free": free,
            "kv_cache_usage": 1.0 - free / max(1, total_blocks),
            "data_replicas": self.dp,
            **(
                {
                    "spec_rounds": self._spec_stats["rounds"],
                    "spec_acceptance": (
                        self._spec_stats["accepted"]
                        / max(1, self._spec_stats["drafted"])
                    ),
                    "spec_suspended": (
                        self._step_counter < self._spec_suspended_until
                    ),
                }
                if self.draft_params is not None else {}
            ),
        }

    # ---------------- step ----------------

    def _sampling_inputs(self, reqs, pad_to: int, stacked: bool = False):
        """Device-side sampling state for one step over ``reqs``:
        (st, pt, greedy_only, with_logprob).  ``pt`` (penalty token
        histories) is built only when some request sets a penalty —
        history lengths are bucketed to powers of two so growing outputs
        reuse executables.  With ``stacked``, ``reqs`` is a list of
        per-replica lists and every leaf gains a leading replica axis."""
        from vllm_triton_backend_tpu.runtime.sampler import (
            PenaltyTensors,
            SamplingTensors,
            make_logit_adjustments,
            make_penalty_tensors,
            make_sampling_tensors,
        )

        groups = reqs if stacked else [reqs]
        flat = [r for g in groups for r in g]
        greedy_only = all(r.sampling.temperature <= 0.0 for r in flat)
        with_logprob = any(r.sampling.logprobs for r in flat)
        with_seeds = any(r.sampling.seed is not None for r in flat)
        st_rows = [
            make_sampling_tensors([r.sampling for r in g], pad_to=pad_to)
            for g in groups
        ]
        pt_rows = None
        if any(r.sampling.has_penalties for r in flat):
            vocab = self.config.model.vocab_size
            out_pad = next_power_of_2(
                max(
                    8,
                    max(len(r.output_token_ids) for r in flat),
                )
            )
            rep_on = any(
                r.sampling.repetition_penalty != 1.0 for r in flat
            )
            prompt_pad = (
                next_power_of_2(
                    max(len(r.prompt_token_ids) for r in flat)
                )
                if rep_on
                else 1
            )
            pt_rows = [
                make_penalty_tensors(g, pad_to, vocab, out_pad, prompt_pad)
                for g in groups
            ]

        def bundle(rows, cls):
            if rows is None:
                return None
            if stacked:
                return cls(
                    *(
                        jnp.asarray(np.stack([getattr(r, f) for r in rows]))
                        for f in cls._fields
                    )
                )
            return cls(*(jnp.asarray(a) for a in rows[0]))

        adj_d = None
        if any(r.sampling.has_logit_adjustments for r in flat):
            vocab = self.config.model.vocab_size
            rows = [
                make_logit_adjustments(g, pad_to, vocab) for g in groups
            ]
            adj_d = jnp.asarray(
                np.stack(rows) if stacked else rows[0]
            )
        return (
            bundle(st_rows, SamplingTensors),
            bundle(pt_rows, PenaltyTensors),
            greedy_only,
            with_logprob,
            with_seeds,
            adj_d,
        )

    def _outputs(self, finished) -> list[RequestOutput]:
        return [
            RequestOutput(
                req_id=r.req_id,
                prompt_token_ids=r.prompt_token_ids,
                output_token_ids=list(r.output_token_ids),
                finish_reason=r.status.value.removeprefix("finished_"),
                logprobs=(
                    list(r.output_logprobs)
                    if r.sampling.logprobs else None
                ),
            )
            for r in finished
        ]

    def _sample_rows(
        self, rows, st_d, pt_d, sub, greedy_only, with_logprob,
        with_seeds=False, seed_ctr=None, adj_d=None,
    ):
        """Penalize + sample per-seq logits rows; returns host
        (sampled [S], logprobs [S] | None)."""
        from vllm_triton_backend_tpu.runtime.sampler import (
            apply_penalties,
        )

        if adj_d is not None:
            # allowed-token masks / logit biases (dense [S, V] addend)
            rows = rows + adj_d
        if pt_d is not None:
            rows = apply_penalties(rows, pt_d)
        res = sample(
            rows, st_d, sub,
            greedy_only=greedy_only, with_logprob=with_logprob,
            with_seeds=with_seeds, seed_ctr=seed_ctr,
        )
        if with_logprob:
            toks, lp = res
            return np.asarray(toks), np.asarray(lp)
        return np.asarray(res), None

    def _mk_extras(
        self, max_query_len: int, max_seq_len: int, batches=(),
    ):
        """ForwardExtras for a regular (possibly mixed) step.

        W8A8 activation quantization engages only on prefill/mixed steps
        of a model configured with quantization="int8-w8a8" (pure-decode
        steps and the fused decode sessions stay bf16).

        ``batches``: the step's ScheduledBatch(es); when any batch mixes
        decode rows (query length 1) with prefill rows, the prefill-row
        count is bucketed to a power of two and passed as the static
        ``mixed_prefill_rows`` bound so attention takes the split path
        (ops.attention.unified_attention) — one executable per bucket."""
        mixed_bucket = 0
        for b in batches:
            qlens = np.diff(b.query_start_loc[: b.num_seqs + 1])
            n_pf = int((qlens > 1).sum())
            if n_pf:
                # enabled for EVERY prefill-carrying batch, not just
                # mixed ones: the compact sub-batch also removes the
                # dense q-pack over the (mostly padded) max_num_seqs
                # rows in pure-prefill steps — at batch 128 that pack
                # materialized ~1 GB of padded q per layer
                # floor at 4: compacting 1 row into a 4-row
                # sub-batch is ~free and keeps the executable set to
                # {4, 8, 16, ...} (warmable at startup)
                mixed_bucket = max(
                    mixed_bucket, 4, next_power_of_2(max(n_pf, 1))
                )
        return ForwardExtras(
            max_query_len=max_query_len,
            max_seq_len=max_seq_len,
            k_scale=self.k_scale,
            v_scale=self.v_scale,
            w8a8=(
                self.config.model.quantization == "int8-w8a8"
                and max_query_len > 1
            ),
            mixed_prefill_rows=mixed_bucket,
        )

    # ---------------- fused multi-step decode fast path ----------------

    def _decode_session_applies(self) -> bool:
        """True when the batch is in steady-state decode: no waiting work
        and every running request has exactly its last sampled token
        pending."""
        sched = self.scheduler
        if self.multistep <= 1 or sched.waiting or not sched.running:
            return False
        if self.session_k_cap is not None and self.session_k_cap <= 1:
            # streaming low-latency mode (server-set at low concurrency):
            # run plain one-token steps so every SSE delta is one token —
            # ITL == TPOT instead of session-chunk bursts (VERDICT r4 #3)
            return False
        if (
            (self.draft_params is not None or self.spec_ngram)
            and self._spec_gate_open()
        ):
            return False  # spec decode is the steady-state fast path
        if len(sched.running) > sched.config.max_num_seqs:
            return False
        for r in sched.running:
            if not r.output_token_ids:
                return False
            if r.num_computed_tokens != r.num_tokens - 1:
                return False
            if (
                r.sampling.has_penalties
                or r.sampling.seed is not None
                or r.sampling.has_logit_adjustments
            ):
                # penalties need per-step token-history updates, seeded
                # draws per-row keys, and logit masks a dense [S, V]
                # addend; the per-step loop handles all three
                return False
        return True

    def _session_chunk_budget(self, reqs) -> int:
        """Chunk size K, gated by the LEAST-advanced request's headroom.

        Continuous batching leaves rows unevenly advanced (early-
        prefilled rows decode while later prompts prefill), so gating K
        by the *most*-advanced row collapses it to 1-2 once any row
        nears its max_tokens — measured: a batch-64 decode ran as 11
        sessions of shrinking K, each paying the ~30 ms session-boundary
        cost, instead of one.  Over-launching past a leader's budget is
        safe by design: the device freezes each row at its own
        ``max_lens`` (no cache write, no length advance) and the host
        discards tokens past ``max_tokens``."""
        sched = self.scheduler
        k = min(
            self.multistep,
            max(
                min(
                    r.sampling.max_tokens - len(r.output_token_ids),
                    sched.config.max_model_len - r.num_tokens,
                )
                for r in reqs
            )
            + 1,
        )
        # streaming low-latency mode: the server caps K so SSE deltas
        # stay near per-token granularity (cap 2 -> ITL ~ 2x TPOT); the
        # cap values are ladder members, so no new executables appear
        if self.session_k_cap is not None:
            k = min(k, self.session_k_cap)
        # Quantize K to a SMALL ladder: every distinct K is its own
        # fused executable, and un-warmed compiles surface as
        # multi-second TTFT/ITL outliers in serving (measured p99 4-5 s
        # at concurrency 2-8).  {multistep, multistep/4, 2} bounds the
        # wasted tail work at ladder-step granularity (rows freeze at
        # max_lens, so over-launching is safe) while keeping the
        # executable count warmable at startup.
        for step in (self.multistep, max(2, self.multistep // 4), 2):
            if k >= step:
                return step
        return k


    def _process_chunk(
        self, reqs, sampled: np.ndarray, budget=None, logprobs=None
    ) -> list[Request]:
        """Apply one chunk's sampled tokens [K, S] to the request states;
        returns requests finished by this chunk.  Tokens for requests that
        already finished in an earlier chunk are discarded.

        ``budget`` ([S] int, mutated) caps how many tokens each row may
        consume across the session: the device freezes a row at its
        reserved ``max_lens`` ceiling, so sampled entries beyond the
        budget are repeats of the last real token and must NOT advance
        the request state."""
        sched = self.scheduler
        k = sampled.shape[0]
        finished = []
        for i, r in enumerate(reqs):
            if r.is_finished:
                continue
            n_valid = k if budget is None else min(k, int(budget[i]))
            if budget is not None:
                budget[i] -= n_valid
            sp = r.sampling
            stop = set(sp.stop_token_ids)
            if self.eos_token_id is not None and not sp.ignore_eos:
                stop.add(self.eos_token_id)
            for j in range(n_valid):
                r.num_computed_tokens += 1
                tok = int(sampled[j, i])
                r.output_token_ids.append(tok)
                if sp.logprobs and logprobs is not None:
                    r.output_logprobs.append(float(logprobs[j, i]))
                if tok in stop:
                    r.status = RequestStatus.FINISHED_STOPPED
                elif len(r.output_token_ids) >= sp.max_tokens:
                    r.status = RequestStatus.FINISHED_LENGTH
                elif r.num_tokens >= sched.config.max_model_len:
                    r.status = RequestStatus.FINISHED_LENGTH
                if r.is_finished:
                    break
            sched.allocator.publish_full_blocks(
                r.req_id, r.all_token_ids[: r.num_computed_tokens]
            )
            if r.is_finished:
                finished.append(r)
                sched.running.remove(r)
                sched.allocator.free(r.req_id)
                if self.is_hybrid:
                    self._hyb_free_slot(
                        r.req_id, self.schedulers.index(sched)
                    )
        return finished

    def _launch_decode_chunk(
        self, tokens_d, lens_d, tbl_d, live_d, maxlen_d,
        st_d, key_d, extras, k, bs, greedy_only,
        sidx_d=None, with_logprob=False,
    ):
        """One fused K-step chunk: single-chip, TP-sharded, or hybrid
        (SSM state pools in the scan carry).  Returns
        (sampled [K,S], logprobs [K,S] | None, next_tokens, next_lens,
        next_key, kv_cache)."""
        from vllm_triton_backend_tpu.runtime.sampler import (
            SamplingTensors,
        )

        cache_key = (extras, k, greedy_only, with_logprob)
        if self.is_hybrid and self.tp > 1:
            from vllm_triton_backend_tpu.parallel.sharded import (
                make_sharded_hybrid_decode_steps,
            )

            step_fn = self._tp_decode_steps.get(cache_key)
            if step_fn is None:
                step_fn = make_sharded_hybrid_decode_steps(
                    self.config.model, self.mesh, extras, k, bs,
                    greedy_only=greedy_only, with_logprob=with_logprob,
                )
                self._tp_decode_steps[cache_key] = step_fn
            (
                sampled, lps, toks, lens, key, kv,
                self.conv_state, self.ssm_state,
            ) = step_fn(
                self.params, tokens_d[None], lens_d[None], tbl_d[None],
                live_d[None], maxlen_d[None],
                self.kv_cache, self.conv_state, self.ssm_state,
                sidx_d[None],
                SamplingTensors(*(a[None] for a in st_d)),
                key_d,
            )
            return (
                sampled[0], lps[0] if with_logprob else None,
                toks[0], lens[0], key, kv,
            )
        if self.is_hybrid:
            from vllm_triton_backend_tpu.runtime.multistep import (
                hybrid_decode_steps,
            )

            (
                sampled, lps, toks, lens, key, kv,
                self.conv_state, self.ssm_state,
            ) = hybrid_decode_steps(
                self.params, self.config.model,
                tokens_d, lens_d, tbl_d, live_d, maxlen_d,
                self.kv_cache, self.conv_state, self.ssm_state, sidx_d,
                st_d,
                key_d, extras, k, bs, greedy_only,
                with_logprob=with_logprob,
            )
            return sampled, lps, toks, lens, key, kv
        if self.tp > 1:
            from vllm_triton_backend_tpu.parallel import (
                make_sharded_decode_steps,
            )

            step_fn = self._tp_decode_steps.get(cache_key)
            if step_fn is None:
                step_fn = make_sharded_decode_steps(
                    self.config.model, self.mesh, extras, k, bs,
                    greedy_only=greedy_only,
                    tp_overlap=self.config.parallel.overlap_collectives,
                    with_logprob=with_logprob,
                    multihost=self.multihost,
                )
                self._tp_decode_steps[cache_key] = step_fn
            sampled, lps, toks, lens, key, kv = step_fn(
                self.params, tokens_d[None], lens_d[None], tbl_d[None],
                live_d[None], maxlen_d[None], self.kv_cache,
                SamplingTensors(*(a[None] for a in st_d)),
                key_d,
            )
            return (
                sampled[0], lps[0] if with_logprob else None,
                toks[0], lens[0], key, kv,
            )
        return decode_steps(
            self.params, self.config.model,
            tokens_d, lens_d, tbl_d, live_d, maxlen_d,
            self.kv_cache,
            st_d,
            key_d, extras, k, bs, greedy_only,
            with_logprob=with_logprob,
        )

    def _drive_session(
        self, *, scheds, all_reqs, k, reserved, horizon,
        launch_chunk, commit_chunk,
    ) -> tuple[list[Request], int]:
        """THE fused-session driver (VERDICT r3 #9 / r4 #4): the launch-
        condition + in-flight/pending bookkeeping shared by every session
        mode.  ``launch_chunk()`` dispatches one K-step chunk (mutating
        the caller's device carries) and returns (sampled, logprobs);
        ``commit_chunk(tokens, logprobs)`` applies one chunk's host
        tokens and returns finished requests.  Chunks are committed one
        iteration LATE so the D2H overlaps the next chunk's execution.

        Launch gating: per-row device-side ``max_lens`` freezing makes a
        chunk that would overshoot the most-advanced row safe — only
        global conditions (arrivals, finishes, page reservation, the
        serving one-chunk-per-step hook) stop the session.
        """
        finished_all: list[Request] = []
        pending = None
        inflight = 0
        launched_total = 0
        chunks_launched = 0
        while True:
            launch = (
                not any(s.waiting for s in scheds)
                # serving (poll hook set): one chunk per step() call so
                # streaming deltas flush and arrivals admit at chunk
                # granularity; offline runs chain chunks device-side
                and not (
                    self.poll_new_work is not None
                    and (
                        chunks_launched >= 1 or self.poll_new_work()
                    )
                )
                and not any(r.is_finished for r in all_reqs)
                and any(
                    len(r.output_token_ids) + inflight
                    < r.sampling.max_tokens
                    and r.num_tokens + inflight < horizon
                    for r in all_reqs
                )
                and launched_total + k <= reserved
            )
            if launch:
                sampled, lps = launch_chunk()
                inflight += k
                launched_total += k
                chunks_launched += 1
                # start the D2H now so the transfer overlaps the next
                # chunk's execution — the host read one iteration later
                # finds the data already local
                try:
                    sampled.copy_to_host_async()
                except (AttributeError, NotImplementedError):
                    pass
            if pending is not None:
                p_tok, p_lp = pending
                finished_all += commit_chunk(p_tok, p_lp)
                inflight -= k
                pending = None
            if not launch:
                break
            pending = (sampled, lps)
        return finished_all, chunks_launched

    def _try_multistep(self) -> list[RequestOutput] | None:
        """Device-resident decode session.

        Chunks of K fused decode steps are chained ON DEVICE: chunk i+1's
        input tokens are a device-side slice of chunk i's output, so the
        device pipeline never waits for the host.  The host processes each
        chunk's sampled tokens one chunk LATE (async D2H), paying the
        transfer latency once per session instead of once per chunk.
        Requests that stop mid-session cost at most one wasted chunk of
        compute; their surplus tokens are discarded on the host.
        """
        if not self._decode_session_applies():
            return None
        sched = self.scheduler
        reqs = list(sched.running)
        k = self._session_chunk_budget(reqs)
        if k < 2:
            return None

        s_pad = sched.config.max_num_seqs
        horizon = max(
            len(r.prompt_token_ids) + r.sampling.max_tokens + 1
            for r in reqs
        )
        horizon = min(horizon, sched.config.max_model_len)
        extras = ForwardExtras(
            max_query_len=1,
            # bucket floored at min(1024, model-len bucket): the
            # decode kernel skips dead pages/chunks, so a coarser
            # static bound costs ~nothing while collapsing the
            # per-horizon executable set to one or two (warmable)
            max_seq_len=max(
                min(
                    1024,
                    next_power_of_2(sched.config.max_model_len),
                ),
                next_power_of_2(horizon),
            ),
            k_scale=self.k_scale,
            v_scale=self.v_scale,
        )
        bs = self.config.cache.block_size

        def build_host_state(reqs):
            from vllm_triton_backend_tpu.runtime.sampler import (
                device_sampling_tensors,
                make_sampling_tensors,
            )

            tokens = np.zeros(s_pad, np.int32)
            lens = np.ones(s_pad, np.int32)
            live = np.zeros(s_pad, bool)
            for i, r in enumerate(reqs):
                tokens[i] = r.output_token_ids[-1]
                lens[i] = r.num_tokens
                live[i] = True
            st = device_sampling_tensors(
                make_sampling_tensors(
                    [r.sampling for r in reqs], pad_to=s_pad
                )
            )
            return (
                jnp.asarray(tokens), jnp.asarray(lens), jnp.asarray(live),
                st,
            )

        reserved = _reserve_session_tokens(
            sched, reqs, horizon, bs, k
        )
        if reserved < k:
            return None  # not even one chunk's pages free: regular path
        maxlen = np.ones(s_pad, np.int32)
        for i, r in enumerate(reqs):
            maxlen[i] = min(
                len(r.prompt_token_ids) + r.sampling.max_tokens + 1,
                horizon,
                r.num_tokens + reserved,
            )
        maxlen_d = jnp.asarray(maxlen)
        # host-side consumable budget per row (tokens the device will
        # actually produce before freezing at max_lens)
        consumable = np.zeros(s_pad, np.int64)
        for i, r in enumerate(reqs):
            consumable[i] = maxlen[i] - r.num_tokens

        tbl = np.zeros((s_pad, sched.max_blocks_per_seq), np.int32)
        for i, r in enumerate(reqs):
            pages = sched.allocator.block_table(r.req_id)
            tbl[i, : len(pages)] = pages
        tbl_d = jnp.asarray(tbl)
        sidx_d = None
        if self.is_hybrid:
            # per-seq SSM state slots (assigned at prefill; a running
            # request always has one)
            sidx = np.full(s_pad, -1, np.int32)
            for i, r in enumerate(reqs):
                sidx[i] = self._slot_of[r.req_id]
            sidx_d = jnp.asarray(sidx)

        tokens_d, lens_d, live_d, st_d = build_host_state(reqs)
        # static sampler specialization: skip the stochastic path (full-
        # vocab sort) entirely when every request decodes greedily
        greedy_only = all(r.sampling.temperature <= 0.0 for r in reqs)
        with_logprob = any(r.sampling.logprobs for r in reqs)
        carry = {"tokens": tokens_d, "lens": lens_d, "key": self._key}

        def launch_chunk():
            (
                sampled, lps, carry["tokens"], carry["lens"],
                carry["key"], self.kv_cache,
            ) = self._launch_decode_chunk(
                carry["tokens"], carry["lens"], tbl_d, live_d, maxlen_d,
                st_d, carry["key"], extras, k, bs,
                greedy_only, sidx_d, with_logprob,
            )
            return sampled, lps

        def commit_chunk(p_tok, p_lp):
            return self._process_chunk(
                reqs, np.asarray(p_tok), consumable,
                np.asarray(p_lp) if p_lp is not None else None,
            )

        finished_all, chunks_launched = self._drive_session(
            scheds=[sched], all_reqs=reqs, k=k, reserved=reserved,
            horizon=horizon, launch_chunk=launch_chunk,
            commit_chunk=commit_chunk,
        )
        self._key = carry["key"]
        if chunks_launched == 0:
            return None  # no progress possible: regular path handles it
        return self._outputs(finished_all)

    # ---------------- pipeline-parallel stepping ----------------

    def _step_pp(self) -> list[RequestOutput]:
        """One GPipe step: the scheduled batch is split into ``pp``
        sequence microbatches that stream through the stage pipeline
        (parallel/pipeline.py; VERDICT r1 item 5 — PP serves actual
        requests).  No fused decode sessions yet: every step pays one
        pipeline pass of M + S - 1 ticks."""
        from vllm_triton_backend_tpu.parallel.pipeline import (
            make_pp_forward,
        )
        from vllm_triton_backend_tpu.runtime.sampler import sample_replicas

        batch = self.scheduler.schedule()
        if batch.is_empty:
            return []
        m = self.pp  # microbatches = stages (standard GPipe fill)
        extras = self._mk_extras(batch.max_query_len, batch.max_seq_len)
        s_max = self.scheduler.config.max_num_seqs
        bucket = batch.token_ids.shape[0]
        num_seqs = batch.num_seqs
        # contiguous split of the batch's sequences into m microbatches
        seq_groups = np.array_split(np.arange(num_seqs), m)
        tok = np.zeros((m, bucket), np.int32)
        pos = np.zeros((m, bucket), np.int32)
        slot = np.full((m, bucket), -1, np.int32)
        qsl = np.zeros((m, s_max + 1), np.int32)
        sl = np.zeros((m, s_max), np.int32)
        tbl = np.zeros(
            (m, s_max, self.scheduler.max_blocks_per_seq), np.int32
        )
        li = np.zeros((m, s_max), np.int32)
        # (microbatch, row) of each original batch row
        row_of: list[tuple[int, int]] = [(0, 0)] * num_seqs
        for mi, group in enumerate(seq_groups):
            t = 0
            for row, i in enumerate(group):
                i = int(i)
                lo, hi = (
                    int(batch.query_start_loc[i]),
                    int(batch.query_start_loc[i + 1]),
                )
                n = hi - lo
                tok[mi, t : t + n] = batch.token_ids[lo:hi]
                pos[mi, t : t + n] = batch.positions[lo:hi]
                slot[mi, t : t + n] = batch.slot_mapping[lo:hi]
                qsl[mi, row + 1] = qsl[mi, row] + n
                sl[mi, row] = batch.seq_lens[i]
                tbl[mi, row] = batch.block_table[i]
                li[mi, row] = t + n - 1
                row_of[i] = (mi, row)
                t += n
            qsl[mi, len(group) + 1 :] = qsl[mi, len(group)]

        step_key = (extras, m)
        step_fn = self._pp_steps.get(step_key)
        if step_fn is None:
            step_fn = make_pp_forward(
                self.config.model, self.mesh, extras, m
            )
            self._pp_steps[step_key] = step_fn
        logits, self.kv_cache = step_fn(
            self.params, jnp.asarray(tok), jnp.asarray(pos),
            self.kv_cache, jnp.asarray(qsl), jnp.asarray(sl),
            jnp.asarray(tbl), jnp.asarray(slot),
        )  # logits [M, Tm, vocab]

        reqs = [self.scheduler.requests[r] for r in batch.req_ids]
        # microbatch groups follow the contiguous seq split (row_of)
        req_groups = [
            [reqs[int(i)] for i in group] for group in seq_groups
        ]
        (
            st_d, pt_d, greedy, with_logprob, with_seeds, adj_d,
        ) = self._sampling_inputs(req_groups, s_max, stacked=True)
        self._key, sub = jax.random.split(self._key)
        res = sample_replicas(
            logits, jnp.asarray(li), st_d, sub,
            greedy_only=greedy, with_logprob=with_logprob, pt=pt_d,
            with_seeds=with_seeds,
            seed_ctr=jnp.asarray(sl) if with_seeds else None,
            logit_adj=adj_d,
        )
        if with_logprob:
            sampled_m, lp_m = np.asarray(res[0]), np.asarray(res[1])
        else:
            sampled_m, lp_m = np.asarray(res), None  # [M, s_max]
        sampled = np.zeros(s_max, sampled_m.dtype)
        lp = np.zeros(s_max, np.float32) if lp_m is not None else None
        for i in range(num_seqs):
            mi, row = row_of[i]
            sampled[i] = sampled_m[mi, row]
            if lp is not None:
                lp[i] = lp_m[mi, row]
        finished = self.scheduler.update(
            batch, sampled, self.eos_token_id, lp
        )
        return self._outputs(finished)

    # ---------------- context-parallel stepping ----------------

    def _launch_cp(self, batch, extras, sampling):
        """Launch stage for sequence-sharded KV (parallel/context.py):
        each chip holds positions [c*chunk, (c+1)*chunk) of every
        sequence, writes the tokens it owns, and attention partials
        merge over the ``seq`` axis.  No fused decode sessions yet."""
        from vllm_triton_backend_tpu.parallel.context import make_cp_forward

        st_d, pt_d, greedy_only, with_logprob, with_seeds, adj_d = sampling
        step_fn = self._cp_steps.get(extras)
        if step_fn is None:
            step_fn = make_cp_forward(
                self.config.model, self.mesh, extras, self.cp_chunk_len
            )
            self._cp_steps[extras] = step_fn
        logits, self.kv_cache = step_fn(
            self.params,
            jnp.asarray(batch.token_ids),
            jnp.asarray(batch.positions),
            self.kv_cache,
            jnp.asarray(batch.query_start_loc),
            jnp.asarray(batch.seq_lens),
            jnp.asarray(batch.block_table),
            jnp.asarray(batch.slot_mapping),
        )
        self._key, sub = jax.random.split(self._key)
        return self._sample_rows(
            logits[jnp.asarray(batch.logits_indices)],
            st_d, pt_d, sub, greedy_only, with_logprob,
            with_seeds,
            jnp.asarray(batch.seq_lens) if with_seeds else None,
            adj_d,
        )

    def _finish_step(self, batch, sampled, logprobs):
        """Commit stage shared by every regular-step mode: apply the
        sampled tokens to the scheduler, release finished requests'
        hybrid state slots, emit outputs."""
        finished = self.scheduler.update(
            batch, sampled, self.eos_token_id, logprobs
        )
        if self.is_hybrid:
            for r in finished:
                self._hyb_free_slot(r.req_id, 0)
        return self._outputs(finished)

    def _process_chunk_for(
        self, sched, reqs, sampled: np.ndarray, budget=None, logprobs=None
    ) -> list[Request]:
        """_process_chunk against an explicit replica scheduler."""
        saved = self.scheduler
        self.scheduler = sched
        try:
            return self._process_chunk(reqs, sampled, budget, logprobs)
        finally:
            self.scheduler = saved

    def step(self) -> list[RequestOutput]:
        """One engine step.  Structure (VERDICT r3 #9): fast paths
        (fused decode sessions, speculative rounds) first, then ONE
        regular driver — schedule -> launch -> commit — where only the
        LAUNCH stage differs per mode (single-chip/TP/hybrid via
        :meth:`_launch_regular`, context-parallel via
        :meth:`_launch_cp`).  DP and PP restructure the batch itself
        (stacked replicas / sequence microbatches) and keep their own
        drivers."""
        self._step_counter += 1
        if self.dp > 1:
            if self._dp_session_applies():
                fast = self._try_multistep_dp()
                if fast is not None:
                    return fast
            return self._step_dp()
        if self.pp > 1:
            return self._step_pp()
        if self.cp > 1:
            return self._regular_step()
        if self._pending_step is not None and not self.scheduler.waiting:
            # prefill phase just drained: commit the deferred tail so
            # the decode session sees every request one-token-pending
            out = self._flush_pending()
            if out:
                return out
        if (
            (self.draft_params is not None or self.spec_ngram)
            and self._spec_applies()
        ):
            out = self._step_spec()
            if out is not None:
                return out
        if self._decode_session_applies():
            fast = self._try_multistep()
            if fast is not None:
                return fast
        return self._regular_step()

    def _defer_prefill_ok(self) -> bool:
        """Pipeline the prefill phase (offline/bench runs): defer one
        step's D2H + token commit until AFTER the next step is
        dispatched.  Chunked-prefill scheduling depends only on
        computed-token counts (scheduler.advance), never on the sampled
        VALUES, so the device never idles waiting for the host's ~35 ms
        tunnel round trip (measured: the blocking np.asarray was 197 of
        a 203 ms prefill step wall at device 154 ms).  Rows awaiting
        their deferred token are unschedulable in between (zero new
        tokens), so ordering is preserved.  Serving keeps synchronous
        steps (poll hook set): deltas there must flush every step."""
        return (
            self.poll_new_work is None
            and self.scheduler.config.prefill_priority
            and bool(self.scheduler.waiting)
            and self.tp == 1 and self.cp == 1 and self.dp == 1
            and not self.is_hybrid
            and self.draft_params is None
        )

    def _flush_pending(self) -> list[RequestOutput]:
        """Commit the deferred step's sampled tokens (if any)."""
        if self._pending_step is None:
            return []
        batch, sampled_d, lp_d, completed = self._pending_step
        self._pending_step = None
        finished = self.scheduler.apply_sampled(
            batch, np.asarray(sampled_d), self.eos_token_id,
            np.asarray(lp_d) if lp_d is not None else None,
            completed_rows=completed,
        )
        return self._outputs(finished)

    def _regular_step(self) -> list[RequestOutput]:
        """The shared schedule -> launch -> commit driver."""
        batch = self.scheduler.schedule()
        if batch.is_empty:
            return self._flush_pending()
        extras = self._mk_extras(
            batch.max_query_len, batch.max_seq_len,
            # the cp forward has its own attention path; keep its
            # extras composition-independent (fewer compiles)
            batches=() if self.cp > 1 else (batch,),
        )
        reqs = [self.scheduler.requests[r] for r in batch.req_ids]
        sampling = self._sampling_inputs(
            reqs, batch.logits_indices.shape[0]
        )
        defer = self._defer_prefill_ok()
        if self.cp > 1:
            sampled, logprobs = self._launch_cp(batch, extras, sampling)
        elif defer:
            sampled_d, lp_d = self._launch_regular(
                batch, extras, sampling, defer=True
            )
            # next schedule() plans the following chunk from counts
            self.scheduler.advance(batch)
            completed = self.scheduler.completion_snapshot(batch)
            # committing the PREVIOUS step now overlaps its D2H with
            # THIS step's device execution
            outs = self._flush_pending()
            self._pending_step = (batch, sampled_d, lp_d, completed)
            return outs
        else:
            sampled, logprobs = self._launch_regular(
                batch, extras, sampling
            )
            if self.draft_params is not None:
                # mirror every regular step into the draft cache so
                # drafts always see the full context (prefill +
                # fallback decode)
                _, self.draft_cache = llama.forward(
                    self.draft_params, self.draft_config,
                    jnp.asarray(batch.token_ids),
                    jnp.asarray(batch.positions),
                    self.draft_cache,
                    AttentionMetadata(
                        query_start_loc=jnp.asarray(
                            batch.query_start_loc
                        ),
                        seq_lens=jnp.asarray(batch.seq_lens),
                        block_table=jnp.asarray(batch.block_table),
                        slot_mapping=jnp.asarray(batch.slot_mapping),
                        num_seqs=jnp.int32(batch.num_seqs),
                    ),
                    extras,
                )
        return self._flush_pending() + self._finish_step(
            batch, sampled, logprobs
        )

    def _launch_regular(self, batch, extras, sampling, defer=False):
        """Launch stage for the single-chip / TP / hybrid modes;
        returns (sampled [S] np, logprobs [S] np | None) — or the
        DEVICE arrays when ``defer`` (single-chip prefill pipeline)."""
        (
            st_d, pt_d, greedy_only, with_logprob, with_seeds, adj_d,
        ) = sampling
        seed_ctr = (
            jnp.asarray(batch.seq_lens) if with_seeds else None
        )
        if self.tp > 1 and not self.is_hybrid:
            from vllm_triton_backend_tpu.parallel import (
                make_sharded_forward,
            )

            step_fn = self._tp_steps.get(extras)
            if step_fn is None:
                step_fn = make_sharded_forward(
                    self.config.model, self.mesh, extras,
                    tp_overlap=self.config.parallel.overlap_collectives,
                    multihost=self.multihost,
                )
                self._tp_steps[extras] = step_fn
            logits, self.kv_cache = step_fn(
                self.params,
                jnp.asarray(batch.token_ids)[None],
                jnp.asarray(batch.positions)[None],
                self.kv_cache,
                jnp.asarray(batch.query_start_loc)[None],
                jnp.asarray(batch.seq_lens)[None],
                jnp.asarray(batch.block_table)[None],
                jnp.asarray(batch.slot_mapping)[None],
            )
            if self.multihost:
                # replicated global -> host -> local: sampling then runs
                # identically on every host (SPMD serving)
                logits = jnp.asarray(np.asarray(logits))
            self._key, sub = jax.random.split(self._key)
            return self._sample_rows(
                logits[0][jnp.asarray(batch.logits_indices)],
                st_d, pt_d, sub, greedy_only, with_logprob,
                with_seeds, seed_ctr, adj_d,
            )
        if self.is_hybrid:
            state_idx = np.full(
                self.scheduler.config.max_num_seqs, -1, np.int32
            )
            for i, rid in enumerate(batch.req_ids):
                if rid not in self._slot_of:
                    self._slot_of[rid] = self._free_slots[0].pop()
                state_idx[i] = self._slot_of[rid]
            if self.tp > 1:
                from vllm_triton_backend_tpu.parallel.sharded import (
                    make_sharded_hybrid_forward,
                )

                step_fn = self._tp_steps.get(extras)
                if step_fn is None:
                    step_fn = make_sharded_hybrid_forward(
                        self.config.model, self.mesh, extras
                    )
                    self._tp_steps[extras] = step_fn
                (
                    logits, self.kv_cache,
                    self.conv_state, self.ssm_state,
                ) = step_fn(
                    self.params,
                    jnp.asarray(batch.token_ids)[None],
                    jnp.asarray(batch.positions)[None],
                    self.kv_cache,
                    self.conv_state, self.ssm_state,
                    jnp.asarray(state_idx)[None],
                    jnp.asarray(batch.query_start_loc)[None],
                    jnp.asarray(batch.seq_lens)[None],
                    jnp.asarray(batch.block_table)[None],
                    jnp.asarray(batch.slot_mapping)[None],
                )
                logits = logits[0]
            else:
                meta = AttentionMetadata(
                    query_start_loc=jnp.asarray(batch.query_start_loc),
                    seq_lens=jnp.asarray(batch.seq_lens),
                    block_table=jnp.asarray(batch.block_table),
                    slot_mapping=jnp.asarray(batch.slot_mapping),
                    num_seqs=jnp.int32(batch.num_seqs),
                )
                (
                    logits, self.kv_cache,
                    self.conv_state, self.ssm_state,
                ) = self._hybrid.forward(
                    self.params, self.config.model,
                    jnp.asarray(batch.token_ids),
                    jnp.asarray(batch.positions),
                    self.kv_cache,
                    self.conv_state, self.ssm_state,
                    jnp.asarray(state_idx), meta, extras,
                )
            self._key, sub = jax.random.split(self._key)
            return self._sample_rows(
                logits[jnp.asarray(batch.logits_indices)],
                st_d, pt_d, sub, greedy_only, with_logprob,
                with_seeds, seed_ctr, adj_d,
            )
        # single chip: forward + gather + sample fused in ONE dispatch
        out = engine_step(
            self.params,
            self.config.model,
            jnp.asarray(batch.token_ids),
            jnp.asarray(batch.positions),
            self.kv_cache,
            jnp.asarray(batch.query_start_loc),
            jnp.asarray(batch.seq_lens),
            jnp.asarray(batch.block_table),
            jnp.asarray(batch.slot_mapping),
            jnp.asarray(batch.logits_indices),
            st_d,
            self._key,
            extras,
            greedy_only,
            with_logprob,
            pt_d,
            with_seeds,
            adj_d,
        )
        if with_logprob:
            sampled_d, lp_d, self._key, self.kv_cache = out
        else:
            sampled_d, self._key, self.kv_cache = out
            lp_d = None
        if defer:
            # start the D2H now so the deferred flush (one step later)
            # finds the data already local
            try:
                sampled_d.copy_to_host_async()
            except (AttributeError, NotImplementedError):
                pass
            return sampled_d, lp_d
        return np.asarray(sampled_d), (
            np.asarray(lp_d) if lp_d is not None else None
        )


class LLM:
    """Offline inference wrapper (the reference's ``LLM.generate`` analog)."""

    def __init__(
        self,
        config: EngineConfig | None = None,
        model_dir: str | None = None,
        tokenizer=None,
        draft_dir: str | None = None,
        spec_ngram: bool = False,
        spec_k: int = 4,
        params=None,
        **config_kw,
    ):
        draft_params = draft_cfg = None
        if draft_dir is not None:
            from vllm_triton_backend_tpu.models.hf import load_params

            draft_cfg, draft_params = load_params(draft_dir)
        if model_dir is not None:
            from vllm_triton_backend_tpu.models.hf import (
                config_from_hf,
                load_params,
            )

            mc, params = load_params(model_dir)
            config = (config or EngineConfig()).replace(model=mc)
            if tokenizer is None:
                try:
                    from transformers import AutoTokenizer

                    tokenizer = AutoTokenizer.from_pretrained(model_dir)
                except Exception:
                    try:
                        from tokenizers import Tokenizer

                        tokenizer = Tokenizer.from_file(
                            f"{model_dir}/tokenizer.json"
                        )
                    except Exception:
                        tokenizer = None
        config = config or EngineConfig()
        if config_kw:
            config = config.replace(**config_kw)
        self.tokenizer = tokenizer
        eos = None
        if tokenizer is not None:
            # transformers tokenizers expose eos_token_id directly;
            # raw tokenizers fall back to the llama sentinel
            eos = getattr(tokenizer, "eos_token_id", None)
            if eos is None and hasattr(tokenizer, "token_to_id"):
                eos = tokenizer.token_to_id("</s>")
        if eos is None and model_dir is not None:
            # generation_config.json / config.json carry it too
            import json as _json
            import os as _os

            for f in ("generation_config.json", "config.json"):
                try:
                    with open(_os.path.join(model_dir, f)) as fh:
                        e = _json.load(fh).get("eos_token_id")
                    if isinstance(e, list):
                        e = e[0] if e else None
                    if e is not None:
                        eos = int(e)
                        break
                except Exception:
                    continue
        self.engine = LLMEngine(
            config, params=params, eos_token_id=eos,
            draft_params=draft_params, draft_config=draft_cfg,
            spec_ngram=spec_ngram, spec_k=spec_k,
        )

    def generate(
        self,
        prompts: list[list[int]] | list[str],
        sampling: SamplingParams | list[SamplingParams] | None = None,
    ) -> list[RequestOutput]:
        if prompts and isinstance(prompts[0], str):
            assert self.tokenizer is not None, "string prompts need tokenizer"

            def enc(p):
                e = self.tokenizer.encode(p)
                return e.ids if hasattr(e, "ids") else e

            prompts = [enc(p) for p in prompts]
        if not isinstance(sampling, list):
            sampling = [sampling] * len(prompts)
        order = {}
        for i, (p, sp) in enumerate(zip(prompts, sampling)):
            order[self.engine.add_request(p, sp)] = i
        outputs: list[RequestOutput | None] = [None] * len(prompts)
        while self.engine.has_unfinished():
            for out in self.engine.step():
                if self.tokenizer is not None:
                    out.text = self.tokenizer.decode(out.output_token_ids)
                outputs[order[out.req_id]] = out
        assert all(o is not None for o in outputs)
        return outputs
