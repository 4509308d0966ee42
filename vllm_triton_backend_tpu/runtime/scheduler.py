"""Continuous-batching scheduler — produces the per-step kernel metadata.

The reference consumes vLLM's V1 scheduler output through the
``AttentionMetadata`` contract (query_start_loc, seq_lens, block_table,
slot_mapping — reference backend/triton_attn.py:60-103); here the scheduler
producing that contract is native.  vLLM-V1-style unified model: every
request tracks ``num_computed_tokens``; a step schedules up to
``max_num_batched_tokens`` new tokens across requests (chunked prefill =
partial prompt schedule; decode = exactly one token), so mixed batches are
the norm and there is no prefill/decode phase distinction.

TPU-specific: all output arrays are padded to *static buckets* —
``token_buckets`` for the flat token count, power-of-two for max_seq_len —
so each bucket hits one cached XLA executable (the TPU answer to the
reference's CUDA-graph capture path, backend/triton_attn.py:120-128).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

import numpy as np

from vllm_triton_backend_tpu.config import CacheConfig, SchedulerConfig
from vllm_triton_backend_tpu.runtime.block_allocator import BlockAllocator
from vllm_triton_backend_tpu.runtime.sampler import SamplingParams
from vllm_triton_backend_tpu.utils import cdiv, next_power_of_2


class RequestStatus(enum.Enum):
    WAITING = "waiting"
    RUNNING = "running"
    FINISHED_STOPPED = "finished_stopped"
    FINISHED_LENGTH = "finished_length"
    FINISHED_ABORTED = "finished_aborted"


@dataclass
class Request:
    req_id: str
    prompt_token_ids: list[int]
    sampling: SamplingParams
    output_token_ids: list[int] = field(default_factory=list)
    # chosen-token logprobs, 1:1 with output_token_ids (filled only when
    # sampling.logprobs; recomputed tokens after preemption/recovery keep
    # their original entries)
    output_logprobs: list[float] = field(default_factory=list)
    num_computed_tokens: int = 0
    status: RequestStatus = RequestStatus.WAITING
    # scheduling priority (vLLM semantics: LOWER value = served earlier;
    # ties keep arrival order). Affects admission order and preemption
    # victim choice.
    priority: int = 0
    arrival: int = 0  # monotone admission counter (set by the scheduler)

    @property
    def all_token_ids(self) -> list[int]:
        return self.prompt_token_ids + self.output_token_ids

    @property
    def num_tokens(self) -> int:
        return len(self.prompt_token_ids) + len(self.output_token_ids)

    @property
    def is_finished(self) -> bool:
        return self.status.value.startswith("finished")


@dataclass
class ScheduledBatch:
    """One step's worth of work, padded to static buckets (all numpy)."""

    req_ids: list[str]
    token_ids: np.ndarray  # [num_token_bucket] int32
    positions: np.ndarray  # [num_token_bucket] int32
    query_start_loc: np.ndarray  # [max_num_seqs + 1] int32
    seq_lens: np.ndarray  # [max_num_seqs] int32
    block_table: np.ndarray  # [max_num_seqs, max_blocks] int32
    slot_mapping: np.ndarray  # [num_token_bucket] int32
    logits_indices: np.ndarray  # [max_num_seqs] int32 (last token per seq)
    num_seqs: int
    num_tokens: int  # actual scheduled tokens
    max_query_len: int  # static bucket
    max_seq_len: int  # static bucket

    @property
    def is_empty(self) -> bool:
        return self.num_seqs == 0


class Scheduler:
    def __init__(
        self,
        scheduler_config: SchedulerConfig,
        cache_config: CacheConfig,
        allocator: BlockAllocator | None = None,
    ):
        self.config = scheduler_config
        self.cache_config = cache_config
        self.block_size = cache_config.block_size
        if allocator is None:
            from vllm_triton_backend_tpu.runtime.native_pool import (
                make_block_allocator,
            )

            allocator = make_block_allocator(
                cache_config.num_blocks,
                cache_config.block_size,
                scheduler_config.enable_prefix_caching,
            )
        self.allocator = allocator
        self.waiting: list[Request] = []
        self.running: list[Request] = []
        self.requests: dict[str, Request] = {}
        self._arrival_counter = 0
        self.max_blocks_per_seq = cdiv(
            scheduler_config.max_model_len, self.block_size
        )

    # ---------------- request lifecycle ----------------

    def add_request(self, req: Request) -> None:
        assert req.req_id not in self.requests
        self.requests[req.req_id] = req
        req.arrival = self._arrival_counter
        self._arrival_counter += 1
        if req.priority == 0 and (
            not self.waiting or self.waiting[-1].priority <= 0
        ):
            self.waiting.append(req)  # common case: FCFS tail append
        else:
            import bisect

            keys = [(w.priority, w.arrival) for w in self.waiting]
            self.waiting.insert(
                bisect.bisect_right(keys, (req.priority, req.arrival)),
                req,
            )

    def abort_request(self, req_id: str) -> None:
        req = self.requests.get(req_id)
        if req is None or req.is_finished:
            return
        req.status = RequestStatus.FINISHED_ABORTED
        if req in self.waiting:
            self.waiting.remove(req)
        if req in self.running:
            self.running.remove(req)
            self.allocator.free(req.req_id)

    def has_unfinished(self) -> bool:
        return bool(self.waiting or self.running)

    def reset_for_recovery(self, allocator: BlockAllocator | None = None):
        """Failure recovery (SURVEY §5.3): requeue every running request
        for full recompute and replace the page pool with a fresh one.

        After a device fault the page contents (and the prefix-cache
        hashes pointing at them) are suspect, so the whole allocator is
        rebuilt rather than freed page-by-page.  Requeued requests keep
        their generated tokens — re-admission re-prefills prompt +
        generated via ``all_token_ids`` (the recompute-preemption path).
        Returns the number of requests requeued.
        """
        n = 0
        for req in reversed(self.running):
            req.num_computed_tokens = 0
            req.status = RequestStatus.WAITING
            self.waiting.insert(0, req)
            n += 1
        self.running.clear()
        if allocator is None:
            from vllm_triton_backend_tpu.runtime.native_pool import (
                make_block_allocator,
            )

            allocator = make_block_allocator(
                self.cache_config.num_blocks,
                self.block_size,
                self.config.enable_prefix_caching,
            )
        self.allocator = allocator
        return n

    # ---------------- scheduling ----------------

    def _bucket_tokens(self, n: int) -> int:
        for b in self.config.token_buckets:
            if n <= b:
                return b
        return self.config.token_buckets[-1]

    def schedule(self, _defer_decodes: bool | None = None) -> ScheduledBatch:
        budget = self.config.max_num_batched_tokens
        scheduled: list[tuple[Request, int]] = []  # (req, num_new_tokens)

        # prefill_priority: while prompts wait, the budget goes to
        # prefill — decode-only rows (remaining == 1) are deferred this
        # step.  If it turns out nothing could be scheduled (queue
        # blocked on pages), re-run WITHOUT deferral so decodes always
        # make progress (the deferred pass has no side effects when it
        # schedules nothing).
        defer_decodes = (
            self.config.prefill_priority and bool(self.waiting)
            if _defer_decodes is None
            else _defer_decodes
        )

        # 1. running requests first (decode or ongoing chunked prefill)
        blocked: list[Request] = []
        for req in self.running:
            if budget == 0 or len(scheduled) >= self.config.max_num_seqs:
                break
            remaining = req.num_tokens - req.num_computed_tokens
            if defer_decodes and remaining == 1:
                continue
            n = min(remaining, budget)
            if n == 0:
                continue
            target_len = req.num_computed_tokens + n
            needed = cdiv(target_len, self.block_size) - len(
                self.allocator.block_table(req.req_id)
            )
            if needed > self.allocator.num_free_blocks:
                blocked.append(req)
                continue  # cannot grow this step
            self.allocator.append_slots(req.req_id, target_len)
            scheduled.append((req, n))
            budget -= n

        # Pool exhausted and nothing runnable: preempt the most recently
        # admitted running requests (free their pages, requeue for full
        # recompute) until at least one blocked request can grow — the
        # standard recompute-preemption policy.
        if blocked and not scheduled:
            while len(self.running) > 1 and blocked:
                # victim: lowest-priority running request, newest first
                victim = max(
                    self.running[1:],
                    key=lambda r: (r.priority, r.arrival),
                )
                self.running.remove(victim)
                if victim in blocked:
                    blocked.remove(victim)
                self.allocator.free(victim.req_id)
                victim.num_computed_tokens = 0
                victim.status = RequestStatus.WAITING
                self.waiting.insert(0, victim)
                req = blocked[0] if blocked else None
                if req is None:
                    break
                target_len = req.num_computed_tokens + 1
                needed = cdiv(target_len, self.block_size) - len(
                    self.allocator.block_table(req.req_id)
                )
                if needed <= self.allocator.num_free_blocks:
                    self.allocator.append_slots(req.req_id, target_len)
                    scheduled.append((req, 1))
                    budget -= 1
                    break

        # 2. admit waiting requests (prefill, possibly chunked)
        if self.config.enable_chunked_prefill or not scheduled:
            while (
                self.waiting
                and budget > 0
                and len(scheduled) < self.config.max_num_seqs
            ):
                req = self.waiting[0]
                # all_token_ids: a preempted request re-prefills its prompt
                # PLUS the tokens it had already generated
                admit_tokens = req.all_token_ids
                if not self.allocator.can_allocate(len(admit_tokens)):
                    break
                sb = self.allocator.allocate(req.req_id, admit_tokens)
                req.num_computed_tokens = sb.num_cached_tokens
                remaining = req.num_tokens - req.num_computed_tokens
                n = min(remaining, budget)
                if n == 0:
                    # couldn't fit any tokens: roll back
                    self.allocator.free(req.req_id)
                    req.num_computed_tokens = 0
                    break
                if (
                    n < remaining
                    and not self.config.enable_chunked_prefill
                ):
                    self.allocator.free(req.req_id)
                    req.num_computed_tokens = 0
                    break
                self.waiting.pop(0)
                req.status = RequestStatus.RUNNING
                self.running.append(req)
                scheduled.append((req, n))
                budget -= n

        if defer_decodes and not scheduled:
            # no prefill could run (pool/budget blocked): fall back to
            # decode-priority so the step still makes progress
            return self.schedule(_defer_decodes=False)
        return self._build_batch(scheduled)

    def _build_batch(
        self, scheduled: list[tuple[Request, int]]
    ) -> ScheduledBatch:
        cfg = self.config
        max_seqs = cfg.max_num_seqs
        num_seqs = len(scheduled)
        total = sum(n for _, n in scheduled)
        bucket = self._bucket_tokens(max(total, 1))

        token_ids = np.zeros(bucket, dtype=np.int32)
        positions = np.zeros(bucket, dtype=np.int32)
        slot_mapping = np.full(
            bucket, self.cache_config.pad_slot_id, dtype=np.int32
        )
        qsl = np.zeros(max_seqs + 1, dtype=np.int32)
        seq_lens = np.zeros(max_seqs, dtype=np.int32)
        block_table = np.zeros(
            (max_seqs, self.max_blocks_per_seq), dtype=np.int32
        )
        logits_indices = np.zeros(max_seqs, dtype=np.int32)

        t = 0
        max_q = 1
        max_s = 1
        for i, (req, n) in enumerate(scheduled):
            start = req.num_computed_tokens
            toks = req.all_token_ids[start : start + n]
            pages = self.allocator.block_table(req.req_id)
            token_ids[t : t + n] = toks
            positions[t : t + n] = np.arange(start, start + n)
            for j in range(n):
                p = start + j
                slot_mapping[t + j] = (
                    pages[p // self.block_size] * self.block_size
                    + p % self.block_size
                )
            qsl[i + 1] = qsl[i] + n
            seq_lens[i] = start + n
            block_table[i, : len(pages)] = pages
            logits_indices[i] = t + n - 1
            t += n
            max_q = max(max_q, n)
            max_s = max(max_s, start + n)
        qsl[num_seqs + 1 :] = qsl[num_seqs]

        # Static-bucket policy (every distinct (max_query_len,
        # max_seq_len) is its own compiled executable; un-warmed
        # compiles surface as multi-second serving outliers):
        #  * prefill/mixed steps PIN max_query_len to one bucket — the
        #    prefill kernel's dead-q-tile skip makes q padding ~free;
        #  * max_seq_len is floored at min(1024, model-len bucket) —
        #    the kernels skip dead pages, so the coarser bound costs
        #    ~nothing.
        mq = next_power_of_2(max_q)
        if mq > 1:
            pin_q = min(
                512,
                next_power_of_2(cfg.max_num_batched_tokens),
                next_power_of_2(cfg.max_model_len),
            )
            mq = max(mq, pin_q)
        floor_s = min(1024, next_power_of_2(cfg.max_model_len))
        batch = ScheduledBatch(
            req_ids=[r.req_id for r, _ in scheduled],
            token_ids=token_ids,
            positions=positions,
            query_start_loc=qsl,
            seq_lens=seq_lens,
            block_table=block_table,
            slot_mapping=slot_mapping,
            logits_indices=logits_indices,
            num_seqs=num_seqs,
            num_tokens=total,
            max_query_len=mq,
            max_seq_len=max(128, floor_s, next_power_of_2(max_s)),
        )
        # VTB_DEBUG=1 sanitizer tier (SURVEY §5.2; the reference's
        # TRITON_BACKEND_DEBUG analog): validate the metadata BEFORE
        # upload so bad page tables fail with indices, not an opaque
        # device fault or a silent wrong-page read
        from vllm_triton_backend_tpu.utils.debug import (
            check_batch_metadata,
            debug_enabled,
        )

        if debug_enabled():
            check_batch_metadata(
                batch,
                self.allocator.num_blocks,
                self.block_size,
                self.cache_config.pad_slot_id,
            )
        return batch

    # ---------------- post-step update ----------------

    def update(
        self, batch: ScheduledBatch, sampled: np.ndarray,
        eos_token_id: int | None, logprobs: np.ndarray | None = None,
    ) -> list[Request]:
        """Apply one step's results; returns requests finished this step.

        ``sampled[i]`` is the sampled token for batch row i; it is only
        consumed when the request's whole remaining context was computed
        (i.e. not mid-chunked-prefill).  ``logprobs[i]``, when given, is
        that token's logprob (stored for requests that asked for it).

        Split into :meth:`advance` (host-only bookkeeping) +
        :meth:`apply_sampled` (consumes device results) so the engine's
        prefill pipeline can advance scheduling WITHOUT waiting for the
        step's D2H (engine._pending_step; ~35 ms tunnel round trip per
        step hidden under the next step's device time).
        """
        self.advance(batch)
        return self.apply_sampled(batch, sampled, eos_token_id, logprobs)

    def advance(self, batch: ScheduledBatch) -> None:
        """Advance computed-token counts + prefix publication for one
        scheduled step — everything the NEXT ``schedule()`` needs, none
        of which depends on the step's sampled tokens."""
        for i, req_id in enumerate(batch.req_ids):
            req = self.requests.get(req_id)
            if req is None:  # aborted while in flight
                continue
            n = int(
                batch.query_start_loc[i + 1] - batch.query_start_loc[i]
            )
            req.num_computed_tokens += n
            self.allocator.publish_full_blocks(
                req_id, req.all_token_ids[: req.num_computed_tokens]
            )

    def completion_snapshot(self, batch: ScheduledBatch) -> list[bool]:
        """Which of this batch's rows have their full prompt computed —
        taken immediately after :meth:`advance` for a deferred flush."""
        out = []
        for req_id in batch.req_ids:
            req = self.requests.get(req_id)
            out.append(
                req is not None
                and req.num_computed_tokens >= req.num_tokens
            )
        return out

    def apply_sampled(
        self, batch: ScheduledBatch, sampled: np.ndarray,
        eos_token_id: int | None, logprobs: np.ndarray | None = None,
        completed_rows: list[bool] | None = None,
    ) -> list[Request]:
        """Consume one (possibly deferred) step's sampled tokens for the
        rows whose prompt completed in that step.

        ``completed_rows`` is the completion snapshot taken right after
        this batch's :meth:`advance` (see :meth:`completion_snapshot`).
        A DEFERRED flush must pass it: by flush time a LATER batch may
        have advanced a mid-prefill row to completion, and re-deriving
        completion from current state would consume this batch's
        garbage mid-chunk logit as that row's first token."""
        finished = []
        for i, req_id in enumerate(batch.req_ids):
            req = self.requests.get(req_id)
            if req is None:  # aborted while deferred
                continue
            done = (
                completed_rows[i] if completed_rows is not None
                else req.num_computed_tokens >= req.num_tokens
            )
            if not done:
                continue  # chunked prefill still in flight
            tok = int(sampled[i])
            req.output_token_ids.append(tok)
            if req.sampling.logprobs and logprobs is not None:
                req.output_logprobs.append(float(logprobs[i]))
            sp = req.sampling
            stop = set(sp.stop_token_ids)
            if eos_token_id is not None and not sp.ignore_eos:
                stop.add(eos_token_id)
            if tok in stop:
                req.status = RequestStatus.FINISHED_STOPPED
            elif len(req.output_token_ids) >= sp.max_tokens:
                req.status = RequestStatus.FINISHED_LENGTH
            elif req.num_tokens >= self.config.max_model_len:
                req.status = RequestStatus.FINISHED_LENGTH
            if req.is_finished:
                finished.append(req)
                self.running.remove(req)
                self.allocator.free(req_id)
        return finished
