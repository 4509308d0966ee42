"""Speculative-decoding engine driver (mixin of LLMEngine).

Split from runtime/engine.py in round 5 (VERDICT r4 #4: one skeleton,
smaller engine): everything here is the spec-round *driver* — batch
building, page reservation, the acceptance gate — while the device math
lives in runtime/spec_decode.py and the shared schedule->launch->commit
machinery stays in the engine (``_process_chunk``/``_outputs``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vllm_triton_backend_tpu.models.llama import ForwardExtras
from vllm_triton_backend_tpu.runtime.scheduler import Request  # noqa: F401
from vllm_triton_backend_tpu.utils import next_power_of_2


class SpecDecodeMixin:
    # ---------------- speculative decoding ----------------

    def _spec_record_round(self, drafted: int, accepted: int) -> None:
        """Feed the acceptance gate one round's (drafted, accepted) and
        suspend speculation when the rolling acceptance predicts a loss
        (see __init__ break-even note)."""
        win = self._spec_window
        win.append((drafted, accepted))
        if len(win) > self.spec_gate_window:
            del win[0]
        d = sum(w[0] for w in win)
        a = sum(w[1] for w in win)
        if len(win) < 2 or d < self.spec_gate_min_drafted:
            return  # not enough evidence yet (see __init__)
        if d and a / d < self.spec_accept_floor:
            self._spec_suspended_until = (
                self._step_counter + self.spec_reprobe_steps
            )
            self._spec_gate_log.warning(
                "speculation suspended: rolling acceptance %.2f < "
                "floor %.2f over %d rounds; re-probing after %d steps",
                a / d, self.spec_accept_floor, len(win),
                self.spec_reprobe_steps,
            )
            win.clear()

    def _spec_probing(self) -> bool:
        """True while the gate lacks evidence — fused dispatches cap
        their round count so a probe costs ~2 rounds, not multistep/k."""
        win = self._spec_window
        return (
            len(win) < 2
            or sum(w[0] for w in win) < self.spec_gate_min_drafted
        )

    def _spec_gate_open(self) -> bool:
        """False while the acceptance gate holds speculation suspended."""
        if self._step_counter < self._spec_suspended_until:
            return False
        if self._spec_suspended_until and (
            self._step_counter == self._spec_suspended_until
        ):
            self._spec_gate_log.info(
                "speculation re-probe at step %d", self._step_counter
            )
        return True

    def _spec_applies(self) -> bool:
        """Steady-state greedy decode with a draft model present —
        the spec round needs every running request one-token-pending
        and plain greedy (stochastic/penalized/seeded/logprob requests
        fall back to the regular path; lossless rejection sampling for
        stochastic requests is a known later phase)."""
        sched = self.scheduler
        if self.spec_k < 2 or sched.waiting or not sched.running:
            return False
        if self.multihost:
            return False  # spec + multi-host composes in a later phase
        if not self._spec_gate_open():
            return False
        if len(sched.running) > sched.config.max_num_seqs:
            return False
        for r in sched.running:
            if not r.output_token_ids:
                return False
            if r.num_computed_tokens != r.num_tokens - 1:
                return False
            sp = r.sampling
            if (
                sp.has_penalties
                or sp.logprobs
                or sp.seed is not None
                or sp.has_logit_adjustments
                # plain temperature sampling is rejection-sampled
                # losslessly; support-filtered dists are a later phase
                or sp.top_p < 1.0
                or sp.top_k > 0
                or sp.min_p > 0.0
            ):
                return False
        return True

    def _step_spec(self) -> list[RequestOutput] | None:
        """One speculative round: k-1 greedy draft steps + ONE target
        verify forward emit 1..k tokens per sequence (spec_decode.py).
        Returns None when pages or model-length headroom are missing —
        the regular one-token step handles that case."""
        from vllm_triton_backend_tpu.runtime.multistep import (
            decode_steps,
        )
        from vllm_triton_backend_tpu.runtime.sampler import (
            SamplingTensors,
            make_sampling_tensors,
        )
        from vllm_triton_backend_tpu.runtime.spec_decode import (
            verify_step,
        )
        from vllm_triton_backend_tpu.utils import cdiv

        sched = self.scheduler
        reqs = list(sched.running)
        k = self.spec_k
        bs = self.config.cache.block_size
        # page + length headroom for k-1 lookahead positions
        needed = 0
        for r in reqs:
            if r.num_tokens + k - 1 > sched.config.max_model_len:
                return None
            target_len = r.num_tokens + k - 1
            needed += max(
                0,
                cdiv(target_len, bs)
                - len(sched.allocator.block_table(r.req_id)),
            )
        if needed > sched.allocator.num_free_blocks:
            return None
        for r in reqs:
            sched.allocator.append_slots(r.req_id, r.num_tokens + k - 1)

        s_pad = sched.config.max_num_seqs
        tokens = np.zeros(s_pad, np.int32)
        lens = np.ones(s_pad, np.int32)
        live = np.zeros(s_pad, bool)
        tbl = np.zeros((s_pad, sched.max_blocks_per_seq), np.int32)
        for i, r in enumerate(reqs):
            tokens[i] = r.output_token_ids[-1]
            lens[i] = r.num_tokens
            live[i] = True
            pages = sched.allocator.block_table(r.req_id)
            tbl[i, : len(pages)] = pages
        maxlen_bucket = max(
            128,
            next_power_of_2(max(r.num_tokens for r in reqs) + k),
        )
        st = SamplingTensors(
            *(jnp.asarray(a) for a in make_sampling_tensors([], s_pad))
        )
        tokens_d, lens_d, live_d, tbl_d = (
            jnp.asarray(tokens), jnp.asarray(lens),
            jnp.asarray(live), jnp.asarray(tbl),
        )
        extras_d = ForwardExtras(
            max_query_len=1, max_seq_len=maxlen_bucket,
            k_scale=self.k_scale, v_scale=self.v_scale,
        )
        stochastic = any(
            r.sampling.temperature > 0.0 for r in reqs
        )
        temp = np.zeros(s_pad, np.float32)
        for i, r in enumerate(reqs):
            temp[i] = r.sampling.temperature
        q_dists = None
        if (
            self.draft_params is not None
            and not stochastic
            and self.tp == 1
        ):
            # FUSED multi-round speculation (spec_decode.spec_rounds):
            # R = multistep/k rounds chained on device — the session
            # treatment applied to speculation (the host-per-round
            # version measured 5.6-7.7x slower than plain sessions,
            # docs/spec_decode_tpu.md)
            return self._step_spec_fused(
                reqs, tokens, lens, live, tbl, maxlen_bucket, k, bs,
                tokens_d, lens_d, live_d, tbl_d,
            )
        if self.draft_params is not None and not stochastic:
            # k (not k-1) draft steps: the extra step's WRITE matters,
            # not its token — after a fully-accepted round the next
            # current token sits at position n+k-1 and the draft must
            # already hold K/V for position n+k-2, which only the k-th
            # step writes (its sampled token is discarded).
            drafts_all, _lp, _t, _l, _key, self.draft_cache = (
                decode_steps(
                    self.draft_params, self.draft_config,
                    tokens_d, lens_d, tbl_d, live_d,
                    jnp.full_like(lens_d, 1 << 30),
                    self.draft_cache, st, self._key,
                    extras_d, k, bs, greedy_only=True,
                )
            )
            drafts = drafts_all[: k - 1]
        elif self.draft_params is not None:
            from vllm_triton_backend_tpu.runtime.spec_decode import (
                draft_steps_stochastic,
            )

            self._key, sub = jax.random.split(self._key)
            drafts_all, q_all, self.draft_cache = (
                draft_steps_stochastic(
                    self.draft_params, self.draft_config,
                    tokens_d, lens_d, tbl_d, live_d,
                    self.draft_cache, jnp.asarray(temp), sub,
                    extras_d, k, bs,
                )
            )
            drafts = drafts_all[: k - 1]
            q_dists = q_all[: k - 1]
        else:
            from vllm_triton_backend_tpu.runtime.spec_decode import (
                ngram_propose,
            )

            dr = np.zeros((k - 1, s_pad), np.int32)
            for i, r in enumerate(reqs):
                prop = ngram_propose(
                    r.all_token_ids, k - 1, self.spec_ngram_n
                )
                dr[:, i] = (
                    prop if prop is not None
                    else [tokens[i]] * (k - 1)
                )
            drafts = jnp.asarray(dr)
            if stochastic:
                # prompt-lookup proposals are deterministic: q is the
                # proposal's one-hot (accept w.p. p(d), residual keeps
                # the emitted marginal exactly p)
                q_dists = jax.nn.one_hot(
                    drafts, self.config.model.vocab_size,
                    dtype=jnp.float32,
                )
        extras_v = ForwardExtras(
            max_query_len=k, max_seq_len=maxlen_bucket,
            k_scale=self.k_scale, v_scale=self.v_scale,
        )
        if self.tp > 1:
            # TP verify: the sharded prefill executable computes the
            # logits; acceptance runs in a small standalone jit
            from vllm_triton_backend_tpu.parallel import (
                make_sharded_forward,
            )
            from vllm_triton_backend_tpu.runtime.spec_decode import (
                spec_accept,
            )

            step_fn = self._tp_steps.get(extras_v)
            if step_fn is None:
                step_fn = make_sharded_forward(
                    self.config.model, self.mesh, extras_v,
                    tp_overlap=self.config.parallel.overlap_collectives,
                    multihost=self.multihost,
                )
                self._tp_steps[extras_v] = step_fn
            fed = np.concatenate(
                [np.asarray(tokens)[None], np.asarray(drafts)], axis=0
            )  # [k, S]
            flat_tokens = fed.T.reshape(-1)
            offs = np.arange(k, dtype=np.int32)
            positions = ((lens - 1)[:, None] + offs[None, :])
            qsl = np.arange(s_pad + 1, dtype=np.int32) * k
            vis = np.where(live, lens + (k - 1), lens).astype(np.int32)
            page = np.take_along_axis(tbl, positions // bs, axis=1)
            slots = np.where(
                live[:, None], page * bs + positions % bs, -1
            ).reshape(-1).astype(np.int32)
            logits, self.kv_cache = step_fn(
                self.params,
                jnp.asarray(flat_tokens)[None],
                jnp.asarray(positions.reshape(-1))[None],
                self.kv_cache,
                jnp.asarray(qsl)[None],
                jnp.asarray(vis)[None],
                tbl_d[None],
                jnp.asarray(slots)[None],
            )
            self._key, sub = jax.random.split(self._key)
            tgt, n_acc = spec_accept(
                logits[0], drafts, jnp.asarray(temp), q_dists, sub,
                k, stochastic=stochastic,
            )
        elif stochastic:
            from vllm_triton_backend_tpu.runtime.spec_decode import (
                verify_step_stochastic,
            )

            self._key, sub = jax.random.split(self._key)
            tgt, n_acc, self.kv_cache = verify_step_stochastic(
                self.params, self.config.model,
                tokens_d, drafts, q_dists, jnp.asarray(temp),
                lens_d, tbl_d, live_d,
                self.kv_cache, sub, extras_v, k, bs,
            )
        else:
            tgt, n_acc, self.kv_cache = verify_step(
                self.params, self.config.model,
                tokens_d, drafts, lens_d, tbl_d, live_d,
                self.kv_cache, extras_v, k, bs,
            )
        tgt = np.asarray(tgt)  # [S, k]
        n_acc = np.asarray(n_acc)
        self._spec_stats["rounds"] += 1
        self._spec_stats["drafted"] += (k - 1) * len(reqs)
        self._spec_stats["accepted"] += int(n_acc[: len(reqs)].sum())
        self._spec_record_round(
            (k - 1) * len(reqs), int(n_acc[: len(reqs)].sum())
        )
        budget = n_acc.astype(np.int64) + 1  # emit t_0..t_{n_acc}
        finished = self._process_chunk(reqs, tgt.T, budget)
        return self._outputs(finished)

    def _step_spec_fused(
        self, reqs, tokens, lens, live, tbl, maxlen_bucket, k, bs,
        tokens_d, lens_d, live_d, tbl_d,
    ) -> list[RequestOutput] | None:
        """R fused greedy speculative rounds in ONE dispatch (see
        spec_decode.spec_rounds).  Reserves pages for up to R*k tokens
        per row (rows whose reservation falls short freeze per-round on
        the device and the host emits nothing for them that round)."""
        from vllm_triton_backend_tpu.runtime.spec_decode import (
            spec_rounds,
        )
        from vllm_triton_backend_tpu.utils import cdiv

        sched = self.scheduler
        rounds = max(1, self.multistep // k)
        if self._spec_probing():
            # acceptance unknown: probe with 2 rounds instead of
            # committing a full multistep/k-round dispatch to a draft
            # that may be a measured loss (acceptance gate, r4 #7)
            rounds = min(rounds, 2)
        s_pad = sched.config.max_num_seqs
        # reserve up to rounds*k growth per row, shrinking rounds if the
        # pool cannot cover even one round for every row
        while rounds >= 1:
            need = 0
            targets = []
            for r in reqs:
                # NOT capped at max_tokens: a row one token from its
                # limit must still verify a full k (the host discards
                # past max_tokens) — capping would freeze it on device
                # forever while the host waits for tokens (livelock)
                tgt_len = min(
                    sched.config.max_model_len,
                    r.num_tokens + rounds * k,
                )
                targets.append(tgt_len)
                need += max(
                    0,
                    cdiv(tgt_len, bs)
                    - len(sched.allocator.block_table(r.req_id)),
                )
            if need <= sched.allocator.num_free_blocks:
                break
            rounds //= 2
        if rounds < 1:
            return None  # pool exhausted: regular path
        maxlen = np.ones(s_pad, np.int32)
        for i, (r, tgt_len) in enumerate(zip(reqs, targets)):
            sched.allocator.append_slots(r.req_id, tgt_len)
            # refresh the table (append may have grown it)
            pages = sched.allocator.block_table(r.req_id)
            tbl[i, : len(pages)] = pages
            maxlen[i] = tgt_len
        tbl_d = jnp.asarray(tbl)
        maxlen_bucket = max(
            maxlen_bucket,
            max(128, next_power_of_2(int(maxlen.max()) + k)),
        )
        extras_d = ForwardExtras(
            max_query_len=1, max_seq_len=maxlen_bucket,
            k_scale=self.k_scale, v_scale=self.v_scale,
        )
        extras_v = ForwardExtras(
            max_query_len=k, max_seq_len=maxlen_bucket,
            k_scale=self.k_scale, v_scale=self.v_scale,
        )
        (
            tgt_r, acc_r, act_r, _toks, _lens,
            self.kv_cache, self.draft_cache,
        ) = spec_rounds(
            self.params, self.draft_params,
            self.config.model, self.draft_config,
            tokens_d, lens_d, tbl_d, live_d, jnp.asarray(maxlen),
            self.kv_cache, self.draft_cache,
            extras_d, extras_v, k, rounds, bs,
        )
        tgt_r = np.asarray(tgt_r)  # [R, S, k]
        acc_r = np.asarray(acc_r)  # [R, S]
        act_r = np.asarray(act_r)  # [R, S]
        finished_all: list[Request] = []
        n_live = len(reqs)
        for r_i in range(rounds):
            emit = np.where(
                act_r[r_i], acc_r[r_i] + 1, 0
            ).astype(np.int64)
            if not emit[:n_live].any():
                continue
            self._spec_stats["rounds"] += 1
            self._spec_stats["drafted"] += (k - 1) * int(
                act_r[r_i, :n_live].sum()
            )
            self._spec_stats["accepted"] += int(
                acc_r[r_i, :n_live].sum()
            )
            self._spec_record_round(
                (k - 1) * int(act_r[r_i, :n_live].sum()),
                int(acc_r[r_i, :n_live].sum()),
            )
            finished_all += self._process_chunk(
                reqs, tgt_r[r_i].T, emit
            )
        return self._outputs(finished_all)
