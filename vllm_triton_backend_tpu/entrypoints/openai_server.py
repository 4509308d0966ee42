"""OpenAI-compatible HTTP server (aiohttp) over the continuous-batching
engine.

Role parity: the reference serves through vLLM's api_server (SURVEY.md §1
L5/L6; bench drivers hit it over HTTP, bench_vllm_user_range.py:72-79).
Here the server is native: a background engine thread drives ``step()``
continuously; asyncio handlers enqueue requests and await completion (or
stream deltas) through thread-safe queues.

Endpoints: /v1/completions, /v1/chat/completions (SSE streaming
supported), /v1/models, /health, /metrics (text counters).

Usage:
  python -m vllm_triton_backend_tpu.entrypoints.openai_server \
      [--model-dir PATH] [--port 8000]
"""

from __future__ import annotations

import argparse
import asyncio
import itertools
import json
import logging
import queue
import threading
import time
import uuid

try:
    from aiohttp import web
except ImportError:  # pragma: no cover - aiohttp is in the base image
    web = None

from vllm_triton_backend_tpu.runtime.engine import LLMEngine
from vllm_triton_backend_tpu.runtime.sampler import SamplingParams

import os as _os

# Serving-layer stall hedge (VERDICT r4 weak #7): this deployment's
# tunnel shows sporadic load-independent ~4-5 s device stalls
# (docs/serving_percentiles.md).  A single chip cannot re-dispatch
# around them, so the serving layer (a) counts them in /metrics and
# (b) keeps SSE clients alive with comment frames while they wait.
_STALL_MS = float(_os.environ.get("VTB_STALL_MS", "1500"))
_KEEPALIVE_S = float(_os.environ.get("VTB_SSE_KEEPALIVE_S", "2.0"))


class EngineWorker:
    """Background thread: admits queued requests, steps the engine, and
    publishes per-request incremental outputs."""

    def __init__(self, engine: LLMEngine, tokenizer=None):
        self.engine = engine
        self.tokenizer = tokenizer
        self.new_requests: queue.Queue = queue.Queue()
        # fused decode sessions poll this at chunk boundaries so queued
        # arrivals interrupt a long session (see LLMEngine.poll_new_work)
        engine.poll_new_work = lambda: not self.new_requests.empty()
        self.streams: dict[str, queue.Queue] = {}
        self.metrics = {
            "requests_total": 0,
            "tokens_generated_total": 0,
            "steps_total": 0,
            "recoveries_total": 0,
            # serving-layer stall hedge (docs/serving_percentiles.md
            # TTFT p99 outliers): device/tunnel stalls detected by step
            # wall time, and SSE keep-alives emitted while clients wait
            "device_stalls_total": 0,
            "sse_keepalives_total": 0,
            "last_stall_ms": 0,
        }
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._prev_lens: dict[str, int] = {}
        self._sampling: dict[str, SamplingParams] = {}

    def start(self):
        self._thread.start()

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5)

    def submit(
        self, prompt_ids: list[int], sampling: SamplingParams,
        priority: int = 0,
    ) -> tuple[str, queue.Queue]:
        req_id = f"cmpl-{uuid.uuid4().hex[:24]}"
        out_q: queue.Queue = queue.Queue()
        self.streams[req_id] = out_q
        self._sampling[req_id] = sampling
        self.new_requests.put((req_id, prompt_ids, sampling, priority))
        self.metrics["requests_total"] += 1
        return req_id, out_q

    def _loop(self):
        while not self._stop.is_set():
            admitted = False
            while True:
                try:
                    req_id, ids, sp, prio = self.new_requests.get_nowait()
                except queue.Empty:
                    break
                self.engine.add_request(
                    ids, sp, req_id=req_id, priority=prio
                )
                self._prev_lens[req_id] = 0
                admitted = True
            if not self.engine.has_unfinished():
                if not admitted:
                    time.sleep(0.005)
                continue
            # Streaming granularity (VERDICT r4 #3): at low concurrency
            # the fused-session K-token chunks dominate ITL (measured
            # ITL p50 ~ 8x TPOT p50 at concurrency 1).  With live SSE
            # streams, cap the session chunk so deltas approach
            # per-token granularity; above the threshold throughput
            # mode resumes (chunking is what holds 96 ms TPOT at 128).
            running = sum(
                len(s.running) for s in self.engine.schedulers
            )
            if self.streams and running <= 8:
                self.engine.session_k_cap = 1  # plain steps: ITL==TPOT
            elif self.streams and running <= 16:
                self.engine.session_k_cap = 2
            else:
                self.engine.session_k_cap = None
            t_step = time.perf_counter()
            try:
                finished = self.engine.step()
            except Exception:  # noqa: BLE001 — device faults surface as
                # runtime errors of many types; recovery requeues all
                # in-flight work for recompute (SURVEY §5.3)
                logging.getLogger(__name__).exception(
                    "engine step failed; recovering"
                )
                requeued = self.engine.recover()
                self.metrics["recoveries_total"] += 1
                logging.getLogger(__name__).warning(
                    "recovered: %d request(s) requeued for recompute",
                    requeued,
                )
                continue
            self.metrics["steps_total"] += 1
            dt_step = time.perf_counter() - t_step
            if dt_step * 1e3 >= _STALL_MS:
                # load-independent device/tunnel stall (diagnosed in
                # docs/serving_percentiles.md): count it so operators
                # can see the p99 outliers in /metrics, and let the
                # SSE keep-alive path cover waiting clients
                self.metrics["device_stalls_total"] += 1
                self.metrics["last_stall_ms"] = int(dt_step * 1e3)
            slow_ms = float(__import__("os").environ.get(
                "VTB_LOG_SLOW_STEP_MS", "0"
            ) or 0)
            if slow_ms and dt_step * 1e3 >= slow_ms:
                # diagnostic for serving-latency outliers: what was the
                # step doing (likely a first-encounter XLA compile of
                # the logged composition)
                sched = self.engine.scheduler
                qlens = [
                    r.num_tokens - r.num_computed_tokens
                    for r in sched.running
                ]
                logging.getLogger(__name__).warning(
                    "slow step: %.0f ms, running=%d waiting=%d "
                    "pending_qlens=%s",
                    dt_step * 1e3, len(sched.running),
                    len(sched.waiting), qlens[:16],
                )
            # incremental deltas for streaming consumers (all_requests:
            # requests may live on any data-parallel replica scheduler)
            all_reqs = self.engine.all_requests()
            for req_id, q in list(self.streams.items()):
                req = all_reqs.get(req_id)
                if req is None:
                    continue
                prev = self._prev_lens.get(req_id, 0)
                cur = len(req.output_token_ids)
                if cur > prev:
                    q.put(("delta", req.output_token_ids[prev:cur]))
                    self.metrics["tokens_generated_total"] += cur - prev
                    self._prev_lens[req_id] = cur
                out = self._check_stop_strings(req)
                if out is not None:
                    finished = [
                        f for f in finished if f.req_id != req_id
                    ]
                    finished.append(out)
            for out in finished:
                q = self.streams.pop(out.req_id, None)
                self._prev_lens.pop(out.req_id, None)
                self._sampling.pop(out.req_id, None)
                if q is not None:
                    q.put(("done", out))

    def _check_stop_strings(self, req):
        """Detokenized stop-sequence scan (vLLM's ``stop`` parameter).
        Needs a tokenizer; on a hit the request is aborted and the final
        text is truncated at the stop string.  Streaming consumers may
        have already received a few characters past the stop — the final
        non-streamed ``text`` is exact."""
        sp = self._sampling.get(req.req_id)
        if (
            sp is None or not sp.stop or self.tokenizer is None
            or not req.output_token_ids
        ):
            return None
        text = _decode(self.tokenizer, req.output_token_ids)
        cut = min(
            (i for i in (text.find(s) for s in sp.stop) if i >= 0),
            default=-1,
        )
        if cut < 0:
            return None
        from vllm_triton_backend_tpu.runtime.engine import RequestOutput

        self.engine.abort_request(req.req_id)
        return RequestOutput(
            req_id=req.req_id,
            prompt_token_ids=req.prompt_token_ids,
            output_token_ids=list(req.output_token_ids),
            finish_reason="stop",
            text=text[:cut],
            logprobs=(
                list(req.output_logprobs) if sp.logprobs else None
            ),
        )


def _decode(tokenizer, ids: list[int]) -> str:
    if tokenizer is None:
        return " ".join(map(str, ids))
    return tokenizer.decode(ids)


def _encode(tokenizer, text: str) -> list[int]:
    if tokenizer is None:
        # tokenizer-less (test) serving: numeric tokens pass through,
        # other words hash to a stable id
        ids = []
        for t in text.split():
            try:
                ids.append(int(t) % 32000)
            except ValueError:
                ids.append(
                    int.from_bytes(t.encode()[:4].ljust(4, b"\0")) % 32000
                )
        return ids or [1]
    enc = tokenizer.encode(text)
    # tokenizers.Tokenizer returns an Encoding; transformers tokenizers
    # return the id list directly
    return enc.ids if hasattr(enc, "ids") else enc


def _render_chat(tokenizer, messages: list[dict]) -> list[int]:
    """Token ids for a chat conversation: the model's own chat
    template when the tokenizer carries one (transformers
    ``apply_chat_template``), else a plain role-prefixed transcript."""
    if (
        tokenizer is not None
        and getattr(tokenizer, "chat_template", None)
        and hasattr(tokenizer, "apply_chat_template")
    ):
        return tokenizer.apply_chat_template(
            messages, add_generation_prompt=True, tokenize=True
        )
    text = "\n".join(
        f"{m.get('role', 'user')}: {m.get('content', '')}"
        for m in messages
    ) + "\nassistant:"
    return _encode(tokenizer, text)


def build_app(worker: EngineWorker, model_name: str = "vtb-model"):
    if web is None:
        raise RuntimeError("aiohttp unavailable")
    app = web.Application()

    def sampling_from(body: dict) -> SamplingParams:
        stop = body.get("stop") or ()
        if isinstance(stop, str):
            stop = (stop,)
        return SamplingParams(
            temperature=float(body.get("temperature", 0.0)),
            top_p=float(body.get("top_p", 1.0)),
            top_k=int(body.get("top_k", 0)),
            min_p=float(body.get("min_p", 0.0)),
            repetition_penalty=float(
                body.get("repetition_penalty", 1.0)
            ),
            presence_penalty=float(body.get("presence_penalty", 0.0)),
            frequency_penalty=float(body.get("frequency_penalty", 0.0)),
            max_tokens=int(body.get("max_tokens", 128)),
            stop=tuple(str(s) for s in stop),
            stop_token_ids=tuple(body.get("stop_token_ids", ())),
            allowed_token_ids=tuple(
                body.get("allowed_token_ids", ())
            ),
            logit_bias=tuple(
                (int(t), float(b))
                for t, b in (body.get("logit_bias") or {}).items()
            ),
            logprobs=bool(body.get("logprobs", False)),
            seed=(
                int(body["seed"]) if body.get("seed") is not None
                else None
            ),
        )

    async def wait_result(out_q: queue.Queue, stream_cb=None, resp=None):
        loop = asyncio.get_event_loop()

        def _get():
            # streaming responses poll with a timeout so device/tunnel
            # stalls (the multi-second TTFT p99 outliers diagnosed in
            # docs/serving_percentiles.md) surface as SSE keep-alive
            # comments instead of a silent dead connection — the
            # serving-layer hedge for stalls the engine cannot shorten
            if resp is None:
                return out_q.get()
            try:
                return out_q.get(timeout=_KEEPALIVE_S)
            except queue.Empty:
                return ("keepalive", None)

        while True:
            kind, payload = await loop.run_in_executor(None, _get)
            if kind == "keepalive":
                worker.metrics["sse_keepalives_total"] += 1
                await resp.write(b": keep-alive\n\n")
                continue
            if kind == "delta" and stream_cb is not None:
                await stream_cb(payload)
            if kind == "done":
                return payload

    async def completions(request: web.Request):
        body = await request.json()
        prompt = body.get("prompt", "")
        if isinstance(prompt, list) and prompt and isinstance(prompt[0], int):
            ids = prompt
        else:
            ids = _encode(worker.tokenizer, str(prompt))
        sp = sampling_from(body)
        n = max(1, int(body.get("n", 1)))
        if n > 1 and not body.get("stream"):
            # n parallel completions: n engine requests batched together
            # (each is its own batch row -> independent draws; seeded
            # requests get seed+i for distinct reproducible streams)
            import dataclasses as _dc

            subs = [
                worker.submit(
                    ids,
                    _dc.replace(sp, seed=sp.seed + i)
                    if sp.seed is not None else sp,
                )
                for i in range(n)
            ]
            outs = [await wait_result(q) for _, q in subs]
            choices = []
            total_completion = 0
            for i, out in enumerate(outs):
                total_completion += len(out.output_token_ids)
                c = {
                    "index": i,
                    "text": (
                        out.text if out.text is not None
                        else _decode(
                            worker.tokenizer, out.output_token_ids
                        )
                    ),
                    "finish_reason": out.finish_reason,
                }
                if sp.logprobs and out.logprobs is not None:
                    c["logprobs"] = {
                        "token_logprobs": out.logprobs,
                        "tokens": [
                            _decode(worker.tokenizer, [t])
                            for t in out.output_token_ids
                        ],
                    }
                choices.append(c)
            return web.json_response(
                {
                    "id": subs[0][0],
                    "object": "text_completion",
                    "created": int(time.time()),
                    "model": model_name,
                    "choices": choices,
                    "usage": {
                        "prompt_tokens": len(ids),
                        "completion_tokens": total_completion,
                        "total_tokens": len(ids) + total_completion,
                    },
                }
            )
        req_id, out_q = worker.submit(
            ids, sp, priority=int(body.get("priority", 0))
        )
        created = int(time.time())

        if body.get("stream"):
            resp = web.StreamResponse(
                headers={"Content-Type": "text/event-stream"}
            )
            await resp.prepare(request)

            async def send_delta(tok_ids):
                chunk = {
                    "id": req_id,
                    "object": "text_completion",
                    "created": created,
                    "model": model_name,
                    "choices": [
                        {
                            "index": 0,
                            "text": _decode(worker.tokenizer, tok_ids),
                            "finish_reason": None,
                        }
                    ],
                }
                await resp.write(
                    f"data: {json.dumps(chunk)}\n\n".encode()
                )

            out = await wait_result(out_q, send_delta, resp=resp)
            final = {
                "id": req_id,
                "object": "text_completion",
                "created": created,
                "model": model_name,
                "choices": [
                    {"index": 0, "text": "",
                     "finish_reason": out.finish_reason}
                ],
            }
            await resp.write(f"data: {json.dumps(final)}\n\n".encode())
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp

        out = await wait_result(out_q)
        choice = {
            "index": 0,
            "text": (
                out.text if out.text is not None
                else _decode(worker.tokenizer, out.output_token_ids)
            ),
            "finish_reason": out.finish_reason,
        }
        if sp.logprobs and out.logprobs is not None:
            choice["logprobs"] = {
                "token_logprobs": out.logprobs,
                "tokens": [
                    _decode(worker.tokenizer, [t])
                    for t in out.output_token_ids
                ],
            }
        return web.json_response(
            {
                "id": req_id,
                "object": "text_completion",
                "created": created,
                "model": model_name,
                "choices": [choice],
                "usage": {
                    "prompt_tokens": len(ids),
                    "completion_tokens": len(out.output_token_ids),
                    "total_tokens": len(ids) + len(out.output_token_ids),
                },
            }
        )

    async def chat_completions(request: web.Request):
        body = await request.json()
        messages = body.get("messages", [])
        ids = _render_chat(worker.tokenizer, messages)
        sp = sampling_from(body)
        req_id, out_q = worker.submit(ids, sp)
        created = int(time.time())
        if body.get("stream"):
            resp = web.StreamResponse(
                headers={"Content-Type": "text/event-stream"}
            )
            await resp.prepare(request)

            async def send_delta(tok_ids):
                chunk = {
                    "id": req_id,
                    "object": "chat.completion.chunk",
                    "created": created,
                    "model": model_name,
                    "choices": [
                        {
                            "index": 0,
                            "delta": {
                                "content": _decode(
                                    worker.tokenizer, tok_ids
                                )
                            },
                            "finish_reason": None,
                        }
                    ],
                }
                await resp.write(
                    f"data: {json.dumps(chunk)}\n\n".encode()
                )

            out = await wait_result(out_q, send_delta, resp=resp)
            final = {
                "id": req_id,
                "object": "chat.completion.chunk",
                "created": created,
                "model": model_name,
                "choices": [
                    {
                        "index": 0,
                        "delta": {},
                        "finish_reason": out.finish_reason,
                    }
                ],
            }
            await resp.write(f"data: {json.dumps(final)}\n\n".encode())
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp
        out = await wait_result(out_q)
        return web.json_response(
            {
                "id": req_id,
                "object": "chat.completion",
                "created": int(time.time()),
                "model": model_name,
                "choices": [
                    {
                        "index": 0,
                        "message": {
                            "role": "assistant",
                            "content": _decode(
                                worker.tokenizer, out.output_token_ids
                            ),
                        },
                        "finish_reason": out.finish_reason,
                    }
                ],
            }
        )

    async def models(request: web.Request):
        return web.json_response(
            {
                "object": "list",
                "data": [
                    {
                        "id": model_name,
                        "object": "model",
                        "owned_by": "vtb",
                    }
                ],
            }
        )

    async def health(request: web.Request):
        return web.json_response({"status": "ok"})

    async def metrics(request: web.Request):
        """Prometheus exposition format (text/plain; version=0.0.4):
        HELP/TYPE headers + one sample per metric; *_total names are
        counters, the rest gauges."""
        merged = dict(worker.metrics)
        try:
            merged.update(worker.engine.stats())
        except Exception:
            pass
        lines = []
        for k, v in merged.items():
            if not isinstance(v, (int, float)):
                continue
            name = f"vtb_{k}"
            kind = "counter" if k.endswith("_total") else "gauge"
            lines.append(f"# TYPE {name} {kind}")
            lines.append(f"{name} {v}")
        return web.Response(
            text="\n".join(lines) + "\n",
            content_type="text/plain",
        )

    app.router.add_post("/v1/completions", completions)
    app.router.add_post("/v1/chat/completions", chat_completions)
    app.router.add_get("/v1/models", models)
    app.router.add_get("/health", health)
    app.router.add_get("/metrics", metrics)
    return app


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    # engine shape
    ap.add_argument("--tensor-parallel", type=int, default=1)
    ap.add_argument("--data-parallel", type=int, default=1)
    ap.add_argument("--pipeline-parallel", type=int, default=1)
    ap.add_argument("--max-num-seqs", type=int, default=None)
    ap.add_argument("--max-model-len", type=int, default=None)
    # memory formats
    ap.add_argument(
        "--cache-dtype", default=None,
        choices=[None, "auto", "fp8", "int8"],
    )
    ap.add_argument(
        "--quantization", default=None,
        choices=[None, "int8", "fp8", "int8-w8a8"],
    )
    # Pre-compile the serving executables (token buckets, mixed
    # compositions, decode session) before accepting traffic — kills
    # the first-request XLA-compile TTFT outliers (engine.warmup()).
    ap.add_argument("--warmup", action="store_true")
    # Fused decode chunk size: tokens generated per engine step in
    # steady-state decode.  Serving default 8 keeps streaming deltas and
    # arrival admission at ~0.1-0.2 s granularity; raise for offline
    # throughput (bench.py uses 32).
    ap.add_argument("--multistep", type=int, default=8)
    # speculative decoding (lossless; see runtime/spec_decode.py)
    ap.add_argument("--draft-dir", default=None)
    ap.add_argument("--spec-ngram", action="store_true")
    ap.add_argument("--spec-k", type=int, default=4)
    args = ap.parse_args()

    import dataclasses as dc

    from vllm_triton_backend_tpu.config import (
        EngineConfig,
        ModelConfig,
        ParallelConfig,
    )

    def shape_config(cfg: EngineConfig) -> EngineConfig:
        cfg = cfg.replace(
            parallel=ParallelConfig(
                tensor_parallel=args.tensor_parallel,
                data_parallel=args.data_parallel,
                pipeline_parallel=args.pipeline_parallel,
            )
        )
        sched = cfg.scheduler
        if args.max_num_seqs:
            sched = dc.replace(sched, max_num_seqs=args.max_num_seqs)
        if args.max_model_len:
            sched = dc.replace(sched, max_model_len=args.max_model_len)
        cfg = cfg.replace(scheduler=sched)
        if args.cache_dtype:
            cfg = cfg.replace(
                cache=dc.replace(cfg.cache, cache_dtype=args.cache_dtype)
            )
        return cfg

    spec_kw = dict(spec_ngram=args.spec_ngram, spec_k=args.spec_k)
    if args.draft_dir:
        from vllm_triton_backend_tpu.models.hf import load_params

        draft_cfg, draft_params = load_params(args.draft_dir)
        spec_kw.update(
            draft_config=draft_cfg, draft_params=draft_params
        )

    tokenizer = None
    if args.model_dir:
        from vllm_triton_backend_tpu.models.hf import load_params

        mc, params = load_params(args.model_dir)
        if args.quantization:
            from vllm_triton_backend_tpu.models.llama import (
                quantize_params,
            )

            params = quantize_params(params, args.quantization, mc)
            # record the mode so the engine can enable the W8A8 prefill
            # path (ForwardExtras.w8a8) when "int8-w8a8" was requested
            import dataclasses

            mc = dataclasses.replace(mc, quantization=args.quantization)
        cfg = shape_config(EngineConfig().replace(model=mc))
        engine = LLMEngine(
            cfg, params=params, multistep=args.multistep, **spec_kw
        )
        # prefer transformers' tokenizer: it carries the model's chat
        # template (used by /v1/chat/completions)
        try:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(args.model_dir)
        except Exception:
            try:
                from tokenizers import Tokenizer

                tokenizer = Tokenizer.from_file(
                    f"{args.model_dir}/tokenizer.json"
                )
            except Exception:
                pass
    else:
        engine = LLMEngine(
            shape_config(EngineConfig(model=ModelConfig.tiny())),
            multistep=args.multistep,
            **spec_kw,
        )

    if args.warmup:
        dt = engine.warmup()
        print(f"warmup: serving executables compiled in {dt:.1f}s",
              flush=True)
    worker = EngineWorker(engine, tokenizer)
    worker.start()
    app = build_app(worker)
    web.run_app(app, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
