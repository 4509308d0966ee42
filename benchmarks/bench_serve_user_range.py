"""E2E serving benchmark: user-concurrency sweep against the OpenAI server.

Reference L6 analog (scripts/bench_vllm_user_range.py:44-84): sweep
max-concurrency 1→128, fire prompts at the HTTP server, record
TTFT / TPOT / ITL / E2EL percentiles [20, 50, 80, 99] and total token
throughput per concurrency level.

Usage:
  python benchmarks/bench_serve_user_range.py [--base-url http://...] \
      [--num-prompts 64] [--concurrency 1,2,4,...] [--result-path DIR]

Without --base-url an in-process server with a tiny random model is
started (smoke mode).  Timing uses streamed SSE chunks: TTFT = first
chunk, ITL = gaps between chunks.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import time

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

PERCENTILES = [20, 50, 80, 99]  # reference bench_vllm_user_range.py:77


def synth_prompts(n: int, rng, in_len=(16, 128), out_len=(8, 64)):
    """ShareGPT-like ragged synthetic workload (token-id prompts)."""
    out = []
    for _ in range(n):
        il = int(rng.integers(*in_len))
        ol = int(rng.integers(*out_len))
        out.append(
            (rng.integers(1, 30000, size=il).tolist(), ol)
        )
    return out


async def _one_request(session, base_url, prompt_ids, max_tokens):
    import aiohttp  # noqa: F401

    t_start = time.perf_counter()
    chunk_times = []
    n_tokens = 0
    async with session.post(
        f"{base_url}/v1/completions",
        json={
            "prompt": prompt_ids,
            "max_tokens": max_tokens,
            "stream": True,
        },
    ) as resp:
        async for raw in resp.content:
            line = raw.decode().strip()
            if not line.startswith("data: ") or line == "data: [DONE]":
                continue
            payload = json.loads(line[len("data: "):])
            text = payload["choices"][0]["text"]
            if text:
                chunk_times.append(time.perf_counter())
                n_tokens += max(1, len(text.split()))
    t_end = time.perf_counter()
    if not chunk_times:
        return None
    ttft = chunk_times[0] - t_start
    e2el = t_end - t_start
    itls = np.diff(chunk_times).tolist() if len(chunk_times) > 1 else [0.0]
    tpot = (t_end - chunk_times[0]) / max(1, n_tokens - 1) if n_tokens > 1 else 0.0
    return {
        "ttft": ttft, "e2el": e2el, "itls": itls, "tpot": tpot,
        "tokens": n_tokens,
    }


async def run_sweep(base_url, prompts, concurrency):
    import aiohttp

    sem = asyncio.Semaphore(concurrency)
    results = []
    t0 = time.perf_counter()
    async with aiohttp.ClientSession() as session:

        async def worker(p, ol):
            async with sem:
                r = await _one_request(session, base_url, p, ol)
                if r:
                    results.append(r)

        await asyncio.gather(
            *[worker(p, ol) for p, ol in prompts]
        )
    wall = time.perf_counter() - t0
    if not results:
        return None
    all_itls = [x for r in results for x in r["itls"]]
    rec = {
        "concurrency": concurrency,
        "completed": len(results),
        "total_token_throughput": sum(r["tokens"] for r in results) / wall,
        "wall_s": wall,
    }
    for name, vals in (
        ("ttft", [r["ttft"] for r in results]),
        ("tpot", [r["tpot"] for r in results]),
        ("itl", all_itls),
        ("e2el", [r["e2el"] for r in results]),
    ):
        for p in PERCENTILES:
            rec[f"{name}_p{p}"] = float(np.percentile(vals, p))
    return rec


def main(argv=None) -> list[dict]:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", default=None)
    ap.add_argument("--num-prompts", type=int, default=32)
    ap.add_argument("--concurrency", default="1,2,4,8")
    ap.add_argument("--result-path", default=None)
    ap.add_argument(
        "--model", default="tiny",
        choices=["tiny", "tinyllama", "granite-int8"],
        help="in-process server model (random weights; granite-int8 = "
        "the bench.py headline config)",
    )
    ap.add_argument("--in-len", default=None, help="min,max prompt tokens")
    ap.add_argument("--out-len", default=None, help="min,max new tokens")
    ap.add_argument("--max-num-seqs", type=int, default=None)
    ap.add_argument(
        "--multistep", type=int, default=8,
        help="decode chunk size (tokens per engine step in steady "
        "decode): small keeps ITL/admission granular, large amortizes "
        "host boundaries (offline bench uses 32)",
    )
    ap.add_argument(
        "--warmup", action="store_true",
        help="pre-compile serving executables before the sweep "
        "(engine.warmup(); removes first-request compile outliers from "
        "the low-concurrency TTFT p99 rows)",
    )
    args = ap.parse_args(argv)

    worker = None
    base_url = args.base_url
    if base_url is None:
        # in-process server (random weights at the requested scale)
        from aiohttp.test_utils import TestServer

        import jax

        from vllm_triton_backend_tpu.config import (
            CacheConfig,
            EngineConfig,
            ModelConfig,
            SchedulerConfig,
        )
        from vllm_triton_backend_tpu.entrypoints.openai_server import (
            EngineWorker,
            build_app,
        )
        from vllm_triton_backend_tpu.models import llama
        from vllm_triton_backend_tpu.runtime.engine import LLMEngine

        if args.model == "tiny":
            engine = LLMEngine(
                EngineConfig(model=ModelConfig.tiny()),
                multistep=args.multistep,
            )
            in_len, out_len = (4, 16), (4, 12)
        else:
            if args.model == "tinyllama":
                mc = ModelConfig.tinyllama_1_1b()
                params = llama.init_params(mc, jax.random.key(0))
                cache_dtype = "auto"
                max_seqs = args.max_num_seqs or 32
                max_len = 1024
            else:
                mc = ModelConfig.granite_3_1_8b()
                params = llama.init_quantized_params(
                    mc, jax.random.key(0), "int8"
                )
                cache_dtype = "int8"
                # 128 concurrent rows (the reference protocol's sweep
                # top, bench_vllm_user_range.py:44): 128 x 640-token
                # int8 KV = 6.7 GB beside the 8.6 GB int8 weights
                max_seqs = args.max_num_seqs or 128
                max_len = 640
            cfg = EngineConfig(
                model=mc,
                cache=CacheConfig(
                    block_size=64,
                    num_blocks=max_seqs * (max_len // 64) + 8,
                    cache_dtype=cache_dtype,
                ),
                scheduler=SchedulerConfig(
                    max_num_seqs=max_seqs,
                    max_num_batched_tokens=2048,
                    max_model_len=max_len,
                    token_buckets=(max_seqs, 512, 1024, 2048),
                ),
            )
            engine = LLMEngine(
                cfg, params=params, multistep=args.multistep
            )
            in_len, out_len = (64, 512), (16, 96)
        if args.in_len:
            in_len = tuple(map(int, args.in_len.split(",")))
        if args.out_len:
            out_len = tuple(map(int, args.out_len.split(",")))

        if args.warmup:
            dt = engine.warmup()
            print(f"warmup: {dt:.1f}s", flush=True)
        worker = EngineWorker(engine)
        worker.start()
        app = build_app(worker)

        async def sweep_all():
            server = TestServer(app)
            await server.start_server()
            url = f"http://{server.host}:{server.port}"
            rng = np.random.default_rng(0)
            recs = []
            for c in map(int, args.concurrency.split(",")):
                prompts = synth_prompts(
                    args.num_prompts, rng, in_len=in_len, out_len=out_len
                )
                rec = await run_sweep(url, prompts, c)
                if rec:
                    recs.append(rec)
                    print(json.dumps(rec))
            await server.close()
            return recs

        recs = asyncio.run(sweep_all())
        worker.stop()
    else:
        rng = np.random.default_rng(0)
        recs = []
        for c in map(int, args.concurrency.split(",")):
            prompts = synth_prompts(args.num_prompts, rng)
            rec = asyncio.run(run_sweep(base_url, prompts, c))
            if rec:
                recs.append(rec)
                print(json.dumps(rec))

    if args.result_path and recs:
        os.makedirs(args.result_path, exist_ok=True)
        out = os.path.join(
            args.result_path,
            f"user_range_{time.strftime('%Y%m%d-%H%M%S')}.json",
        )
        with open(out, "w") as f:
            json.dump(recs, f, indent=1)
        print(f"wrote {out}")
    return recs


if __name__ == "__main__":
    main()
