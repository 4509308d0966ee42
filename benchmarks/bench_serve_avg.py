"""Repeated serving runs with averaged medians.

Reference L6 analog (scripts/bench_vllm_serve_avg.py:78-123): run the same
serving workload ``--reps`` times, then report the mean of each run's
median TTFT / ITL and total token throughput as one JSON summary.

Usage:
  python benchmarks/bench_serve_avg.py [--base-url URL] [--reps 3]
      [--num-prompts 32] [--concurrency 8] [--result-path DIR]
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

from benchmarks.bench_serve_user_range import (  # noqa: E402
    run_sweep,
    synth_prompts,
)


def main(argv=None) -> dict | None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--num-prompts", type=int, default=16)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--result-path", default=None)
    args = ap.parse_args(argv)

    rng = np.random.default_rng(0)

    async def one_rep(url):
        prompts = synth_prompts(
            args.num_prompts, rng, in_len=(4, 32), out_len=(4, 16)
        )
        return await run_sweep(url, prompts, args.concurrency)

    runs = []
    if args.base_url:
        for _ in range(args.reps):
            rec = asyncio.run(one_rep(args.base_url))
            if rec:
                runs.append(rec)
    else:
        from aiohttp.test_utils import TestServer

        from vllm_triton_backend_tpu.config import EngineConfig, ModelConfig
        from vllm_triton_backend_tpu.entrypoints.openai_server import (
            EngineWorker,
            build_app,
        )
        from vllm_triton_backend_tpu.runtime.engine import LLMEngine

        worker = EngineWorker(
            LLMEngine(EngineConfig(model=ModelConfig.tiny()))
        )
        worker.start()

        async def all_reps():
            server = TestServer(build_app(worker))
            await server.start_server()
            url = f"http://{server.host}:{server.port}"
            out = []
            for _ in range(args.reps):
                rec = await one_rep(url)
                if rec:
                    out.append(rec)
            await server.close()
            return out

        runs = asyncio.run(all_reps())
        worker.stop()

    if not runs:
        return None
    summary = {
        "reps": len(runs),
        "concurrency": args.concurrency,
        "avg_median_ttft_s": float(
            np.mean([r["ttft_p50"] for r in runs])
        ),
        "avg_median_itl_s": float(np.mean([r["itl_p50"] for r in runs])),
        "avg_total_token_throughput": float(
            np.mean([r["total_token_throughput"] for r in runs])
        ),
    }
    print(json.dumps(summary))
    if args.result_path:
        os.makedirs(args.result_path, exist_ok=True)
        path = os.path.join(
            args.result_path,
            f"serve_avg_{time.strftime('%Y%m%d-%H%M%S')}.json",
        )
        with open(path, "w") as f:
            json.dump({"summary": summary, "runs": runs}, f, indent=1)
    return summary


if __name__ == "__main__":
    main()
