"""Engine-loop phase breakdown at the headline bench config (dev tool).

Replicates ``bench.py``'s ``run_e2e`` protocol but instruments each
``engine.step()`` call: which path it took (fused decode session, spec
round, or the regular mixed step), how long it took, and how many tokens
it produced.  This is the evidence tool for the wall-vs-device gap the
step profiler (profile_step.py) cannot see — everything the ENGINE adds
around the fused chunks (reference analog: the CPU-overhead warning in
backend/triton_attn.py:380-387).

    python benchmarks/profile_engine.py --batch 128 --max-len 640
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--max-len", type=int, default=640)
    ap.add_argument("--prompt-len", type=int, default=512)
    ap.add_argument("--n-new", type=int, default=96)
    ap.add_argument("--weights", default="int8")
    ap.add_argument("--skip-warmup", action="store_true")
    args = ap.parse_args()

    import jax

    from vllm_triton_backend_tpu.config import (
        CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
    )
    from vllm_triton_backend_tpu.models import llama
    from vllm_triton_backend_tpu.runtime.engine import LLMEngine
    from vllm_triton_backend_tpu.runtime.sampler import SamplingParams

    mc = ModelConfig.granite_3_1_8b()
    params = llama.init_quantized_params(
        mc, jax.random.key(0), args.weights
    )
    n_seqs, max_len = args.batch, args.max_len
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(
            block_size=64, num_blocks=n_seqs * (max_len // 64) + 8,
            cache_dtype="int8",
        ),
        scheduler=SchedulerConfig(
            max_num_seqs=n_seqs,
            max_num_batched_tokens=2048,
            max_model_len=max_len,
            token_buckets=(n_seqs, 512, 1024, 2048),
        ),
    )

    def run(label: str):
        rng = np.random.default_rng(7)
        engine = LLMEngine(cfg, params=params)

        # instrument the step sub-paths
        events: list[tuple[str, float, int]] = []
        orig_ms = engine._try_multistep
        orig_sched = engine.scheduler.schedule

        def timed_ms():
            t0 = time.perf_counter()
            out = orig_ms()
            events.append(("session", time.perf_counter() - t0, 0))
            return out

        engine._try_multistep = timed_ms
        t_start = time.perf_counter()
        for _ in range(n_seqs):
            prompt = rng.integers(0, mc.vocab_size, size=args.prompt_len)
            engine.add_request(
                prompt.tolist(), SamplingParams(max_tokens=args.n_new)
            )
        first_tok: dict = {}
        decode_t0 = None
        tokens_at_decode_start = 0
        step_log = []  # (t_rel, dur, total_tokens)
        prev_total = 0
        while engine.has_unfinished():
            t0 = time.perf_counter()
            engine.step()
            t1 = time.perf_counter()
            total = 0
            for rid, r in engine.all_requests().items():
                n = len(r.output_token_ids)
                total += n
                if n > 0 and rid not in first_tok:
                    first_tok[rid] = t1
            step_log.append((t0 - t_start, t1 - t0, total - prev_total))
            prev_total = total
            if decode_t0 is None and len(first_tok) == n_seqs:
                decode_t0 = t1
                tokens_at_decode_start = total
        t_end = time.perf_counter()
        decode_tokens = total - tokens_at_decode_start
        decode_dt = t_end - decode_t0
        print(f"\n=== {label} ===")
        print(f"total wall {t_end - t_start:.2f}s  "
              f"prefill phase {decode_t0 - t_start:.2f}s  "
              f"decode phase {decode_dt:.2f}s")
        print(f"tokens at decode start: {tokens_at_decode_start} "
              f"({tokens_at_decode_start - n_seqs} decoded during prefill)")
        print(f"decode tokens {decode_tokens}  "
              f"-> {decode_tokens/decode_dt:.0f} tok/s (bench metric)")
        all_tok = total - n_seqs  # total decode tokens incl. prefill phase
        print(f"ALL decode tokens {all_tok} / total wall "
              f"-> {all_tok/(t_end - t_start):.0f} tok/s")
        # per-step log around the decode boundary
        n_steps = len(step_log)
        print(f"{n_steps} engine.step() calls; slowest 12:")
        for t_rel, dur, toks in sorted(
            step_log, key=lambda x: -x[1]
        )[:12]:
            print(f"  t={t_rel:7.2f}s  dur={dur*1e3:9.1f} ms  "
                  f"tokens={toks:5d}"
                  + ("" if toks == 0 else
                     f"  ({dur/max(toks,1)*1e6*n_seqs:.0f} us*S/tok)"))
        sess = [e for e in events if e[0] == "session"]
        print(f"{len(sess)} _try_multistep calls, "
              f"sum {sum(e[1] for e in sess):.2f}s")
        # break the engine->timed_ms->engine ref cycle and drop the big
        # device buffers NOW: weights (shared) + a 6.75 GB KV cache leave
        # no room for a second engine until the first is actually freed
        engine._try_multistep = orig_ms
        engine.kv_cache = None
        del engine
        import gc

        gc.collect()
        return decode_tokens / decode_dt

    if not args.skip_warmup:
        run("warmup (compiles)")
    run("measured")


if __name__ == "__main__":
    main()
