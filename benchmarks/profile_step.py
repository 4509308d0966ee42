"""Decode-step device-time breakdown (dev tool, real TPU).

Traces one fused decode-session chunk (``runtime/multistep.decode_steps``)
with ``jax.profiler`` and aggregates per-op device durations from the
xplane timeline grouped by component — the evidence behind
``docs/decode_step_profile.md`` (the reference's analog is the proton
hook + viewer discipline, scripts/benchmark.py:549-564).

    python benchmarks/profile_step.py --model granite --batch 32 \
        --weights int8 --kv int8 --ctx 576 --max-len 1024
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def _fence(out):
    import jax

    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


GROUPS = [
    ("quant matmuls", ("qmm", "quant_matmul")),
    ("decode attention", ("paged_decode", "decode_attention")),
    ("cache writes (DUS)", ("dynamic-update-slice", "dynamic_update_slice")),
    ("fusions", ("fusion",)),
    ("copies", ("copy",)),
]


def group_of(name: str) -> str:
    lname = name.lower()
    for g, keys in GROUPS:
        if any(k in lname for k in keys):
            return g
    return "other"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="granite",
                    choices=["granite", "llama3_8b", "tinyllama"])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--ctx", type=int, default=576)
    ap.add_argument("--max-len", type=int, default=1024)
    ap.add_argument("--weights", default="int8",
                    choices=["int8", "fp8", "bf16"])
    ap.add_argument("--kv", default="int8",
                    choices=["int8", "fp8", "auto"])
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vllm_triton_backend_tpu.config import ModelConfig
    from vllm_triton_backend_tpu.models import llama
    from vllm_triton_backend_tpu.models.llama import (
        ForwardExtras,
        make_kv_caches,
    )
    from vllm_triton_backend_tpu.runtime.multistep import decode_steps
    from vllm_triton_backend_tpu.utils.xplane import device_kernel_times

    cfg = {
        "granite": ModelConfig.granite_3_1_8b,
        "llama3_8b": ModelConfig.llama3_8b,
        "tinyllama": ModelConfig.tinyllama_1_1b,
    }[args.model]()
    S, K = args.batch, args.steps
    rng = np.random.default_rng(0)
    if args.weights == "bf16":
        params = llama.init_params(cfg, jax.random.key(0))
    else:
        params = llama.init_quantized_params(
            cfg, jax.random.key(0), args.weights
        )
    kv_dtype = {
        "int8": jnp.int8, "fp8": jnp.float8_e4m3fn,
        "auto": jnp.dtype(cfg.dtype),
    }[args.kv]
    bs = 64
    max_blocks = args.max_len // bs
    num_blocks = S * max_blocks + 8
    kv_cache = make_kv_caches(cfg, num_blocks, bs, kv_dtype)
    bt = rng.permutation(num_blocks - 1)[: S * max_blocks].reshape(
        S, max_blocks).astype(np.int32)
    extras = ForwardExtras(
        max_query_len=1, max_seq_len=args.max_len,
        k_scale=0.03 if args.kv != "auto" else 1.0,
        v_scale=0.03 if args.kv != "auto" else 1.0,
    )
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, S), jnp.int32)
    lens_d = jnp.asarray(np.full(S, args.ctx, np.int32))
    bt_d = jnp.asarray(bt)
    live = jnp.ones(S, bool)
    from vllm_triton_backend_tpu.runtime.sampler import SamplingTensors

    st = SamplingTensors(
        jnp.zeros(S, jnp.float32), jnp.ones(S, jnp.float32),
        jnp.zeros(S, jnp.int32), jnp.zeros(S, jnp.float32),
        jnp.full(S, -1, jnp.int32),
    )
    key = jax.random.key(0)

    def chunk(kv):
        # greedy_only matches the engine's all-greedy fast path (the
        # stochastic path's full-vocab sort is 1.9 ms/step at batch 32
        # and would misattribute the step profile)
        sampled, _lp, _t, _l, _k, kv = decode_steps(
            params, cfg, tokens, lens_d, bt_d, live,
            jnp.full_like(lens_d, 1 << 30), kv,
            st, key, extras, K, bs, greedy_only=True)
        return sampled, kv

    out, kv_cache = chunk(kv_cache)  # compile
    _fence(out)
    out, kv_cache = chunk(kv_cache)
    _fence(out)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out, kv_cache = chunk(kv_cache)
    _fence(out)
    wall = (time.perf_counter() - t0) / reps
    print(f"{args.model} S={S} {args.weights}-W/{args.kv}-KV ctx={args.ctx}: "
          f"chunk K={K} {wall*1e3:.2f} ms -> {wall/K*1e3:.3f} ms/step "
          f"-> {S*K/wall:.0f} tok/s", flush=True)

    from vllm_triton_backend_tpu.utils.profiling import trace

    trace_dir = tempfile.mkdtemp(prefix="profile_step_")
    try:
        with trace(trace_dir):
            out, kv_cache = chunk(kv_cache)
            _fence(out)
        times = device_kernel_times(trace_dir)
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)

    groups: dict[str, tuple[int, float]] = {}
    for name, kt in times.items():
        g = group_of(name)
        c, t = groups.get(g, (0, 0.0))
        groups[g] = (c + kt.count, t + kt.total_s)
    total = sum(t for _, t in groups.values())
    print(f"device op-sum: {total/K*1e3:.3f} ms/step "
          f"(wall-op gap {(wall - total)/K*1e3:.3f} ms/step)")
    for g, (c, t) in sorted(groups.items(), key=lambda kv: -kv[1][1]):
        print(f"  {g:24s} {t/K*1e3:8.3f} ms/step  ({c} events)")
    print("top ops:")
    for name, kt in sorted(
        times.items(), key=lambda kv: -kv[1].total_s
    )[: args.top]:
        print(f"  {kt.total_s/K*1e3:7.3f} ms/step x{kt.count:5d}  "
              f"{name[:90]}")


if __name__ == "__main__":
    main()
