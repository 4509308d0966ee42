"""Mixed prefill+decode step device-time breakdown (dev tool, real TPU).

Synthesizes the scheduler's steady-state mixed batch at the headline
serving config — D decode rows riding along with chunked prefills that
fill the token budget — and traces ONE ``engine_step`` (the regular step
path, runtime/multistep.engine_step) with ``jax.profiler``.  This is the
step that sets TTFT: at batch 128 the bench runs ~30 of these before
the decode session starts.  Reference analog of the mixed-batch focus:
the unified 2D kernel exists exactly for this composition
(triton_unified_attention.py:276-523).

    python benchmarks/profile_mixed.py --decodes 124 --ctx 530
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

from benchmarks.profile_step import GROUPS, group_of, _fence  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="granite")
    ap.add_argument("--max-seqs", type=int, default=128)
    ap.add_argument("--decodes", type=int, default=124,
                    help="decode rows riding in the mixed batch")
    ap.add_argument("--ctx", type=int, default=530,
                    help="context length of the decode rows")
    ap.add_argument("--prompt-len", type=int, default=512)
    ap.add_argument("--budget", type=int, default=2048,
                    help="max_num_batched_tokens")
    ap.add_argument("--max-len", type=int, default=640)
    ap.add_argument("--weights", default="int8")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--no-split", action="store_true",
                    help="disable the mixed split path (old behavior)")
    ap.add_argument("--w8a8", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vllm_triton_backend_tpu.config import ModelConfig
    from vllm_triton_backend_tpu.models import llama
    from vllm_triton_backend_tpu.models.llama import (
        ForwardExtras, make_kv_caches,
    )
    from vllm_triton_backend_tpu.runtime.multistep import engine_step
    from vllm_triton_backend_tpu.runtime.sampler import SamplingTensors
    from vllm_triton_backend_tpu.utils import next_power_of_2
    from vllm_triton_backend_tpu.utils.xplane import device_kernel_times

    cfg = {
        "granite": ModelConfig.granite_3_1_8b,
        "llama3_8b": ModelConfig.llama3_8b,
        "tinyllama": ModelConfig.tinyllama_1_1b,
    }[args.model]()
    rng = np.random.default_rng(0)
    params = (
        llama.init_params(cfg, jax.random.key(0))
        if args.weights == "bf16"
        else llama.init_quantized_params(cfg, jax.random.key(0),
                                         args.weights)
    )
    bs = 64
    S, D = args.max_seqs, args.decodes
    max_blocks = args.max_len // bs
    num_blocks = S * max_blocks + 8
    kv_cache = make_kv_caches(cfg, num_blocks, bs, jnp.int8)

    # batch layout (scheduler._build_batch): D decode rows first, then
    # chunked prefills filling the budget
    budget = args.budget
    bucket = budget  # token bucket = 2048
    n_prompts = (budget - D) // args.prompt_len
    tail = (budget - D) - n_prompts * args.prompt_len
    qlens = [1] * D + [args.prompt_len] * n_prompts + (
        [tail] if tail else []
    )
    num_seqs = len(qlens)
    assert num_seqs <= S
    token_ids = np.zeros(bucket, np.int32)
    positions = np.zeros(bucket, np.int32)
    slot_map = np.full(bucket, -1, np.int32)
    qsl = np.zeros(S + 1, np.int32)
    seq_lens = np.zeros(S, np.int32)
    tbl = np.zeros((S, max_blocks), np.int32)
    logits_idx = np.zeros(S, np.int32)
    perm = rng.permutation(num_blocks - 1)
    t = 0
    for i, n in enumerate(qlens):
        start = args.ctx if n == 1 else 0
        token_ids[t:t + n] = rng.integers(0, cfg.vocab_size, n)
        positions[t:t + n] = np.arange(start, start + n)
        pages = perm[i * max_blocks:(i + 1) * max_blocks]
        tbl[i] = pages
        for j in range(n):
            p = start + j
            slot_map[t + j] = pages[p // bs] * bs + p % bs
        qsl[i + 1] = qsl[i] + n
        seq_lens[i] = start + n
        logits_idx[i] = t + n - 1
        t += n
    qsl[num_seqs + 1:] = qsl[num_seqs]
    mq = next_power_of_2(max(qlens))
    n_pf = sum(1 for n in qlens if n > 1)
    extras = ForwardExtras(
        max_query_len=mq,
        max_seq_len=max(128, next_power_of_2(int(seq_lens.max()))),
        k_scale=0.03, v_scale=0.03,
        w8a8=args.w8a8,
        mixed_prefill_rows=(
            0 if args.no_split or n_pf == 0 else next_power_of_2(n_pf)
        ),
    )
    st = SamplingTensors(
        jnp.zeros(S, jnp.float32), jnp.ones(S, jnp.float32),
        jnp.zeros(S, jnp.int32), jnp.zeros(S, jnp.float32),
        jnp.full(S, -1, jnp.int32),
    )
    key = jax.random.key(0)
    argv = dict(
        token_ids=jnp.asarray(token_ids),
        positions=jnp.asarray(positions),
        query_start_loc=jnp.asarray(qsl),
        seq_lens=jnp.asarray(seq_lens),
        block_table=jnp.asarray(tbl),
        slot_mapping=jnp.asarray(slot_map),
        logits_indices=jnp.asarray(logits_idx),
    )

    def step(kv):
        sampled, _key, kv = engine_step(
            params, cfg, argv["token_ids"], argv["positions"], kv,
            argv["query_start_loc"], argv["seq_lens"],
            argv["block_table"], argv["slot_mapping"],
            argv["logits_indices"], st, key, extras,
            True, False, None, False, None,
        )
        return sampled, kv

    out, kv_cache = step(kv_cache)
    _fence(out)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out, kv_cache = step(kv_cache)
    _fence(out)
    wall = (time.perf_counter() - t0) / reps
    print(f"mixed step [{D}x decode ctx={args.ctx} + {n_prompts}x "
          f"{args.prompt_len} prefill + {tail}]: {wall*1e3:.1f} ms "
          f"({wall/bucket*1e6:.1f} us/token)", flush=True)

    from vllm_triton_backend_tpu.utils.profiling import trace

    trace_dir = tempfile.mkdtemp(prefix="profile_mixed_")
    try:
        with trace(trace_dir):
            out, kv_cache = step(kv_cache)
            _fence(out)
        times = device_kernel_times(trace_dir)
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)
    groups: dict[str, tuple[int, float]] = {}
    for name, kt in times.items():
        g = group_of(name)
        c, tt = groups.get(g, (0, 0.0))
        groups[g] = (c + kt.count, tt + kt.total_s)
    total = sum(tt for _, tt in groups.values())
    print(f"device op-sum: {total*1e3:.1f} ms (wall-op gap "
          f"{(wall - total)*1e3:.1f} ms)")
    for g, (c, tt) in sorted(groups.items(), key=lambda kv: -kv[1][1]):
        print(f"  {g:24s} {tt*1e3:8.2f} ms  ({c} events)")
    print("top ops:")
    for name, kt in sorted(
        times.items(), key=lambda kv: -kv[1].total_s
    )[: args.top]:
        print(f"  {kt.total_s*1e3:8.3f} ms x{kt.count:5d}  {name[:90]}")


if __name__ == "__main__":
    main()
