"""Mamba on-chip evidence (VERDICT r4 #6, real TPU).

The reference ships tuned dejavu DBs for its selective_state_update
Triton kernel on two GPU families plus a dedicated bench setup
(reference scripts/setups/mamba_ssu_0.conf; kernels/mamba_ssm.py:55-104).
The TPU SSU kernel (ops/pallas/mamba.py) has NO tunable launch knobs —
the grid is (batch, nheads) and the [dim, dstate] state tile is pinned
by the head shape — so the parity artifact here is MEASURED device
kernel time + achieved bandwidth at the reference's shape grid, plus a
hybrid-model fused decode-session step time on the chip:

    python benchmarks/bench_mamba.py            # SSU microbench grid
    python benchmarks/bench_mamba.py --hybrid   # + hybrid session step

Rows are appended to autotune/dejavu_data/tuned_vs_fallback.tsv
(tuned == fallback by construction; the config column records the
no-knobs fact) — the "tuned SSU DB" role of the reference, realized as
measurement evidence.  Setup axes: benchmarks/setups/mamba_ssu.conf.
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

TSV = os.path.join(
    REPO_ROOT, "vllm_triton_backend_tpu", "autotune", "dejavu_data",
    "tuned_vs_fallback.tsv",
)


def _fence(x):
    import jax

    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def _kernel_time(fn, pattern, reps=10):
    import jax

    from vllm_triton_backend_tpu.utils.xplane import matched_kernel_time

    _fence(fn())
    d = tempfile.mkdtemp(prefix="ssu_")
    try:
        with jax.profiler.trace(d):
            r = None
            for _ in range(reps):
                r = fn()
            _fence(r)
        kt = matched_kernel_time(d, pattern)
        return kt.total_s / kt.count if kt and kt.count else None
    finally:
        shutil.rmtree(d, ignore_errors=True)


def ssu_grid(rows: list) -> None:
    import jax
    import jax.numpy as jnp

    from vllm_triton_backend_tpu.ops.pallas.mamba import (
        selective_state_update,
    )

    rng = np.random.default_rng(0)
    # (label, batch, nheads, dim, dstate): mamba2 head shapes (the
    # reference's tuned grid) + the mamba1/bamba hybrid layer shape
    shapes = [
        ("mamba2", 16, 64, 64, 128),
        ("mamba2", 64, 64, 64, 128),
        ("mamba2", 128, 64, 64, 128),
        ("mamba1-hybrid", 64, 1, 4096, 16),
        ("mamba1-hybrid", 128, 1, 4096, 16),
    ]
    for label, batch, nheads, dim, ds in shapes:
        slots = batch + 8
        state = jnp.asarray(
            rng.standard_normal((slots, nheads, dim, ds)), jnp.float32
        )
        x = jnp.asarray(
            rng.standard_normal((batch, nheads, dim)), jnp.float32
        )
        dt = jnp.asarray(
            rng.standard_normal((batch, nheads, dim)), jnp.float32
        )
        A = jnp.asarray(
            -np.abs(rng.standard_normal((nheads, dim, ds))), jnp.float32
        )
        B = jnp.asarray(
            rng.standard_normal((batch, nheads, ds)), jnp.float32
        )
        C = jnp.asarray(
            rng.standard_normal((batch, nheads, ds)), jnp.float32
        )
        D = jnp.asarray(rng.standard_normal((nheads, dim)), jnp.float32)
        z = jnp.asarray(
            rng.standard_normal((batch, nheads, dim)), jnp.float32
        )
        idx = jnp.arange(batch, dtype=jnp.int32)

        holder = {"state": state}

        def run():
            # chain the donated state through (the kernel aliases it)
            out, new = selective_state_update(
                holder["state"], x, dt, A, B, C, D=D, z=z,
                dt_softplus=True, state_batch_indices=idx,
            )
            holder["state"] = new
            return out

        t = _kernel_time(run, "_ssu_kernel|selective_state")
        # bytes: state read+write dominates (f32), plus A read per head
        # and the [B,H,dim] operand reads
        bytes_acc = (
            2 * batch * nheads * dim * ds * 4
            + nheads * dim * ds * 4
            + 4 * batch * nheads * dim * 4
        )
        gbps = bytes_acc / t / 1e9 if t else 0.0
        print(
            f"ssu {label} b={batch} h={nheads} dim={dim} ds={ds}: "
            f"{(t or 0)*1e6:.1f} us  ({gbps:.0f} GB/s)",
            flush=True,
        )
        rows.append(
            ("mamba_ssu", f"{label} b{batch} h{nheads} "
             f"dim{dim} ds{ds}", "float32", ds,
             "no tunable knobs (grid=(batch,heads); tile pinned)",
             t, "same", t)
        )


def hybrid_step(rows: list) -> None:
    """Fused decode-session step time for a hybrid (attn+mamba) model."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from vllm_triton_backend_tpu.config import ModelConfig
    from vllm_triton_backend_tpu.models import hybrid
    from vllm_triton_backend_tpu.models.llama import ForwardExtras
    from vllm_triton_backend_tpu.runtime.multistep import (
        hybrid_decode_steps,
    )
    from vllm_triton_backend_tpu.runtime.sampler import (
        SamplingTensors, make_sampling_tensors,
    )

    # bamba-class mid-size hybrid: 24 layers alternating attn/mamba
    cfg = ModelConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=5632,
        num_layers=24, num_heads=32, num_kv_heads=4,
        architecture="hybrid",
        layers_block_type=tuple(
            "attention" if i % 2 == 0 else "mamba" for i in range(24)
        ),
        mamba_state_size=16, dtype="bfloat16",
    )
    S, K, bs, ctx, max_len = 64, 16, 64, 576, 1024
    params = hybrid.init_params(cfg, jax.random.key(0))
    nb = S * (max_len // bs) + 8
    kv = hybrid.make_kv_caches(cfg, nb, bs)
    conv, ssm = hybrid.make_state_pools(cfg, S + 2)
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(
        rng.permutation(nb - 1)[: S * (max_len // bs)]
        .reshape(S, max_len // bs).astype(np.int32)
    )
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, S), jnp.int32)
    lens = jnp.full((S,), ctx, jnp.int32)
    live = jnp.ones(S, bool)
    sidx = jnp.arange(1, S + 1, dtype=jnp.int32)
    st = SamplingTensors(
        *(jnp.asarray(a) for a in make_sampling_tensors([], S))
    )
    extras = ForwardExtras(max_query_len=1, max_seq_len=max_len)
    key = jax.random.key(0)

    def chunk(kv, conv, ssm):
        sampled, _lp, _t, _l, _k, kv, conv, ssm = hybrid_decode_steps(
            params, cfg, tokens, lens, tbl, live,
            jnp.full_like(lens, 1 << 30), kv, conv, ssm, sidx,
            st, key, extras, K, bs, greedy_only=True,
        )
        return sampled, kv, conv, ssm

    out, kv, conv, ssm = chunk(kv, conv, ssm)
    _fence(out)
    out, kv, conv, ssm = chunk(kv, conv, ssm)
    _fence(out)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out, kv, conv, ssm = chunk(kv, conv, ssm)
    _fence(out)
    wall = (time.perf_counter() - t0) / reps
    ms_step = wall / K * 1e3
    tps = S * K / wall
    print(
        f"hybrid 24L(12 attn + 12 mamba) h2048 bf16 S={S} ctx={ctx}: "
        f"{ms_step:.2f} ms/step -> {tps:.0f} tok/s",
        flush=True,
    )
    rows.append(
        ("hybrid_session", "24L h2048 attn+mamba b64", "bf16", max_len,
         "engine fused session (K=16)", ms_step / 1e3, "same",
         ms_step / 1e3)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hybrid", action="store_true")
    ap.add_argument("--no-tsv", action="store_true")
    args = ap.parse_args()

    rows: list = []
    ssu_grid(rows)
    if args.hybrid:
        hybrid_step(rows)
    if args.no_tsv:
        return
    mode = "a" if os.path.exists(TSV) else "w"
    with open(TSV, mode) as f:
        if mode == "w":
            f.write(
                "kernel\theads\tkv_dtype\tmax_seq\tfallback_cfg\t"
                "fallback_us\ttuned_cfg\ttuned_us\n"
            )
        for r in rows:
            f.write(
                f"{r[0]}\t{r[1]}\t{r[2]}\t{r[3]}\t{r[4]}\t"
                f"{(r[5] or 0)*1e6:.1f}\t{r[6]}\t{(r[7] or 0)*1e6:.1f}\n"
            )
    print("appended", len(rows), "rows to", TSV)


if __name__ == "__main__":
    main()
