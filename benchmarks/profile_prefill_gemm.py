"""W8A8 prefill GEMM decomposition (dev tool, real TPU).

VERDICT r4 #1: the TTFT path is dominated by the W8A8 linears at
~242 TFLOP/s = 61% of the 394 TOP/s int8 MXU peak.  This script answers
"where do the other 39% go?" at the granite prefill shapes (T=2048):

* wall per call for the tuned launch (what the engine pays),
* xplane split: pallas kernel vs surrounding XLA ops (prequant, pads),
* a direct (block_n, block_k) sweep past the shipped ConfigSpace /
  VMEM-budget snapping,
* an XLA ``dot_general`` int8 upper-bound (same math, no pallas),
* the bf16 dequant path for the same shape (is a8 still winning?).

    python benchmarks/profile_prefill_gemm.py --t 2048
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

from benchmarks.profile_step import _fence  # noqa: E402

INT8_PEAK_TOPS = 394.0  # v5e int8 MXU
BF16_PEAK_TFLOPS = 197.0

# granite-3.1-8b prefill linears: (name, K, N)
SHAPES = [
    ("qkv", 4096, 6144),
    ("o", 4096, 4096),
    ("gate_up", 4096, 25600),
    ("down", 12800, 4096),
]


def _time_call(fn, *a, reps=10, **kw):
    out = fn(*a, **kw)
    _fence(out)
    out = fn(*a, **kw)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a, **kw)
    _fence(out)
    return (time.perf_counter() - t0) / reps


def _kernel_time(fn, *a, **kw):
    """(pallas kernel s, total device op s) for one call, via xplane."""
    from vllm_triton_backend_tpu.utils.profiling import trace
    from vllm_triton_backend_tpu.utils.xplane import device_kernel_times

    out = fn(*a, **kw)
    _fence(out)
    d = tempfile.mkdtemp(prefix="ppg_")
    try:
        with trace(d):
            for _ in range(4):
                out = fn(*a, **kw)
            _fence(out)
        times = device_kernel_times(d)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    kern = sum(
        kt.total_s for name, kt in times.items()
        if "quant_matmul" in name.lower() or "qmm" in name.lower()
    )
    tot = sum(kt.total_s for kt in times.values())
    other = [
        (name, kt.total_s) for name, kt in times.items()
        if not ("quant_matmul" in name.lower() or "qmm" in name.lower())
    ]
    other.sort(key=lambda x: -x[1])
    return kern / 4, tot / 4, [(n, t / 4) for n, t in other[:6]]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=2048)
    ap.add_argument("--shapes", default="all")
    ap.add_argument("--sweep", action="store_true",
                    help="direct (bn,bk) sweep incl. beyond-budget tiles")
    ap.add_argument("--budget-mb", type=int, default=0,
                    help="override quant_linear._VMEM_BUDGET (MiB)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vllm_triton_backend_tpu.ops.pallas import quant_linear as ql
    from vllm_triton_backend_tpu.ops.pallas.quant_linear import (
        _prequant_tokens, linear, quant_matmul, quantize_weights,
    )

    if args.budget_mb:
        ql._VMEM_BUDGET = args.budget_mb * 1024 * 1024
        print(f"VMEM budget override: {args.budget_mb} MiB")

    T = args.t
    rng = np.random.default_rng(0)
    shapes = [s for s in SHAPES
              if args.shapes == "all" or s[0] in args.shapes.split(",")]

    for name, K, N in shapes:
        flops = 2.0 * T * K * N
        x = jnp.asarray(rng.standard_normal((T, K)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
        qw = jax.jit(quantize_weights, static_argnames=("dtype",))(
            w, "int8")
        qw = jax.tree.map(jax.device_put, qw)

        print(f"\n=== {name}: [{T},{K}] @ [{K},{N}]  "
              f"({flops/1e9:.1f} GFLOP, ideal int8 "
              f"{flops/INT8_PEAK_TOPS/1e9*1e3:.0f} us) ===")

        # 1. prequant alone
        pq = jax.jit(_prequant_tokens)
        t_pq = _time_call(pq, x)
        print(f"prequant_tokens alone: {t_pq*1e6:7.1f} us")

        # 2. tuned a8 launch (wall + kernel split)
        t_a8 = _time_call(linear, x, qw, a8=True)
        kern, tot, other = _kernel_time(linear, x, qw, a8=True)
        print(f"tuned a8 launch wall : {t_a8*1e6:7.1f} us "
              f"({flops/t_a8/1e12:6.1f} TOP/s = "
              f"{flops/t_a8/1e12/INT8_PEAK_TOPS*100:4.1f}% peak)")
        print(f"  kernel device time : {kern*1e6:7.1f} us "
              f"({flops/kern/1e12:6.1f} TOP/s = "
              f"{flops/kern/1e12/INT8_PEAK_TOPS*100:4.1f}% peak)")
        print(f"  non-kernel device  : {(tot-kern)*1e6:7.1f} us")
        for n2, t2 in other:
            print(f"    {t2*1e6:7.1f} us  {n2[:70]}")

        # 3. bf16 dequant path
        t_bf = _time_call(linear, x, qw, a8=False)
        print(f"bf16 dequant path    : {t_bf*1e6:7.1f} us "
              f"({flops/t_bf/1e12:6.1f} TFLOP/s = "
              f"{flops/t_bf/1e12/BF16_PEAK_TFLOPS*100:4.1f}% bf16 peak)")

        # 4. XLA int8 dot_general upper bound (prequant + dot + scale)
        def xla_a8(x, qw):
            x8, sx = _prequant_tokens(x)
            acc = jax.lax.dot_general(
                x8, qw.w_q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * sx
                    * qw.scales[None, :]).astype(x.dtype)

        try:
            t_xla = _time_call(jax.jit(xla_a8), x, qw)
            print(f"XLA int8 dot_general : {t_xla*1e6:7.1f} us "
                  f"({flops/t_xla/1e12:6.1f} TOP/s = "
                  f"{flops/t_xla/1e12/INT8_PEAK_TOPS*100:4.1f}% peak)")
        except Exception as e:  # pragma: no cover - tunnel limits
            print(f"XLA int8 dot_general : FAILED ({type(e).__name__})")

        # 5. direct tile sweep
        if args.sweep:
            for bn in (256, 512, 640, 1024, 1280, 2048):
                for bk in (512, 1024, 2048, 4096):
                    if bk > K or bn > N:
                        continue
                    try:
                        t_d = _time_call(
                            quant_matmul, x, qw,
                            block_n=bn, block_k=bk, a8=True, reps=5)
                        print(f"  direct bn={bn:5d} bk={bk:5d}: "
                              f"{t_d*1e6:7.1f} us "
                              f"({flops/t_d/1e12:5.1f} TOP/s, "
                              f"{flops/t_d/1e12/INT8_PEAK_TOPS*100:4.1f}%)")
                    except Exception as e:
                        print(f"  direct bn={bn:5d} bk={bk:5d}: "
                              f"FAIL {type(e).__name__}")


if __name__ == "__main__":
    main()
