"""AOT Mosaic lowering gate: compile every kernel x dtype, no execution.

The round-2 regression (a packed-dtype layout bug in the fused append
kernel) passed all 218 CPU tests because interpret mode cannot see Mosaic
tiling constraints, and shipped broken (VERDICT r2 weak #3).  This tool is
the missing tier: it AOT-compiles (``jax.jit(...).lower(avals).compile()``)
each Pallas kernel for every production dtype on the REAL TPU compiler —
abstract avals only, so no device memory or data transfer is needed and a
full matrix runs in minutes.  The reference's analog discipline is its
known-bug config guards (triton_flash_attention.py:744-751) plus the
"incorrect kernels never produce perf rows" gate (scripts/benchmark.py:
476-489).

Run before every snapshot (``make smoke`` runs this + tpu_smoke)::

    python tools/tpu_lower_check.py          # full matrix
    python tools/tpu_lower_check.py append   # name filter

Exits 1 if any (kernel, dtype, variant) fails to lower.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

S = jax.ShapeDtypeStruct
failures: list[str] = []
name_filter = sys.argv[1] if len(sys.argv) > 1 else ""

CACHE_DTYPES = (jnp.bfloat16, jnp.int8, jnp.float8_e4m3fn)


def check(name: str, fn, *avals, **kw) -> None:
    if name_filter and name_filter not in name:
        return
    t0 = time.time()
    try:
        jax.jit(functools.partial(fn, **kw)).lower(*avals).compile()
        print(f"PASS lower {name}  ({time.time() - t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        failures.append(name)
        msg = str(e).split("\n")[0][:240]
        print(f"FAIL lower {name}: {type(e).__name__}: {msg}", flush=True)


def main() -> int:
    from vllm_triton_backend_tpu.ops.pallas.cache_ops import (
        reshape_and_cache,
    )
    from vllm_triton_backend_tpu.ops.pallas.decode_attention import (
        _paged_decode_impl,
        paged_decode_append_attention,
        stickbreaking_decode_attention,
    )
    from vllm_triton_backend_tpu.ops.pallas.mamba import (
        selective_state_update,
    )
    from vllm_triton_backend_tpu.ops.pallas.prefill_attention import (
        _prefill_attention_impl,
    )
    from vllm_triton_backend_tpu.ops.pallas.quant_linear import (
        QuantizedLinear,
        quant_matmul,
    )

    # granite-like decode shapes: 16 seqs, 32/8 heads, head 128, bs 64
    ns, hq, hkv, hd, bs, nb, L, mp = 16, 32, 8, 128, 64, 256, 2, 16
    q = S((ns, hq, hd), jnp.bfloat16)
    lens = S((ns,), jnp.int32)
    tbl = S((ns, mp), jnp.int32)
    lyr = S((), jnp.int32)
    kv_row = S((ns, hkv, hd), jnp.bfloat16)
    slots = S((ns,), jnp.int32)

    for dt in CACHE_DTYPES:
        kv = S((L, nb, 2, hkv, bs, hd), dt)
        dn = jnp.dtype(dt).name
        check(
            f"decode {dn}", _paged_decode_impl, q, kv, lyr, lens, tbl,
            scale=0.08, max_seq_len=1024, k_scale=0.03, v_scale=0.03,
        )
        check(
            f"decode-partials {dn}", _paged_decode_impl, q, kv, lyr, lens,
            tbl, scale=0.08, max_seq_len=1024, k_scale=0.03, v_scale=0.03,
            return_partials=True,
        )
        check(
            f"append-decode {dn}",
            functools.partial(
                paged_decode_append_attention, scale=0.08,
                max_seq_len=1024, k_scale=0.03, v_scale=0.03,
            ),
            q, kv_row, kv_row, kv, lyr, S((), jnp.int32), lens, tbl,
            slots,
        )
        check(
            f"decode-sliding {dn}", _paged_decode_impl, q, kv, lyr, lens,
            tbl, scale=0.08, max_seq_len=1024, sliding_window=256,
            k_scale=0.03, v_scale=0.03,
        )
        check(
            f"stickbreaking {dn}", stickbreaking_decode_attention, q, kv,
            lyr, lens, tbl, scale=0.08, max_seq_len=1024,
            k_scale=0.03, v_scale=0.03,
        )
        # prefill/mixed: 256 new tokens over 4 seqs
        t = 256
        check(
            f"prefill {dn}", _prefill_attention_impl,
            S((t, hq, hd), jnp.bfloat16), kv, lyr,
            S((5,), jnp.int32), S((4,), jnp.int32), S((4, mp), jnp.int32),
            scale=0.08, max_query_len=128, max_seq_len=1024,
            k_scale=0.03, v_scale=0.03,
        )
        check(
            f"cache-write {dn}", reshape_and_cache, kv, lyr,
            kv_row, kv_row, slots,
        )
        check(
            f"cache-write-runs {dn}", reshape_and_cache, kv, lyr,
            S((t, hkv, hd), jnp.bfloat16), S((t, hkv, hd), jnp.bfloat16),
            S((t,), jnp.int32),
        )

    # mamba SSU (f32 state, the production config) + quantized linears
    nh, dstate, hdm = 32, 128, 64
    check(
        "mamba-ssu",
        lambda st, x, dt, A, B, C, D, z, dtb, idx: selective_state_update(
            st, x, dt, A, B, C, D, z, dtb,
            dt_softplus=True, state_batch_indices=idx,
        ),
        S((64, nh, hdm, dstate), jnp.float32),
        S((ns, nh, hdm), jnp.bfloat16),  # x
        S((ns, nh, hdm), jnp.float32),  # dt
        S((nh, hdm, dstate), jnp.float32),  # A
        S((ns, 1, dstate), jnp.bfloat16),  # B
        S((ns, 1, dstate), jnp.bfloat16),  # C
        S((nh, hdm), jnp.float32),  # D
        S((ns, nh, hdm), jnp.bfloat16),  # z
        S((nh, hdm), jnp.float32),  # dt_bias
        S((ns,), jnp.int32),  # state_batch_indices
    )
    for wdt in (jnp.int8, jnp.float8_e4m3fn):
        dn = jnp.dtype(wdt).name
        check(
            f"quant-linear {dn}", quant_matmul,
            S((ns, 4096), jnp.bfloat16),
            QuantizedLinear(
                S((4096, 4096), wdt), S((4096,), jnp.float32)
            ),
        )

    if failures:
        print(f"\n{len(failures)} lowering failures: {failures}")
        return 1
    print("\nall kernels lower for all dtypes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
