"""Real-TPU smoke: drive every Pallas kernel vs its oracle on the chip.

The pytest suite runs the kernels on CPU in interpret mode, which does not
enforce Mosaic layout/alignment rules (e.g. the 128-lane minor-dim rule for
manual DMAs) — this script is the real-hardware gate.  Run it after any
kernel change:

    python tools/tpu_smoke.py            # full sweep
    python tools/tpu_smoke.py decode     # name filter

Checks fetch only small outputs (multi-MB D2H through the dev tunnel can
stall); the cache-write check therefore verifies write->read through the
decode kernel instead of fetching the cache.
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")  # run from repo root

from tests.utils import random_batch, random_cache  # noqa: E402
from vllm_triton_backend_tpu.ops.attention import unified_attention  # noqa: E402
from vllm_triton_backend_tpu.ops.pallas.cache_ops import reshape_and_cache  # noqa: E402
from vllm_triton_backend_tpu.ops.refs import ref_paged_attention  # noqa: E402

rng = np.random.default_rng(0)
failures: list[str] = []
name_filter = sys.argv[1] if len(sys.argv) > 1 else ""


def check(name, fn):
    if name_filter and name_filter not in name:
        return
    t0 = time.time()
    try:
        fn()
        print(f"PASS {name}  ({time.time() - t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        failures.append(name)
        msg = str(e).split("\n")[0][:300]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)


def run_attn(qlens, clens, hq=8, hkv=2, hd=128, bs=32, head_pad=None,
             cache_dtype=None, k_scale=1.0, atol=2e-2, **kw):
    nb = 256
    kv = random_cache(rng, hkv, nb, bs, hd, num_layers=2,
                      head_pad=head_pad or max(hd, 128))
    q, tbl, meta = random_batch(rng, qlens, clens, hq, hd, bs, nb)
    if cache_dtype is not None:
        kvj = jnp.asarray(kv / k_scale).astype(cache_dtype)
        ref_kv = np.asarray(kvj[1].astype(jnp.float32))[..., :hd] * k_scale
    else:
        kvj = jnp.asarray(kv, jnp.bfloat16)
        ref_kv = np.asarray(kvj[1].astype(jnp.float32))[..., :hd]
    ref_kw = {k: v for k, v in kw.items() if k in
              ("sliding_window", "logits_soft_cap", "local_chunk_size")}
    if kw.get("alibi_slopes") is not None:
        ref_kw["alibi_slopes"] = np.asarray(kw["alibi_slopes"])
    ref = ref_paged_attention(
        q, ref_kv, np.asarray(meta.query_start_loc),
        np.asarray(meta.seq_lens), tbl, hd ** -0.5, **ref_kw,
    )
    out = unified_attention(
        jnp.asarray(q, jnp.bfloat16), kvj, jnp.int32(1), meta,
        scale=hd ** -0.5, max_query_len=max(qlens),
        max_seq_len=max(c + ql for c, ql in zip(clens, qlens)),
        k_scale=k_scale, v_scale=k_scale, **kw,
    )
    err = np.max(np.abs(np.asarray(out, np.float32) - ref))
    assert err < atol, f"max err {err}"


def run_cache_write_read():
    """reshape_and_cache -> paged_decode_attention vs a host-built cache:
    verifies the scatter's addressing on hardware with a small D2H."""
    from vllm_triton_backend_tpu.ops.pallas.decode_attention import (
        paged_decode_attention,
    )

    nb, bs, hkv, hq, hd, S = 64, 32, 2, 8, 128, 4
    lens = np.asarray([40, 7, 100, 64], np.int32)
    tbl = rng.permutation(nb)[: S * 4].reshape(S, 4).astype(np.int32)
    host = np.zeros((1, nb, 2, hkv, bs, hd), np.float32)
    slots = []
    for i, ln in enumerate(lens):
        for pos in range(ln):
            slots.append(tbl[i, pos // bs] * bs + pos % bs)
    kv_tok = rng.standard_normal((len(slots), 2, hkv, hd)).astype(
        np.float32) * 0.5
    for j, sl in enumerate(slots):
        host[0, sl // bs, 0, :, sl % bs, :] = kv_tok[j, 0]
        host[0, sl // bs, 1, :, sl % bs, :] = kv_tok[j, 1]

    kv = jnp.zeros((1, nb, 2, hkv, bs, hd), jnp.float32)
    kv = reshape_and_cache(
        kv, jnp.int32(0),
        jnp.asarray(kv_tok[:, 0]), jnp.asarray(kv_tok[:, 1]),
        jnp.asarray(np.asarray(slots, np.int32)),
    )
    q = rng.standard_normal((S, hq, hd)).astype(np.float32)
    out = paged_decode_attention(
        jnp.asarray(q), kv, jnp.int32(0), jnp.asarray(lens),
        jnp.asarray(tbl), scale=hd ** -0.5, max_seq_len=128,
    )
    qsl = np.arange(S + 1, dtype=np.int32)
    ref = ref_paged_attention(q, host[0], qsl, lens, tbl, hd ** -0.5)
    err = np.max(np.abs(np.asarray(out) - ref))
    # addressing bugs show up as O(1) errors; 1e-2 leaves room for the
    # MXU's default-precision (bf16-pass) matmul vs the f32 oracle while
    # still catching any misplaced token (suite tolerance policy is 2e-2)
    assert err < 1e-2, f"max err {err}"


def run_mamba():
    from vllm_triton_backend_tpu.ops.pallas.mamba import (
        selective_state_update,
    )
    from vllm_triton_backend_tpu.ops.refs import ref_selective_state_update

    slots, b, h, di, ds = 16, 4, 8, 64, 16
    state = rng.standard_normal((slots, h, di, ds)).astype(np.float32)
    x = rng.standard_normal((b, h, di)).astype(np.float32)
    dt = rng.standard_normal((b, h, di)).astype(np.float32)
    A = -np.abs(rng.standard_normal((h, di, ds))).astype(np.float32)
    B = rng.standard_normal((b, h, ds)).astype(np.float32)
    C = rng.standard_normal((b, h, ds)).astype(np.float32)
    D = rng.standard_normal((h, di)).astype(np.float32)
    z = rng.standard_normal((b, h, di)).astype(np.float32)
    idx = np.asarray([3, 7, 1, 9], np.int32)
    ref_state = state.copy()
    ref_out = ref_selective_state_update(
        ref_state, x, dt, A, B, C, D=D, z=z, state_batch_indices=idx,
        dt_softplus=True,
    )
    out, new_st = selective_state_update(
        jnp.asarray(state), jnp.asarray(x), jnp.asarray(dt), jnp.asarray(A),
        jnp.asarray(B), jnp.asarray(C), D=jnp.asarray(D), z=jnp.asarray(z),
        state_batch_indices=jnp.asarray(idx), dt_softplus=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-3,
                               rtol=2e-2)
    # fetch only the touched slots (small D2H)
    got = np.asarray(new_st[jnp.asarray(idx)])
    np.testing.assert_allclose(got, ref_state[idx], atol=2e-3, rtol=2e-2)


def run_quant():
    from vllm_triton_backend_tpu.ops.pallas.quant_linear import (
        quantize_weights, quant_matmul,
    )

    x = jnp.asarray(rng.standard_normal((64, 512)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((512, 1024)) * 0.02, jnp.bfloat16)
    for dt in ("int8", "fp8"):
        qw = quantize_weights(w, dt)
        out = quant_matmul(x, qw)
        ref = np.asarray(x, np.float32) @ np.asarray(w, np.float32)
        err = np.max(np.abs(np.asarray(out, np.float32) - ref))
        assert err < ref.std() * 0.2, f"{dt} err {err}"


def run_append_decode(cache_dtype=jnp.bfloat16, scale_kv=1.0, atol=1e-2):
    """Fused append-attend on hardware: (a) output matches the two-op
    write-then-attend path; (b) the kernel's slot-write DMA landed at the
    right address — proven by re-reading the cache through a plain decode
    at the same lengths.  Slots cover every RMW window group (off 0, 4,
    7, 8, 31) plus a dead slot (-1) and cross page boundaries."""
    from vllm_triton_backend_tpu.ops.pallas.decode_attention import (
        paged_decode_append_attention,
        paged_decode_attention,
    )

    nb, bs, hkv, hq, hd, S = 64, 32, 2, 8, 128, 5
    # seq_lens INCLUDE the current token; w_off = (len-1) % 32 hits
    # window bases 8, 0, 4, 0(new page), 24.  The LAST page is the
    # kernel's reserved trash page (dead-slot target) — engine block
    # tables never reference it, so neither may this one.
    lens = np.asarray([41, 8, 101, 65, 121], np.int32)
    tbl = rng.permutation(nb - 1)[: S * 4].reshape(S, 4).astype(np.int32)
    kvh = random_cache(rng, hkv, nb, bs, hd, num_layers=1)
    q = rng.standard_normal((S, hq, hd)).astype(np.float32) * 0.5
    kn = rng.standard_normal((S, hkv, hd)).astype(np.float32) * 0.5
    vn = rng.standard_normal((S, hkv, hd)).astype(np.float32) * 0.5
    pos = lens - 1
    page = np.take_along_axis(tbl, (pos // bs)[:, None], 1)[:, 0]
    slots = (page * bs + pos % bs).astype(np.int32)

    kv0 = jnp.asarray(kvh / scale_kv).astype(cache_dtype)
    args = (
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(kn, jnp.bfloat16),
        jnp.asarray(vn, jnp.bfloat16),
    )
    common = dict(
        scale=hd ** -0.5, max_seq_len=128,
        k_scale=scale_kv, v_scale=scale_kv,
    )
    # two-op reference path
    kv_ref = reshape_and_cache(
        kv0, jnp.int32(0), args[1], args[2], jnp.asarray(slots),
        scale_kv, scale_kv,
    )
    out_ref = paged_decode_attention(
        args[0], kv_ref, jnp.int32(0), jnp.asarray(lens),
        jnp.asarray(tbl), **common,
    )
    # fused path
    out, kv1 = paged_decode_append_attention(
        args[0], args[1], args[2], kv0, jnp.int32(0), jnp.int32(1),
        jnp.asarray(lens), jnp.asarray(tbl), jnp.asarray(slots), **common,
    )
    err = np.max(np.abs(
        np.asarray(out, np.float32) - np.asarray(out_ref, np.float32)
    ))
    assert err < atol, f"fused vs two-op max err {err}"
    # read-back: plain decode over the kernel-written cache must agree
    out_rb = paged_decode_attention(
        args[0], kv1, jnp.int32(0), jnp.asarray(lens),
        jnp.asarray(tbl), **common,
    )
    err = np.max(np.abs(
        np.asarray(out_rb, np.float32) - np.asarray(out_ref, np.float32)
    ))
    assert err < atol, f"cache read-back max err {err}"
    # dead slots (-1, preempted rows) must not write any live page
    out2, kv2 = paged_decode_append_attention(
        args[0], args[1], args[2], kv1, jnp.int32(0), jnp.int32(1),
        jnp.asarray(lens), jnp.asarray(tbl),
        jnp.full(S, -1, jnp.int32), **common,
    )
    same = np.asarray(
        kv2[0, np.sort(page)].astype(jnp.float32)
    ) == np.asarray(kv1[0, np.sort(page)].astype(jnp.float32))
    assert same.all(), "dead slot leaked a write into a live page"


def run_append_decode_steps(cache_dtype=jnp.bfloat16, scale_kv=1.0,
                            atol=2e-2):
    """Multi-step appends: 8 consecutive fused steps growing each
    sequence by one token must equal 8 write-then-attend steps — catches
    stale RMW-window reads and cross-step write ordering."""
    from vllm_triton_backend_tpu.ops.pallas.decode_attention import (
        paged_decode_append_attention,
        paged_decode_attention,
    )

    nb, bs, hkv, hq, hd, S = 64, 16, 2, 4, 128, 3
    lens0 = np.asarray([13, 30, 5], np.int32)
    tbl = rng.permutation(nb - 1)[: S * 8].reshape(S, 8).astype(np.int32)
    kvh = random_cache(rng, hkv, nb, bs, hd, num_layers=1)
    kv_f = jnp.asarray(kvh / scale_kv).astype(cache_dtype)
    kv_r = kv_f
    common = dict(
        scale=hd ** -0.5, max_seq_len=128,
        k_scale=scale_kv, v_scale=scale_kv,
    )
    for step in range(8):
        lens = lens0 + step + 1  # incl. current token
        pos = lens - 1
        page = np.take_along_axis(tbl, (pos // bs)[:, None], 1)[:, 0]
        slots = jnp.asarray((page * bs + pos % bs).astype(np.int32))
        q = jnp.asarray(
            rng.standard_normal((S, hq, hd)) * 0.5, jnp.bfloat16
        )
        kn = jnp.asarray(
            rng.standard_normal((S, hkv, hd)) * 0.5, jnp.bfloat16
        )
        vn = jnp.asarray(
            rng.standard_normal((S, hkv, hd)) * 0.5, jnp.bfloat16
        )
        lens_d = jnp.asarray(lens)
        tbl_d = jnp.asarray(tbl)
        out_f, kv_f = paged_decode_append_attention(
            q, kn, vn, kv_f, jnp.int32(0), jnp.int32(1),
            lens_d, tbl_d, slots, **common,
        )
        kv_r = reshape_and_cache(
            kv_r, jnp.int32(0), kn, vn, slots, scale_kv, scale_kv
        )
        out_r = paged_decode_attention(
            q, kv_r, jnp.int32(0), lens_d, tbl_d, **common,
        )
        err = np.max(np.abs(
            np.asarray(out_f, np.float32) - np.asarray(out_r, np.float32)
        ))
        assert err < atol, f"step {step}: fused vs two-op max err {err}"


def main():
    print("devices:", jax.devices(), flush=True)
    check("decode hd128 bs32",
          lambda: run_attn([1] * 8, [100, 5, 977, 32, 64, 1, 333, 80]))
    check("decode hd64 pad128", lambda: run_attn([1, 1], [55, 200], hd=64))
    check("decode hd256", lambda: run_attn([1, 1], [55, 200], hd=256))
    check("decode bs16", lambda: run_attn([1, 1, 1], [31, 64, 150], bs=16))
    check("decode mha", lambda: run_attn([1, 1], [40, 90], hq=4, hkv=4))
    check("decode sliding",
          lambda: run_attn([1, 1], [300, 500], sliding_window=128))
    check("decode softcap",
          lambda: run_attn([1, 1], [77, 11], logits_soft_cap=30.0))
    check("decode fp8", lambda: run_attn(
        [1, 1, 1], [40, 200, 9], cache_dtype=jnp.float8_e4m3fn,
        k_scale=0.05, atol=6e-2))
    check("decode local-chunk",
          lambda: run_attn([1, 1], [300, 150], local_chunk_size=128))
    check("decode alibi", lambda: run_attn(
        [1, 1], [33, 100],
        alibi_slopes=jnp.asarray(
            np.geomspace(0.5, 0.01, 8, dtype=np.float32)),
        atol=5e-2))
    check("prefill full", lambda: run_attn([32, 17, 5], [0, 0, 0]))
    check("prefill chunked", lambda: run_attn([16, 8], [48, 9]))
    check("prefill mixed+decode", lambda: run_attn([1, 7, 33], [20, 13, 0]))
    check("prefill hd64", lambda: run_attn([12, 9], [0, 30], hd=64))
    check("prefill sliding",
          lambda: run_attn([16, 9], [10, 300], sliding_window=64))
    check("prefill fp8", lambda: run_attn(
        [9, 21], [30, 0], cache_dtype=jnp.float8_e4m3fn,
        k_scale=0.05, atol=6e-2))
    check("prefill long", lambda: run_attn([512], [1024]))
    check("cache write->read", run_cache_write_read)
    check("append decode fused", run_append_decode)
    check("append decode fused int8", lambda: run_append_decode(
        jnp.int8, scale_kv=0.05, atol=5e-2))
    check("append decode fused fp8", lambda: run_append_decode(
        jnp.float8_e4m3fn, scale_kv=0.05, atol=6e-2))
    check("append decode multi-step", run_append_decode_steps)
    check("append decode multi-step int8", lambda: run_append_decode_steps(
        jnp.int8, scale_kv=0.05, atol=6e-2))
    check("mamba selective_state_update", run_mamba)
    check("quant linear int8/fp8", run_quant)
    print(f"\n{len(failures)} failures: {failures}", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
