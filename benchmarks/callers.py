"""Caller adapter layer — uniform contract per implementation-under-test.

The reference's callers/ package (reference scripts/callers/base.py:19-113:
``make_call_func`` / ``select_output`` per impl, ImportError-tolerant
registry).  Each caller returns a zero-arg closure over device-resident
inputs so the timing loop measures only dispatch + kernel.
"""

from __future__ import annotations

import enum
from typing import Callable

import jax.numpy as jnp

from vllm_triton_backend_tpu.ops.attention import (
    unified_attention,
    xla_paged_attention,
)
from vllm_triton_backend_tpu.ops.pallas.decode_attention import (
    paged_decode_attention,
)


class Implementation(enum.Enum):
    """Implementations-under-test (reference benchmark.py:56-71 enum)."""

    PALLAS_UNIFIED = "pallas_unified"  # dispatcher (decode/prefill select)
    PALLAS_PREFILL = "pallas_prefill"  # force 2D prefill kernel
    PALLAS_DECODE = "pallas_decode"  # decode kernel directly
    PALLAS_APPEND = "pallas_append"  # fused append-attend decode (write+attn)
    XLA_BASELINE = "xla_baseline"  # pure-XLA gather baseline (slow slot)
    SPLASH_PREFILL = "splash_prefill"  # jaxlib splash-attention cross-check


def _make_splash_call(q, kv_cache, meta, *, scale, layer):
    """Library-kernel baseline: jaxlib's splash attention on the same batch.

    The reference cross-checks its Triton kernels against external library
    kernels (flash_attn / flashinfer IUT slots, scripts/callers/
    {flash_attn,flashinfer}_caller.py); the TPU analog of "the best
    available library kernel" is `jax.experimental.pallas.ops.tpu.
    splash_attention`.  Splash is dense + varlen-via-segment-ids, not
    paged, so this slot only accepts FULL-prefill batches (no prior
    context) and pre-gathers K/V from the paged cache outside the timed
    closure — the timing then answers "is our paged prefill kernel as
    fast as jaxlib's dense kernel on identical math?".
    """
    import numpy as np
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as _sk,
        splash_attention_mask as _sm,
    )

    from vllm_triton_backend_tpu.ops.pallas.common import use_interpret

    qsl = np.asarray(meta.query_start_loc)
    seq_lens = np.asarray(meta.seq_lens)
    n = int(meta.num_seqs)
    qlens = np.diff(qsl)[:n]
    if not np.array_equal(seq_lens[:n], qlens):
        raise ValueError(
            "splash baseline requires full-prefill batches "
            "(context would need paging, which splash lacks)"
        )
    T, H, D = q.shape
    Tp = max(128, -(-T // 128) * 128)  # splash block size is 128
    bt = np.asarray(meta.block_table)
    bs = kv_cache.shape[4]
    Hkv = kv_cache.shape[3]
    # packed position -> (page, slot) gather indices, built host-side
    seg = np.full(Tp, n, np.int32)  # padding rows share a dead segment
    pages = np.zeros(Tp, np.int32)
    slots = np.zeros(Tp, np.int32)
    for i in range(n):
        for p in range(int(qlens[i])):
            t = int(qsl[i]) + p
            seg[t] = i
            pages[t] = bt[i, p // bs]
            slots[t] = p % bs
    kv_dense = kv_cache[layer, pages, :, :, slots, :D]  # [Tp, 2, Hkv, D]
    rep = H // Hkv
    k = jnp.repeat(kv_dense[:, 0], rep, axis=1).transpose(1, 0, 2)
    v = jnp.repeat(kv_dense[:, 1], rep, axis=1).transpose(1, 0, 2)
    qp = jnp.pad(q * scale, ((0, Tp - T), (0, 0), (0, 0)))
    qt = qp.transpose(1, 0, 2)  # [H, Tp, D], pre-scaled
    seg = jnp.asarray(seg)
    segment_ids = _sk.SegmentIds(q=seg, kv=seg)
    mask = _sm.MultiHeadMask([_sm.CausalMask((Tp, Tp))] * H)
    kernel = _sk.make_splash_mha(
        mask, head_shards=1, q_seq_shards=1, interpret=use_interpret()
    )
    real = jnp.asarray((np.arange(T) < qsl[n])[None, :, None])

    import jax

    @jax.jit
    def call():
        out = kernel(qt, k, v, segment_ids=segment_ids)  # [H, Tp, D]
        return jnp.where(real, out[:, :T], 0.0).transpose(1, 0, 2)

    return call


def make_call_func(
    impl: Implementation,
    q,
    kv_cache,
    meta,
    *,
    scale: float,
    max_query_len: int,
    max_seq_len: int,
    layer_idx=None,
    **kw,
) -> Callable[[], jnp.ndarray]:
    layer = jnp.int32(0) if layer_idx is None else layer_idx
    if impl == Implementation.SPLASH_PREFILL:
        return _make_splash_call(
            q, kv_cache, meta, scale=scale,
            layer=0 if layer_idx is None else int(layer_idx),
        )
    if impl == Implementation.PALLAS_DECODE:
        assert max_query_len == 1, "decode caller needs decode-only batch"

        def call():
            return paged_decode_attention(
                q, kv_cache, layer, meta.seq_lens, meta.block_table,
                scale=scale, max_seq_len=max_seq_len, **kw,
            )

        return call
    if impl == Implementation.PALLAS_APPEND:
        # fused append-attend: one launch does the cache write AND the
        # attention (vs PALLAS_DECODE which assumes the write already
        # happened).  To keep the shared oracle valid, the appended row
        # is the batch's OWN last token, re-gathered from the cache: the
        # kernel rewrites the slot with identical bytes (quantize/dequant
        # roundtrip is exact) and the output equals plain decode.
        assert max_query_len == 1, "append caller needs decode-only batch"
        import numpy as np

        from vllm_triton_backend_tpu.ops.pallas.decode_attention import (
            paged_decode_append_attention,
        )

        bs = kv_cache.shape[4]
        hd = q.shape[-1]
        pos = np.asarray(meta.seq_lens) - 1
        page = np.take_along_axis(
            np.asarray(meta.block_table), (pos // bs)[:, None], 1
        )[:, 0]
        slots = jnp.asarray((page * bs + pos % bs).astype(np.int32))
        row = kv_cache[layer, jnp.asarray(page), :, :, jnp.asarray(pos % bs)]
        kn, vn = row[:, 0, :, :hd], row[:, 1, :, :hd]
        if kv_cache.dtype not in (jnp.float32, jnp.bfloat16, jnp.float16):
            kn = kn.astype(jnp.float32) * kw.get("k_scale", 1.0)
            vn = vn.astype(jnp.float32) * kw.get("v_scale", 1.0)

        def call():
            out, _ = paged_decode_append_attention(
                q, kn, vn, kv_cache, layer, jnp.int32(1),
                meta.seq_lens, meta.block_table, slots,
                scale=scale, max_seq_len=max_seq_len, **kw,
            )
            return out

        return call
    if impl == Implementation.XLA_BASELINE:

        def call():
            return xla_paged_attention(
                q, kv_cache, layer, meta, scale=scale,
                max_query_len=max_query_len, max_seq_len=max_seq_len, **kw,
            )

        return call

    force = (
        "prefill" if impl == Implementation.PALLAS_PREFILL else None
    )

    def call():
        return unified_attention(
            q, kv_cache, layer, meta, scale=scale,
            max_query_len=max_query_len, max_seq_len=max_seq_len,
            force_selection=force, **kw,
        )

    return call
