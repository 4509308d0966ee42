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
    XLA_BASELINE = "xla_baseline"  # pure-XLA gather baseline (slow slot)


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
    if impl == Implementation.PALLAS_DECODE:
        assert max_query_len == 1, "decode caller needs decode-only batch"

        def call():
            return paged_decode_attention(
                q, kv_cache, layer, meta.seq_lens, meta.block_table,
                scale=scale, max_seq_len=max_seq_len, **kw,
            )

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
