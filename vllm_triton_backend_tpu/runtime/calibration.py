"""KV-cache scale calibration (VERDICT r1 item 8 / weak #7).

The engine's default k/v scales are static heuristics (int8 -> 1/16,
fp8 -> 1.0).  This module measures the actual K/V activation range of a
model on a calibration batch and derives per-tensor symmetric scales,
closing the loop the reference leaves to upstream checkpoints (its
backend consumes k_scale/v_scale tensors the model ships,
backend/triton_attn.py:446-468).

Method: run the calibration prompts through the REAL forward (bf16
cache — the cache rows then hold exactly the post-RoPE K and V the
quantized cache would hold), take absmax over the written region per
plane, divide by the format's max representable value.  eval_ppl.py is
the accuracy gate: quantized-KV perplexity with calibrated scales must
sit within the reference's relaxed-atol discipline of the bf16 run
(BASELINE.md accuracy target; tests/test_eval_ppl.py).
"""

from __future__ import annotations

import numpy as np

# max representable magnitude per cache format
_FORMAT_MAX = {
    "int8": 127.0,
    "fp8": 448.0,
    "float8_e4m3": 448.0,
    "float8_e5m2": 57344.0,
}


def calibrate_kv_scales(
    cfg,
    params,
    token_chunks: list[np.ndarray],
    cache_dtype: str,
    block_size: int = 16,
    headroom: float = 1.0,
) -> tuple[float, float]:
    """Returns per-tensor (k_scale, v_scale) for ``cache_dtype``.

    ``headroom`` > 1 trades clipping for resolution (absmax / headroom
    saturates outliers; 1.0 = pure absmax calibration).
    """
    import jax.numpy as jnp

    from vllm_triton_backend_tpu.models.llama import (
        ForwardExtras,
        forward,
        make_kv_caches,
    )
    from vllm_triton_backend_tpu.ops.metadata import make_metadata
    from vllm_triton_backend_tpu.utils import next_power_of_2

    fmt_max = _FORMAT_MAX[cache_dtype]
    k_abs = v_abs = 0.0
    for chunk in token_chunks:
        chunk = np.asarray(chunk)
        t = len(chunk)
        if t == 0:
            continue
        bucket = next_power_of_2(max(t, block_size))
        nb = bucket // block_size + 1
        kv_cache = make_kv_caches(cfg, nb, block_size)  # model dtype
        bt = np.arange(nb, dtype=np.int32).reshape(1, nb)
        padded = np.zeros(bucket, np.int32)
        padded[:t] = chunk
        meta = make_metadata(
            [t], [0], bt, block_size, num_token_bucket=bucket
        )
        _, kv_cache = forward(
            params, cfg,
            jnp.asarray(padded),
            jnp.arange(bucket, dtype=jnp.int32),
            kv_cache, meta,
            ForwardExtras(max_query_len=bucket, max_seq_len=bucket),
        )
        # written region: the first ceil(t/bs) pages of every layer
        used = -(-t // block_size)
        k_abs = max(
            k_abs,
            float(jnp.max(jnp.abs(
                kv_cache[:, :used, 0].astype(jnp.float32)
            ))),
        )
        v_abs = max(
            v_abs,
            float(jnp.max(jnp.abs(
                kv_cache[:, :used, 1].astype(jnp.float32)
            ))),
        )
    k_scale = max(k_abs / headroom, 1e-8) / fmt_max
    v_scale = max(v_abs / headroom, 1e-8) / fmt_max
    return k_scale, v_scale
