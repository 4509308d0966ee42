"""TPU roofline model — utilization = attained / peak (flops & HBM bytes).

The TPU re-build of the reference's proton roofline viewer
(reference scripts/roofline/proton_viewer.py:64-115): per-chip hardcoded
peaks replace the per-GPU table (A100 624 TF/s, H100 1513 TF/s, MI300X
2614.9 TF/s...), and the kernel's declared CostEstimate plays the role of
the Triton launch_metadata flops/bytes hooks (reference
triton_flash_attention.py:649-675).

Peaks are public figures for the matrix units (dense) and HBM:
  v4:   275 TF/s bf16, 1228 GB/s
  v5e:  197 TF/s bf16 / 394 TOP/s int8, 819 GB/s
  v5p:  459 TF/s bf16, 2765 GB/s
  v6e: 918 TF/s bf16 / 1836 TOP/s int8, 1640 GB/s
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ChipPeaks:
    name: str
    flops_bf16: float  # FLOP/s
    flops_int8: float
    hbm_bytes: float  # B/s


_PEAKS = {
    "v4": ChipPeaks("v4", 275e12, 275e12, 1228e9),
    "v5e": ChipPeaks("v5e", 197e12, 394e12, 819e9),
    "v5 lite": ChipPeaks("v5e", 197e12, 394e12, 819e9),
    "v5p": ChipPeaks("v5p", 459e12, 918e12, 2765e9),
    "v6e": ChipPeaks("v6e", 918e12, 1836e12, 1640e9),
    "v6 lite": ChipPeaks("v6e", 918e12, 1836e12, 1640e9),
}

_FALLBACK = ChipPeaks("unknown", 197e12, 394e12, 819e9)


def chip_peaks(device=None) -> ChipPeaks:
    """Resolve peaks for a jax device (by device_kind substring match)."""
    if device is None:
        import jax

        device = jax.devices()[0]
    kind = str(getattr(device, "device_kind", "")).lower()
    for pat, peaks in _PEAKS.items():
        if pat in kind:
            return peaks
    return _FALLBACK


def utilization(
    flops: float,
    bytes_accessed: float,
    seconds: float,
    peaks: ChipPeaks | None = None,
    dtype_bits: int = 16,
) -> dict[str, float]:
    """The reference's util_flops / util_bytes derivation
    (proton_viewer.py:233-244): fraction of roofline attained."""
    peaks = peaks or chip_peaks()
    peak_flops = peaks.flops_int8 if dtype_bits <= 8 else peaks.flops_bf16
    return {
        "util_flops": (flops / seconds) / peak_flops,
        "util_bytes": (bytes_accessed / seconds) / peaks.hbm_bytes,
        "attained_tflops": flops / seconds / 1e12,
        "attained_gbs": bytes_accessed / seconds / 1e9,
    }


def attention_cost(
    num_tokens_q: int,
    kv_len: int,
    num_q_heads: int,
    num_kv_heads: int,
    head_size: int,
    kv_bytes: int = 2,
    q_bytes: int = 2,
    causal_fraction: float = 1.0,
) -> tuple[float, float]:
    """(flops, bytes) estimate for paged attention — the metadata_fn
    analog (reference triton_paged_decode_attention_2d.py:34-66)."""
    flops = (
        4.0 * num_tokens_q * kv_len * num_q_heads * head_size
        * causal_fraction
    )
    bytes_accessed = (
        2.0 * kv_len * num_kv_heads * head_size * kv_bytes  # K+V read
        + 2.0 * num_tokens_q * num_q_heads * head_size * q_bytes  # q + out
    )
    return flops, bytes_accessed


def measure_practical_hbm(
    mbytes: int = 512, reps: int = 16
) -> float | None:
    """Measured speed-of-light HBM read bandwidth (B/s) via a pure-DMA
    Pallas kernel — no compute, page-sized HBM->VMEM copies only.

    The paper peak (``chip_peaks().hbm_bytes``) is not attainable by any
    access pattern on some deployments (measured 640 GB/s vs the 819
    nominal on this round's tunneled v5e, identical for sequential and
    random pages and for 128 KB vs 1.25 MB descriptors) — utilization
    against THIS number says how much of the achievable machine a kernel
    leaves on the table.  The reference's analog derives peaks from
    device info (proton_viewer.py:101-115); TPU device info does not
    expose HBM clocks, so we measure.  Returns None off-TPU.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if jax.default_backend() == "cpu":
        return None

    page = 128 * 1024  # one KV page
    pages = mbytes * 1024 * 1024 // page
    src = jnp.zeros((pages, 8, page // 8 // 128, 128), jnp.int8)
    group, depth = 8, 2

    def kern(hbm, o_ref, buf, sems):
        g = pl.program_id(0)
        n = pl.num_programs(0)

        def start(gi, slot):
            pltpu.make_async_copy(
                hbm.at[pl.ds(gi * group, group)], buf.at[slot],
                sems.at[slot],
            ).start()

        def wait(gi, slot):
            pltpu.make_async_copy(
                hbm.at[pl.ds(gi * group, group)], buf.at[slot],
                sems.at[slot],
            ).wait()

        @pl.when(g == 0)
        def _():
            start(0, 0)

        @pl.when(g + 1 < n)
        def _():
            start(g + 1, jax.lax.rem(g + 1, depth))

        wait(g, jax.lax.rem(g, depth))
        o_ref[0, :] = buf[jax.lax.rem(g, depth), 0, 0, 0, :].astype(
            jnp.float32
        )

    f = pl.pallas_call(
        kern,
        grid=(pages // group,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 128), lambda g: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(
                (depth, group) + src.shape[1:], jnp.int8
            ),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )

    @jax.jit
    def loop(x):
        def body(c, _):
            return c + f(x)[0, 0], None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return c

    try:
        out = loop(src)
        np.asarray(jax.device_get(out))
        import shutil
        import tempfile

        from vllm_triton_backend_tpu.utils.xplane import (
            matched_kernel_time,
        )

        d = tempfile.mkdtemp(prefix="hbm_probe_")
        try:
            with jax.profiler.trace(d):
                out = loop(src)
                np.asarray(jax.device_get(out))
            kt = matched_kernel_time(d, "kern|custom-call|closed_call")
            if kt and kt.count:
                return src.nbytes / (kt.total_s / kt.count)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    except Exception:
        return None
    return None
