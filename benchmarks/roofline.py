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
