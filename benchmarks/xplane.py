"""Bench-harness surface for the xplane trace parser (moved into the
package so the autotuner can use trace-based timings)."""

from vllm_triton_backend_tpu.utils.xplane import (  # noqa: F401
    KernelTime,
    device_kernel_times,
    matched_kernel_time,
    measured_utilization,
)
