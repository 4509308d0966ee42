"""Measured per-kernel roofline: parse jax profiler xplane traces.

The reference derives util_flops/util_bytes from *measured* kernel
durations — proton hook metadata joined with the profile dataframe
(reference scripts/roofline/proton_viewer.py:119-205, consumed
programmatically at scripts/benchmark.py:549-564).  The TPU analog: a
``jax.profiler`` trace dir holds ``*.xplane.pb`` protobufs whose device
planes carry one event per executed kernel (Mosaic kernels included);
this module aggregates their durations so the roofline denominators in
``benchmarks/roofline.py`` divide real device time, not wall clock with
dispatch overhead in it.

The XSpace schema ships with tensorflow
(``tensorflow.tsl.profiler.protobuf.xplane_pb2``); the import is lazy so
the engine never pays the TF import cost.
"""

from __future__ import annotations

import glob
import os
import re
from dataclasses import dataclass


@dataclass
class KernelTime:
    name: str
    count: int
    total_s: float

    @property
    def avg_s(self) -> float:
        return self.total_s / max(1, self.count)


def _load_xspaces(log_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True
    )
    spaces = []
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append(xs)
    return spaces


# Container events that WRAP child ops on the same timeline — summing
# them alongside their children double-counts (a `while` spans its whole
# body; measured: 46k-event granite chunk summed to 762 ms on a 269 ms
# executable before this filter).
_CONTAINER_RE = re.compile(
    r"^%?(while|conditional|call)[.\d]*\s*=|^jit_"
)


def device_kernel_times(
    log_dir: str, include: str | None = None
) -> dict[str, KernelTime]:
    """Aggregate per-kernel device durations from a trace dir.

    Returns {event_name: KernelTime} over all device (TPU) planes —
    host/python planes are skipped.  ``include`` filters names by regex
    (the proton viewer's include-regex knob, proton_viewer.py:327-350).

    Only op-level timeline lines are read ("XLA Ops" when present):
    the "XLA Modules" line holds one umbrella event per executable, and
    "Async XLA Ops" holds copies whose durations span their overlap
    window — both would double-count against the op line.  Container
    ops (while/conditional/call) are skipped for the same reason.
    """
    pat = re.compile(include) if include else None
    out: dict[str, KernelTime] = {}
    for xs in _load_xspaces(log_dir):
        for plane in xs.planes:
            name = plane.name.lower()
            if not ("tpu" in name or "/device" in name):
                continue
            if "host" in name:
                continue
            meta = plane.event_metadata
            lines = list(plane.lines)
            op_lines = [
                ln for ln in lines if ln.name.strip() == "XLA Ops"
            ]
            for line in op_lines or lines:
                if (
                    not op_lines
                    and line.name.strip() in ("XLA Modules",
                                              "Async XLA Ops")
                ):
                    continue
                for ev in line.events:
                    md = meta.get(ev.metadata_id)
                    ev_name = md.name if md is not None else str(
                        ev.metadata_id
                    )
                    if _CONTAINER_RE.match(ev_name):
                        continue
                    # match the OP NAME only (lhs of "="): the full HLO
                    # text names operands too, so a consumer fusion like
                    # `%reduce_fusion = f32[] fusion(%_paged_decode...)`
                    # would otherwise count as the kernel and HALVE the
                    # per-call average (found round 3: 85 us kernels
                    # reported as 43 us, inflating util to 119%)
                    if pat and not pat.search(
                        ev_name.split(" = ", 1)[0]
                    ):
                        continue
                    kt = out.get(ev_name)
                    dur_s = ev.duration_ps * 1e-12
                    if kt is None:
                        out[ev_name] = KernelTime(ev_name, 1, dur_s)
                    else:
                        kt.count += 1
                        kt.total_s += dur_s
    return out


def matched_kernel_time(
    log_dir: str, pattern: str
) -> KernelTime | None:
    """Sum all device events whose name matches ``pattern`` into one
    aggregate (a kernel often appears under several fusion names)."""
    times = device_kernel_times(log_dir, include=pattern)
    if not times:
        return None
    total = sum(t.total_s for t in times.values())
    count = sum(t.count for t in times.values())
    name = ";".join(sorted(times)[:3])
    return KernelTime(name, count, total)


def measured_utilization(
    log_dir: str,
    pattern: str,
    flops: float,
    bytes_accessed: float,
    peaks,
    calls: int = 1,
    dtype_bits: int = 16,
) -> dict | None:
    """Roofline utilization from MEASURED kernel time.

    ``flops``/``bytes_accessed`` are per-call (the kernel's CostEstimate
    values — the launch_metadata analog); ``calls`` is how many times the
    kernel ran inside the trace.  Returns None when the trace holds no
    matching events (e.g. CPU interpret runs)."""
    kt = matched_kernel_time(log_dir, pattern)
    if kt is None or kt.total_s <= 0:
        return None
    t_call = kt.total_s / max(calls, 1)
    peak_flops = (
        peaks.flops_int8 if dtype_bits <= 8 else peaks.flops_bf16
    )
    return {
        "kernel_names": kt.name,
        "kernel_events": kt.count,
        "kernel_ms_measured": t_call * 1e3,
        "util_flops_measured": flops / t_call / peak_flops,
        "util_bytes_measured": bytes_accessed / t_call / peaks.hbm_bytes,
    }
