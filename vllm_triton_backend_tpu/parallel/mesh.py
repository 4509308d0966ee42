"""Device-mesh bootstrap.

Axis convention (SURVEY.md §5.8; the scaling-book recipe):
  - ``data``:  replica axis — independent batches, no weight communication.
  - ``model``: tensor-parallel axis — weights/KV-heads sharded; psum /
    all-gather collectives ride the ICI.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    data: int = 1,
    model: int = 1,
    devices: list | None = None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * model
    if n > len(devices):
        raise ValueError(
            f"mesh {data}x{model} needs {n} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))
