"""Small shared helpers."""

from __future__ import annotations

import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
    "int8": jnp.int8,
    "fp8": jnp.float8_e4m3fn,
    "float8_e4m3": jnp.float8_e4m3fn,
    "float8_e5m2": jnp.float8_e5m2,
}


def get_dtype(name: str):
    return _DTYPES[name]


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def next_power_of_2(x: int) -> int:
    """Smallest power of two >= x (>=1).

    Used to bucket MAX/AVG sequence statistics for autotune cache keys, the
    same rounding the reference applies before its dejavu lookup
    (reference kernels/triton_unified_attention.py:878-881).
    """
    if x <= 1:
        return 1
    return 1 << (x - 1).bit_length()
