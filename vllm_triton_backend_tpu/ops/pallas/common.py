"""Shared Pallas kernel utilities."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Large-negative mask value that survives f32 arithmetic without becoming NaN
# (same choice as jax's TPU attention kernels: -0.7 * f32_max).
MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def use_interpret() -> bool:
    """Run Pallas kernels in interpreter mode on non-TPU backends.

    The test suite runs on a virtual CPU mesh (tests/conftest.py), where
    Mosaic is unavailable; on real TPU this returns False and kernels are
    compiled.  ``VTB_FORCE_INTERPRET=1`` forces interpreter mode on any
    backend — the debug switch for suspected miscompiles (the reference's
    TRITON_BACKEND_DEBUG analog, SURVEY.md §5.2).
    """
    import os

    if os.environ.get("VTB_FORCE_INTERPRET") == "1":
        return True
    return jax.default_backend() == "cpu"


def merge_softmax_segments(
    m: jax.Array,  # [..., num_segments]
    l: jax.Array,  # [..., num_segments]
    acc: jax.Array,  # [..., num_segments, head]
) -> jax.Array:
    """Numerically-stable merge of per-segment flash-attention partials.

    The TPU generalization of the reference's ``reduce_segments`` second-phase
    kernel (reference kernels/triton_unified_attention.py:757-836): given
    per-segment running max ``m``, exp-sum ``l`` and unnormalized accumulator
    ``acc``, produce the combined attention output.  Also the combine step of
    ring attention across chips (SURVEY.md §5.7).
    """
    m_max = jnp.max(m, axis=-1, keepdims=True)
    alpha = jnp.exp(m - m_max)  # [..., S]
    l_total = jnp.sum(l * alpha, axis=-1)  # [...]
    acc_total = jnp.sum(acc * alpha[..., None], axis=-2)  # [..., head]
    safe_l = jnp.where(l_total == 0.0, 1.0, l_total)
    return jnp.where(
        (l_total == 0.0)[..., None], 0.0, acc_total / safe_l[..., None]
    )
