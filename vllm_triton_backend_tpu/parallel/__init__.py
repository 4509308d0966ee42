"""Multi-chip parallelism — mesh construction and sharded execution.

The reference inherits all distribution from vLLM/NCCL (SURVEY.md §2.6,
§5.8: "no parallelism strategies itself").  Here it is first-class and
TPU-native: a ``jax.sharding.Mesh`` with (data, model) axes, Megatron-style
tensor parallelism expressed through ``shard_map`` + ``psum`` riding the
ICI, and data parallelism as a leading replica axis over independent
engine batches.
"""

from vllm_triton_backend_tpu.parallel.mesh import make_mesh
from vllm_triton_backend_tpu.parallel.sharded import (
    make_sharded_decode_steps,
    make_sharded_forward,
    shard_caches,
    shard_params,
)

__all__ = [
    "make_mesh",
    "make_sharded_decode_steps",
    "make_sharded_forward",
    "shard_caches",
    "shard_params",
]
