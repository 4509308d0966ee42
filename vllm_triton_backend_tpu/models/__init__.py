"""Model definitions — pure-functional JAX decoder families.

The reference delegates model execution to vLLM's model runner (SURVEY.md
§1 L5); here models are first-class: parameter pytrees + jittable forward
functions built around the paged KV-cache and unified attention kernels.
"""

from vllm_triton_backend_tpu.models.llama import (
    LlamaParams,
    forward,
    init_params,
)

__all__ = ["LlamaParams", "forward", "init_params"]
