from vllm_triton_backend_tpu.ops.metadata import AttentionMetadata
from vllm_triton_backend_tpu.ops.attention import unified_attention

__all__ = ["AttentionMetadata", "unified_attention"]
