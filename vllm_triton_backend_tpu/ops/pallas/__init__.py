from vllm_triton_backend_tpu.ops.pallas.cache_ops import reshape_and_cache
from vllm_triton_backend_tpu.ops.pallas.decode_attention import paged_decode_attention
from vllm_triton_backend_tpu.ops.pallas.prefill_attention import prefill_attention

__all__ = [
    "paged_decode_attention",
    "prefill_attention",
    "reshape_and_cache",
]
from vllm_triton_backend_tpu.ops.pallas.mamba import (
    selective_scan,
    selective_state_update,
)
from vllm_triton_backend_tpu.ops.pallas.quant_linear import (
    QuantizedLinear,
    quant_matmul,
    quantize_weights,
)

__all__ += [
    "QuantizedLinear",
    "quant_matmul",
    "quantize_weights",
    "selective_scan",
    "selective_state_update",
]
