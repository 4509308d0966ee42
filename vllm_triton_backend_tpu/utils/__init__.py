from vllm_triton_backend_tpu.utils.common import (
    cdiv,
    get_dtype,
    next_power_of_2,
    round_up,
)

__all__ = ["cdiv", "get_dtype", "next_power_of_2", "round_up"]
