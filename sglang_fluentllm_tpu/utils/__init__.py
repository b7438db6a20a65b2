from sglang_fluentllm_tpu.utils.common import (
    cdiv,
    configure_logger,
    get_exception_traceback,
    next_power_of_2,
    pick_bucket,
    round_up,
)

__all__ = [
    "cdiv",
    "configure_logger",
    "get_exception_traceback",
    "next_power_of_2",
    "pick_bucket",
    "round_up",
]
