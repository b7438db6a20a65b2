from sglang_fluentllm_tpu.models.registry import get_model_class, register

__all__ = ["get_model_class", "register"]
