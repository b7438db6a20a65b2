from sglang_fluentllm_tpu.config.model_config import AttentionArch, ModelConfig
from sglang_fluentllm_tpu.config.server_args import PortArgs, ServerArgs

__all__ = ["AttentionArch", "ModelConfig", "PortArgs", "ServerArgs"]
