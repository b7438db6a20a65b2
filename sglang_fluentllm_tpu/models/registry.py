"""Model registry (analog of reference srt/models/registry.py:17,70)."""

from __future__ import annotations

from typing import Dict, Type

_REGISTRY: Dict[str, type] = {}


def register(*names):
    def deco(cls):
        for n in names:
            _REGISTRY[n] = cls
        return cls

    return deco


def get_model_class(architectures):
    from sglang_fluentllm_tpu.models import llama  # noqa: F401 (populates)
    from sglang_fluentllm_tpu.models import qwen3  # noqa: F401
    from sglang_fluentllm_tpu.models import deepseek_v2  # noqa: F401
    from sglang_fluentllm_tpu.models import qwen2_moe  # noqa: F401
    from sglang_fluentllm_tpu.models import gemma  # noqa: F401
    from sglang_fluentllm_tpu.models import gpt2  # noqa: F401
    from sglang_fluentllm_tpu.models import longcat_flash  # noqa: F401
    from sglang_fluentllm_tpu.models import llama_variants  # noqa: F401
    from sglang_fluentllm_tpu.models import gpt_oss  # noqa: F401
    from sglang_fluentllm_tpu.models import glm4_moe  # noqa: F401
    from sglang_fluentllm_tpu.models import qwen3_next  # noqa: F401
    from sglang_fluentllm_tpu.models import kimi_linear  # noqa: F401
    from sglang_fluentllm_tpu.models import qwen3_nsa  # noqa: F401
    from sglang_fluentllm_tpu.models import longcat_large  # noqa: F401
    from sglang_fluentllm_tpu.models import deepseek_mha_nsa  # noqa: F401
    from sglang_fluentllm_tpu.models import grok  # noqa: F401

    for arch in architectures:
        if arch in _REGISTRY:
            return _REGISTRY[arch]
    raise ValueError(
        f"No model class for architectures {architectures}; "
        f"registered: {sorted(_REGISTRY)}"
    )
