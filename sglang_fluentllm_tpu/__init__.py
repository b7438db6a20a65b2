"""sglang_fluentllm_tpu — a TPU-native LLM serving engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of
SGLang-FluentLLM (meituan-longcat): continuous batching with a radix-tree
prefix cache and paged KV allocator, overlap scheduling, chunked prefill,
MLA attention with FP8 per-token KV cache, MoE expert parallelism,
speculative decoding, PD disaggregation, and an OpenAI-compatible API.

The architecture is idiomatic TPU — device meshes and sharded jit programs
over ICI/DCN — not a port of the reference's CUDA design.
"""

from sglang_fluentllm_tpu.version import __version__

__all__ = ["__version__"]
