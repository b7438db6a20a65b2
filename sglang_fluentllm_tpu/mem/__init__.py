from sglang_fluentllm_tpu.mem.allocator import KVAllocator
from sglang_fluentllm_tpu.mem.kv_cache import (
    MHAKVCache,
    MLAKVCache,
    MLAKVCacheFP8,
    create_kv_cache,
    kv_cell_bytes_per_token,
    mha_write,
    mla_write,
    mla_write_fp8,
)
from sglang_fluentllm_tpu.mem.radix_cache import MatchResult, RadixCache, TreeNode
from sglang_fluentllm_tpu.mem.req_pool import ReqPool

__all__ = [
    "KVAllocator",
    "MHAKVCache",
    "MLAKVCache",
    "MLAKVCacheFP8",
    "MatchResult",
    "RadixCache",
    "ReqPool",
    "TreeNode",
    "create_kv_cache",
    "kv_cell_bytes_per_token",
    "mha_write",
    "mla_write",
    "mla_write_fp8",
]
