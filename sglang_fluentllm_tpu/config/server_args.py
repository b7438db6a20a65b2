"""Server configuration.

TPU-native analog of the reference's ``srt/server_args.py`` (``ServerArgs:50``,
~176 flags with mirrored argparse CLI and cross-flag validation). We keep the
same single-dataclass design — one source of truth, argparse generated from the
fields — but the flags reflect a TPU deployment: one process per *host* (JAX
owns all local chips), mesh axes instead of nccl group sizes, and jit bucket
controls instead of CUDA-graph capture lists.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import random
import tempfile
from typing import List, Optional

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class ServerArgs:
    # ---- model / tokenizer ----
    model_path: str = ""
    tokenizer_path: Optional[str] = None
    load_format: str = "auto"  # auto | safetensors | dummy
    dtype: str = "bfloat16"
    kv_cache_dtype: str = "auto"  # auto | bfloat16 | fp8_e4m3 (MLA per-token)
    context_length: Optional[int] = None
    json_model_override_args: str = "{}"
    trust_remote_code: bool = True
    revision: Optional[str] = None

    # ---- memory / KV cache ----
    page_size: int = 16
    mem_fraction_static: float = 0.85
    # offload this many GiB of the largest weight leaves to pinned host
    # memory (reference --cpu-offload-gb; XLA streams them to HBM per
    # step — see runtime/offloader.py)
    cpu_offload_gb: float = 0.0
    max_total_tokens: Optional[int] = None
    max_running_requests: Optional[int] = None
    max_prefill_tokens: int = 8192
    chunked_prefill_size: int = 4096
    disable_radix_cache: bool = False
    radix_eviction_policy: str = "lru"  # lru | lfu
    disable_native_radix: bool = False  # force the python radix tree

    # ---- hicache (host / storage KV tiers) ----
    enable_hierarchical_cache: bool = False
    hicache_ratio: float = 2.0
    hicache_size: int = 0
    hicache_write_policy: str = "write_through"
    hicache_storage_backend: Optional[str] = None  # file | remote
    hicache_storage_remote_addr: Optional[str] = None  # host:port
    hicache_storage_prefetch_threshold: int = 256

    # ---- scheduling ----
    schedule_policy: str = "lpm"  # lpm | fcfs | dfs-weight | lof | random
    schedule_conservativeness: float = 1.0
    enable_mixed_chunk: bool = False
    disable_overlap_schedule: bool = False
    stream_interval: int = 1
    stream_output: bool = True
    watchdog_timeout: float = 600.0  # generous: first-shape jit compiles are slow
    decode_log_interval: int = 40
    max_queued_requests: Optional[int] = None

    # ---- parallelism (mesh axes) ----
    tp_size: int = 1            # tensor parallel (within attn group too)
    dp_size: int = 1            # request-level data parallel replicas
    load_balance_method: str = "shortest_queue"  # round_robin|shortest_queue
    ep_size: int = 1            # expert parallel size for MoE
    attn_tp_size: Optional[int] = None  # DP-attention: TP size for attention
    dense_tp_size: Optional[int] = None
    moe_parallel_strategy: str = "tp"  # tp | ep
    # token-sharded fixed-capacity all-to-all (DeepEP analog) — the DEFAULT
    # EP path; set False to force the replicated-token psum path
    enable_ep_dispatch: bool = True
    ep_dispatch_capacity_factor: float = 2.0
    # below this many tokens the all-to-all is latency-bound: fall back to
    # the replicated path (identity placement only)
    ep_dispatch_min_tokens: int = 16
    ep_num_redundant_experts: int = 0
    enable_expert_distribution_recorder: bool = False
    dist_init_addr: Optional[str] = None
    nnodes: int = 1
    node_rank: int = 0

    # ---- attention backend / jit buckets ----
    attention_backend: Optional[str] = None  # ref | paged | mla | auto
    # double-sparsity sparse decode (reference --enable-double-sparsity)
    enable_double_sparsity: bool = False
    ds_channel_config: Optional[str] = None  # offline calibration JSON
    ds_heavy_channel_num: int = 32
    ds_heavy_token_num: int = 256
    ds_sparse_decode_threshold: int = 1024
    decode_bs_buckets: Optional[List[int]] = None
    prefill_token_buckets: Optional[List[int]] = None
    disable_jit_warmup: bool = False
    # named custom warmups run at startup (entrypoints/warmup.py
    # registry; reference srt/warmup.py --warmups)
    warmups: Optional[List[str]] = None
    # fused-window dense-KV decode: gather the paged history once per
    # window and run pure-XLA attention for the k in-window steps (zero
    # Mosaic launches — the axon runtime charges ~130us fixed per pallas
    # call). Applied when the dense buffer fits this budget; 0 disables.
    decode_dense_window_bytes: int = 768 * 1024 * 1024
    # decode steps fused into one device program (host cost amortization —
    # the analog of the reference fusing multi-step spec decode into a
    # single CUDA graph). 1 = classic one-step decode. 32 amortizes the
    # dense-window gather + per-window fixed costs (measured +21% decode
    # throughput over 16 on the bench geometry); clamped per batch to the
    # remaining token budget, and dropped to 1 for host-callback batches.
    decode_steps_per_launch: int = 32
    # launched-but-unresolved batch window (tunnel dispatch latency hiding)
    overlap_pipeline_depth: int = 4

    # ---- quantization ----
    quantization: Optional[str] = None  # fp8 | w8a8_int8 | w4a16
    weight_block_size: int = 128

    # ---- speculative decoding ----
    speculative_algorithm: Optional[str] = None  # EAGLE | EAGLE3 | NEXTN | PLD | STANDALONE
    speculative_draft_model_path: Optional[str] = None
    speculative_num_steps: int = 3
    speculative_eagle_topk: int = 1
    speculative_num_draft_tokens: int = 4

    # ---- PD disaggregation ----
    # null | prefill | decode | colocated (one-process 1P1D pair on
    # disjoint submeshes with device-to-device KV transfer)
    disaggregation_mode: str = "null"
    disaggregation_bootstrap_port: int = 8998
    disaggregation_transfer_backend: str = "fake"  # fake | tcp
    disaggregation_decode_radix_cache: bool = True
    # KV-transfer piece size (pages): 0 = ship whole chunked-prefill
    # chunks (default). Splitting chunks into pieces pipelines wire time
    # against the decode-side install chain (the token-axis analog of
    # the reference's layer-wise transfer) — worth it ONLY when wire
    # time dominates; measured on this rig's loopback HTTP transport the
    # ~35 ms fixed cost per transfer dominates and 16-page pieces made
    # the TTFT tail 6x WORSE (perf/pd_ttft_piped2_r5.log vs
    # pd_ttft_r5.log), so finer-than-chunk granularity (incl. the
    # reference's layer-wise scheme) is a net loss here. Set to e.g. 16
    # on high-bandwidth DCN where bytes dominate.
    pd_transfer_piece_pages: int = 0

    # ---- server / network ----
    host: str = "127.0.0.1"
    port: int = 30000
    api_key: Optional[str] = None
    served_model_name: Optional[str] = None
    chat_template: Optional[str] = None
    completion_template: Optional[str] = None
    enable_metrics: bool = False
    enable_trace: bool = False
    enable_kv_events: bool = False
    kv_events_endpoint: Optional[str] = None  # zmq pub, e.g. tcp://*:5557
    otlp_traces_endpoint: Optional[str] = None
    log_level: str = "info"
    log_requests: bool = False
    show_time_cost: bool = False
    profile_dir: Optional[str] = None  # /start_profile default output dir

    # ---- sampling / misc ----
    random_seed: Optional[int] = None
    skip_tokenizer_init: bool = False
    enable_nan_detection: bool = False
    enable_custom_logit_processor: bool = False
    # one-forward per-layer activation dump to <folder>/tensor_dump.npz for
    # cross-impl numeric diffing (reference --debug-tensor-dump-* flags +
    # distributed/model_tensor_tracer.py:20). Runs at engine init.
    debug_tensor_dump_output_folder: Optional[str] = None
    # prompt for the dump forward: comma-separated token ids, or a path to
    # a .npy of int ids; default = deterministic 16-token ramp
    debug_tensor_dump_input_ids: Optional[str] = None
    # startup micro-bench across hosts flagging slow chips (reference
    # utils/slow_rank_detector.py)
    enable_slow_host_check: bool = False
    sampling_backend: str = "jax"
    constrained_json_whitespace_pattern: Optional[str] = None
    grammar_backend: str = "native"
    tool_call_parser: str = "json"  # json | qwen25 | llama32 | mistral | deepseekv3
    # Responses-API server-side tools: "demo" (in-process registry) or
    # MCP SSE endpoints "host:port[,host:port]" (reference tool_server.py)
    tool_server: Optional[str] = None
    reasoning_parser: Optional[str] = None  # deepseek_r1 | qwen3
    device: str = "auto"  # auto | tpu | cpu

    def __post_init__(self):
        if self.tokenizer_path is None:
            self.tokenizer_path = self.model_path
        if self.served_model_name is None:
            self.served_model_name = self.model_path
        if self.random_seed is None:
            self.random_seed = random.randint(0, 2**30)
        if self.attn_tp_size is None:
            self.attn_tp_size = self.tp_size
        if self.dense_tp_size is None:
            self.dense_tp_size = self.tp_size
        if self.decode_bs_buckets is None:
            self.decode_bs_buckets = default_decode_buckets()
        if self.prefill_token_buckets is None:
            self.prefill_token_buckets = default_prefill_buckets(
                self.chunked_prefill_size
            )
        self.check()

    @property
    def dp_attn_size(self) -> int:
        """Number of DP-attention groups (reference
        ``initialize_dp_attention``: attn_dp = tp // attn_tp)."""
        return self.tp_size // self.attn_tp_size

    # Mirrors reference check_server_args (server_args.py) cross-validation.
    def check(self):
        assert self.page_size >= 1
        assert self.tp_size >= 1 and self.dp_size >= 1 and self.ep_size >= 1
        assert self.tp_size % self.attn_tp_size == 0, (
            "attn_tp_size must divide tp_size (DP-attention groups)"
        )
        if self.dp_attn_size > 1:
            # engine-level DP-attention: features whose host state is not
            # yet group-aware are rejected loudly (never silently ignored)
            incompat = {
                "speculative decoding": self.speculative_algorithm,
                "hierarchical cache": self.enable_hierarchical_cache,
                "PD disaggregation": self.disaggregation_mode != "null",
            }
            for name, active in incompat.items():
                if active:
                    raise ValueError(
                        f"attn_tp_size < tp_size (DP-attention) does not "
                        f"yet compose with {name}"
                    )
        if self.moe_parallel_strategy == "ep":
            assert self.ep_size > 0
        if self.speculative_algorithm is not None:
            assert self.speculative_algorithm in (
                "EAGLE", "EAGLE3", "NEXTN", "PLD", "STANDALONE")
        assert self.disaggregation_mode in (
            "null", "prefill", "decode", "colocated")
        if self.chunked_prefill_size > 0:
            assert self.chunked_prefill_size % self.page_size == 0, (
                "chunked_prefill_size must be page-aligned"
            )

    # ---- CLI ----
    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser):
        for f in dataclasses.fields(ServerArgs):
            name = "--" + f.name.replace("_", "-")
            default = f.default
            if f.default_factory is not dataclasses.MISSING:  # type: ignore
                default = f.default_factory()  # type: ignore
            ftype = f.type
            if ftype in ("bool", bool):
                if default is True:
                    parser.add_argument(
                        "--disable-" + f.name.replace("_", "-"),
                        dest=f.name, action="store_false", default=True,
                    )
                else:
                    parser.add_argument(
                        name, dest=f.name, action="store_true", default=False
                    )
            elif "List" in str(ftype):
                etype = str if "str" in str(ftype) else int
                parser.add_argument(name, dest=f.name, type=etype,
                                    nargs="*", default=default)
            else:
                pytype = str
                s = str(ftype)
                if "int" in s:
                    pytype = int
                elif "float" in s:
                    pytype = float
                parser.add_argument(name, dest=f.name, type=pytype,
                                    default=default)

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "ServerArgs":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in vars(args).items() if k in names})

    @classmethod
    def from_yaml(cls, path: str) -> "ServerArgs":
        # Reference: server_args_config_parser.py (YAML config -> args)
        import yaml  # lazy; pyyaml is in the base image

        with open(path) as fp:
            data = yaml.safe_load(fp)
        data = {k.replace("-", "_"): v for k, v in data.items()}
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in data.items() if k in names})

    def to_dict(self):
        return dataclasses.asdict(self)


def default_decode_buckets(max_bs: int = 256) -> List[int]:
    """Decode batch-size buckets for jit compilation.

    Analog of the reference's CUDA-graph capture sizes
    (``cuda_graph_runner.py:121`` — [1,2,4]+multiples of 8): each decode
    batch is padded up to the nearest bucket so XLA sees a small, fixed set
    of shapes.
    """
    buckets = [1, 2, 4, 8]
    b = 16
    while b <= max_bs:
        buckets.append(b)
        b *= 2
    return buckets


def default_prefill_buckets(chunked_prefill_size: int) -> List[int]:
    """Prefill token-count buckets (analog of prefill_cuda_graph_runner)."""
    buckets = []
    t = 128
    limit = max(chunked_prefill_size, 128)
    while t < limit:
        buckets.append(t)
        t *= 2
    buckets.append(limit)
    return buckets


@dataclasses.dataclass
class PortArgs:
    """IPC endpoints between tokenizer manager, scheduler and detokenizer.

    Analog of reference ``server_args.py:1737 PortArgs``; ZMQ over ipc://.
    """

    tokenizer_ipc_name: str
    scheduler_input_ipc_name: str
    detokenizer_ipc_name: str
    metrics_ipc_name: str

    @staticmethod
    def init_new(server_args: ServerArgs) -> "PortArgs":
        base = tempfile.mkdtemp(prefix="sft_ipc_")
        return PortArgs(
            tokenizer_ipc_name=f"ipc://{base}/tokenizer",
            scheduler_input_ipc_name=f"ipc://{base}/scheduler",
            detokenizer_ipc_name=f"ipc://{base}/detokenizer",
            metrics_ipc_name=f"ipc://{base}/metrics",
        )
