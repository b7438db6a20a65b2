"""Unified model configuration.

Analog of the reference's ``srt/configs/model_config.py`` (``ModelConfig:95``):
parse a HuggingFace ``config.json`` into one normalized struct, detect the
attention architecture (MHA vs MLA, ``model_config.py:63-92`` in the
reference), MoE structure, and derive KV-cache cell sizes. No network access —
configs come from a local directory or an inline dict.
"""

from __future__ import annotations

import dataclasses
import enum
import json
import os
from typing import Any, Dict, List, Optional


class AttentionArch(str, enum.Enum):
    MHA = "MHA"   # multi-head / grouped-query attention
    MLA = "MLA"   # multi-head latent attention (DeepSeek-class)


@dataclasses.dataclass
class ModelConfig:
    architectures: List[str]
    model_type: str
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    head_dim: int
    intermediate_size: int
    vocab_size: int
    max_position_embeddings: int
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[Dict[str, Any]] = None
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    mlp_bias: bool = False
    hidden_act: str = "silu"
    partial_rotary_factor: float = 1.0

    # --- context override ---
    context_length: Optional[int] = None

    # --- MLA (DeepSeek V2/V3, LongCat Flash) ---
    attention_arch: AttentionArch = AttentionArch.MHA
    q_lora_rank: Optional[int] = None
    kv_lora_rank: Optional[int] = None
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: int = 0

    # --- MoE ---
    num_experts: int = 0                 # routed experts (0 = dense model)
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    num_shared_experts: int = 0
    first_k_dense_replace: int = 0
    moe_layer_freq: int = 1
    routed_scaling_factor: float = 1.0
    topk_method: str = "greedy"          # greedy | group_limited_greedy | noaux_tc
    n_group: int = 1
    topk_group: int = 1
    norm_topk_prob: bool = True
    scoring_func: str = "softmax"        # softmax | sigmoid
    num_zero_experts: int = 0            # LongCat ScMoE zero (identity) experts

    # --- sliding window ---
    sliding_window: Optional[int] = None

    # --- quantization from checkpoint ---
    quantization: Optional[str] = None
    weight_block_size: Optional[List[int]] = None

    # --- speculative (NEXTN/MTP draft layers present in ckpt) ---
    num_nextn_predict_layers: int = 0

    # --- KV pool depth (LongCat ScMoE has 2 attentions per layer) ---
    num_kv_layers: Optional[int] = None

    # --- hybrid linear attention (Qwen3-Next GDN / mamba-class) ---
    # per-layer kind list ("linear_attention" | "full_attention"); None for
    # pure paged-attention models
    layer_types: Optional[List[str]] = None

    # raw HF dict for model-specific extras
    hf_config: Dict[str, Any] = dataclasses.field(default_factory=dict)

    # ------------------------------------------------------------------
    @property
    def is_mla(self) -> bool:
        return self.attention_arch == AttentionArch.MLA

    @property
    def is_dsa(self) -> bool:
        """DeepSeek V3.2 sparse attention (lightning indexer present)."""
        return self.is_mla and bool(self.hf_config.get("index_topk"))

    @property
    def is_nsa(self) -> bool:
        """Native sparse attention (compress/select/window branches;
        reference qwen3_nsa / deepseek NSA configs carry the compression
        geometry in the HF config)."""
        return (not self.is_mla
                and "kernel_size" in self.hf_config
                and "select_size" in self.hf_config)

    @property
    def use_over_embedding(self) -> bool:
        """LongCat OEP hashed n-gram embeddings present (reference
        ``configs/configuration_flash.py:177-196``: either
        oe_vocab_size_ratio or ngram_vocab_size_ratio activates it)."""
        hf = self.hf_config
        return bool(hf.get("oe_vocab_size_ratio")
                    or hf.get("ngram_vocab_size_ratio"))

    @property
    def oep_dims(self):
        """(M, K, N): base modulus, splits per n, max n-gram length."""
        hf = self.hf_config
        ratio = (hf.get("ngram_vocab_size_ratio")
                 or hf.get("oe_vocab_size_ratio"))
        m = int(self.vocab_size * float(ratio))
        k = int(hf.get("emb_split_num") or hf.get("oe_split_num"))
        n = int(hf.get("emb_neighbor_num") or hf.get("oe_neighbor_num"))
        return m, k, n

    @property
    def is_hybrid_linear(self) -> bool:
        return bool(
            self.layer_types
            and "linear_attention" in self.layer_types
        )

    @property
    def linear_layer_ids(self) -> List[int]:
        return [i for i, t in enumerate(self.layer_types or [])
                if t == "linear_attention"]

    @property
    def full_attn_layer_ids(self) -> List[int]:
        return [i for i, t in enumerate(self.layer_types or [])
                if t != "linear_attention"]

    @property
    def is_moe(self) -> bool:
        return self.num_experts > 0

    def is_moe_layer(self, layer_id: int) -> bool:
        if not self.is_moe:
            return False
        if layer_id < self.first_k_dense_replace:
            return False
        return (layer_id % self.moe_layer_freq) == 0

    @property
    def qk_head_dim(self) -> int:
        if self.is_mla:
            return self.qk_nope_head_dim + self.qk_rope_head_dim
        return self.head_dim

    def kv_cell_dims(self) -> int:
        """Per-token-per-layer KV dims (unit count, not bytes).

        MLA stores the compressed kv_lora + rope vector once per token
        (reference ``memory_pool.py:591`` MLATokenToKVPool); MHA stores
        K and V per kv-head.
        """
        if self.is_mla:
            return self.kv_lora_rank + self.qk_rope_head_dim
        return 2 * self.num_key_value_heads * self.head_dim

    # ------------------------------------------------------------------
    @classmethod
    def from_hf_dict(
        cls,
        cfg: Dict[str, Any],
        context_length: Optional[int] = None,
        model_override_args: Optional[Dict[str, Any]] = None,
    ) -> "ModelConfig":
        cfg = dict(cfg)
        if model_override_args:
            cfg.update(model_override_args)
        # Nested text_config (multimodal wrappers)
        if "text_config" in cfg and isinstance(cfg["text_config"], dict):
            inner = dict(cfg["text_config"])
            inner.setdefault("architectures", cfg.get("architectures", []))
            cfg = inner

        n_heads = cfg.get("num_attention_heads", cfg.get("n_head", 32))
        hidden = cfg.get("hidden_size", cfg.get("n_embd", 4096))
        head_dim = cfg.get("head_dim") or hidden // n_heads

        kv_lora_rank = cfg.get("kv_lora_rank")
        attention_arch = (
            AttentionArch.MLA if kv_lora_rank else AttentionArch.MHA
        )

        num_experts = (
            cfg.get("n_routed_experts")
            or cfg.get("num_experts")
            or cfg.get("num_local_experts")
            or 0
        )
        if isinstance(num_experts, (list, tuple)):
            # LongCat-Large style per-layer expert counts (None = dense
            # layer); the scalar config carries the MoE layers' count and
            # the per-layer list stays in hf_config for the model
            counts = [e for e in num_experts if e and e > 1]
            num_experts = max(counts) if counts else 0

        mc = cls(
            architectures=cfg.get("architectures", []),
            model_type=cfg.get("model_type", "llama"),
            hidden_size=hidden,
            num_hidden_layers=cfg.get("num_hidden_layers", cfg.get("n_layer", 32)),
            num_attention_heads=n_heads,
            num_key_value_heads=cfg.get("num_key_value_heads", n_heads),
            head_dim=head_dim,
            intermediate_size=cfg.get("intermediate_size", 4 * hidden),
            vocab_size=cfg.get("vocab_size", 32000),
            max_position_embeddings=cfg.get(
                "max_position_embeddings", cfg.get("n_positions", 4096)
            ),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            rope_theta=cfg.get("rope_theta", 10000.0),
            rope_scaling=cfg.get("rope_scaling"),
            # HF PretrainedConfig defaults tying to True and omits the key
            # from config.json when left at the default (e.g. command-r)
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            attention_bias=cfg.get("attention_bias", cfg.get("qkv_bias", False)),
            mlp_bias=cfg.get("mlp_bias", False),
            hidden_act=cfg.get("hidden_act", "silu"),
            partial_rotary_factor=cfg.get("partial_rotary_factor", 1.0),
            attention_arch=attention_arch,
            q_lora_rank=cfg.get("q_lora_rank"),
            kv_lora_rank=kv_lora_rank,
            qk_nope_head_dim=cfg.get("qk_nope_head_dim", 0),
            qk_rope_head_dim=cfg.get("qk_rope_head_dim", 0),
            v_head_dim=cfg.get("v_head_dim", 0),
            num_experts=num_experts,
            num_experts_per_tok=cfg.get("num_experts_per_tok", cfg.get("moe_topk", 0) or 0),
            moe_intermediate_size=cfg.get("moe_intermediate_size", 0) or 0,
            num_shared_experts=cfg.get("n_shared_experts", 0) or 0,
            first_k_dense_replace=cfg.get("first_k_dense_replace", 0),
            moe_layer_freq=cfg.get("moe_layer_freq", 1),
            routed_scaling_factor=cfg.get("routed_scaling_factor", 1.0),
            topk_method=cfg.get("topk_method", "greedy"),
            n_group=cfg.get("n_group", 1) or 1,
            topk_group=cfg.get("topk_group", 1) or 1,
            norm_topk_prob=cfg.get("norm_topk_prob", True),
            scoring_func=cfg.get("scoring_func", "softmax"),
            num_zero_experts=cfg.get("zero_expert_num", 0) or 0,
            sliding_window=cfg.get("sliding_window")
            if cfg.get("use_sliding_window", True)
            else None,
            num_nextn_predict_layers=cfg.get("num_nextn_predict_layers", 0),
            hf_config=cfg,
        )

        qc = cfg.get("quantization_config")
        if qc:
            mc.quantization = qc.get("quant_method")
            mc.weight_block_size = qc.get("weight_block_size")

        if cfg.get("ffn_hidden_size"):
            mc.intermediate_size = cfg["ffn_hidden_size"]
        if cfg.get("expert_ffn_hidden_size"):
            mc.moe_intermediate_size = cfg["expert_ffn_hidden_size"]
        if mc.model_type == "qwen3_next":
            # hybrid GDN/full-attention stack: paged KV pool only covers
            # the full-attention layers; linear layers use the state pool
            L = mc.num_hidden_layers
            mc.layer_types = cfg.get("layer_types") or [
                "full_attention"
                if (i + 1) % cfg.get("full_attention_interval", 4) == 0
                else "linear_attention"
                for i in range(L)
            ]
            mc.num_kv_layers = len(mc.full_attn_layer_ids)
        if mc.model_type == "kimi_linear":
            # KDA hybrid (reference configs/kimi_linear.py): 1-indexed
            # kda_layers list; MLA full-attn layers (often NoPE); MoE is
            # V3-style sigmoid + correction bias + grouped topk
            lac = cfg.get("linear_attn_config") or {}
            L = mc.num_hidden_layers
            kda = set(lac.get("kda_layers") or [])
            mc.layer_types = [
                "linear_attention" if (i + 1) in kda else "full_attention"
                for i in range(L)
            ]
            mc.num_kv_layers = len(mc.full_attn_layer_ids)
            h = lac.get("num_heads", mc.num_attention_heads)
            d = lac.get("head_dim", mc.head_dim)
            mc.hf_config.setdefault("linear_num_key_heads", h)
            mc.hf_config.setdefault("linear_num_value_heads", h)
            mc.hf_config.setdefault("linear_key_head_dim", d)
            mc.hf_config.setdefault("linear_value_head_dim", d)
            mc.hf_config.setdefault(
                "linear_conv_kernel_dim",
                lac.get("short_conv_kernel_size", 4))
            if not mc.num_experts_per_tok:
                mc.num_experts_per_tok = cfg.get(
                    "num_experts_per_token", 0) or 0
            mc.norm_topk_prob = cfg.get("moe_renormalize", True)
            mc.scoring_func = cfg.get(
                "moe_router_activation_func", "sigmoid")
            mc.topk_method = "noaux_tc"
            mc.n_group = cfg.get("num_expert_group", 1) or 1
            mc.num_shared_experts = cfg.get("num_shared_experts", 0) or 0
        if mc.model_type == "qwen":
            # Qwen-1 (QWenLMHeadModel): RMSNorm eps under
            # layer_norm_epsilon; config intermediate_size is 2x the MLP
            # width (reference models/qwen.py:171 passes
            # intermediate_size // 2); qkv has biases (c_attn)
            mc.rms_norm_eps = cfg.get("layer_norm_epsilon", 1e-6)
            mc.intermediate_size = mc.intermediate_size // 2
            mc.rope_theta = cfg.get("rotary_emb_base", 10000.0)
            mc.attention_bias = True
            mc.max_position_embeddings = cfg.get(
                "seq_length", mc.max_position_embeddings)
        if mc.model_type == "glm4_moe":
            # HF Glm4MoeConfig encodes V3-style routing implicitly
            # (sigmoid scores + bias-corrected group-limited selection,
            # modeling_glm4_moe.Glm4MoeTopkRouter)
            mc.topk_method = "noaux_tc"
            mc.scoring_func = "sigmoid"
        if mc.model_type == "longcat_flash" or "FLASH" in str(
            mc.architectures
        ) or "ShortcutMoE" in str(mc.architectures):
            # ScMoE: two MLA attentions per decoder layer
            mc.num_kv_layers = 2 * mc.num_hidden_layers
        mc.context_length = context_length or cfg.get(
            "max_position_embeddings", 4096
        )
        if mc.is_mla and mc.head_dim == hidden // n_heads:
            # MLA head dim is qk_nope+rope, not hidden/heads
            mc.head_dim = mc.qk_nope_head_dim + mc.qk_rope_head_dim
        return mc

    @classmethod
    def from_model_path(
        cls,
        model_path: str,
        context_length: Optional[int] = None,
        model_override_args: Optional[str] = None,
    ) -> "ModelConfig":
        override = json.loads(model_override_args) if model_override_args else None
        cfg_file = os.path.join(model_path, "config.json")
        with open(cfg_file) as fp:
            cfg = json.load(fp)
        return cls.from_hf_dict(cfg, context_length, override)

    @classmethod
    def from_server_args(cls, server_args) -> "ModelConfig":
        return cls.from_model_path(
            server_args.model_path,
            context_length=server_args.context_length,
            model_override_args=server_args.json_model_override_args,
        )
