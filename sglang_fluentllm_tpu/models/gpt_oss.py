"""gpt-oss (OpenAI open-weight MoE) — TPU-native implementation.

Reference: ``srt/models/gpt_oss.py`` (807 LoC). Architecture:

- per-layer MoE (no dense layers, no shared expert): biased router,
  top-k -> softmax over the selected logits (equivalent to softmax +
  renormalize, which is what ``select_experts`` computes), experts with
  BIASED gate_up/down projections and the clamped ``swiglu_oai``
  activation (alpha=1.702, limit=7; reference ``layers/activation.py:214``)
- attention sinks: a learned per-head logit joining the softmax
  denominator (reference ``gpt_oss.py:231,285``)
- alternating sliding-window / full attention per ``config.layer_types``
  (reference ``gpt_oss.py:255-263``; HF windows are inclusive of the
  current token, which matches our kernels' convention directly)
- YaRN rope, q/k/v/o biases, RMS norm, untied lm_head

Checkpoint layout is HF gpt-oss: dense per-layer expert tensors
``mlp.experts.gate_up_proj`` [E, H, 2I] with gate/linear INTERLEAVED on
the last axis (de-interleaved to gate|up concat at load), plus expert
biases, ``mlp.router.{weight,bias}`` and ``self_attn.sinks``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_fluentllm_tpu.config.model_config import ModelConfig
from sglang_fluentllm_tpu.models.registry import register
from sglang_fluentllm_tpu.ops.layernorm import rms_norm
from sglang_fluentllm_tpu.ops.moe.layer import moe_forward
from sglang_fluentllm_tpu.ops.rotary import RotaryEmbedding, apply_rope
from sglang_fluentllm_tpu.runtime.forward_batch import ForwardBatch


@register("GptOssForCausalLM")
class GptOssForCausalLM:
    has_qkv_bias = True

    def __init__(self, config: ModelConfig, attn_backend):
        self.config = config
        self.attn = attn_backend
        self.sm_scale = config.head_dim ** -0.5
        hf = config.hf_config
        self.rope = RotaryEmbedding(
            config.head_dim,
            max(config.context_length or 0, config.max_position_embeddings),
            config.rope_theta,
            config.rope_scaling,
        )
        self.use_gmm = jax.default_backend() == "tpu"
        self.ep_mesh = None
        self.ep_axis = "tp"
        self.act_alpha = float(hf.get("hidden_act_alpha", 1.702))
        self.act_limit = float(hf.get("swiglu_limit", 7.0))
        # per-layer window table: sliding layers use config.sliding_window
        # (inclusive semantics == ours), full layers use 0
        L = config.num_hidden_layers
        w = config.sliding_window or 0
        layer_types = hf.get("layer_types") or [
            "sliding_attention" if i % 2 == 0 else "full_attention"
            for i in range(L)
        ]
        self.windows = jnp.asarray(
            [w if t == "sliding_attention" else 0 for t in layer_types],
            jnp.int32,
        )

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        L, H = c.num_hidden_layers, c.hidden_size
        D, Hq, Hk = c.head_dim, c.num_attention_heads, c.num_key_value_heads
        # gpt-oss has no separate moe_intermediate_size; experts use
        # intermediate_size
        E = c.num_experts
        Im = c.moe_intermediate_size or c.intermediate_size
        layers: Dict[str, Any] = {
            "input_layernorm": (L, H),
            "post_attention_layernorm": (L, H),
            "q_proj": (L, H, Hq * D),
            "k_proj": (L, H, Hk * D),
            "v_proj": (L, H, Hk * D),
            "o_proj": (L, Hq * D, H),
            "q_bias": (L, Hq * D),
            "k_bias": (L, Hk * D),
            "v_bias": (L, Hk * D),
            "o_bias": (L, H),
            "sinks": (L, Hq),
            "router": (L, H, E),
            "router_bias": (L, E),
            "w_gate_up": (L, E, H, 2 * Im),
            "w_down": (L, E, Im, H),
            "b_gate_up": (L, E, 2 * Im),
            "b_down": (L, E, H),
        }
        shapes = {
            "embed_tokens": (c.vocab_size, H),
            "layers": layers,
            "norm": (H,),
        }
        if not c.tie_word_embeddings:
            shapes["lm_head"] = (H, c.vocab_size)
        return shapes

    def param_specs(self) -> Dict[str, Any]:
        c = self.config
        layers = {
            "input_layernorm": P(), "post_attention_layernorm": P(),
            "q_proj": P(None, None, "tp"), "k_proj": P(None, None, "tp"),
            "v_proj": P(None, None, "tp"), "o_proj": P(None, "tp", None),
            "q_bias": P(None, "tp"), "k_bias": P(None, "tp"),
            "v_bias": P(None, "tp"), "o_bias": P(),
            "sinks": P(None, "tp"),
            "router": P(), "router_bias": P(),
            "w_gate_up": P(None, "tp", None, None),
            "w_down": P(None, "tp", None, None),
            "b_gate_up": P(None, "tp", None),
            "b_down": P(None, "tp", None),
        }
        specs = {"embed_tokens": P("tp", None), "layers": layers,
                 "norm": P()}
        if not c.tie_word_embeddings:
            specs["lm_head"] = P(None, "tp")
        return specs

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16):
        rng = np.random.RandomState(seed)

        def build(tree):
            if isinstance(tree, dict):
                return {k: build(v) for k, v in tree.items()}
            return jnp.asarray(
                rng.standard_normal(tree).astype(np.float32) * 0.02,
                dtype=dtype)

        params = build(self.param_shapes())
        params["norm"] = jnp.ones_like(params["norm"])
        for k in ("input_layernorm", "post_attention_layernorm"):
            params["layers"][k] = jnp.ones_like(params["layers"][k])
        return params

    # ------------------------------------------------------------------
    def _moe(self, lp, x2d):
        c = self.config
        logits = x2d @ lp["router"] + lp["router_bias"]
        return moe_forward(
            x2d, logits, lp["w_gate_up"], lp["w_down"], c,
            use_gmm=self.use_gmm,
            b_gate_up=lp["b_gate_up"], b_down=lp["b_down"],
            activation="swiglu_oai",
            act_alpha=self.act_alpha, act_limit=self.act_limit,
        )

    def forward(self, params, kv_cache, batch: ForwardBatch):
        c = self.config
        B, S = batch.input_ids.shape
        Hq, Hk, D = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        eps = c.rms_norm_eps
        h = jnp.take(params["embed_tokens"], batch.input_ids, axis=0)
        cos = self.rope.cos[batch.positions]
        sin = self.rope.sin[batch.positions]

        def layer_fn(carry, xs):
            h, kv_cache = carry
            lp, layer_id = xs
            normed = rms_norm(h, lp["input_layernorm"], eps)
            q = (normed @ lp["q_proj"] + lp["q_bias"]).reshape(B, S, Hq, D)
            k = (normed @ lp["k_proj"] + lp["k_bias"]).reshape(B, S, Hk, D)
            v = (normed @ lp["v_proj"] + lp["v_bias"]).reshape(B, S, Hk, D)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            attn_out, kv_cache = self.attn(
                kv_cache, layer_id, q, k, v, batch, self.sm_scale,
                window=self.windows[layer_id], sinks=lp["sinks"],
            )
            h = h + (attn_out.reshape(B, S, Hq * D) @ lp["o_proj"]
                     + lp["o_bias"])
            normed2 = rms_norm(h, lp["post_attention_layernorm"], eps)
            moe_out = self._moe(lp, normed2.reshape(B * S, -1))
            h = h + moe_out.reshape(B, S, -1)
            return (h, kv_cache), None

        (h, kv_cache), _ = jax.lax.scan(
            layer_fn, (h, kv_cache),
            (params["layers"],
             jnp.arange(c.num_hidden_layers, dtype=jnp.int32)),
        )
        return kv_cache, rms_norm(h, params["norm"], eps)

    def compute_logits(self, params, hidden):
        w = (params["embed_tokens"].T if self.config.tie_word_embeddings
             else params["lm_head"])
        return (hidden @ w).astype(jnp.float32)

    # ------------------------------------------------------------------
    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        c = self.config
        L = c.num_hidden_layers
        st: Dict[int, Dict[str, Any]] = {i: {} for i in range(L)}
        top: Dict[str, Any] = {}

        def deinterleave(w):
            # HF stores gate/linear interleaved on the last axis; our
            # layout is gate|up concatenated
            return np.concatenate([w[..., 0::2], w[..., 1::2]], axis=-1)

        mapping = {
            "self_attn.q_proj.weight": ("q_proj", "T"),
            "self_attn.k_proj.weight": ("k_proj", "T"),
            "self_attn.v_proj.weight": ("v_proj", "T"),
            "self_attn.o_proj.weight": ("o_proj", "T"),
            "self_attn.q_proj.bias": ("q_bias", ""),
            "self_attn.k_proj.bias": ("k_bias", ""),
            "self_attn.v_proj.bias": ("v_bias", ""),
            "self_attn.o_proj.bias": ("o_bias", ""),
            "self_attn.sinks": ("sinks", ""),
            "input_layernorm.weight": ("input_layernorm", ""),
            "post_attention_layernorm.weight":
                ("post_attention_layernorm", ""),
            "mlp.router.weight": ("router", "T"),
            "mlp.router.bias": ("router_bias", ""),
            "mlp.experts.gate_up_proj": ("w_gate_up", "I"),
            "mlp.experts.gate_up_proj_bias": ("b_gate_up", "I"),
            "mlp.experts.down_proj": ("w_down", ""),
            "mlp.experts.down_proj_bias": ("b_down", ""),
        }
        for name, w in named_tensors:
            if name.startswith("model."):
                name = name[len("model."):]
            if name == "embed_tokens.weight":
                top["embed_tokens"] = w
            elif name == "norm.weight":
                top["norm"] = w
            elif name == "lm_head.weight":
                top["lm_head"] = w.T
            elif name.startswith("layers."):
                parts = name.split(".", 2)
                li = int(parts[1])
                if li >= L or parts[2] not in mapping:
                    continue
                key, op = mapping[parts[2]]
                if op == "T":
                    w = w.T
                elif op == "I":
                    w = deinterleave(w)
                st[li][key] = w

        params: Dict[str, Any] = {
            "embed_tokens": jnp.asarray(top["embed_tokens"], dtype=dtype),
            "norm": jnp.asarray(top["norm"], dtype=dtype),
            "layers": {},
        }
        if not c.tie_word_embeddings:
            params["lm_head"] = jnp.asarray(top["lm_head"], dtype=dtype)
        for k in self.param_shapes()["layers"]:
            missing = [i for i in range(L) if k not in st[i]]
            if missing:
                raise ValueError(f"missing weights for {k}: {missing}")
            params["layers"][k] = jnp.asarray(
                np.stack([st[i][k] for i in range(L)]), dtype=dtype)
        return params
