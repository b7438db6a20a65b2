"""Gemma / Gemma2 causal LMs.

Parity targets: reference ``srt/models/gemma.py`` / ``gemma2.py``.
Gemma family specifics: embeddings scaled by sqrt(hidden), tied lm_head,
RMSNorm with unit offset (w + 1), gelu_pytorch_tanh MLP. Gemma2 adds
pre/post-FFN norms, post-attention norm placement, attention logit
soft-capping, final logit soft-capping, and query_pre_attn_scalar.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_fluentllm_tpu.config.model_config import ModelConfig
from sglang_fluentllm_tpu.models.registry import register
from sglang_fluentllm_tpu.ops.rotary import RotaryEmbedding, apply_rope
from sglang_fluentllm_tpu.runtime.forward_batch import ForwardBatch


def gemma_rms_norm(x, weight, eps):
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    out = x32 * jax.lax.rsqrt(var + eps)
    return (out * (1.0 + weight.astype(jnp.float32))).astype(dtype)


@register("GemmaForCausalLM")
class GemmaForCausalLM:
    is_gemma2 = False

    def __init__(self, config: ModelConfig, attn_backend):
        self.config = config
        self.attn = attn_backend
        hf = config.hf_config
        qpas = hf.get("query_pre_attn_scalar")
        self.sm_scale = (
            qpas ** -0.5 if qpas else config.head_dim ** -0.5
        )
        self.attn_logit_cap = hf.get("attn_logit_softcapping", 0.0) or 0.0
        self.final_logit_cap = hf.get("final_logit_softcapping", 0.0) or 0.0
        # gemma2 interleaves sliding-window layers (even idx) with full
        # attention layers (reference srt/models/gemma2.py sliding pattern)
        w = config.sliding_window or 0
        if self.is_gemma2 and w:
            self.windows = jnp.asarray(
                [w if i % 2 == 0 else 0
                 for i in range(config.num_hidden_layers)], jnp.int32,
            )
        else:
            self.windows = None
        self.rope = RotaryEmbedding(
            config.head_dim,
            max(config.context_length or 0, config.max_position_embeddings),
            config.rope_theta,
            config.rope_scaling,
        )

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        L, H = c.num_hidden_layers, c.hidden_size
        D, Hq, Hk = c.head_dim, c.num_attention_heads, c.num_key_value_heads
        I = c.intermediate_size
        layers = {
            "input_layernorm": (L, H),
            "post_attention_layernorm": (L, H),
            "q_proj": (L, H, Hq * D),
            "k_proj": (L, H, Hk * D),
            "v_proj": (L, H, Hk * D),
            "o_proj": (L, Hq * D, H),
            "gate_proj": (L, H, I),
            "up_proj": (L, H, I),
            "down_proj": (L, I, H),
        }
        if self.is_gemma2:
            layers["pre_feedforward_layernorm"] = (L, H)
            layers["post_feedforward_layernorm"] = (L, H)
        return {
            "embed_tokens": (c.vocab_size, H),
            "layers": layers,
            "norm": (H,),
        }

    def param_specs(self) -> Dict[str, Any]:
        layers = {
            "input_layernorm": P(), "post_attention_layernorm": P(),
            "q_proj": P(None, None, "tp"), "k_proj": P(None, None, "tp"),
            "v_proj": P(None, None, "tp"), "o_proj": P(None, "tp", None),
            "gate_proj": P(None, None, "tp"), "up_proj": P(None, None, "tp"),
            "down_proj": P(None, "tp", None),
        }
        if self.is_gemma2:
            layers["pre_feedforward_layernorm"] = P()
            layers["post_feedforward_layernorm"] = P()
        return {"embed_tokens": P("tp", None), "layers": layers,
                "norm": P()}

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16):
        rng = np.random.RandomState(seed)

        def build(tree):
            if isinstance(tree, dict):
                return {k: build(v) for k, v in tree.items()}
            return jnp.asarray(
                rng.standard_normal(tree).astype(np.float32) * 0.02,
                dtype=dtype)

        params = build(self.param_shapes())
        params["norm"] = jnp.zeros_like(params["norm"])  # unit offset
        for k in params["layers"]:
            if "layernorm" in k:
                params["layers"][k] = jnp.zeros_like(params["layers"][k])
        return params

    # ------------------------------------------------------------------
    def forward(self, params, kv_cache, batch: ForwardBatch):
        c = self.config
        B, S = batch.input_ids.shape
        Hq, Hk, D = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        eps = c.rms_norm_eps
        h = jnp.take(params["embed_tokens"], batch.input_ids, axis=0)
        h = h * jnp.asarray(
            math.sqrt(c.hidden_size), h.dtype
        )  # gemma embed scaling
        cos = self.rope.cos[batch.positions]
        sin = self.rope.sin[batch.positions]

        def layer_fn(carry, xs):
            h, kv_cache = carry
            lp, layer_id = xs
            normed = gemma_rms_norm(h, lp["input_layernorm"], eps)
            q = (normed @ lp["q_proj"]).reshape(B, S, Hq, D)
            k = (normed @ lp["k_proj"]).reshape(B, S, Hk, D)
            v = (normed @ lp["v_proj"]).reshape(B, S, Hk, D)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            attn_out, kv_cache = self.attn(
                kv_cache, layer_id, q, k, v, batch, self.sm_scale,
                self.attn_logit_cap,
                window=(self.windows[layer_id]
                        if self.windows is not None else None),
            )
            attn_out = attn_out.reshape(B, S, Hq * D) @ lp["o_proj"]
            if self.is_gemma2:
                attn_out = gemma_rms_norm(
                    attn_out, lp["post_attention_layernorm"], eps)
                h = h + attn_out
                x = gemma_rms_norm(
                    h, lp["pre_feedforward_layernorm"], eps)
            else:
                h = h + attn_out
                x = gemma_rms_norm(
                    h, lp["post_attention_layernorm"], eps)
            mlp = (jax.nn.gelu(x @ lp["gate_proj"], approximate=True)
                   * (x @ lp["up_proj"])) @ lp["down_proj"]
            if self.is_gemma2:
                mlp = gemma_rms_norm(
                    mlp, lp["post_feedforward_layernorm"], eps)
            h = h + mlp
            return (h, kv_cache), None

        (h, kv_cache), _ = jax.lax.scan(
            layer_fn, (h, kv_cache),
            (params["layers"],
             jnp.arange(c.num_hidden_layers, dtype=jnp.int32)),
        )
        return kv_cache, gemma_rms_norm(h, params["norm"], eps)

    def compute_logits(self, params, hidden):
        logits = (hidden @ params["embed_tokens"].T).astype(jnp.float32)
        if self.final_logit_cap > 0:
            logits = self.final_logit_cap * jnp.tanh(
                logits / self.final_logit_cap)
        return logits

    # ------------------------------------------------------------------
    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        c = self.config
        L = c.num_hidden_layers
        st: Dict[int, Dict[str, Any]] = {i: {} for i in range(L)}
        top: Dict[str, Any] = {}
        mapping = {
            "self_attn.q_proj.weight": ("q_proj", True),
            "self_attn.k_proj.weight": ("k_proj", True),
            "self_attn.v_proj.weight": ("v_proj", True),
            "self_attn.o_proj.weight": ("o_proj", True),
            "mlp.gate_proj.weight": ("gate_proj", True),
            "mlp.up_proj.weight": ("up_proj", True),
            "mlp.down_proj.weight": ("down_proj", True),
            "input_layernorm.weight": ("input_layernorm", False),
            "post_attention_layernorm.weight":
                ("post_attention_layernorm", False),
            "pre_feedforward_layernorm.weight":
                ("pre_feedforward_layernorm", False),
            "post_feedforward_layernorm.weight":
                ("post_feedforward_layernorm", False),
        }
        for name, w in named_tensors:
            if name.startswith("model."):
                name = name[len("model."):]
            if name == "embed_tokens.weight":
                top["embed_tokens"] = w
            elif name == "norm.weight":
                top["norm"] = w
            elif name.startswith("layers."):
                parts = name.split(".")
                li = int(parts[1])
                rest = ".".join(parts[2:])
                if li < L and rest in mapping:
                    key, tr = mapping[rest]
                    st[li][key] = w.T if tr else w
        params: Dict[str, Any] = {
            "embed_tokens": jnp.asarray(top["embed_tokens"], dtype=dtype),
            "norm": jnp.asarray(top["norm"], dtype=dtype),
            "layers": {},
        }
        for k in self.param_shapes()["layers"]:
            params["layers"][k] = jnp.asarray(
                np.stack([st[i][k] for i in range(L)]), dtype=dtype)
        return params


@register("Gemma2ForCausalLM")
class Gemma2ForCausalLM(GemmaForCausalLM):
    is_gemma2 = True
