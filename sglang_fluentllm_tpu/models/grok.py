"""Grok-1 (xAI) MoE causal LM.

Reference: ``srt/models/grok.py``. Distinctives: FOUR RMSNorms per layer
(pre/post attention and pre/post MoE, each residual adds the POST-normed
branch output), tanh logit softcapping on both attention scores and
router logits (30.0), GELU expert activation without top-k
renormalization, and embedding/output multiplier scales.
"""

from __future__ import annotations

import dataclasses
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


@register("Grok1ForCausalLM", "Grok1ModelForCausalLM")
class Grok1ForCausalLM:
    def __init__(self, config: ModelConfig, attn_backend):
        self.config = config
        self.attn = attn_backend
        c = config
        hf = c.hf_config
        self.sm_scale = c.head_dim ** -0.5
        self.attn_cap = float(hf.get("attn_logit_softcapping", 30.0) or 0)
        self.router_cap = float(
            hf.get("router_logit_softcapping", 30.0) or 0)
        self.emb_scale = float(hf.get("embedding_multiplier_scale", 1.0))
        self.out_scale = float(hf.get("output_multiplier_scale", 1.0))
        self.rope = RotaryEmbedding(
            c.head_dim,
            max(c.context_length or 0, c.max_position_embeddings),
            c.rope_theta,
            c.rope_scaling,
        )
        self.use_gmm = jax.default_backend() == "tpu"
        self.ep_mesh = None
        self.ep_axis = "tp"
        # grok routing: softmax, NO renormalization
        self.moe_config = dataclasses.replace(
            c, norm_topk_prob=False, scoring_func="softmax",
            topk_method="greedy",
        )

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        L, H = c.num_hidden_layers, c.hidden_size
        D, Hq, Hk = c.head_dim, c.num_attention_heads, c.num_key_value_heads
        E = c.num_experts
        Im = c.moe_intermediate_size or c.intermediate_size
        layers = {
            "pre_attn_norm": (L, H), "post_attn_norm": (L, H),
            "pre_moe_norm": (L, H), "post_moe_norm": (L, H),
            "q_proj": (L, H, Hq * D), "k_proj": (L, H, Hk * D),
            "v_proj": (L, H, Hk * D), "o_proj": (L, Hq * D, H),
            "router": (L, H, E),
            "w_gate_up": (L, E, H, 2 * Im),
            "w_down": (L, E, Im, H),
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
            "pre_attn_norm": P(), "post_attn_norm": P(),
            "pre_moe_norm": P(), "post_moe_norm": P(),
            "q_proj": P(None, None, "tp"), "k_proj": P(None, None, "tp"),
            "v_proj": P(None, None, "tp"), "o_proj": P(None, "tp", None),
            "router": P(),
            "w_gate_up": P(None, "tp", None, None),
            "w_down": P(None, "tp", None, None),
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
        for k in params["layers"]:
            if "norm" in k:
                params["layers"][k] = jnp.ones_like(params["layers"][k])
        return params

    # ------------------------------------------------------------------
    def forward(self, params, kv_cache, batch: ForwardBatch):
        c = self.config
        B, S = batch.input_ids.shape
        Hq, Hk, D = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        eps = c.rms_norm_eps
        h = jnp.take(params["embed_tokens"], batch.input_ids, axis=0) \
            * self.emb_scale
        cos = self.rope.cos[batch.positions]
        sin = self.rope.sin[batch.positions]

        def layer_fn(carry, xs):
            h, kv_cache = carry
            lp, layer_id = xs
            normed = rms_norm(h, lp["pre_attn_norm"], eps)
            q = apply_rope(
                (normed @ lp["q_proj"]).reshape(B, S, Hq, D), cos, sin)
            k = apply_rope(
                (normed @ lp["k_proj"]).reshape(B, S, Hk, D), cos, sin)
            v = (normed @ lp["v_proj"]).reshape(B, S, Hk, D)
            attn_out, kv_cache = self.attn(
                kv_cache, layer_id, q, k, v, batch, self.sm_scale,
                logit_cap=self.attn_cap,
            )
            attn_out = attn_out.reshape(B, S, Hq * D) @ lp["o_proj"]
            h = h + rms_norm(attn_out, lp["post_attn_norm"], eps)

            normed2 = rms_norm(h, lp["pre_moe_norm"], eps)
            flat = normed2.reshape(B * S, -1)
            logits = flat.astype(jnp.float32) @ lp["router"].astype(
                jnp.float32)
            if self.router_cap > 0:
                logits = self.router_cap * jnp.tanh(
                    logits / self.router_cap)
            moe_out = moe_forward(
                flat, logits, lp["w_gate_up"], lp["w_down"],
                self.moe_config, use_gmm=self.use_gmm,
                activation="gelu",
            ).reshape(B, S, -1)
            h = h + rms_norm(moe_out, lp["post_moe_norm"], eps)
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
        return (hidden @ w).astype(jnp.float32) * self.out_scale

    # ------------------------------------------------------------------
    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        c = self.config
        L, E = c.num_hidden_layers, c.num_experts
        st: Dict[int, Dict[str, Any]] = {i: {} for i in range(L)}
        experts: Dict[int, Dict[int, Dict[str, np.ndarray]]] = {
            i: {} for i in range(L)}
        top: Dict[str, Any] = {}
        mapping = {
            "attn.q_proj.weight": ("q_proj", True),
            "attn.k_proj.weight": ("k_proj", True),
            "attn.v_proj.weight": ("v_proj", True),
            "attn.o_proj.weight": ("o_proj", True),
            "self_attn.q_proj.weight": ("q_proj", True),
            "self_attn.k_proj.weight": ("k_proj", True),
            "self_attn.v_proj.weight": ("v_proj", True),
            "self_attn.o_proj.weight": ("o_proj", True),
            "pre_attn_norm.weight": ("pre_attn_norm", False),
            "post_attn_norm.weight": ("post_attn_norm", False),
            "pre_moe_norm.weight": ("pre_moe_norm", False),
            "post_moe_norm.weight": ("post_moe_norm", False),
            "block_sparse_moe.gate.weight": ("router", True),
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
                parts = name.split(".")
                li = int(parts[1])
                if li >= L:
                    continue
                rest = ".".join(parts[2:])
                if rest in mapping:
                    key, tr = mapping[rest]
                    st[li][key] = np.asarray(w).T if tr else w
                elif rest.startswith("block_sparse_moe.experts."):
                    e = int(parts[4])
                    # grok expert names: w1 (gate), w3 (up), w2 (down)
                    experts[li].setdefault(e, {})[parts[5]] = w
        for li in range(L):
            emap = experts[li]
            st[li]["w_gate_up"] = np.stack([
                np.concatenate([np.asarray(emap[e]["w1"]).T,
                                np.asarray(emap[e]["w3"]).T], axis=1)
                for e in range(E)])
            st[li]["w_down"] = np.stack(
                [np.asarray(emap[e]["w2"]).T for e in range(E)])

        shapes = self.param_shapes()
        params: Dict[str, Any] = {
            "embed_tokens": jnp.asarray(top["embed_tokens"], dtype=dtype),
            "norm": jnp.asarray(top["norm"], dtype=dtype),
            "layers": {},
        }
        if not c.tie_word_embeddings:
            params["lm_head"] = jnp.asarray(top["lm_head"], dtype=dtype)
        for k in shapes["layers"]:
            params["layers"][k] = jnp.asarray(
                np.stack([st[i][k] for i in range(L)]), dtype=dtype)
        return params
