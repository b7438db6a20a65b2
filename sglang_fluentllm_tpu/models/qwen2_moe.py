"""Qwen2-MoE / Qwen3-MoE causal LMs.

Parity targets: reference ``srt/models/qwen2_moe.py`` / ``qwen3_moe.py``.
Qwen2-MoE: llama-style attention (qkv bias), MoE MLP with softmax router
(norm_topk_prob) + a shared expert gated by sigmoid(shared_expert_gate).
Qwen3-MoE: q/k per-head RMSNorm, no qkv bias, no shared expert.
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


@register("Qwen2MoeForCausalLM")
class Qwen2MoeForCausalLM:
    has_qkv_bias = True
    has_qk_norm = False
    has_shared_expert = True

    def __init__(self, config: ModelConfig, attn_backend):
        self.config = config
        self.attn = attn_backend
        self.sm_scale = config.head_dim ** -0.5
        self.rope = RotaryEmbedding(
            config.head_dim,
            max(config.context_length or 0, config.max_position_embeddings),
            config.rope_theta,
            config.rope_scaling,
        )
        self.use_gmm = jax.default_backend() == "tpu"
        self.ep_mesh = None
        self.ep_axis = "tp"
        hf = config.hf_config
        self.shared_I = hf.get("shared_expert_intermediate_size",
                               config.intermediate_size)

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        L, H = c.num_hidden_layers, c.hidden_size
        D, Hq, Hk = c.head_dim, c.num_attention_heads, c.num_key_value_heads
        E, Im = c.num_experts, c.moe_intermediate_size
        layers: Dict[str, Any] = {
            "input_layernorm": (L, H),
            "post_attention_layernorm": (L, H),
            "q_proj": (L, H, Hq * D),
            "k_proj": (L, H, Hk * D),
            "v_proj": (L, H, Hk * D),
            "o_proj": (L, Hq * D, H),
            "router": (L, H, E),
            "w_gate_up": (L, E, H, 2 * Im),
            "w_down": (L, E, Im, H),
        }
        if self.has_qkv_bias:
            layers.update({"q_bias": (L, Hq * D), "k_bias": (L, Hk * D),
                           "v_bias": (L, Hk * D)})
        if self.has_qk_norm:
            layers.update({"q_norm": (L, D), "k_norm": (L, D)})
        if self.has_shared_expert:
            layers.update({
                "shared_gate_up": (L, H, 2 * self.shared_I),
                "shared_down": (L, self.shared_I, H),
                "shared_gate": (L, H, 1),
            })
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
            "router": P(),
            "w_gate_up": P(None, "tp", None, None),
            "w_down": P(None, "tp", None, None),
        }
        if self.has_qkv_bias:
            layers.update({"q_bias": P(None, "tp"), "k_bias": P(None, "tp"),
                           "v_bias": P(None, "tp")})
        if self.has_qk_norm:
            layers.update({"q_norm": P(), "k_norm": P()})
        if self.has_shared_expert:
            layers.update({
                "shared_gate_up": P(None, None, "tp"),
                "shared_down": P(None, "tp", None),
                "shared_gate": P(),
            })
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
            if "layernorm" in k or k in ("q_norm", "k_norm"):
                params["layers"][k] = jnp.ones_like(params["layers"][k])
        return params

    # ------------------------------------------------------------------
    def _moe(self, lp, x2d):
        c = self.config
        logits = x2d @ lp["router"]
        from sglang_fluentllm_tpu.ops.moe.layer import model_moe_forward

        out = model_moe_forward(
            self, x2d, logits, lp["w_gate_up"], lp["w_down"], c,
        )
        if self.has_shared_expert:
            h = x2d @ lp["shared_gate_up"]
            g, u = jnp.split(h, 2, axis=-1)
            shared = (jax.nn.silu(g) * u) @ lp["shared_down"]
            gate = jax.nn.sigmoid(x2d @ lp["shared_gate"])
            out = out + gate * shared
        return out

    def eagle3_capture_ids(self):
        """EAGLE-3 default capture layers (reference qwen3_moe.py supports
        capture_aux_hidden_states; recipe from llama.py:713)."""
        L = self.config.num_hidden_layers
        return tuple(sorted({min(max(i, 1), L) for i in (2, L // 2, L - 3)}))

    def forward(self, params, kv_cache, batch: ForwardBatch):
        kv_cache, h, _ = self._forward_tower(params, kv_cache, batch, None)
        return kv_cache, h

    def forward_with_aux(self, params, kv_cache, batch: ForwardBatch,
                         capture_ids):
        return self._forward_tower(params, kv_cache, batch,
                                   tuple(capture_ids))

    def _forward_tower(self, params, kv_cache, batch: ForwardBatch,
                       capture_ids):
        c = self.config
        B, S = batch.input_ids.shape
        Hq, Hk, D = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        eps = c.rms_norm_eps
        h = jnp.take(params["embed_tokens"], batch.input_ids, axis=0)
        cos = self.rope.cos[batch.positions]
        sin = self.rope.sin[batch.positions]
        cap_arr = (jnp.asarray(capture_ids, jnp.int32)
                   if capture_ids else None)
        aux0 = (jnp.zeros((len(capture_ids), B, S, c.hidden_size), h.dtype)
                if capture_ids else jnp.zeros((), h.dtype))

        def layer_fn(carry, xs):
            h, kv_cache, aux = carry
            lp, layer_id = xs
            normed = rms_norm(h, lp["input_layernorm"], eps)
            q = normed @ lp["q_proj"]
            k = normed @ lp["k_proj"]
            v = normed @ lp["v_proj"]
            if self.has_qkv_bias:
                q = q + lp["q_bias"]
                k = k + lp["k_bias"]
                v = v + lp["v_bias"]
            q = q.reshape(B, S, Hq, D)
            k = k.reshape(B, S, Hk, D)
            v = v.reshape(B, S, Hk, D)
            if self.has_qk_norm:
                q = rms_norm(q, lp["q_norm"], eps)
                k = rms_norm(k, lp["k_norm"], eps)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            attn_out, kv_cache = self.attn(
                kv_cache, layer_id, q, k, v, batch, self.sm_scale
            )
            h = h + attn_out.reshape(B, S, Hq * D) @ lp["o_proj"]
            normed2 = rms_norm(h, lp["post_attention_layernorm"], eps)
            moe_out = self._moe(lp, normed2.reshape(B * S, -1))
            h = h + moe_out.reshape(B, S, -1)
            if cap_arr is not None:
                sel = (cap_arr == layer_id + 1).astype(aux.dtype)
                aux = aux + sel[:, None, None, None] * h[None]
            return (h, kv_cache, aux), None

        (h, kv_cache, aux), _ = jax.lax.scan(
            layer_fn, (h, kv_cache, aux0),
            (params["layers"],
             jnp.arange(c.num_hidden_layers, dtype=jnp.int32)),
        )
        if capture_ids:
            aux = aux.transpose(1, 2, 0, 3).reshape(
                B, S, len(capture_ids) * c.hidden_size)
        return kv_cache, rms_norm(h, params["norm"], eps), aux

    def compute_logits(self, params, hidden):
        w = (params["embed_tokens"].T if self.config.tie_word_embeddings
             else params["lm_head"])
        return (hidden @ w).astype(jnp.float32)

    # ------------------------------------------------------------------
    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        c = self.config
        L, E = c.num_hidden_layers, c.num_experts
        st: Dict[int, Dict[str, Any]] = {i: {} for i in range(L)}
        experts: Dict[int, Dict[int, Dict[str, np.ndarray]]] = {
            i: {} for i in range(L)}
        top: Dict[str, Any] = {}
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
                mapping = {
                    "self_attn.q_proj.weight": ("q_proj", True),
                    "self_attn.k_proj.weight": ("k_proj", True),
                    "self_attn.v_proj.weight": ("v_proj", True),
                    "self_attn.o_proj.weight": ("o_proj", True),
                    "self_attn.q_proj.bias": ("q_bias", False),
                    "self_attn.k_proj.bias": ("k_bias", False),
                    "self_attn.v_proj.bias": ("v_bias", False),
                    "self_attn.q_norm.weight": ("q_norm", False),
                    "self_attn.k_norm.weight": ("k_norm", False),
                    "input_layernorm.weight": ("input_layernorm", False),
                    "post_attention_layernorm.weight":
                        ("post_attention_layernorm", False),
                    "mlp.gate.weight": ("router", True),
                    "mlp.shared_expert_gate.weight": ("shared_gate", True),
                }
                if rest in mapping:
                    key, tr = mapping[rest]
                    st[li][key] = w.T if tr else w
                elif rest.startswith("mlp.shared_expert."):
                    sub = parts[4]
                    experts[li].setdefault("shared", {})[sub] = w
                elif rest.startswith("mlp.experts."):
                    e = int(parts[4])
                    experts[li].setdefault(e, {})[parts[5]] = w
        for li in range(L):
            emap = experts[li]
            st[li]["w_gate_up"] = np.stack([
                np.concatenate([emap[e]["gate_proj"].T,
                                emap[e]["up_proj"].T], axis=1)
                for e in range(E)])
            st[li]["w_down"] = np.stack(
                [emap[e]["down_proj"].T for e in range(E)])
            if self.has_shared_expert and "shared" in emap:
                sh = emap["shared"]
                st[li]["shared_gate_up"] = np.concatenate(
                    [sh["gate_proj"].T, sh["up_proj"].T], axis=1)
                st[li]["shared_down"] = sh["down_proj"].T

        shapes = self.param_shapes()
        params: Dict[str, Any] = {
            "embed_tokens": jnp.asarray(top["embed_tokens"], dtype=dtype),
            "norm": jnp.asarray(top["norm"], dtype=dtype),
            "layers": {},
        }
        if not c.tie_word_embeddings:
            params["lm_head"] = jnp.asarray(top["lm_head"], dtype=dtype)
        for k in shapes["layers"]:
            mats = [st[i][k] for i in range(L)]
            params["layers"][k] = jnp.asarray(np.stack(mats), dtype=dtype)
        return params


@register("Qwen3MoeForCausalLM")
class Qwen3MoeForCausalLM(Qwen2MoeForCausalLM):
    has_qkv_bias = False
    has_qk_norm = True
    has_shared_expert = False
