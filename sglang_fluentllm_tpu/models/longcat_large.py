"""LongCat-Large (LlamaForCausalLMMoE) — llama GQA attention with
per-layer MoE.

Reference: ``srt/models/longcat_large.py`` (``LlamaForCausalLMMoE``):
standard llama decoder whose MLP is a softmax-routed MoE on layers where
``config.num_experts[layer]`` > 1 (the config carries a PER-LAYER expert
count list; None/<=1 entries are dense llama MLP layers). The router
runs in float32 (``router_dtype``).
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


@register("LlamaForCausalLMMoE")
class LlamaForCausalLMMoE:
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
        raw = hf.get("num_experts")
        L = config.num_hidden_layers
        if isinstance(raw, (list, tuple)):
            self.moe_ids = [i for i, e in enumerate(raw)
                            if e and e > 1]
        elif raw:
            self.moe_ids = list(range(L))
        else:
            self.moe_ids = []
        self.dense_ids = [i for i in range(L) if i not in set(self.moe_ids)]
        self.qkv_bias = bool(config.attention_bias or hf.get("bias"))

    # ------------------------------------------------------------------
    def _attn_shapes(self, c):
        H = c.hidden_size
        D, Hq, Hk = c.head_dim, c.num_attention_heads, c.num_key_value_heads
        d = {
            "input_layernorm": (H,),
            "post_attention_layernorm": (H,),
            "q_proj": (H, Hq * D), "k_proj": (H, Hk * D),
            "v_proj": (H, Hk * D), "o_proj": (Hq * D, H),
        }
        if self.qkv_bias:
            d.update({"q_bias": (Hq * D,), "k_bias": (Hk * D,),
                      "v_bias": (Hk * D,)})
        return d

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        H, I = c.hidden_size, c.intermediate_size
        E = c.num_experts
        dense = dict(self._attn_shapes(c))
        dense.update({"gate_proj": (H, I), "up_proj": (H, I),
                      "down_proj": (I, H)})
        moe = dict(self._attn_shapes(c))
        Im = c.moe_intermediate_size or I
        moe.update({
            "router": (H, E + c.num_zero_experts),
            "w_gate_up": (E, H, 2 * Im),
            "w_down": (E, Im, H),
        })
        shapes: Dict[str, Any] = {
            "embed_tokens": (c.vocab_size, H), "norm": (H,),
        }
        if self.dense_ids:
            shapes["dense_layers"] = {
                k: (len(self.dense_ids),) + v for k, v in dense.items()
            }
        if self.moe_ids:
            shapes["moe_layers"] = {
                k: (len(self.moe_ids),) + v for k, v in moe.items()
            }
        if not c.tie_word_embeddings:
            shapes["lm_head"] = (H, c.vocab_size)
        return shapes

    def param_specs(self) -> Dict[str, Any]:
        c = self.config
        shapes = self.param_shapes()
        moe_specs = {
            "w_gate_up": P(None, "tp", None, None),
            "w_down": P(None, "tp", None, None),
        }
        specs: Dict[str, Any] = {
            "embed_tokens": P("tp", None), "norm": P(),
        }
        for grp in ("dense_layers", "moe_layers"):
            if grp in shapes:
                specs[grp] = {k: moe_specs.get(k, P())
                              for k in shapes[grp]}
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
        for grp in ("dense_layers", "moe_layers"):
            if grp in params:
                for k in params[grp]:
                    if "layernorm" in k:
                        params[grp][k] = jnp.ones_like(params[grp][k])
        return params

    # ------------------------------------------------------------------
    def _attend(self, lp, normed, kv_cache, layer_id, batch, cos, sin):
        c = self.config
        B, S = normed.shape[:2]
        Hq, Hk, D = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        q = normed @ lp["q_proj"]
        k = normed @ lp["k_proj"]
        v = normed @ lp["v_proj"]
        if self.qkv_bias:
            q = q + lp["q_bias"]
            k = k + lp["k_bias"]
            v = v + lp["v_bias"]
        q = apply_rope(q.reshape(B, S, Hq, D), cos, sin)
        k = apply_rope(k.reshape(B, S, Hk, D), cos, sin)
        v = v.reshape(B, S, Hk, D)
        out, kv_cache = self.attn(
            kv_cache, layer_id, q, k, v, batch, self.sm_scale
        )
        return out.reshape(B, S, Hq * D) @ lp["o_proj"], kv_cache

    def forward(self, params, kv_cache, batch: ForwardBatch):
        c = self.config
        eps = c.rms_norm_eps
        B, S = batch.input_ids.shape
        h = jnp.take(params["embed_tokens"], batch.input_ids, axis=0)
        cos = self.rope.cos[batch.positions]
        sin = self.rope.sin[batch.positions]
        moe_set = set(self.moe_ids)
        di = mi = 0
        for i in range(c.num_hidden_layers):
            if i in moe_set:
                lp = jax.tree.map(
                    lambda x, j=mi: x[j], params["moe_layers"])
                mi += 1
            else:
                lp = jax.tree.map(
                    lambda x, j=di: x[j], params["dense_layers"])
                di += 1
            normed = rms_norm(h, lp["input_layernorm"], eps)
            attn_out, kv_cache = self._attend(
                lp, normed, kv_cache, i, batch, cos, sin)
            h = h + attn_out
            normed2 = rms_norm(h, lp["post_attention_layernorm"], eps)
            if i in moe_set:
                flat = normed2.reshape(B * S, -1)
                # router in f32 (config.router_dtype)
                logits = flat.astype(jnp.float32) @ lp["router"].astype(
                    jnp.float32)
                from sglang_fluentllm_tpu.ops.moe.layer import (
                    model_moe_forward,
                )

                out = model_moe_forward(
                    self, flat, logits, lp["w_gate_up"], lp["w_down"], c,
                )
                h = h + out.reshape(B, S, -1)
            else:
                h = h + (jax.nn.silu(normed2 @ lp["gate_proj"])
                         * (normed2 @ lp["up_proj"])) @ lp["down_proj"]
        return kv_cache, rms_norm(h, params["norm"], eps)

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
        mapping = {
            "self_attn.q_proj.weight": ("q_proj", True),
            "self_attn.k_proj.weight": ("k_proj", True),
            "self_attn.v_proj.weight": ("v_proj", True),
            "self_attn.o_proj.weight": ("o_proj", True),
            "self_attn.q_proj.bias": ("q_bias", False),
            "self_attn.k_proj.bias": ("k_bias", False),
            "self_attn.v_proj.bias": ("v_bias", False),
            "input_layernorm.weight": ("input_layernorm", False),
            "post_attention_layernorm.weight":
                ("post_attention_layernorm", False),
            "mlp.gate.weight": ("router", True),
            "mlp.gate_proj.weight": ("gate_proj", True),
            "mlp.up_proj.weight": ("up_proj", True),
            "mlp.down_proj.weight": ("down_proj", True),
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
                elif rest.startswith("mlp.experts."):
                    e = int(parts[4])
                    experts[li].setdefault(e, {})[parts[5]] = w
        for li in self.moe_ids:
            emap = experts[li]
            st[li]["w_gate_up"] = np.stack([
                np.concatenate([emap[e]["gate_proj"].T,
                                emap[e]["up_proj"].T], axis=1)
                for e in range(E)])
            st[li]["w_down"] = np.stack(
                [emap[e]["down_proj"].T for e in range(E)])

        shapes = self.param_shapes()
        params: Dict[str, Any] = {
            "embed_tokens": jnp.asarray(top["embed_tokens"], dtype=dtype),
            "norm": jnp.asarray(top["norm"], dtype=dtype),
        }
        if not c.tie_word_embeddings:
            params["lm_head"] = jnp.asarray(top["lm_head"], dtype=dtype)
        for grp, ids in (("dense_layers", self.dense_ids),
                         ("moe_layers", self.moe_ids)):
            if not ids:
                continue
            params[grp] = {
                k: jnp.asarray(
                    np.stack([st[i][k] for i in ids]), dtype=dtype)
                for k in shapes[grp]
            }
        return params
