"""DeepSeek-MHA-NSA: deepseek MoE stack over GQA native sparse attention.

Reference: ``srt/models/deepseek_mha_nsa.py`` (``DeepseekMhaNsaForCausalLM``):
standard GQA attention (fused qkv checkpoint) routed through the NSA
three-branch kernels, with the DeepSeek MoE MLP family
(first_k_dense_replace dense layers, sigmoid/noaux routing, shared
experts). The NSA branch math lives in ``ops/attention/nsa.py``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_fluentllm_tpu.config.model_config import ModelConfig
from sglang_fluentllm_tpu.models.registry import register
from sglang_fluentllm_tpu.ops.attention.nsa import (
    NSAAttentionBackend,
    NSAParams,
)
from sglang_fluentllm_tpu.ops.layernorm import rms_norm
from sglang_fluentllm_tpu.ops.moe.layer import moe_forward
from sglang_fluentllm_tpu.ops.moe.topk import select_experts  # noqa: F401
from sglang_fluentllm_tpu.ops.rotary import RotaryEmbedding, apply_rope
from sglang_fluentllm_tpu.runtime.forward_batch import ForwardBatch


@register("DeepseekMhaNsaForCausalLM")
class DeepseekMhaNsaForCausalLM:
    def __init__(self, config: ModelConfig, attn_backend):
        self.config = config
        c = config
        hf = c.hf_config
        self.sm_scale = c.head_dim ** -0.5
        self.rope = RotaryEmbedding(
            c.head_dim,
            max(c.context_length or 0, c.max_position_embeddings),
            c.rope_theta,
            c.rope_scaling,
        )
        self.attn = NSAAttentionBackend()
        self.nsa_kernel = hf.get("kernel_size", 32)
        self.nsa_stride = hf.get("stride", 16)
        self.nsa_select = hf.get("select_size", 64)
        self.nsa_top_n = hf.get("top_n", 16)
        self.nsa_init = hf.get("slc_att_num_init_blocks", 1)
        self.nsa_local = hf.get("slc_att_num_local_blocks", 2)
        self.nsa_window = hf.get("window_size", 512)
        self.use_gmm = jax.default_backend() == "tpu"
        self.ep_mesh = None
        self.ep_axis = "tp"
        self.n_dense = (c.first_k_dense_replace if c.is_moe
                        else c.num_hidden_layers)
        self.n_moe = c.num_hidden_layers - self.n_dense

    # ------------------------------------------------------------------
    def _attn_shapes(self, c):
        H = c.hidden_size
        D, Hq, Hk = c.head_dim, c.num_attention_heads, c.num_key_value_heads
        K = self.nsa_kernel
        return {
            "input_layernorm": (H,),
            "post_attention_layernorm": (H,),
            "q_proj": (H, Hq * D), "k_proj": (H, Hk * D),
            "v_proj": (H, Hk * D), "o_proj": (Hq * D, H),
            "nsa_gate_k": (K * D, K),
            "nsa_gate_v": (K * D, K),
            "nsa_fusion": (Hq, 3, 3 * D),
        }

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        H, I = c.hidden_size, c.intermediate_size
        dense = dict(self._attn_shapes(c))
        dense.update({"gate_proj": (H, I), "up_proj": (H, I),
                      "down_proj": (I, H)})
        shapes: Dict[str, Any] = {
            "embed_tokens": (c.vocab_size, H), "norm": (H,),
        }
        if self.n_dense:
            shapes["dense_layers"] = {
                k: (self.n_dense,) + v for k, v in dense.items()
            }
        if self.n_moe:
            E, Im = c.num_experts, c.moe_intermediate_size
            moe = dict(self._attn_shapes(c))
            moe.update({
                "router": (H, E),
                "w_gate_up": (E, H, 2 * Im),
                "w_down": (E, Im, H),
            })
            if c.topk_method == "noaux_tc":
                moe["correction_bias"] = (E,)
            if c.num_shared_experts:
                Is = Im * c.num_shared_experts
                moe.update({
                    "shared_gate_proj": (H, Is),
                    "shared_up_proj": (H, Is),
                    "shared_down_proj": (Is, H),
                })
            shapes["moe_layers"] = {
                k: (self.n_moe,) + v for k, v in moe.items()
            }
        if not c.tie_word_embeddings:
            shapes["lm_head"] = (H, c.vocab_size)
        return shapes

    def param_specs(self) -> Dict[str, Any]:
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
        if "lm_head" in shapes:
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
            if grp not in params:
                continue
            for k in params[grp]:
                if "layernorm" in k:
                    params[grp][k] = jnp.ones_like(params[grp][k])
                if k == "correction_bias":
                    params[grp][k] = jnp.zeros_like(
                        params[grp][k]).astype(jnp.float32)
        return params

    # ------------------------------------------------------------------
    def _attend(self, lp, normed, kv_cache, layer_id, batch, cos, sin):
        c = self.config
        B, S = normed.shape[:2]
        Hq, Hk, D = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        q = apply_rope(
            (normed @ lp["q_proj"]).reshape(B, S, Hq, D), cos, sin)
        k = apply_rope(
            (normed @ lp["k_proj"]).reshape(B, S, Hk, D), cos, sin)
        v = (normed @ lp["v_proj"]).reshape(B, S, Hk, D)
        out, kv_cache = self.attn(
            kv_cache, layer_id, q, k, v, batch, self.sm_scale,
            nsa=NSAParams(gate_k=lp["nsa_gate_k"],
                          gate_v=lp["nsa_gate_v"],
                          fusion_w=lp["nsa_fusion"]),
            kernel=self.nsa_kernel, stride=self.nsa_stride,
            select_size=self.nsa_select, top_n=self.nsa_top_n,
            n_init=self.nsa_init, n_local=self.nsa_local,
            window=self.nsa_window,
        )
        return out.reshape(B, S, Hq * D) @ lp["o_proj"], kv_cache

    def _moe_mlp(self, lp, x2d):
        c = self.config
        logits = x2d.astype(jnp.float32) @ lp["router"].astype(jnp.float32)
        out = moe_forward(
            x2d, logits, lp["w_gate_up"], lp["w_down"], c,
            correction_bias=lp.get("correction_bias"),
            use_gmm=self.use_gmm,
        )
        if c.num_shared_experts:
            out = out + (jax.nn.silu(x2d @ lp["shared_gate_proj"])
                         * (x2d @ lp["shared_up_proj"])
                         ) @ lp["shared_down_proj"]
        return out

    def forward(self, params, kv_cache, batch: ForwardBatch):
        c = self.config
        eps = c.rms_norm_eps
        B, S = batch.input_ids.shape
        h = jnp.take(params["embed_tokens"], batch.input_ids, axis=0)
        cos = self.rope.cos[batch.positions]
        sin = self.rope.sin[batch.positions]
        for i in range(c.num_hidden_layers):
            if i < self.n_dense:
                lp = jax.tree.map(
                    lambda x, j=i: x[j], params["dense_layers"])
            else:
                lp = jax.tree.map(
                    lambda x, j=i - self.n_dense: x[j],
                    params["moe_layers"])
            normed = rms_norm(h, lp["input_layernorm"], eps)
            attn_out, kv_cache = self._attend(
                lp, normed, kv_cache, i, batch, cos, sin)
            h = h + attn_out
            normed2 = rms_norm(h, lp["post_attention_layernorm"], eps)
            if i < self.n_dense:
                h = h + (jax.nn.silu(normed2 @ lp["gate_proj"])
                         * (normed2 @ lp["up_proj"])) @ lp["down_proj"]
            else:
                h = h + self._moe_mlp(
                    lp, normed2.reshape(B * S, -1)).reshape(B, S, -1)
        return kv_cache, rms_norm(h, params["norm"], eps)

    def compute_logits(self, params, hidden):
        w = (params["embed_tokens"].T if self.config.tie_word_embeddings
             else params["lm_head"])
        return (hidden @ w).astype(jnp.float32)

    # ------------------------------------------------------------------
    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        c = self.config
        L, E = c.num_hidden_layers, c.num_experts
        D, Hq, Hk = c.head_dim, c.num_attention_heads, c.num_key_value_heads
        st: Dict[int, Dict[str, Any]] = {i: {} for i in range(L)}
        experts: Dict[int, Dict[int, Dict[str, np.ndarray]]] = {
            i: {} for i in range(L)}
        top: Dict[str, Any] = {}
        mapping = {
            "self_attn.q_proj.weight": ("q_proj", True),
            "self_attn.k_proj.weight": ("k_proj", True),
            "self_attn.v_proj.weight": ("v_proj", True),
            "self_attn.o_proj.weight": ("o_proj", True),
            "input_layernorm.weight": ("input_layernorm", False),
            "post_attention_layernorm.weight":
                ("post_attention_layernorm", False),
            "mlp.gate.weight": ("router", True),
            "mlp.gate.e_score_correction_bias": ("correction_bias", False),
            "mlp.gate_proj.weight": ("gate_proj", True),
            "mlp.up_proj.weight": ("up_proj", True),
            "mlp.down_proj.weight": ("down_proj", True),
            "mlp.shared_experts.gate_proj.weight":
                ("shared_gate_proj", True),
            "mlp.shared_experts.up_proj.weight": ("shared_up_proj", True),
            "mlp.shared_experts.down_proj.weight":
                ("shared_down_proj", True),
            "self_attn.attn.compress_attn.compress_key.gate_proj.weight":
                ("nsa_gate_k", True),
            "self_attn.attn.compress_attn.compress_value.gate_proj.weight":
                ("nsa_gate_v", True),
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
                if rest == "self_attn.qkv_proj.weight":
                    wt = np.asarray(w).T
                    qd, kd = Hq * D, Hk * D
                    st[li]["q_proj"] = wt[:, :qd]
                    st[li]["k_proj"] = wt[:, qd:qd + kd]
                    st[li]["v_proj"] = wt[:, qd + kd:]
                elif rest.endswith("attn.gate_fusion.gate_weight.weight"):
                    st[li]["nsa_fusion"] = np.asarray(w).reshape(
                        Hq, 3, 3 * D)
                elif rest in mapping:
                    key, tr = mapping[rest]
                    st[li][key] = np.asarray(w).T if tr else w
                elif rest.startswith("mlp.experts."):
                    e = int(parts[4])
                    experts[li].setdefault(e, {})[parts[5]] = w
        for li in range(self.n_dense, L):
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
        groups = []
        if self.n_dense:
            groups.append(("dense_layers", range(self.n_dense)))
        if self.n_moe:
            groups.append(("moe_layers", range(self.n_dense, L)))
        for grp, ids in groups:
            params[grp] = {}
            for k in shapes[grp]:
                mats = [st[i][k] for i in ids]
                params[grp][k] = jnp.asarray(
                    np.stack(mats),
                    dtype=jnp.float32 if k == "correction_bias"
                    else dtype)
        return params
