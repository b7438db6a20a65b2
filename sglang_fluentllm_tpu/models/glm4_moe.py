"""GLM-4.5 / GLM-4-MoE (Glm4MoeForCausalLM) — TPU-native implementation.

Reference: ``srt/models/glm4_moe.py`` (DeepSeek-V3-style MoE over standard
GQA attention). Architecture notes (HF ``modeling_glm4_moe``):

- attention: GQA with optional qkv bias (``attention_bias``), optional
  per-head q/k RMSNorm (``use_qk_norm``), PARTIAL rotary
  (``partial_rotary_factor``, default 0.5) applied neox-style to the
  first ``rotary_dim`` dims
- first ``first_k_dense_replace`` layers use a dense MLP; the rest are
  MoE: sigmoid router scores + e_score_correction_bias for SELECTION
  only, top-2-sum group-limited top-k, weight normalization and
  ``routed_scaling_factor`` (exactly V3 noaux_tc — ``ops/moe/topk.py``),
  plus ``n_shared_experts`` always-on shared experts
- router logits computed in float32 (Glm4MoeTopkRouter.forward)

Checkpoint layout is HF: ``mlp.gate.weight`` [E, H] +
``mlp.gate.e_score_correction_bias``, per-expert
``mlp.experts.N.{gate,up,down}_proj``, shared
``mlp.shared_experts.{gate,up,down}_proj``.
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


@register("Glm4MoeForCausalLM")
class Glm4MoeForCausalLM:
    def __init__(self, config: ModelConfig, attn_backend):
        self.config = config
        self.attn = attn_backend
        self.sm_scale = config.head_dim ** -0.5
        hf = config.hf_config
        self.rotary_dim = int(
            config.head_dim * (config.partial_rotary_factor or 1.0)
        )
        self.rope = RotaryEmbedding(
            self.rotary_dim,
            max(config.context_length or 0, config.max_position_embeddings),
            config.rope_theta,
            config.rope_scaling,
        )
        self.use_qk_norm = bool(hf.get("use_qk_norm", False))
        self.qkv_bias = bool(config.attention_bias)
        self.use_gmm = jax.default_backend() == "tpu"
        self.ep_mesh = None
        self.ep_axis = "tp"
        self.expert_recorder = None
        self.ep_tables = None
        self.n_dense = min(
            config.first_k_dense_replace if config.is_moe
            else config.num_hidden_layers,
            config.num_hidden_layers,
        )
        self.n_moe = config.num_hidden_layers - self.n_dense

    # ------------------------------------------------------------------
    def _attn_shapes(self, c):
        D, Hq, Hk = c.head_dim, c.num_attention_heads, c.num_key_value_heads
        H = c.hidden_size
        d: Dict[str, Any] = {
            "input_layernorm": (H,),
            "post_attention_layernorm": (H,),
            "q_proj": (H, Hq * D),
            "k_proj": (H, Hk * D),
            "v_proj": (H, Hk * D),
            "o_proj": (Hq * D, H),
        }
        if self.qkv_bias:
            d.update({"q_bias": (Hq * D,), "k_bias": (Hk * D,),
                      "v_bias": (Hk * D,)})
        if self.use_qk_norm:
            d.update({"q_norm": (D,), "k_norm": (D,)})
        return d

    def _attn_specs(self):
        d = {
            "input_layernorm": P(), "post_attention_layernorm": P(),
            "q_proj": P(None, "tp"), "k_proj": P(None, "tp"),
            "v_proj": P(None, "tp"), "o_proj": P("tp", None),
        }
        if self.qkv_bias:
            d.update({"q_bias": P("tp"), "k_bias": P("tp"),
                      "v_bias": P("tp")})
        if self.use_qk_norm:
            d.update({"q_norm": P(), "k_norm": P()})
        return d

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        H, I = c.hidden_size, c.intermediate_size
        E, Im = c.num_experts, c.moe_intermediate_size
        dense = dict(self._attn_shapes(c))
        dense.update({
            "gate_proj": (H, I), "up_proj": (H, I), "down_proj": (I, H),
        })
        moe = dict(self._attn_shapes(c))
        moe.update({
            "router": (H, E),
            "correction_bias": (E,),
            "w_gate_up": (E, H, 2 * Im),
            "w_down": (E, Im, H),
        })
        if c.num_shared_experts:
            Is = Im * c.num_shared_experts
            moe.update({
                "shared_gate_proj": (H, Is),
                "shared_up_proj": (H, Is),
                "shared_down_proj": (Is, H),
            })

        def add_layer_axis(d, n):
            return {k: (n,) + v for k, v in d.items()}

        shapes: Dict[str, Any] = {
            "embed_tokens": (c.vocab_size, H),
            "norm": (H,),
        }
        if self.n_dense:
            shapes["dense_layers"] = add_layer_axis(dense, self.n_dense)
        if self.n_moe:
            shapes["moe_layers"] = add_layer_axis(moe, self.n_moe)
        if not c.tie_word_embeddings:
            shapes["lm_head"] = (H, c.vocab_size)
        return shapes

    def param_specs(self) -> Dict[str, Any]:
        c = self.config

        def add_layer_axis(d):
            return {k: P(*((None,) + tuple(s)))
                    for k, s in d.items()}

        attn = {k: tuple(v) for k, v in self._attn_specs().items()}
        dense = dict(attn)
        dense.update({
            "gate_proj": (None, "tp"), "up_proj": (None, "tp"),
            "down_proj": ("tp", None),
        })
        moe = dict(attn)
        moe.update({
            "router": (), "correction_bias": (),
            "w_gate_up": ("tp", None, None),
            "w_down": ("tp", None, None),
        })
        if c.num_shared_experts:
            moe.update({
                "shared_gate_proj": (None, "tp"),
                "shared_up_proj": (None, "tp"),
                "shared_down_proj": ("tp", None),
            })
        specs: Dict[str, Any] = {
            "embed_tokens": P("tp", None), "norm": P(),
        }
        if self.n_dense:
            specs["dense_layers"] = add_layer_axis(dense)
        if self.n_moe:
            specs["moe_layers"] = add_layer_axis(moe)
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
            if grp not in params:
                continue
            for k in params[grp]:
                if "layernorm" in k or k in ("q_norm", "k_norm"):
                    params[grp][k] = jnp.ones_like(params[grp][k])
                elif k == "correction_bias":
                    params[grp][k] = jnp.zeros_like(
                        params[grp][k]).astype(jnp.float32)
        return params

    # ------------------------------------------------------------------
    def _attn_block(self, lp, normed, kv_cache, layer_id, batch, cos, sin):
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
        q = q.reshape(B, S, Hq, D)
        k = k.reshape(B, S, Hk, D)
        v = v.reshape(B, S, Hk, D)
        if self.use_qk_norm:
            q = rms_norm(q, lp["q_norm"], c.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"], c.rms_norm_eps)
        # partial rotary: rotate the first rotary_dim dims only
        r = self.rotary_dim
        q = jnp.concatenate(
            [apply_rope(q[..., :r], cos, sin), q[..., r:]], axis=-1
        )
        k = jnp.concatenate(
            [apply_rope(k[..., :r], cos, sin), k[..., r:]], axis=-1
        )
        attn_out, kv_cache = self.attn(
            kv_cache, layer_id, q, k, v, batch, self.sm_scale
        )
        return attn_out.reshape(B, S, Hq * D) @ lp["o_proj"], kv_cache

    def _moe_mlp(self, lp, x, layer_id=None):
        c = self.config
        B, S, H = x.shape
        flat = x.reshape(B * S, H)
        # router in f32 (Glm4MoeTopkRouter.forward)
        logits = flat.astype(jnp.float32) @ lp["router"].astype(jnp.float32)
        if self.expert_recorder is not None and layer_id is not None:
            from jax.experimental import io_callback

            from sglang_fluentllm_tpu.ops.moe.topk import select_experts

            _, rec_ids = select_experts(logits, c, lp["correction_bias"])
            io_callback(self.expert_recorder.record, None, layer_id,
                        rec_ids, ordered=False)
        from sglang_fluentllm_tpu.ops.moe.layer import model_moe_forward

        out = model_moe_forward(
            self, flat, logits, lp["w_gate_up"], lp["w_down"], c,
            correction_bias=lp["correction_bias"],
        )
        if c.num_shared_experts:
            shared = (jax.nn.silu(flat @ lp["shared_gate_proj"])
                      * (flat @ lp["shared_up_proj"])) @ lp["shared_down_proj"]
            out = out + shared
        return out.reshape(B, S, H)

    def forward(self, params, kv_cache, batch: ForwardBatch):
        c = self.config
        eps = c.rms_norm_eps
        h = jnp.take(params["embed_tokens"], batch.input_ids, axis=0)
        cos = self.rope.cos[batch.positions]
        sin = self.rope.sin[batch.positions]

        for i in range(self.n_dense):
            lp = jax.tree.map(lambda x: x[i], params["dense_layers"])
            normed = rms_norm(h, lp["input_layernorm"], eps)
            attn_out, kv_cache = self._attn_block(
                lp, normed, kv_cache, i, batch, cos, sin
            )
            h = h + attn_out
            normed2 = rms_norm(h, lp["post_attention_layernorm"], eps)
            h = h + (jax.nn.silu(normed2 @ lp["gate_proj"])
                     * (normed2 @ lp["up_proj"])) @ lp["down_proj"]

        if self.n_moe:
            def layer_fn(carry, xs):
                h, kv_cache = carry
                lp, layer_id = xs
                normed = rms_norm(h, lp["input_layernorm"], eps)
                attn_out, kv_cache = self._attn_block(
                    lp, normed, kv_cache, layer_id, batch, cos, sin
                )
                h = h + attn_out
                normed2 = rms_norm(h, lp["post_attention_layernorm"], eps)
                h = h + self._moe_mlp(lp, normed2, layer_id)
                return (h, kv_cache), None

            (h, kv_cache), _ = jax.lax.scan(
                layer_fn, (h, kv_cache),
                (params["moe_layers"],
                 self.n_dense + jnp.arange(self.n_moe, dtype=jnp.int32)),
            )
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
        experts: Dict[int, Dict[Any, Dict[str, np.ndarray]]] = {
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
            "self_attn.q_norm.weight": ("q_norm", False),
            "self_attn.k_norm.weight": ("k_norm", False),
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
                    st[li][key] = w.T if tr else w
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
        if self.n_dense:
            params["dense_layers"] = {
                k: jnp.asarray(
                    np.stack([st[i][k] for i in range(self.n_dense)]),
                    dtype=dtype)
                for k in shapes["dense_layers"]
            }
        if self.n_moe:
            params["moe_layers"] = {
                k: jnp.asarray(
                    np.stack([st[i][k] for i in range(self.n_dense, L)]),
                    dtype=jnp.float32 if k == "correction_bias" else dtype)
                for k in shapes["moe_layers"]
            }
        return params
