"""GPT-2 causal LM (reference srt/models/gpt2.py parity).

Structurally distinct from the llama family: learned positional embeddings
(no RoPE), LayerNorm with bias, fused c_attn QKV, gelu_new MLP. HF GPT-2
weights use Conv1D layout ([in, out]) so no transposes on load.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_fluentllm_tpu.config.model_config import ModelConfig
from sglang_fluentllm_tpu.models.registry import register
from sglang_fluentllm_tpu.runtime.forward_batch import ForwardBatch


def layer_norm(x, w, b, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (out * w + b).astype(x.dtype)


@register("GPT2LMHeadModel")
class GPT2LMHeadModel:
    def __init__(self, config: ModelConfig, attn_backend):
        self.config = config
        self.attn = attn_backend
        self.sm_scale = config.head_dim ** -0.5
        self.ln_eps = config.hf_config.get("layer_norm_epsilon", 1e-5)

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        L, H = c.num_hidden_layers, c.hidden_size
        I = c.hf_config.get("n_inner") or 4 * H
        return {
            "wte": (c.vocab_size, H),
            "wpe": (c.max_position_embeddings, H),
            "layers": {
                "ln_1_w": (L, H), "ln_1_b": (L, H),
                "ln_2_w": (L, H), "ln_2_b": (L, H),
                "c_attn_w": (L, H, 3 * H), "c_attn_b": (L, 3 * H),
                "attn_proj_w": (L, H, H), "attn_proj_b": (L, H),
                "c_fc_w": (L, H, I), "c_fc_b": (L, I),
                "mlp_proj_w": (L, I, H), "mlp_proj_b": (L, H),
            },
            "ln_f_w": (H,), "ln_f_b": (H,),
        }

    def param_specs(self) -> Dict[str, Any]:
        sh = self.param_shapes()

        def spec(_):
            return P()

        return jax.tree.map(spec, sh)

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16):
        rng = np.random.RandomState(seed)

        def build(tree):
            if isinstance(tree, dict):
                return {k: build(v) for k, v in tree.items()}
            return jnp.asarray(
                rng.standard_normal(tree).astype(np.float32) * 0.02,
                dtype=dtype)

        p = build(self.param_shapes())
        for k in ("ln_f_w",):
            p[k] = jnp.ones_like(p[k])
        p["ln_f_b"] = jnp.zeros_like(p["ln_f_b"])
        lyr = p["layers"]
        for k in ("ln_1_w", "ln_2_w"):
            lyr[k] = jnp.ones_like(lyr[k])
        for k in ("ln_1_b", "ln_2_b"):
            lyr[k] = jnp.zeros_like(lyr[k])
        return p

    def forward(self, params, kv_cache, batch: ForwardBatch):
        c = self.config
        B, S = batch.input_ids.shape
        Hn, D = c.num_attention_heads, c.head_dim
        eps = self.ln_eps
        h = (jnp.take(params["wte"], batch.input_ids, axis=0)
             + jnp.take(params["wpe"], batch.positions, axis=0))

        def layer_fn(carry, xs):
            h, kv_cache = carry
            lp, layer_id = xs
            x = layer_norm(h, lp["ln_1_w"], lp["ln_1_b"], eps)
            qkv = x @ lp["c_attn_w"] + lp["c_attn_b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, S, Hn, D)
            k = k.reshape(B, S, Hn, D)
            v = v.reshape(B, S, Hn, D)
            attn_out, kv_cache = self.attn(
                kv_cache, layer_id, q, k, v, batch, self.sm_scale
            )
            h = h + (attn_out.reshape(B, S, Hn * D) @ lp["attn_proj_w"]
                     + lp["attn_proj_b"])
            x = layer_norm(h, lp["ln_2_w"], lp["ln_2_b"], eps)
            mlp = jax.nn.gelu(x @ lp["c_fc_w"] + lp["c_fc_b"],
                              approximate=True)
            h = h + (mlp @ lp["mlp_proj_w"] + lp["mlp_proj_b"])
            return (h, kv_cache), None

        (h, kv_cache), _ = jax.lax.scan(
            layer_fn, (h, kv_cache),
            (params["layers"],
             jnp.arange(c.num_hidden_layers, dtype=jnp.int32)),
        )
        return kv_cache, layer_norm(h, params["ln_f_w"], params["ln_f_b"],
                                    eps)

    def compute_logits(self, params, hidden):
        return (hidden @ params["wte"].T).astype(jnp.float32)

    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        c = self.config
        L = c.num_hidden_layers
        st: Dict[int, Dict[str, Any]] = {i: {} for i in range(L)}
        top: Dict[str, Any] = {}
        mapping = {
            "ln_1.weight": "ln_1_w", "ln_1.bias": "ln_1_b",
            "ln_2.weight": "ln_2_w", "ln_2.bias": "ln_2_b",
            "attn.c_attn.weight": "c_attn_w", "attn.c_attn.bias": "c_attn_b",
            "attn.c_proj.weight": "attn_proj_w",
            "attn.c_proj.bias": "attn_proj_b",
            "mlp.c_fc.weight": "c_fc_w", "mlp.c_fc.bias": "c_fc_b",
            "mlp.c_proj.weight": "mlp_proj_w",
            "mlp.c_proj.bias": "mlp_proj_b",
        }
        for name, w in named_tensors:
            if name.startswith("transformer."):
                name = name[len("transformer."):]
            if name == "wte.weight":
                top["wte"] = w
            elif name == "wpe.weight":
                top["wpe"] = w
            elif name == "ln_f.weight":
                top["ln_f_w"] = w
            elif name == "ln_f.bias":
                top["ln_f_b"] = w
            elif name.startswith("h."):
                parts = name.split(".", 2)
                li = int(parts[1])
                if li < L and parts[2] in mapping:
                    st[li][mapping[parts[2]]] = w  # Conv1D: already [in,out]
        params: Dict[str, Any] = {
            "wte": jnp.asarray(top["wte"], dtype=dtype),
            "wpe": jnp.asarray(top["wpe"], dtype=dtype),
            "ln_f_w": jnp.asarray(top["ln_f_w"], dtype=dtype),
            "ln_f_b": jnp.asarray(top["ln_f_b"], dtype=dtype),
            "layers": {},
        }
        for k in self.param_shapes()["layers"]:
            params["layers"][k] = jnp.asarray(
                np.stack([st[i][k] for i in range(L)]), dtype=dtype)
        return params
