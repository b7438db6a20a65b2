"""Qwen3 dense model (reference srt/models/qwen3.py parity).

Qwen3 = Llama body with per-head q/k RMSNorm before RoPE, explicit head_dim,
and no qkv bias.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_fluentllm_tpu.models.llama import LlamaForCausalLM
from sglang_fluentllm_tpu.models.registry import register
from sglang_fluentllm_tpu.ops.layernorm import rms_norm
from sglang_fluentllm_tpu.ops.quant.fp8 import matmul
from sglang_fluentllm_tpu.ops.rotary import apply_rope
from sglang_fluentllm_tpu.runtime.forward_batch import ForwardBatch


@register("Qwen3ForCausalLM")
class Qwen3ForCausalLM(LlamaForCausalLM):
    has_qkv_bias = False

    def param_shapes(self):
        shapes = super().param_shapes()
        c = self.config
        shapes["layers"]["q_norm"] = (c.num_hidden_layers, c.head_dim)
        shapes["layers"]["k_norm"] = (c.num_hidden_layers, c.head_dim)
        return shapes

    def param_specs(self):
        specs = super().param_specs()
        specs["layers"]["q_norm"] = P()
        specs["layers"]["k_norm"] = P()
        return specs

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16):
        params = super().init_dummy_params(seed, dtype)
        params["layers"]["q_norm"] = jnp.ones_like(params["layers"]["q_norm"])
        params["layers"]["k_norm"] = jnp.ones_like(params["layers"]["k_norm"])
        return params

    def forward(self, params, kv_cache, batch: ForwardBatch):
        kv_cache, h, _ = self._forward_tower(params, kv_cache, batch, None)
        return kv_cache, h

    def forward_with_aux(self, params, kv_cache, batch: ForwardBatch,
                         capture_ids):
        """EAGLE-3 aux-hidden capture (see LlamaForCausalLM)."""
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
            q = matmul(normed, lp["q_proj"]).reshape(B, S, Hq, D)
            k = matmul(normed, lp["k_proj"]).reshape(B, S, Hk, D)
            v = matmul(normed, lp["v_proj"]).reshape(B, S, Hk, D)
            q = rms_norm(q, lp["q_norm"], eps)
            k = rms_norm(k, lp["k_norm"], eps)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            attn_out, kv_cache = self.attn(
                kv_cache, layer_id, q, k, v, batch, self.sm_scale
            )
            h = h + matmul(attn_out.reshape(B, S, Hq * D), lp["o_proj"])
            normed2 = rms_norm(h, lp["post_attention_layernorm"], eps)
            mlp = matmul(
                jax.nn.silu(matmul(normed2, lp["gate_proj"]))
                * matmul(normed2, lp["up_proj"]),
                lp["down_proj"],
            )
            h = h + mlp
            if cap_arr is not None:
                sel = (cap_arr == layer_id + 1).astype(aux.dtype)
                aux = aux + sel[:, None, None, None] * h[None]
            return (h, kv_cache, aux), None

        (h, kv_cache, aux), _ = jax.lax.scan(
            layer_fn,
            (h, kv_cache, aux0),
            (params["layers"],
             jnp.arange(c.num_hidden_layers, dtype=jnp.int32)),
        )
        h = rms_norm(h, params["norm"], eps)
        if capture_ids:
            aux = aux.transpose(1, 2, 0, 3).reshape(
                B, S, len(capture_ids) * c.hidden_size)
        return kv_cache, h, aux

    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        import numpy as np

        extras = {"q_norm": {}, "k_norm": {}}

        def wrapped():
            for name, w in named_tensors:
                short = name[len("model."):] if name.startswith("model.") else name
                if short.startswith("layers.") and (
                    ".q_norm.weight" in short or ".k_norm.weight" in short
                ):
                    parts = short.split(".")
                    li = int(parts[1])
                    key = "q_norm" if "q_norm" in short else "k_norm"
                    extras[key][li] = w
                    continue
                yield name, w

        params = super().load_weights(wrapped(), dtype)
        L = self.config.num_hidden_layers
        for key in ("q_norm", "k_norm"):
            params["layers"][key] = jnp.asarray(
                np.stack([extras[key][i] for i in range(L)]), dtype=dtype
            )
        return params
