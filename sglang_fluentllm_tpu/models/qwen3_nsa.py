"""Qwen3-NSA (native sparse attention) causal LM.

Reference: ``srt/models/qwen3_nsa.py`` (Qwen3 body whose attention is
the three-branch NSA: gated-compressed blocks + top-n selected blocks +
sliding window, fused by per-head sigmoid gates). The branch math lives
in ``ops/attention/nsa.py``; this file adds the per-layer NSA weights
(compress gates + fusion gates) and routes attention through the
NSA backend instead of the paged kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_fluentllm_tpu.models.qwen3 import Qwen3ForCausalLM
from sglang_fluentllm_tpu.models.registry import register
from sglang_fluentllm_tpu.ops.attention.nsa import (
    NSAAttentionBackend,
    NSAParams,
)
from sglang_fluentllm_tpu.ops.layernorm import rms_norm
from sglang_fluentllm_tpu.ops.quant.fp8 import matmul
from sglang_fluentllm_tpu.ops.rotary import apply_rope
from sglang_fluentllm_tpu.runtime.forward_batch import ForwardBatch


@register("Qwen3NSAForCausalLM", "Qwen3NsaForCausalLM")
class Qwen3NSAForCausalLM(Qwen3ForCausalLM):
    def __init__(self, config, attn_backend):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        self.nsa_kernel = hf.get("kernel_size", 32)
        self.nsa_stride = hf.get("stride", 16)
        self.nsa_select = hf.get("select_size", 64)
        self.nsa_top_n = hf.get("top_n", 16)
        self.nsa_init = hf.get("slc_att_num_init_blocks", 1)
        self.nsa_local = hf.get("slc_att_num_local_blocks", 2)
        self.nsa_window = hf.get("window_size", 512)
        # NSA needs its own dense-branch backend (window + compressed
        # buffers are not paged-kernel shapes yet)
        self.attn = NSAAttentionBackend()

    def param_shapes(self):
        shapes = super().param_shapes()
        c = self.config
        L, D, Hq = c.num_hidden_layers, c.head_dim, c.num_attention_heads
        K = self.nsa_kernel
        shapes["layers"]["nsa_gate_k"] = (L, K * D, K)
        shapes["layers"]["nsa_gate_v"] = (L, K * D, K)
        shapes["layers"]["nsa_fusion"] = (L, Hq, 3, 3 * D)
        return shapes

    def param_specs(self):
        specs = super().param_specs()
        specs["layers"]["nsa_gate_k"] = P()
        specs["layers"]["nsa_gate_v"] = P()
        specs["layers"]["nsa_fusion"] = P()
        return specs

    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        import numpy as np

        c = self.config
        D, Hq = c.head_dim, c.num_attention_heads
        K = self.nsa_kernel

        def remap(pairs):
            for name, w in pairs:
                if name.endswith(
                    "attn.compress_attn.compress_key.gate_proj.weight"
                ):
                    yield (name.replace(
                        "attn.compress_attn.compress_key.gate_proj",
                        "nsa_gate_k_raw"), w)
                elif name.endswith(
                    "attn.compress_attn.compress_value.gate_proj.weight"
                ):
                    yield (name.replace(
                        "attn.compress_attn.compress_value.gate_proj",
                        "nsa_gate_v_raw"), w)
                elif name.endswith("attn.gate_fusion.gate_weight.weight"):
                    yield (name.replace(
                        "attn.gate_fusion.gate_weight",
                        "nsa_fusion_raw"), w)
                else:
                    yield name, w

        staged = {}

        def collect(pairs):
            for name, w in pairs:
                if "nsa_gate_k_raw" in name or "nsa_gate_v_raw" in name \
                        or "nsa_fusion_raw" in name:
                    staged[name] = np.asarray(w)
                else:
                    yield name, w

        params = super().load_weights(
            collect(remap(named_tensors)), dtype)
        L = c.num_hidden_layers
        gk, gv, fu = [], [], []
        for i in range(L):
            pre = f"layers.{i}."
            gk.append(staged.get(
                f"model.{pre}self_attn.nsa_gate_k_raw.weight",
                staged.get(f"{pre}self_attn.nsa_gate_k_raw.weight")).T)
            gv.append(staged.get(
                f"model.{pre}self_attn.nsa_gate_v_raw.weight",
                staged.get(f"{pre}self_attn.nsa_gate_v_raw.weight")).T)
            fw = staged.get(
                f"model.{pre}self_attn.nsa_fusion_raw.weight",
                staged.get(f"{pre}self_attn.nsa_fusion_raw.weight"))
            fu.append(np.asarray(fw).reshape(Hq, 3, 3 * D))
        params["layers"]["nsa_gate_k"] = jnp.asarray(
            np.stack(gk), dtype=dtype)
        params["layers"]["nsa_gate_v"] = jnp.asarray(
            np.stack(gv), dtype=dtype)
        params["layers"]["nsa_fusion"] = jnp.asarray(
            np.stack(fu), dtype=dtype)
        return params

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
            q = matmul(normed, lp["q_proj"]).reshape(B, S, Hq, D)
            k = matmul(normed, lp["k_proj"]).reshape(B, S, Hk, D)
            v = matmul(normed, lp["v_proj"]).reshape(B, S, Hk, D)
            q = rms_norm(q, lp["q_norm"], eps)
            k = rms_norm(k, lp["k_norm"], eps)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            attn_out, kv_cache = self.attn(
                kv_cache, layer_id, q, k, v, batch, self.sm_scale,
                nsa=NSAParams(
                    gate_k=lp["nsa_gate_k"], gate_v=lp["nsa_gate_v"],
                    fusion_w=lp["nsa_fusion"],
                ),
                kernel=self.nsa_kernel, stride=self.nsa_stride,
                select_size=self.nsa_select, top_n=self.nsa_top_n,
                n_init=self.nsa_init, n_local=self.nsa_local,
                window=self.nsa_window,
            )
            h = h + matmul(attn_out.reshape(B, S, Hq * D), lp["o_proj"])
            normed2 = rms_norm(h, lp["post_attention_layernorm"], eps)
            mlp = matmul(
                jax.nn.silu(matmul(normed2, lp["gate_proj"]))
                * matmul(normed2, lp["up_proj"]),
                lp["down_proj"],
            )
            h = h + mlp
            return (h, kv_cache), None

        (h, kv_cache), _ = jax.lax.scan(
            layer_fn, (h, kv_cache),
            (params["layers"],
             jnp.arange(c.num_hidden_layers, dtype=jnp.int32)),
        )
        return kv_cache, rms_norm(h, params["norm"], eps)
