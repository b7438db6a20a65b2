"""Llama-architecture variants: checkpoint-format and scaling differences.

Each class here is the analog of one reference model file
(``srt/models/phi3.py``, ``internlm2.py``, ``baichuan.py``, ``exaone.py``,
``granite.py``, ``minicpm.py``, ``olmo2.py``, ``commandr.py``): the decoder
math is the shared stacked-``lax.scan`` llama body; what differs is the HF
weight naming/fusion (split here at load time) and a handful of scaling
hooks. Keeping them as weight-map subclasses mirrors how the reference
subclasses LlamaForCausalLM, while every variant inherits the TPU-first
kernel paths for free.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from sglang_fluentllm_tpu.models.llama import LlamaForCausalLM
from sglang_fluentllm_tpu.models.registry import register
from sglang_fluentllm_tpu.ops.layernorm import rms_norm
from sglang_fluentllm_tpu.ops.quant.fp8 import matmul
from sglang_fluentllm_tpu.runtime.forward_batch import ForwardBatch


def _remap(named_tensors, fn):
    """Apply fn(name, tensor) -> iterable of (name, tensor) lazily."""
    for name, w in named_tensors:
        yield from fn(name, w)


@register("Phi3ForCausalLM", "Phi3MiniForCausalLM")
class Phi3ForCausalLM(LlamaForCausalLM):
    """Phi-3: llama body with FUSED qkv_proj / gate_up_proj checkpoints
    (reference ``srt/models/phi3.py`` weight mapping)."""

    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        c = self.config
        qd = c.num_attention_heads * c.head_dim
        kd = c.num_key_value_heads * c.head_dim

        def split(name, w):
            if name.endswith("self_attn.qkv_proj.weight"):
                base = name[: -len("qkv_proj.weight")]
                yield base + "q_proj.weight", w[:qd]
                yield base + "k_proj.weight", w[qd : qd + kd]
                yield base + "v_proj.weight", w[qd + kd :]
            elif name.endswith("mlp.gate_up_proj.weight"):
                base = name[: -len("gate_up_proj.weight")]
                half = w.shape[0] // 2
                yield base + "gate_proj.weight", w[:half]
                yield base + "up_proj.weight", w[half:]
            else:
                yield name, w

        return super().load_weights(_remap(named_tensors, split), dtype)


@register("InternLM2ForCausalLM")
class InternLM2ForCausalLM(LlamaForCausalLM):
    """InternLM2: llama body; checkpoint uses tok_embeddings/wqkv (group-
    interleaved fused QKV)/wo/w1-w3-w2 naming (reference
    ``srt/models/internlm2.py``)."""

    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        c = self.config
        D = c.head_dim
        Hk = c.num_key_value_heads
        G = c.num_attention_heads // Hk

        def split(name, w):
            name = name.replace("model.tok_embeddings.weight",
                                "model.embed_tokens.weight")
            name = name.replace("output.weight", "lm_head.weight")
            if name.endswith("attention.wqkv.weight"):
                base = name[: -len("attention.wqkv.weight")]
                # rows are [Hk, (G + 2), D, H]: G q-heads, then k, then v
                wr = w.reshape(Hk, G + 2, D, w.shape[-1])
                yield (base + "self_attn.q_proj.weight",
                       wr[:, :G].reshape(Hk * G * D, -1))
                yield (base + "self_attn.k_proj.weight",
                       wr[:, G].reshape(Hk * D, -1))
                yield (base + "self_attn.v_proj.weight",
                       wr[:, G + 1].reshape(Hk * D, -1))
                return
            name = name.replace("attention.wo.", "self_attn.o_proj.")
            name = name.replace("feed_forward.w1.", "mlp.gate_proj.")
            name = name.replace("feed_forward.w3.", "mlp.up_proj.")
            name = name.replace("feed_forward.w2.", "mlp.down_proj.")
            name = name.replace("attention_norm.", "input_layernorm.")
            name = name.replace("ffn_norm.", "post_attention_layernorm.")
            yield name, w

        return super().load_weights(_remap(named_tensors, split), dtype)


@register("BaichuanForCausalLM", "BaiChuanForCausalLM")
class BaichuanForCausalLM(LlamaForCausalLM):
    """Baichuan-7B: llama body with a fused W_pack QKV (reference
    ``srt/models/baichuan.py``). 13B's ALiBi positioning is not supported
    (rope models only)."""

    def __init__(self, config, attn_backend):
        if (config.hf_config.get("position_embedding", "ROPE").upper()
                == "ALIBI"):
            raise ValueError("Baichuan ALiBi variant not supported (rope only)")
        super().__init__(config, attn_backend)

    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        def split(name, w):
            if name.endswith("self_attn.W_pack.weight"):
                base = name[: -len("W_pack.weight")]
                third = w.shape[0] // 3
                yield base + "q_proj.weight", w[:third]
                yield base + "k_proj.weight", w[third : 2 * third]
                yield base + "v_proj.weight", w[2 * third :]
            else:
                yield name, w

        return super().load_weights(_remap(named_tensors, split), dtype)


@register("QWenLMHeadModel")
class QWenLMHeadModel(LlamaForCausalLM):
    """Qwen-1 (reference ``srt/models/qwen.py``): llama body with fused
    biased c_attn, w2/w1 gate/up naming, and transformer.h checkpoint
    layout."""

    has_qkv_bias = True

    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        c = self.config
        qd = c.num_attention_heads * c.head_dim

        def split(name, w):
            if name.startswith("transformer."):
                name = name[len("transformer."):]
            name = (name
                    .replace("wte.weight", "embed_tokens.weight")
                    .replace("ln_f.weight", "norm.weight"))
            if name.startswith("h."):
                name = "layers." + name[len("h."):]
            name = (name
                    .replace(".ln_1.", ".input_layernorm.")
                    .replace(".ln_2.", ".post_attention_layernorm.")
                    .replace(".attn.c_proj.", ".self_attn.o_proj.")
                    # w2 is the gate, w1 the up projection
                    # (reference stacked_params qwen.py:268-269)
                    .replace(".mlp.w2.", ".mlp.gate_proj.")
                    .replace(".mlp.w1.", ".mlp.up_proj.")
                    .replace(".mlp.c_proj.", ".mlp.down_proj."))
            if ".attn.c_attn." in name:
                base = name.split(".attn.c_attn.")[0] + ".self_attn."
                kind = name.rsplit(".", 1)[1]          # weight | bias
                yield base + f"q_proj.{kind}", w[:qd]
                yield base + f"k_proj.{kind}", w[qd:2 * qd]
                yield base + f"v_proj.{kind}", w[2 * qd:]
            else:
                yield name, w

        return super().load_weights(_remap(named_tensors, split), dtype)


@register("ExaoneForCausalLM")
class ExaoneForCausalLM(LlamaForCausalLM):
    """EXAONE: llama body under transformer.h/attn.attention/c_fc_0
    checkpoint names (reference ``srt/models/exaone.py``)."""

    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        def split(name, w):
            name = name.replace("transformer.wte.", "model.embed_tokens.")
            name = name.replace("transformer.ln_f.", "model.norm.")
            name = name.replace("transformer.h.", "model.layers.")
            name = name.replace(".attn.attention.", ".self_attn.")
            name = name.replace(".out_proj.", ".o_proj.")
            name = name.replace(".mlp.c_fc_0.", ".mlp.gate_proj.")
            name = name.replace(".mlp.c_fc_1.", ".mlp.up_proj.")
            name = name.replace(".mlp.c_proj.", ".mlp.down_proj.")
            name = name.replace(".ln_1.", ".input_layernorm.")
            name = name.replace(".ln_2.", ".post_attention_layernorm.")
            yield name, w

        return super().load_weights(_remap(named_tensors, split), dtype)


@register("GraniteForCausalLM")
class GraniteForCausalLM(LlamaForCausalLM):
    """IBM Granite: llama body + four scalar multipliers (reference
    ``srt/models/granite.py``: embedding/residual/attention multipliers and
    logits_scaling, which DIVIDES the logits)."""

    def __init__(self, config, attn_backend):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        self.embed_scale = float(hf.get("embedding_multiplier", 1.0))
        self.residual_scale = float(hf.get("residual_multiplier", 1.0))
        self.logits_scale = 1.0 / float(hf.get("logits_scaling", 1.0))
        am = hf.get("attention_multiplier")
        if am is not None:
            self.sm_scale = float(am)


@register("MiniCPMForCausalLM")
class MiniCPMForCausalLM(LlamaForCausalLM):
    """MiniCPM: llama body with muP-style scaling (reference
    ``srt/models/minicpm.py``: scale_emb, scale_depth/sqrt(L) residuals,
    hidden/dim_model_base logits divisor)."""

    def __init__(self, config, attn_backend):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        self.embed_scale = float(hf.get("scale_emb", 1.0))
        depth = float(hf.get("scale_depth", 1.0))
        self.residual_scale = depth / math.sqrt(config.num_hidden_layers)
        base = hf.get("dim_model_base")
        if base:
            self.logits_scale = 1.0 / (config.hidden_size / float(base))


@register("Olmo2ForCausalLM")
class Olmo2ForCausalLM(LlamaForCausalLM):
    """OLMo-2: post-norm llama variant with full-width q/k RMS norms
    (reference ``srt/models/olmo2.py``): residual adds NORMED sublayer
    outputs, there is no pre-attention/ffn norm."""

    def param_shapes(self):
        c = self.config
        shapes = super().param_shapes()
        L = c.num_hidden_layers
        lyr = shapes["layers"]
        # olmo2 norms the sublayer OUTPUTS; reuse the two norm slots and
        # add q/k norms over the full projected widths
        lyr["q_norm"] = (L, c.num_attention_heads * c.head_dim)
        lyr["k_norm"] = (L, c.num_key_value_heads * c.head_dim)
        return shapes

    def param_specs(self):
        from jax.sharding import PartitionSpec as P

        specs = super().param_specs()
        specs["layers"]["q_norm"] = P(None, "tp")
        specs["layers"]["k_norm"] = P(None, "tp")
        return specs

    def forward(self, params, kv_cache, batch: ForwardBatch):
        c = self.config
        B, S = batch.input_ids.shape
        Hq, Hk, D = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        eps = c.rms_norm_eps
        h = jnp.take(params["embed_tokens"], batch.input_ids, axis=0)
        cos = self.rope.cos[batch.positions]
        sin = self.rope.sin[batch.positions]

        from sglang_fluentllm_tpu.ops.rotary import apply_rope

        def layer_fn(carry, xs):
            h, kv_cache = carry
            lp, layer_id = xs
            q = rms_norm(matmul(h, lp["q_proj"]), lp["q_norm"], eps)
            k = rms_norm(matmul(h, lp["k_proj"]), lp["k_norm"], eps)
            v = matmul(h, lp["v_proj"])
            q = apply_rope(q.reshape(B, S, Hq, D), cos, sin)
            k = apply_rope(k.reshape(B, S, Hk, D), cos, sin)
            v = v.reshape(B, S, Hk, D)
            attn_out, kv_cache = self.attn(
                kv_cache, layer_id, q, k, v, batch, self.sm_scale
            )
            attn_o = matmul(attn_out.reshape(B, S, Hq * D), lp["o_proj"])
            h = h + rms_norm(attn_o, lp["post_attention_layernorm"], eps)
            gate = matmul(h, lp["gate_proj"])
            up = matmul(h, lp["up_proj"])
            mlp = matmul(jax.nn.silu(gate) * up, lp["down_proj"])
            h = h + rms_norm(mlp, lp["input_layernorm"], eps)
            return (h, kv_cache), None

        L = c.num_hidden_layers
        (h, kv_cache), _ = jax.lax.scan(
            layer_fn, (h, kv_cache),
            (params["layers"], jnp.arange(L, dtype=jnp.int32)),
        )
        return kv_cache, rms_norm(h, params["norm"], eps)

    def extra_name_map(self):
        return {
            "self_attn.q_norm.weight": ("q_norm", False),
            "self_attn.k_norm.weight": ("k_norm", False),
        }

    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        def split(name, w):
            # olmo2 names post_feedforward_layernorm; map it onto the
            # input_layernorm slot used by this post-norm forward
            name = name.replace("post_feedforward_layernorm.",
                                "input_layernorm.")
            yield name, w

        return super().load_weights(_remap(named_tensors, split), dtype)


@register("CohereForCausalLM", "Cohere2ForCausalLM")
class CohereForCausalLM(LlamaForCausalLM):
    """Cohere Command-R: PARALLEL attention+MLP block behind one shared
    LayerNorm (non-RMS, no bias), tied embeddings, logit_scale multiplier
    (reference ``srt/models/commandr.py``)."""

    def __init__(self, config, attn_backend):
        super().__init__(config, attn_backend)
        self.logits_scale = float(
            config.hf_config.get("logit_scale", 1.0)
        )
        self.ln_eps = float(
            config.hf_config.get("layer_norm_eps", 1e-5)
        )

    def param_shapes(self):
        shapes = super().param_shapes()
        del shapes["layers"]["post_attention_layernorm"]
        return shapes

    def param_specs(self):
        specs = super().param_specs()
        del specs["layers"]["post_attention_layernorm"]
        return specs

    @staticmethod
    def _layer_norm(x, w, eps):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + eps) * w).astype(x.dtype)

    def forward(self, params, kv_cache, batch: ForwardBatch):
        c = self.config
        B, S = batch.input_ids.shape
        Hq, Hk, D = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        h = jnp.take(params["embed_tokens"], batch.input_ids, axis=0)
        cos = self.rope.cos[batch.positions]
        sin = self.rope.sin[batch.positions]

        from sglang_fluentllm_tpu.ops.rotary import apply_rope

        def layer_fn(carry, xs):
            h, kv_cache = carry
            lp, layer_id = xs
            normed = self._layer_norm(h, lp["input_layernorm"], self.ln_eps)
            q = matmul(normed, lp["q_proj"]).reshape(B, S, Hq, D)
            k = matmul(normed, lp["k_proj"]).reshape(B, S, Hk, D)
            v = matmul(normed, lp["v_proj"]).reshape(B, S, Hk, D)
            # command-r rope is GPT-J interleaved (reference commandr.py
            # is_neox_style=False)
            q = apply_rope(q, cos, sin, True)
            k = apply_rope(k, cos, sin, True)
            attn_out, kv_cache = self.attn(
                kv_cache, layer_id, q, k, v, batch, self.sm_scale,
                window=self.window if self.window else None,
            )
            attn_o = matmul(attn_out.reshape(B, S, Hq * D), lp["o_proj"])
            gate = matmul(normed, lp["gate_proj"])
            up = matmul(normed, lp["up_proj"])
            mlp = matmul(jax.nn.silu(gate) * up, lp["down_proj"])
            h = h + attn_o + mlp  # parallel block
            return (h, kv_cache), None

        L = c.num_hidden_layers
        (h, kv_cache), _ = jax.lax.scan(
            layer_fn, (h, kv_cache),
            (params["layers"], jnp.arange(L, dtype=jnp.int32)),
        )
        return kv_cache, self._layer_norm(h, params["norm"], self.ln_eps)


@register("LlamaForSequenceClassification", "Qwen2ForSequenceClassification")
class LlamaForSequenceClassification(LlamaForCausalLM):
    """Sequence classification / reward heads (reference /classify route,
    ``http_server.py`` classify + reward-model serving): the llama body
    with a ``score`` head [H, num_labels]; classification logits are the
    score head applied to the LAST token's hidden state (HF
    ``LlamaForSequenceClassification`` pooling for right-padless
    batches)."""

    is_classification = True

    def __init__(self, config, attn_backend):
        super().__init__(config, attn_backend)
        self.num_labels = config.hf_config.get("num_labels", 2)

    def param_shapes(self):
        shapes = super().param_shapes()
        shapes.pop("lm_head", None)
        shapes["score"] = (self.config.hidden_size, self.num_labels)
        return shapes

    def param_specs(self):
        specs = super().param_specs()
        specs.pop("lm_head", None)
        from jax.sharding import PartitionSpec as P

        specs["score"] = P()
        return specs

    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        staged = {}

        def grab(pairs):
            for name, w in pairs:
                if name in ("score.weight", "model.score.weight",
                            "v_head.weight"):
                    staged["score"] = np.asarray(w).T
                elif "lm_head" in name:
                    continue
                else:
                    yield name, w

        # the body loader requires an lm_head when embeddings are untied;
        # feed a placeholder and drop it after
        def with_head(pairs):
            yield from pairs
            if not self.config.tie_word_embeddings:
                yield ("lm_head.weight", np.zeros(
                    (self.config.vocab_size, self.config.hidden_size),
                    np.float32))

        params = super().load_weights(
            with_head(grab(named_tensors)), dtype)
        params.pop("lm_head", None)
        params["score"] = jnp.asarray(staged["score"], dtype)
        return params

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16):
        params = super().init_dummy_params(seed, dtype)
        params.pop("lm_head", None)
        rng = np.random.RandomState(seed + 7)
        params["score"] = jnp.asarray(
            rng.standard_normal(
                (self.config.hidden_size, self.num_labels)
            ).astype(np.float32) * 0.02, dtype)
        return params

    def compute_classification(self, params, hidden):
        """[B, H] last-token hidden -> [B, num_labels] f32."""
        return (hidden @ params["score"]).astype(jnp.float32)
