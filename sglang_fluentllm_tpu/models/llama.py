"""Llama-family causal LM (LlamaForCausalLM, Mistral, and via subclassing
Qwen2) in pure-functional JAX style.

Parity target: reference ``srt/models/llama.py`` / ``qwen2.py``. TPU-first
design decisions:
- parameters are a plain pytree with all decoder layers STACKED on a leading
  [L, ...] axis and the forward is a single ``lax.scan`` over layers — one
  traced layer body instead of L python-unrolled layers (fast compiles, and
  XLA pipelines the weight loads);
- weights are stored [in, out] so the hot path is gemm-transpose-free;
- TP sharding is declared as a PartitionSpec pytree matching the params
  (vocab-parallel embedding, column/row-parallel projections — the analog of
  the reference's ColumnParallelLinear/RowParallelLinear+VocabParallelEmbedding).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_fluentllm_tpu.config.model_config import ModelConfig
from sglang_fluentllm_tpu.ops.activation import silu_and_mul
from sglang_fluentllm_tpu.ops.layernorm import rms_norm
from sglang_fluentllm_tpu.ops.quant.fp8 import matmul
from sglang_fluentllm_tpu.ops.rotary import RotaryEmbedding
from sglang_fluentllm_tpu.models.registry import register
from sglang_fluentllm_tpu.runtime.forward_batch import ForwardBatch


@register("LlamaForCausalLM")
class LlamaForCausalLM:
    has_qkv_bias = False
    supports_fp8_weights = True
    # hooks used by derived architectures (granite/minicpm multipliers)
    embed_scale = 1.0
    residual_scale = 1.0
    logits_scale = 1.0

    def extra_name_map(self):
        """Per-layer weight-name additions for derived architectures:
        {hf_suffix: (param_key, transpose)}."""
        return {}

    def __init__(self, config: ModelConfig, attn_backend):
        self.config = config
        self.attn = attn_backend
        self.sm_scale = 1.0 / math.sqrt(config.head_dim)
        # uniform sliding window (Mistral-style); 0/None = full attention
        self.window = config.sliding_window or 0
        rotary_dim = int(config.head_dim * config.partial_rotary_factor)
        self.rope = RotaryEmbedding(
            rotary_dim,
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
        if self.has_qkv_bias or c.attention_bias:
            layers.update({
                "q_bias": (L, Hq * D),
                "k_bias": (L, Hk * D),
                "v_bias": (L, Hk * D),
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
        """TP PartitionSpecs over mesh axis 'tp' (head/ffn dimension)."""
        c = self.config
        layers = {
            "input_layernorm": P(),
            "post_attention_layernorm": P(),
            "q_proj": P(None, None, "tp"),
            "k_proj": P(None, None, "tp"),
            "v_proj": P(None, None, "tp"),
            "o_proj": P(None, "tp", None),
            "gate_proj": P(None, None, "tp"),
            "up_proj": P(None, None, "tp"),
            "down_proj": P(None, "tp", None),
        }
        if self.has_qkv_bias or c.attention_bias:
            layers.update({
                "q_bias": P(None, "tp"),
                "k_bias": P(None, "tp"),
                "v_bias": P(None, "tp"),
            })
        specs = {
            "embed_tokens": P("tp", None),
            "layers": layers,
            "norm": P(),
        }
        if not c.tie_word_embeddings:
            specs["lm_head"] = P(None, "tp")
        return specs

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16):
        """Random-weight init (reference DummyModelLoader, loader.py:404)."""
        rng = np.random.RandomState(seed)

        def mk(shape):
            return jnp.asarray(
                rng.standard_normal(shape).astype(np.float32) * 0.02,
                dtype=dtype,
            )

        def build(tree):
            if isinstance(tree, dict):
                return {k: build(v) for k, v in tree.items()}
            return mk(tree)

        params = build(self.param_shapes())
        # keep norms ~1
        params["norm"] = jnp.ones_like(params["norm"])
        lyr = params["layers"]
        for name in ("input_layernorm", "post_attention_layernorm"):
            if name in lyr:  # variants may drop one (e.g. commandr)
                lyr[name] = jnp.ones_like(lyr[name])
        return params

    # ------------------------------------------------------------------
    def eagle3_capture_ids(self) -> Tuple[int, ...]:
        """Default EAGLE-3 aux-hidden capture layers (reference
        ``models/llama.py:710`` ``set_eagle3_layers_to_capture``:
        ``[2, L//2, L-3]`` — layer ids whose INPUT residual stream is
        captured), clamped + deduped for small models."""
        L = self.config.num_hidden_layers
        ids = sorted({min(max(i, 1), L) for i in (2, L // 2, L - 3)})
        return tuple(ids)

    def forward_with_aux(
        self, params, kv_cache, batch: ForwardBatch,
        capture_ids: Tuple[int, ...],
    ):
        """Forward that additionally captures the residual stream entering
        layers ``capture_ids`` (EAGLE-3 aux hidden states, reference
        ``models/llama.py:379-403``). Returns (kv, h_final,
        aux [B, S, len(ids)*H])."""
        return self._forward_tower(params, kv_cache, batch,
                                   tuple(capture_ids))

    def forward(
        self, params, kv_cache, batch: ForwardBatch
    ) -> Tuple[Any, jax.Array]:
        kv_cache, h, _ = self._forward_tower(params, kv_cache, batch, None)
        return kv_cache, h

    def _forward_tower(self, params, kv_cache, batch: ForwardBatch,
                       capture_ids):
        c = self.config
        B, S = batch.input_ids.shape
        Hq, Hk, D = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        eps = c.rms_norm_eps

        h = jnp.take(params["embed_tokens"], batch.input_ids, axis=0)
        if self.embed_scale != 1.0:
            h = h * jnp.asarray(self.embed_scale, h.dtype)
        cos = self.rope.cos[batch.positions]
        sin = self.rope.sin[batch.positions]
        res_scale = self.residual_scale
        cap_arr = (jnp.asarray(capture_ids, jnp.int32)
                   if capture_ids else None)
        aux0 = (jnp.zeros((len(capture_ids), B, S, c.hidden_size), h.dtype)
                if capture_ids else jnp.zeros((), h.dtype))

        def layer_fn(carry, xs):
            h, kv_cache, aux = carry
            lp, layer_id = xs
            normed = rms_norm(h, lp["input_layernorm"], eps)
            q = matmul(normed, lp["q_proj"])
            k = matmul(normed, lp["k_proj"])
            v = matmul(normed, lp["v_proj"])
            if "q_bias" in lp:
                q = q + lp["q_bias"]
                k = k + lp["k_bias"]
                v = v + lp["v_bias"]
            q = q.reshape(B, S, Hq, D)
            k = k.reshape(B, S, Hk, D)
            v = v.reshape(B, S, Hk, D)
            from sglang_fluentllm_tpu.ops.rotary import apply_rope

            rd = self.rope.rotary_dim
            q = q.at[..., :rd].set(
                apply_rope(q[..., :rd], cos, sin)
            ) if rd < D else apply_rope(q, cos, sin)
            k = k.at[..., :rd].set(
                apply_rope(k[..., :rd], cos, sin)
            ) if rd < D else apply_rope(k, cos, sin)

            attn_out, kv_cache = self.attn(
                kv_cache, layer_id, q, k, v, batch, self.sm_scale,
                window=self.window if self.window else None,
            )
            attn_o = matmul(attn_out.reshape(B, S, Hq * D), lp["o_proj"])
            if res_scale != 1.0:
                attn_o = attn_o * jnp.asarray(res_scale, h.dtype)
            h = h + attn_o

            normed2 = rms_norm(h, lp["post_attention_layernorm"], eps)
            gate = matmul(normed2, lp["gate_proj"])
            up = matmul(normed2, lp["up_proj"])
            mlp = matmul(jax.nn.silu(gate) * up, lp["down_proj"])
            if res_scale != 1.0:
                mlp = mlp * jnp.asarray(res_scale, h.dtype)
            h = h + mlp
            if cap_arr is not None:
                # capture the residual stream ENTERING layer (layer_id+1)
                sel = (cap_arr == layer_id + 1).astype(aux.dtype)
                aux = aux + sel[:, None, None, None] * h[None]
            return (h, kv_cache, aux), None

        L = c.num_hidden_layers
        (h, kv_cache, aux), _ = jax.lax.scan(
            layer_fn,
            (h, kv_cache, aux0),
            (params["layers"], jnp.arange(L, dtype=jnp.int32)),
        )
        h = rms_norm(h, params["norm"], eps)
        if capture_ids:
            nc = len(capture_ids)
            aux = aux.transpose(1, 2, 0, 3).reshape(B, S, nc * c.hidden_size)
        return kv_cache, h, aux

    def lm_head_weight(self, params) -> jax.Array:
        """[H, V] logits projection (monotone in logits scale): enables
        the runner's vocab-chunked fused greedy argmax, which never
        materializes the [B, V] f32 logits (a ~0.7 ms/step round trip at
        152k vocab, measured in the decode profile)."""
        if self.config.tie_word_embeddings:
            return params["embed_tokens"].T
        return params["lm_head"]

    def compute_logits(self, params, hidden: jax.Array) -> jax.Array:
        """hidden [B, H] -> logits [B, V] (f32)."""
        w = self.lm_head_weight(params)
        logits = (hidden @ w).astype(jnp.float32)
        if self.logits_scale != 1.0:
            logits = logits * self.logits_scale
        return logits

    # ------------------------------------------------------------------
    def load_weights(
        self, named_tensors: Iterator[Tuple[str, np.ndarray]],
        dtype=jnp.bfloat16,
    ):
        """Build the stacked param pytree from HF-named tensors.

        Mirrors the reference's per-module weight_loader inversion
        (SURVEY B.7): name mapping + transpose + stacking happens here, the
        loader just iterates safetensors.
        """
        c = self.config
        L = c.num_hidden_layers
        shapes = self.param_shapes()
        staging: Dict[str, Any] = {
            "layers": {k: [None] * L for k in shapes["layers"]}
        }

        name_map = {
            "self_attn.q_proj.weight": ("q_proj", True),
            "self_attn.k_proj.weight": ("k_proj", True),
            "self_attn.v_proj.weight": ("v_proj", True),
            "self_attn.o_proj.weight": ("o_proj", True),
            "self_attn.q_proj.bias": ("q_bias", False),
            "self_attn.k_proj.bias": ("k_bias", False),
            "self_attn.v_proj.bias": ("v_bias", False),
            "mlp.gate_proj.weight": ("gate_proj", True),
            "mlp.up_proj.weight": ("up_proj", True),
            "mlp.down_proj.weight": ("down_proj", True),
            "input_layernorm.weight": ("input_layernorm", False),
            "post_attention_layernorm.weight": (
                "post_attention_layernorm", False),
        }
        name_map.update(self.extra_name_map())

        for name, w in named_tensors:
            if name.startswith("model."):
                name = name[len("model."):]
            if name == "embed_tokens.weight":
                staging["embed_tokens"] = w
            elif name == "norm.weight":
                staging["norm"] = w
            elif name == "lm_head.weight":
                if not c.tie_word_embeddings:
                    staging["lm_head"] = w.T
            elif name.startswith("layers."):
                rest = name.split(".", 2)
                li = int(rest[1])
                key = rest[2]
                if key in name_map and li < L:
                    pkey, transpose = name_map[key]
                    if pkey in staging["layers"]:
                        staging["layers"][pkey][li] = w.T if transpose else w
            # rotary inv_freq buffers etc. are ignored

        params = {
            "embed_tokens": jnp.asarray(staging["embed_tokens"], dtype=dtype),
            "norm": jnp.asarray(staging["norm"], dtype=dtype),
            "layers": {},
        }
        if not c.tie_word_embeddings:
            params["lm_head"] = jnp.asarray(staging["lm_head"], dtype=dtype)
        for k, per_layer in staging["layers"].items():
            missing = [i for i, t in enumerate(per_layer) if t is None]
            if missing:
                raise ValueError(f"missing weights for {k}: layers {missing}")
            params["layers"][k] = jnp.asarray(
                np.stack(per_layer), dtype=dtype
            )
        return params


@register("MistralForCausalLM")
class MistralForCausalLM(LlamaForCausalLM):
    pass


@register("Qwen2ForCausalLM")
class Qwen2ForCausalLM(LlamaForCausalLM):
    """Qwen2/2.5: Llama body + QKV bias (reference srt/models/qwen2.py)."""

    has_qkv_bias = True
