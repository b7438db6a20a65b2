"""NEXTN / MTP draft module sharing the target's embeddings and lm-head.

Analog of the reference's MTP draft family (``models/deepseek_nextn.py``,
``models/flash_nextn.py`` — LongCat's NEXTN draft; scaffolding in
``speculative/base_spec_worker.py:144`` where the drafter borrows the
target's embedding and lm-head). Architecture (DeepSeek-V3 MTP):

    x   = eh_proj @ [ RMSNorm(embed(tok)) ; RMSNorm(h_target) ]
    h'  = DecoderLayer(x)            # one llama-style layer with own KV
    p   = lm_head(RMSNorm(h'))

The draft chains on its own hidden state within a speculative window
(EAGLE-style): step j+1 consumes (embed(d_j), h'_j).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from sglang_fluentllm_tpu.config.model_config import ModelConfig
from sglang_fluentllm_tpu.ops.layernorm import rms_norm
from sglang_fluentllm_tpu.ops.rotary import RotaryEmbedding, apply_rope
from sglang_fluentllm_tpu.runtime.forward_batch import ForwardBatch


class NextNDraftModel:
    """One-layer MTP draft; embeddings/lm-head are read from the TARGET's
    params at call time (zero duplicated weight memory)."""

    def __init__(self, config: ModelConfig, target_model, attn_backend):
        self.config = config
        self.target = target_model
        self.attn = attn_backend
        self.sm_scale = 1.0 / math.sqrt(config.head_dim)
        self.rope = RotaryEmbedding(
            config.head_dim,
            config.max_position_embeddings,
            config.rope_theta,
            config.rope_scaling,
        )

    # -- params --------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        H = c.hidden_size
        D, Hq, Hk = c.head_dim, c.num_attention_heads, c.num_key_value_heads
        I = c.intermediate_size
        return {
            "enorm": (H,),
            "hnorm": (H,),
            "eh_proj": (2 * H, H),
            "final_norm": (H,),
            "layer": {
                "input_layernorm": (H,),
                "post_attention_layernorm": (H,),
                "q_proj": (H, Hq * D),
                "k_proj": (H, Hk * D),
                "v_proj": (H, Hk * D),
                "o_proj": (Hq * D, H),
                "gate_proj": (H, I),
                "up_proj": (H, I),
                "down_proj": (I, H),
            },
        }

    def param_specs(self):
        """Replicated draft params. Shape leaves are TUPLES, which
        jax.tree.map would otherwise descend into — producing a specs
        tree that mismatches the params tree under tp>1 (caught by the
        dryrun NEXTN-tree-under-tp=4 arm, round 5)."""
        from jax.sharding import PartitionSpec as P

        return jax.tree.map(lambda _: P(), self.param_shapes(),
                            is_leaf=lambda x: isinstance(x, tuple))

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16):
        rng = np.random.RandomState(seed)

        def build(tree):
            if isinstance(tree, dict):
                return {k: build(v) for k, v in tree.items()}
            return jnp.asarray(
                rng.standard_normal(tree).astype(np.float32) * 0.02, dtype
            )

        p = build(self.param_shapes())
        for k in ("enorm", "hnorm", "final_norm"):
            p[k] = jnp.ones_like(p[k])
        for k in ("input_layernorm", "post_attention_layernorm"):
            p["layer"][k] = jnp.ones_like(p["layer"][k])
        return p

    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        """HF MTP checkpoint names (deepseek_v3 mtp / nextn layout)."""
        staging: Dict[str, Any] = {"layer": {}}
        name_map = {
            "enorm.weight": "enorm",
            "hnorm.weight": "hnorm",
            "eh_proj.weight": ("eh_proj", True),
            "shared_head.norm.weight": "final_norm",
            "final_layernorm.weight": "final_norm",
        }
        layer_map = {
            "self_attn.q_proj.weight": ("q_proj", True),
            "self_attn.k_proj.weight": ("k_proj", True),
            "self_attn.v_proj.weight": ("v_proj", True),
            "self_attn.o_proj.weight": ("o_proj", True),
            "mlp.gate_proj.weight": ("gate_proj", True),
            "mlp.up_proj.weight": ("up_proj", True),
            "mlp.down_proj.weight": ("down_proj", True),
            "input_layernorm.weight": ("input_layernorm", False),
            "post_attention_layernorm.weight": (
                "post_attention_layernorm", False),
        }
        for name, w in named_tensors:
            n = name
            for pref in ("model.layers.0.", "model.", "layers.0.", "mtp."):
                if n.startswith(pref):
                    n = n[len(pref):]
            if n in name_map:
                spec = name_map[n]
                if isinstance(spec, tuple):
                    staging[spec[0]] = w.T if spec[1] else w
                else:
                    staging[spec] = w
            elif n in layer_map:
                key, t = layer_map[n]
                staging["layer"][key] = w.T if t else w
        out = {}
        for k, shape in self.param_shapes().items():
            if k == "layer":
                out["layer"] = {
                    kk: jnp.asarray(staging["layer"][kk], dtype)
                    for kk in shape
                }
            else:
                out[k] = jnp.asarray(staging[k], dtype)
        return out

    # -- forward -------------------------------------------------------
    def _layer(self, params, kv_cache, x, batch: ForwardBatch):
        c = self.config
        lp = params["layer"]
        B, S, H = x.shape
        Hq, Hk, D = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        eps = c.rms_norm_eps
        normed = rms_norm(x, lp["input_layernorm"], eps)
        q = (normed @ lp["q_proj"]).reshape(B, S, Hq, D)
        k = (normed @ lp["k_proj"]).reshape(B, S, Hk, D)
        v = (normed @ lp["v_proj"]).reshape(B, S, Hk, D)
        cos = self.rope.cos[batch.positions]
        sin = self.rope.sin[batch.positions]
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn_out, kv_cache = self.attn(
            kv_cache, 0, q, k, v, batch, self.sm_scale
        )
        x = x + attn_out.reshape(B, S, Hq * D) @ lp["o_proj"]
        normed2 = rms_norm(x, lp["post_attention_layernorm"], eps)
        mlp = (jax.nn.silu(normed2 @ lp["gate_proj"])
               * (normed2 @ lp["up_proj"])) @ lp["down_proj"]
        return x + mlp, kv_cache

    def fuse(self, params, target_params, tokens, hidden):
        """[..., H] draft input from (token embedding, carried hidden)."""
        c = self.config
        emb = jnp.take(target_params["embed_tokens"], tokens, axis=0)
        cat = jnp.concatenate(
            [
                rms_norm(emb, params["enorm"], c.rms_norm_eps),
                rms_norm(
                    hidden.astype(emb.dtype), params["hnorm"],
                    c.rms_norm_eps,
                ),
            ],
            axis=-1,
        )
        return cat @ params["eh_proj"]

    def forward(self, params, target_params, kv_cache, batch: ForwardBatch,
                hidden):
        """hidden: target hidden states aligned with batch.input_ids
        ([B, S, H]). Returns (kv_cache, draft hidden [B, S, H])."""
        x = self.fuse(params, target_params, batch.input_ids, hidden)
        h, kv_cache = self._layer(params, kv_cache, x, batch)
        return kv_cache, h

    def compute_logits(self, params, target_params, hidden):
        c = self.config
        h = rms_norm(hidden, params["final_norm"], c.rms_norm_eps)
        if c.tie_word_embeddings or "lm_head" not in target_params:
            w = target_params["embed_tokens"].T
        else:
            w = target_params["lm_head"]
        return (h @ w).astype(jnp.float32)


class EagleDraftModel(NextNDraftModel):
    """EAGLE-1 draft (reference ``models/llama_eagle.py``): one llama
    decoder layer whose first input_layernorm is REMOVED, a ``fc``
    projecting cat(embed(tok), target_hidden) -> H with NO pre-norms,
    the draft's OWN embed table, and logits through the draft lm_head
    (tied to its embed when tie_word_embeddings) with NO final norm."""

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        del shapes["enorm"], shapes["hnorm"], shapes["final_norm"]
        c = self.config
        shapes["embed_tokens"] = (c.vocab_size, c.hidden_size)
        if not c.tie_word_embeddings:
            shapes["lm_head"] = (c.hidden_size, c.vocab_size)
        return shapes

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16):
        rng = np.random.RandomState(seed)

        def build(tree):
            if isinstance(tree, dict):
                return {k: build(v) for k, v in tree.items()}
            return jnp.asarray(
                rng.standard_normal(tree).astype(np.float32) * 0.02,
                dtype=dtype)

        params = build(self.param_shapes())
        for k in ("input_layernorm", "post_attention_layernorm"):
            params["layer"][k] = jnp.ones_like(params["layer"][k])
        return params

    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        staging: Dict[str, Any] = {"layer": {}}
        layer_map = {
            "self_attn.q_proj.weight": ("q_proj", True),
            "self_attn.k_proj.weight": ("k_proj", True),
            "self_attn.v_proj.weight": ("v_proj", True),
            "self_attn.o_proj.weight": ("o_proj", True),
            "mlp.gate_proj.weight": ("gate_proj", True),
            "mlp.up_proj.weight": ("up_proj", True),
            "mlp.down_proj.weight": ("down_proj", True),
            "input_layernorm.weight": ("input_layernorm", False),
            "post_attention_layernorm.weight": (
                "post_attention_layernorm", False),
        }
        for name, w in named_tensors:
            n = name
            for pref in ("model.", ):
                if n.startswith(pref):
                    n = n[len(pref):]
            if n == "embed_tokens.weight":
                staging["embed_tokens"] = w
            elif n == "fc.weight":
                staging["eh_proj"] = w.T
            elif n == "lm_head.weight":
                staging["lm_head"] = w.T
            elif n.startswith("layers.0."):
                n = n[len("layers.0."):]
                if n in layer_map:
                    key, t = layer_map[n]
                    staging["layer"][key] = w.T if t else w
        # EAGLE layer 0 has no input_layernorm in the checkpoint
        staging["layer"].setdefault(
            "input_layernorm",
            np.ones((self.config.hidden_size,), np.float32),
        )
        out = {}
        for k, shape in self.param_shapes().items():
            if k == "layer":
                out["layer"] = {
                    kk: jnp.asarray(staging["layer"][kk], dtype)
                    for kk in shape
                }
            elif k == "lm_head" and k not in staging:
                out[k] = jnp.asarray(staging["embed_tokens"], dtype).T
            else:
                out[k] = jnp.asarray(staging[k], dtype)
        return out

    def fuse(self, params, target_params, tokens, hidden):
        emb = jnp.take(params["embed_tokens"], tokens, axis=0)
        cat = jnp.concatenate(
            [emb, hidden.astype(emb.dtype)], axis=-1
        )
        return cat @ params["eh_proj"]

    def _layer(self, params, kv_cache, x, batch: ForwardBatch):
        # EAGLE deletes layer 0's input_layernorm; with the checkpoint
        # default of ones the rms_norm still rescales — so bypass it by
        # normalizing with weight AND dividing out... simplest: replicate
        # the reference exactly: identity in place of input_layernorm.
        c = self.config
        lp = params["layer"]
        B, S, H = x.shape
        Hq, Hk, D = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        normed = x  # EAGLE: no input norm on the (only) layer
        q = (normed @ lp["q_proj"]).reshape(B, S, Hq, D)
        k = (normed @ lp["k_proj"]).reshape(B, S, Hk, D)
        v = (normed @ lp["v_proj"]).reshape(B, S, Hk, D)
        cos = self.rope.cos[batch.positions]
        sin = self.rope.sin[batch.positions]
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn_out, kv_cache = self.attn(
            kv_cache, 0, q, k, v, batch, self.sm_scale
        )
        x = x + attn_out.reshape(B, S, Hq * D) @ lp["o_proj"]
        normed2 = rms_norm(x, lp["post_attention_layernorm"],
                           c.rms_norm_eps)
        mlp = (jax.nn.silu(normed2 @ lp["gate_proj"])
               * (normed2 @ lp["up_proj"])) @ lp["down_proj"]
        return x + mlp, kv_cache

    def compute_logits(self, params, target_params, hidden):
        # no final norm (reference llama_eagle LlamaModel has no norm)
        w = params.get("lm_head")
        if w is None:
            w = params["embed_tokens"].T
        return (hidden @ w).astype(jnp.float32)


class DeepseekNextNDraftModel(NextNDraftModel):
    """DeepSeek-V3 MTP draft (reference ``models/deepseek_nextn.py``):
    enorm/hnorm/eh_proj + ONE full DeepSeek block (MLA attention + the
    model's MLP/MoE) + shared_head.norm, with embeddings/lm-head read
    from the TARGET. Checkpoint tensors live either under
    ``model.layers.0.`` (standalone NextN export) or under
    ``model.layers.{L}.`` inside the main checkpoint (V3 ships the MTP
    layer as the extra layer)."""

    def __init__(self, config: ModelConfig, target_model, attn_backend):
        super().__init__(config, target_model, attn_backend)
        # MLA geometry + interleaved deepseek rope come from the target
        self.rope = target_model.rope
        self.sm_scale = target_model.sm_scale
        self.moe_layer = config.is_moe

    # -- params --------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        H = c.hidden_size
        layer = dict(self.target._attn_shapes())
        layer["input_layernorm"] = (H,)
        layer["post_attention_layernorm"] = (H,)
        if self.moe_layer:
            E = c.num_experts + c.num_zero_experts
            Et = c.num_experts
            Im = c.moe_intermediate_size
            layer.update({
                "router": (H, E),
                "w_gate_up": (c.num_experts, H, 2 * Im),
                "w_down": (c.num_experts, Im, H),
            })
            if c.topk_method == "noaux_tc":
                layer["correction_bias"] = (Et,)
            if c.num_shared_experts:
                Is = Im * c.num_shared_experts
                layer.update({
                    "shared_gate_proj": (H, Is),
                    "shared_up_proj": (H, Is),
                    "shared_down_proj": (Is, H),
                })
        else:
            I = c.intermediate_size
            layer.update({
                "gate_proj": (H, I), "up_proj": (H, I),
                "down_proj": (I, H),
            })
        return {
            "enorm": (H,),
            "hnorm": (H,),
            "eh_proj": (2 * H, H),
            "final_norm": (H,),
            "layer": layer,
        }

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16):
        rng = np.random.RandomState(seed)

        def build(tree):
            if isinstance(tree, dict):
                return {k: build(v) for k, v in tree.items()}
            return jnp.asarray(
                rng.standard_normal(tree).astype(np.float32) * 0.02,
                dtype=dtype)

        params = build(self.param_shapes())
        for k in ("enorm", "hnorm", "final_norm"):
            params[k] = jnp.ones_like(params[k])
        for k in list(params["layer"]):
            if "layernorm" in k:
                params["layer"][k] = jnp.ones_like(params["layer"][k])
            if k == "correction_bias":
                params["layer"][k] = jnp.zeros_like(
                    params["layer"][k]).astype(jnp.float32)
        return params

    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        """Reuse the deepseek family loader by remapping the MTP layer's
        tensors onto a one-layer model, then lift them into the draft's
        flat layout."""
        import re as _re

        staged: Dict[str, Any] = {}
        layer_pairs = []
        li_seen = set()
        for name, w in named_tensors:
            n = name
            if n.startswith("model."):
                n = n[len("model."):]
            m = _re.match(r"layers\.(\d+)\.(.*)", n)
            if m:
                li_seen.add(int(m.group(1)))
                layer_pairs.append((int(m.group(1)), m.group(2), w))
            elif n in ("enorm.weight", "hnorm.weight"):
                staged[n.split(".")[0]] = w
            elif n == "eh_proj.weight":
                staged["eh_proj"] = np.asarray(w).T
            elif n in ("shared_head.norm.weight",
                       "final_layernorm.weight"):
                staged["final_norm"] = w
        # the MTP layer is the HIGHEST layer index present (standalone
        # exports have only layer 0)
        mtp_li = max(li_seen) if li_seen else 0

        class _OneLayer:
            pass

        # run the target family's loader on just that layer's tensors,
        # pretending it is layer 0 of a 1-layer model
        sub = [("layers.0." + rest, w)
               for li, rest, w in layer_pairs if li == mtp_li]
        one_cfg = dataclasses.replace(
            self.config, num_hidden_layers=1,
            # the MTP layer is MoE whenever the model is MoE (V3: the
            # extra layer mirrors the late blocks, not the dense head)
            first_k_dense_replace=0 if self.moe_layer else 1,
        )
        helper = type(self.target)(one_cfg, self.attn)
        helper_params = helper.load_weights(
            sub + [("embed_tokens.weight",
                    np.zeros((1, self.config.hidden_size), np.float32)),
                   ("norm.weight",
                    np.ones((self.config.hidden_size,), np.float32)),
                   ("lm_head.weight",
                    np.zeros((1, self.config.hidden_size), np.float32))],
            dtype,
        )
        grp = ("moe_layers" if "moe_layers" in helper_params
               else "dense_layers")
        layer = {
            k: v[0] for k, v in helper_params[grp].items()
        }
        out: Dict[str, Any] = {
            "enorm": jnp.asarray(staged["enorm"], dtype),
            "hnorm": jnp.asarray(staged["hnorm"], dtype),
            "eh_proj": jnp.asarray(staged["eh_proj"], dtype),
            "final_norm": jnp.asarray(staged["final_norm"], dtype),
            "layer": layer,
        }
        return out

    # -- forward -------------------------------------------------------
    def _layer(self, params, kv_cache, x, batch: ForwardBatch):
        c = self.config
        lp = params["layer"]
        eps = c.rms_norm_eps
        cos = self.rope.cos[batch.positions]
        sin = self.rope.sin[batch.positions]
        normed = rms_norm(x, lp["input_layernorm"], eps)
        # reuse the target's MLA block on the draft's own KV (layer 0);
        # the target's DSA branch keys off its own flag — MTP layers are
        # dense-attention, so route through the plain path
        dsa_saved = getattr(self.target, "dsa", False)
        try:
            self.target.dsa = False
            attn_out, kv_cache = self.target._mla_block(
                lp, normed, kv_cache, 0, batch, cos, sin
            )
        finally:
            self.target.dsa = dsa_saved
        x = x + attn_out
        normed2 = rms_norm(x, lp["post_attention_layernorm"], eps)
        if self.moe_layer:
            x = x + self.target._moe_mlp(lp, normed2)
        else:
            x = x + self.target._dense_mlp(lp, normed2)
        return x, kv_cache


class MoeNextNDraftModel(DeepseekNextNDraftModel):
    """MHA+MoE MTP draft (reference ``models/glm4_moe_nextn.py``
    Glm4MoeModelNextN): enorm/hnorm/eh_proj + ONE full MHA+MoE decoder
    block reused from the TARGET's ``_attn_block``/``_moe_mlp``, with
    shared_head.norm. Same checkpoint layouts as the V3 MTP family
    (standalone layer-0 export or extra in-checkpoint layer)."""

    def __init__(self, config: ModelConfig, target_model, attn_backend):
        NextNDraftModel.__init__(self, config, target_model, attn_backend)
        self.rope = target_model.rope
        self.sm_scale = target_model.sm_scale
        self.moe_layer = config.is_moe

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        H = c.hidden_size
        # the target's per-layer attention shapes (glm4_moe returns
        # per-layer shapes with no layer axis, norms included)
        layer = dict(self.target._attn_shapes(c))
        layer.setdefault("input_layernorm", (H,))
        layer.setdefault("post_attention_layernorm", (H,))
        if self.moe_layer:
            E = c.num_experts + c.num_zero_experts
            Im = c.moe_intermediate_size
            layer.update({
                "router": (H, E),
                "w_gate_up": (c.num_experts, H, 2 * Im),
                "w_down": (c.num_experts, Im, H),
            })
            if c.topk_method == "noaux_tc":
                layer["correction_bias"] = (c.num_experts,)
            if c.num_shared_experts:
                Is = Im * c.num_shared_experts
                layer.update({
                    "shared_gate_proj": (H, Is),
                    "shared_up_proj": (H, Is),
                    "shared_down_proj": (Is, H),
                })
        else:
            I = c.intermediate_size
            layer.update({
                "gate_proj": (H, I), "up_proj": (H, I),
                "down_proj": (I, H),
            })
        return {
            "enorm": (H,),
            "hnorm": (H,),
            "eh_proj": (2 * H, H),
            "final_norm": (H,),
            "layer": layer,
        }

    def _layer(self, params, kv_cache, x, batch: ForwardBatch):
        c = self.config
        lp = params["layer"]
        eps = c.rms_norm_eps
        cos = self.rope.cos[batch.positions]
        sin = self.rope.sin[batch.positions]
        normed = rms_norm(x, lp["input_layernorm"], eps)
        attn_out, kv_cache = self.target._attn_block(
            lp, normed, kv_cache, 0, batch, cos, sin
        )
        x = x + attn_out
        normed2 = rms_norm(x, lp["post_attention_layernorm"], eps)
        if self.moe_layer:
            x = x + self.target._moe_mlp(lp, normed2)
        else:
            x = x + (jax.nn.silu(normed2 @ lp["gate_proj"])
                     * (normed2 @ lp["up_proj"])) @ lp["down_proj"]
        return x, kv_cache


class Qwen3NextMtpDraftModel(MoeNextNDraftModel):
    """Qwen3-Next MTP draft (reference ``models/qwen3_next_mtp.py``: the
    MTP model forces ``full_attention_interval = 1``, so the single
    draft layer is the gated FULL-attention block + MoE — no GDN state).
    The draft's 1-layer KV pool is plain MHA; the target's
    ``_full_layer`` expects its HybridKVCache wrapper, so the draft
    wraps/unwraps around the call."""

    def param_shapes(self):
        c = self.config
        H = c.hidden_size
        layer = {**self.target._full_shapes(c),
                 **self.target._mlp_shapes(c)}
        return {
            "enorm": (H,),
            "hnorm": (H,),
            "eh_proj": (2 * H, H),
            "final_norm": (H,),
            "layer": layer,
        }

    def _layer(self, params, kv_cache, x, batch: ForwardBatch):
        from sglang_fluentllm_tpu.mem.kv_cache import HybridKVCache

        c = self.config
        lp = params["layer"]
        eps = c.rms_norm_eps
        cos = self.rope.cos[batch.positions]
        sin = self.rope.sin[batch.positions]
        normed = rms_norm(x, lp["input_layernorm"], eps)
        z = jnp.zeros((0,), x.dtype)
        hk = HybridKVCache(mha=kv_cache, conv=z, rec=z)
        attn_out, hk = self.target._full_layer(
            lp, normed, hk, 0, batch, cos, sin
        )
        x = x + attn_out
        normed2 = rms_norm(x, lp["post_attention_layernorm"], eps)
        B, S, H = x.shape
        x = x + self.target._moe(lp, normed2.reshape(B * S, H)).reshape(
            B, S, H)
        return x, hk.mha

    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        """MTP checkpoint: layers.{L} (or a standalone layer-0 export)
        with qwen3-next full-attention + MoE names, plus the
        enorm/hnorm/eh_proj fusion tensors."""
        import re as _re

        staged: Dict[str, Any] = {}
        layer_pairs = []
        li_seen = set()
        for name, w in named_tensors:
            n = name
            if n.startswith("model."):
                n = n[len("model."):]
            if n.startswith("mtp."):
                n = n[len("mtp."):]
            m = _re.match(r"layers\.(\d+)\.(.*)", n)
            if m:
                li_seen.add(int(m.group(1)))
                layer_pairs.append((int(m.group(1)), m.group(2), w))
            elif n in ("enorm.weight", "hnorm.weight",
                       "pre_fc_norm_embedding.weight",
                       "pre_fc_norm_hidden.weight"):
                key = ("enorm" if "emb" in n or n.startswith("enorm")
                       else "hnorm")
                staged[key] = w
            elif n in ("eh_proj.weight", "fc.weight"):
                staged["eh_proj"] = np.asarray(w).T
            elif n in ("shared_head.norm.weight", "norm.weight",
                       "final_layernorm.weight"):
                staged["final_norm"] = w
        mtp_li = max(li_seen) if li_seen else 0
        sub = [("layers.0." + rest, w)
               for li, rest, w in layer_pairs if li == mtp_li]
        one_cfg = dataclasses.replace(
            self.config, num_hidden_layers=1,
            hf_config=dict(self.config.hf_config,
                           layer_types=["full_attention"]),
            layer_types=["full_attention"],
        )
        helper = type(self.target)(one_cfg, self.attn)
        V, H = 1, self.config.hidden_size
        helper_params = helper.load_weights(
            sub + [("embed_tokens.weight", np.zeros((V, H), np.float32)),
                   ("norm.weight", np.ones((H,), np.float32)),
                   ("lm_head.weight", np.zeros((V, H), np.float32))],
            dtype,
        )
        layer = {k: v[0] for k, v in helper_params["full_layers"].items()}
        return {
            "enorm": jnp.asarray(staged["enorm"], dtype),
            "hnorm": jnp.asarray(staged["hnorm"], dtype),
            "eh_proj": jnp.asarray(staged["eh_proj"], dtype),
            "final_norm": jnp.asarray(staged["final_norm"], dtype),
            "layer": layer,
        }


class LongcatNextNDraftModel(NextNDraftModel):
    """LongCat Flash MTP draft (reference ``models/flash_nextn.py``
    FLASHModelNextN): enorm/hnorm/eh_proj + ONE decoder block that is
    either a full ScMoE FLASH layer (``nextn_use_scmoe``, two MLA
    attentions + shortcut MoE — draft KV holds 2 layers) or a dense
    block (one MLA attention + dense MLP, FlASHDenseDecoderLayer)."""

    def __init__(self, config: ModelConfig, target_model, attn_backend):
        super().__init__(config, target_model, attn_backend)
        self.rope = target_model.rope
        self.sm_scale = target_model.sm_scale
        self.scmoe = bool(config.hf_config.get("nextn_use_scmoe"))
        self.draft_kv_layers = 2 if self.scmoe else 1

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        H = c.hidden_size
        if self.scmoe:
            layer = {
                k: tuple(v[1:])
                for k, v in self.target.param_shapes()["layers"].items()
            }
        else:
            # keep the '0'-branch key suffix: the dense draft reuses the
            # target's _mla(lp, "0", ...) path
            layer = {
                k: tuple(v[1:])
                for k, v in self.target._attn_shapes("0").items()
            }
            I = c.intermediate_size
            layer.update({
                "input_layernorm0": (H,),
                "post_attention_layernorm0": (H,),
                "gate_up0": (H, 2 * I),
                "down0": (I, H),
            })
        return {
            "enorm": (H,),
            "hnorm": (H,),
            "eh_proj": (2 * H, H),
            "final_norm": (H,),
            "layer": layer,
        }

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16):
        rng = np.random.RandomState(seed)

        def build(tree):
            if isinstance(tree, dict):
                return {k: build(v) for k, v in tree.items()}
            return jnp.asarray(
                rng.standard_normal(tree).astype(np.float32) * 0.02,
                dtype=dtype)

        p = build(self.param_shapes())
        for k in ("enorm", "hnorm", "final_norm"):
            p[k] = jnp.ones_like(p[k])
        for k in list(p["layer"]):
            if "layernorm" in k:
                p["layer"][k] = jnp.ones_like(p["layer"][k])
            if k == "correction_bias":
                p["layer"][k] = jnp.zeros_like(
                    p["layer"][k]).astype(jnp.float32)
        return p

    def _layer(self, params, kv_cache, x, batch: ForwardBatch):
        c = self.config
        lp = params["layer"]
        eps = c.rms_norm_eps
        cos = self.rope.cos[batch.positions]
        sin = self.rope.sin[batch.positions]
        if self.scmoe:
            return self.target._decoder_layer(
                lp, x, kv_cache, 0, batch, cos, sin)
        normed = rms_norm(x, lp["input_layernorm0"], eps)
        a0, kv_cache = self.target._mla(
            lp, "0", normed, kv_cache, 0, batch, cos, sin)
        x = x + a0
        normed2 = rms_norm(x, lp["post_attention_layernorm0"], eps)
        g, u = jnp.split(normed2 @ lp["gate_up0"], 2, axis=-1)
        x = x + (jax.nn.silu(g) * u) @ lp["down0"]
        return x, kv_cache

    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        """MTP layer tensors under model.layers.{L} (or a standalone
        layer-0 export). ScMoE reuses the target family loader on a
        one-layer model; the dense form maps FlASHDenseDecoderLayer's
        un-suffixed names onto the '0'-branch keys."""
        import re as _re

        staged: Dict[str, Any] = {}
        layer_pairs = []
        li_seen = set()
        for name, w in named_tensors:
            n = name
            if n.startswith("model."):
                n = n[len("model."):]
            m = _re.match(r"layers\.(\d+)\.(.*)", n)
            if m:
                li_seen.add(int(m.group(1)))
                layer_pairs.append((int(m.group(1)), m.group(2), w))
            elif n in ("enorm.weight", "hnorm.weight"):
                staged[n.split(".")[0]] = w
            elif n == "eh_proj.weight":
                staged["eh_proj"] = np.asarray(w).T
            elif n in ("shared_head.norm.weight", "final_layernorm.weight",
                       "norm.weight"):
                staged["final_norm"] = w
        mtp_li = max(li_seen) if li_seen else 0
        sub = [(rest, w) for li, rest, w in layer_pairs if li == mtp_li]
        if self.scmoe:
            one_cfg = dataclasses.replace(
                self.config, num_hidden_layers=1, num_kv_layers=2)
            helper = type(self.target)(one_cfg, self.attn)
            H = self.config.hidden_size
            hp = helper.load_weights(
                [("layers.0." + rest, w) for rest, w in sub]
                + [("embed_tokens.weight",
                    np.zeros((1, H), np.float32)),
                   ("norm.weight", np.ones((H,), np.float32)),
                   ("lm_head.weight", np.zeros((1, H), np.float32))],
                dtype,
            )
            layer = {k: v[0] for k, v in hp["layers"].items()}
        else:
            c = self.config
            r, dn, dv = (c.kv_lora_rank, c.qk_nope_head_dim,
                         c.v_head_dim)
            Hq = c.num_attention_heads
            lay: Dict[str, Any] = {}
            for rest, w in sub:
                key = None
                tmap = {
                    "self_attn.q_a_proj.weight": ("q_a_proj0", True),
                    "self_attn.q_a_layernorm.weight":
                        ("q_a_layernorm0", False),
                    "self_attn.q_b_proj.weight": ("q_b_proj0", True),
                    "self_attn.q_proj.weight": ("q_proj0", True),
                    "self_attn.kv_a_proj_with_mqa.weight":
                        ("kv_a_proj0", True),
                    "self_attn.kv_a_layernorm.weight":
                        ("kv_a_layernorm0", False),
                    "self_attn.o_proj.weight": ("o_proj0", True),
                    "input_layernorm.weight": ("input_layernorm0", False),
                    "post_attention_layernorm.weight":
                        ("post_attention_layernorm0", False),
                    "mlp.down_proj.weight": ("down0", True),
                }
                if rest in tmap:
                    key, t = tmap[rest]
                    lay[key] = np.asarray(w).T if t else w
                elif rest == "self_attn.kv_b_proj.weight":
                    kvb = np.asarray(w).T.reshape(r, Hq, dn + dv)
                    lay["w_kc0"] = np.transpose(kvb[..., :dn], (1, 0, 2))
                    lay["w_vc0"] = np.transpose(kvb[..., dn:], (1, 0, 2))
                elif rest == "mlp.gate_proj.weight":
                    lay["_gate"] = np.asarray(w).T
                elif rest == "mlp.up_proj.weight":
                    lay["_up"] = np.asarray(w).T
                elif rest == "mlp.gate_up_proj.weight":
                    lay["gate_up0"] = np.asarray(w).T
            if "gate_up0" not in lay and "_gate" in lay:
                lay["gate_up0"] = np.concatenate(
                    [lay.pop("_gate"), lay.pop("_up")], axis=1)
            layer = lay
        out: Dict[str, Any] = {
            "enorm": jnp.asarray(staged["enorm"], dtype),
            "hnorm": jnp.asarray(staged["hnorm"], dtype),
            "eh_proj": jnp.asarray(staged["eh_proj"], dtype),
            "final_norm": jnp.asarray(staged["final_norm"], dtype),
            "layer": {
                k: (jnp.asarray(v, jnp.float32)
                    if k == "correction_bias"
                    else jnp.asarray(v, dtype))
                for k, v in layer.items()
            },
        }
        return out


class Eagle3DraftModel(NextNDraftModel):
    """EAGLE-3 draft (reference ``models/llama_eagle3.py``): one llama
    decoder layer whose attention input is ``cat(input_layernorm(embed(tok)),
    hidden_norm(h))`` (so q/k/v projections take 2H), a ``fc`` mapping the
    target's concatenated aux hidden states (nc*H, captured from
    ``eagle_aux_hidden_state_layer_ids``) down to H, the draft's OWN embed
    table + lm_head over a REDUCED draft vocab, and a ``d2t`` table mapping
    draft token ids to target ids (reference ``llama_eagle3.py:264``
    ``hot_token_id = d2t + arange``).

    Chaining: within a window, step j+1 consumes the draft layer's pre-norm
    residual output (H wide — ``fc`` is only applied when the input hidden
    is the nc*H target aux, reference ``llama_eagle3.py:191-192``)."""

    def __init__(self, config, target_model, attn_backend):
        super().__init__(config, target_model, attn_backend)
        hf = config.hf_config or {}
        tgt_cfg = target_model.config
        ids = hf.get("eagle_aux_hidden_state_layer_ids")
        if ids:
            self.capture_ids = tuple(int(i) for i in ids)
            n_layers = getattr(tgt_cfg, "num_hidden_layers", None)
            if n_layers is not None:
                bad = [i for i in self.capture_ids
                       if not (1 <= i <= n_layers)]
                if bad:
                    raise ValueError(
                        f"eagle_aux_hidden_state_layer_ids {bad} out of "
                        f"range 1..{n_layers}: the target captures the "
                        "hidden AFTER layer i (1-based); an out-of-range "
                        "id would silently leave its aux slice zero"
                    )
        elif hasattr(target_model, "eagle3_capture_ids"):
            self.capture_ids = target_model.eagle3_capture_ids()
        else:
            raise ValueError(
                "EAGLE3 requires a target model with aux-hidden capture "
                f"support (got {type(target_model).__name__})"
            )
        if not hasattr(target_model, "forward_with_aux"):
            raise ValueError(
                "EAGLE3 target must implement forward_with_aux "
                f"(got {type(target_model).__name__})"
            )
        self.target_vocab = tgt_cfg.vocab_size
        self.draft_vocab = int(hf.get("draft_vocab_size",
                                      config.vocab_size))

    @property
    def hidden_feed_dim(self) -> int:
        return len(self.capture_ids) * self.config.hidden_size

    # -- params --------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        H = c.hidden_size
        D, Hq, Hk = c.head_dim, c.num_attention_heads, c.num_key_value_heads
        I = c.intermediate_size
        nc = len(self.capture_ids)
        return {
            "embed_tokens": (c.vocab_size, H),
            "fc": (nc * H, H),
            # reference llama_eagle3.py:174 uses torch.nn.Linear (bias
            # by default); zero when the checkpoint omits it
            "fc_bias": (H,),
            "input_layernorm": (H,),
            "hidden_norm": (H,),
            "q_proj": (2 * H, Hq * D),
            "k_proj": (2 * H, Hk * D),
            "v_proj": (2 * H, Hk * D),
            "o_proj": (Hq * D, H),
            "post_attention_layernorm": (H,),
            "gate_proj": (H, I),
            "up_proj": (H, I),
            "down_proj": (I, H),
            "norm": (H,),
            "lm_head": (H, self.draft_vocab),
            "d2t_targets": (self.draft_vocab,),
        }

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16):
        rng = np.random.RandomState(seed)
        p = {}
        for k, shape in self.param_shapes().items():
            if k == "d2t_targets":
                p[k] = jnp.arange(shape[0], dtype=jnp.int32)
            elif k == "fc_bias":
                p[k] = jnp.zeros(shape, dtype)
            elif "norm" in k:
                p[k] = jnp.ones(shape, dtype)
            else:
                p[k] = jnp.asarray(
                    rng.standard_normal(shape).astype(np.float32) * 0.02,
                    dtype)
        return p

    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        staging: Dict[str, Any] = {}
        mid_map = {
            "self_attn.q_proj.weight": ("q_proj", True),
            "self_attn.k_proj.weight": ("k_proj", True),
            "self_attn.v_proj.weight": ("v_proj", True),
            "self_attn.o_proj.weight": ("o_proj", True),
            "mlp.gate_proj.weight": ("gate_proj", True),
            "mlp.up_proj.weight": ("up_proj", True),
            "mlp.down_proj.weight": ("down_proj", True),
            "input_layernorm.weight": ("input_layernorm", False),
            "hidden_norm.weight": ("hidden_norm", False),
            "post_attention_layernorm.weight": (
                "post_attention_layernorm", False),
        }
        for name, w in named_tensors:
            n = name
            for pref in ("model.",):
                if n.startswith(pref):
                    n = n[len(pref):]
            if n == "d2t":
                d2t = np.asarray(w, np.int64)
                staging["d2t_targets"] = (
                    d2t + np.arange(d2t.shape[0])).astype(np.int32)
            elif n == "t2d":
                continue
            elif n == "embed_tokens.weight":
                staging["embed_tokens"] = w
            elif n == "fc.weight":
                staging["fc"] = np.asarray(w).T
            elif n == "fc.bias":
                staging["fc_bias"] = w
            elif n == "lm_head.weight":
                staging["lm_head"] = np.asarray(w).T
            elif n == "norm.weight":
                staging["norm"] = w
            else:
                for pref in ("midlayer.", "layers.0."):
                    if n.startswith(pref):
                        n = n[len(pref):]
                if n in mid_map:
                    key, t = mid_map[n]
                    staging[key] = np.asarray(w).T if t else w
        out = {}
        for k, shape in self.param_shapes().items():
            if k == "d2t_targets" and k not in staging:
                out[k] = jnp.arange(shape[0], dtype=jnp.int32)
            elif k == "d2t_targets":
                out[k] = jnp.asarray(staging[k], jnp.int32)
            elif k == "fc_bias" and k not in staging:
                out[k] = jnp.zeros(shape, dtype)
            else:
                out[k] = jnp.asarray(staging[k], dtype)
        return out

    # -- forward -------------------------------------------------------
    def forward(self, params, target_params, kv_cache, batch: ForwardBatch,
                hidden, hidden_is_aux=None):
        c = self.config
        H = c.hidden_size
        B, S = batch.input_ids.shape
        Hq, Hk, D = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        eps = c.rms_norm_eps
        emb = jnp.take(params["embed_tokens"], batch.input_ids, axis=0)
        # fc is applied iff the input hidden is the target's aux concat
        # (reference llama_eagle3.py:191-192). The width check alone is
        # ambiguous when nc==1 (nc*H == H), so callers that know pass an
        # explicit flag; prefill feeds aux, chained decode feeds the H-wide
        # residual.
        if hidden_is_aux is None:
            hidden_is_aux = hidden.shape[-1] != H
        if hidden_is_aux:
            h = (hidden.astype(emb.dtype) @ params["fc"]
                 + params.get("fc_bias", 0))
        else:
            h = hidden.astype(emb.dtype)
        x2 = jnp.concatenate(
            [
                rms_norm(emb, params["input_layernorm"], eps),
                rms_norm(h, params["hidden_norm"], eps),
            ],
            axis=-1,
        )
        q = (x2 @ params["q_proj"]).reshape(B, S, Hq, D)
        k = (x2 @ params["k_proj"]).reshape(B, S, Hk, D)
        v = (x2 @ params["v_proj"]).reshape(B, S, Hk, D)
        cos = self.rope.cos[batch.positions]
        sin = self.rope.sin[batch.positions]
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn_out, kv_cache = self.attn(
            kv_cache, 0, q, k, v, batch, self.sm_scale
        )
        resid = h + attn_out.reshape(B, S, Hq * D) @ params["o_proj"]
        normed2 = rms_norm(resid, params["post_attention_layernorm"], eps)
        mlp = (jax.nn.silu(normed2 @ params["gate_proj"])
               * (normed2 @ params["up_proj"])) @ params["down_proj"]
        # pre-norm residual is BOTH the logits input (normed in
        # compute_logits) and the chained hidden for the next draft step
        return kv_cache, resid + mlp

    def compute_logits(self, params, target_params, hidden):
        c = self.config
        h = rms_norm(hidden, params["norm"], c.rms_norm_eps)
        ld = (h @ params["lm_head"]).astype(jnp.float32)  # [..., Vd]
        if self.draft_vocab == self.target_vocab:
            return ld
        # scatter the reduced draft vocab into target-vocab logits so the
        # shared sampler (penalties/grammar masks sized V) applies as-is
        out = jnp.full((*ld.shape[:-1], self.target_vocab), -1e30,
                       jnp.float32)
        return out.at[..., params["d2t_targets"]].set(ld)


class LongcatEagle3DraftModel(Eagle3DraftModel):
    """LongCat EAGLE-3 draft (reference ``models/longcat_eagle3.py``
    ``LongcatForCausalLMEagle3NextN``): fc over the target's aux-hidden
    concat, ONE dense decoder block whose MLA attention consumes the
    ``cat(input_layernorm(embeds), hidden_norm(h))`` 2H input
    (``LongcatDecoderLayerEagle3NextN:66`` builds the MLA with
    ``hidden_size=2*H``), a dense MLP, and the draft's own embed +
    full-vocab lm_head (no d2t reduction)."""

    draft_kv_layers = 1

    def __init__(self, config, target_model, attn_backend):
        super().__init__(config, target_model, attn_backend)
        self.rope = target_model.rope
        self.sm_scale = target_model.sm_scale

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        H = c.hidden_size
        I = c.intermediate_size
        nc = len(self.capture_ids)
        # one-layer MLA branch shapes (strip the leading L axis); the
        # input-side projections read the 2H concat
        attn = {
            k: tuple(v[1:])
            for k, v in self.target._attn_shapes("0").items()
        }
        for k in ("q_a_proj0", "q_proj0", "kv_a_proj0"):
            if k in attn:
                attn[k] = (2 * H,) + attn[k][1:]
        return {
            "embed_tokens": (c.vocab_size, H),
            "fc": (nc * H, H),
            # reference longcat_eagle3 fc is a torch Linear (bias by
            # default); zero-filled when the checkpoint omits it
            "fc_bias": (H,),
            "input_layernorm": (H,),
            "hidden_norm": (H,),
            "post_attention_layernorm": (H,),
            "gate_up": (H, 2 * I),
            "down": (I, H),
            "norm": (H,),
            "lm_head": (H, self.draft_vocab),
            "d2t_targets": (self.draft_vocab,),
            **attn,
        }

    def forward(self, params, target_params, kv_cache, batch: ForwardBatch,
                hidden, hidden_is_aux=None):
        c = self.config
        H = c.hidden_size
        eps = c.rms_norm_eps
        emb = jnp.take(params["embed_tokens"], batch.input_ids, axis=0)
        if hidden_is_aux is None:
            hidden_is_aux = hidden.shape[-1] != H
        if hidden_is_aux:
            h = (hidden.astype(emb.dtype) @ params["fc"]
                 + params.get("fc_bias", 0))
        else:
            h = hidden.astype(emb.dtype)
        x2 = jnp.concatenate(
            [
                rms_norm(emb, params["input_layernorm"], eps),
                rms_norm(h, params["hidden_norm"], eps),
            ],
            axis=-1,
        )
        cos = self.rope.cos[batch.positions]
        sin = self.rope.sin[batch.positions]
        a0, kv_cache = self.target._mla(
            params, "0", x2, kv_cache, 0, batch, cos, sin)
        resid = h + a0
        normed2 = rms_norm(resid, params["post_attention_layernorm"], eps)
        g, u = jnp.split(normed2 @ params["gate_up"], 2, axis=-1)
        mlp = (jax.nn.silu(g) * u) @ params["down"]
        return kv_cache, resid + mlp

    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        c = self.config
        r, dn, dv = c.kv_lora_rank, c.qk_nope_head_dim, c.v_head_dim
        Hq = c.num_attention_heads
        staging: Dict[str, Any] = {}
        mid_map = {
            "self_attn.q_a_proj.weight": ("q_a_proj0", True),
            "self_attn.q_a_layernorm.weight": ("q_a_layernorm0", False),
            "self_attn.q_b_proj.weight": ("q_b_proj0", True),
            "self_attn.q_proj.weight": ("q_proj0", True),
            "self_attn.kv_a_proj_with_mqa.weight": ("kv_a_proj0", True),
            "self_attn.kv_a_layernorm.weight": ("kv_a_layernorm0", False),
            "self_attn.o_proj.weight": ("o_proj0", True),
            "input_layernorm.weight": ("input_layernorm", False),
            "hidden_norm.weight": ("hidden_norm", False),
            "post_attention_layernorm.weight":
                ("post_attention_layernorm", False),
            "mlp.down_proj.weight": ("down", True),
        }
        gate = up = None
        for name, w in named_tensors:
            n = name
            for pref in ("model.",):
                if n.startswith(pref):
                    n = n[len(pref):]
            if n == "d2t":
                d2t = np.asarray(w, np.int64)
                staging["d2t_targets"] = (
                    d2t + np.arange(d2t.shape[0])).astype(np.int32)
            elif n == "t2d":
                continue
            elif n == "embed_tokens.weight":
                staging["embed_tokens"] = w
            elif n == "fc.weight":
                staging["fc"] = np.asarray(w).T
            elif n == "fc.bias":
                staging["fc_bias"] = w
            elif n == "lm_head.weight":
                staging["lm_head"] = np.asarray(w).T
            elif n == "norm.weight":
                staging["norm"] = w
            else:
                for pref in ("midlayer.", "layers.0."):
                    if n.startswith(pref):
                        n = n[len(pref):]
                if n in mid_map:
                    key, t = mid_map[n]
                    staging[key] = np.asarray(w).T if t else w
                elif n == "self_attn.kv_b_proj.weight":
                    kvb = np.asarray(w).T.reshape(r, Hq, dn + dv)
                    staging["w_kc0"] = np.transpose(
                        kvb[..., :dn], (1, 0, 2))
                    staging["w_vc0"] = np.transpose(
                        kvb[..., dn:], (1, 0, 2))
                elif n == "mlp.gate_proj.weight":
                    gate = np.asarray(w).T
                elif n == "mlp.up_proj.weight":
                    up = np.asarray(w).T
                elif n == "mlp.gate_up_proj.weight":
                    staging["gate_up"] = np.asarray(w).T
        if "gate_up" not in staging and gate is not None:
            staging["gate_up"] = np.concatenate([gate, up], axis=1)
        out = {}
        for k, shape in self.param_shapes().items():
            if k == "d2t_targets":
                out[k] = (jnp.asarray(staging[k], jnp.int32)
                          if k in staging
                          else jnp.arange(shape[0], dtype=jnp.int32))
            elif k == "fc_bias" and k not in staging:
                out[k] = jnp.zeros(shape, dtype)
            else:
                out[k] = jnp.asarray(staging[k], dtype)
        return out
