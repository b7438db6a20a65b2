"""Kimi-Linear (KDA hybrid: Kimi Delta Attention + NoPE MLA, MoE).

Reference: ``srt/models/kimi_linear.py`` + ``srt/configs/kimi_linear.py``
+ ``srt/layers/attention/fla/kda.py``. Structure per layer (1-indexed
``linear_attn_config.kda_layers``):

- KDA layers: per-projection short causal convs (silu) over q/k/v,
  per-CHANNEL decay ``g = -exp(A_log[h]) * softplus(f_b(f_a(x)) +
  dt_bias)`` ([.., H, Dk] — the delta rule with vector decay,
  ``ops/linear_attn.kda_delta_rule``), beta = sigmoid(b_proj(x)) per
  head, output through a SIGMOID-gated RMSNorm and o_proj.
- full-attention layers: MLA (absorbed decode via the paged backend),
  with ``mla_use_nope`` skipping rope entirely.
- MoE: DeepSeek-V3-style sigmoid router + e_score_correction_bias +
  grouped top-k + renormalize + shared experts.

States: 3 conv tails (packed as one [3*H*D, K] row) + [H, Dk, Dv]
recurrent state per request in the HybridKVCache pool.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_fluentllm_tpu.config.model_config import ModelConfig
from sglang_fluentllm_tpu.mem.kv_cache import HybridKVCache
from sglang_fluentllm_tpu.models.registry import register
from sglang_fluentllm_tpu.ops.layernorm import rms_norm
from sglang_fluentllm_tpu.ops.linear_attn import (
    causal_conv1d,
    kda_delta_rule,
)
from sglang_fluentllm_tpu.ops.moe.layer import moe_forward
from sglang_fluentllm_tpu.ops.rotary import RotaryEmbedding, apply_rope
from sglang_fluentllm_tpu.runtime.forward_batch import ForwardBatch


@register("KimiLinearForCausalLM")
class KimiLinearForCausalLM:
    def __init__(self, config: ModelConfig, attn_backend):
        self.config = config
        self.attn = attn_backend
        c = config
        hf = c.hf_config
        self.qk_dim = c.qk_nope_head_dim + c.qk_rope_head_dim
        self.sm_scale = self.qk_dim ** -0.5
        self.nope = bool(hf.get("mla_use_nope"))
        self.rope = RotaryEmbedding(
            max(c.qk_rope_head_dim, 2),
            max(c.context_length or 0, c.max_position_embeddings),
            c.rope_theta,
            c.rope_scaling,
            interleaved=True,
        )
        lac = hf.get("linear_attn_config") or {}
        self.kh = lac.get("num_heads", c.num_attention_heads)
        self.kd = lac.get("head_dim", 128)
        self.conv_K = lac.get("short_conv_kernel_size", 4)
        self.layer_types = list(c.layer_types)
        self.lin_ids = c.linear_layer_ids
        self.full_ids = c.full_attn_layer_ids
        self.use_gmm = jax.default_backend() == "tpu"
        self.ep_mesh = None
        self.ep_axis = "tp"
        self.n_dense_mlp = c.first_k_dense_replace if c.is_moe else (
            c.num_hidden_layers)

    # ------------------------------------------------------------------
    def _kda_shapes(self, c):
        H = c.hidden_size
        h, d = self.kh, self.kd
        return {
            "kda_q_proj": (H, h * d), "kda_k_proj": (H, h * d),
            "kda_v_proj": (H, h * d),
            "kda_q_conv": (h * d, self.conv_K),
            "kda_k_conv": (h * d, self.conv_K),
            "kda_v_conv": (h * d, self.conv_K),
            "kda_f_a": (H, d), "kda_f_b": (d, h * d),
            "kda_g_a": (H, d), "kda_g_b": (d, h * d),
            "kda_b_proj": (H, h),
            "kda_dt_bias": (h * d,), "kda_A_log": (h,),
            "kda_o_norm": (d,),
            "kda_o_proj": (h * d, H),
        }

    def _mla_shapes(self, c):
        H, Hq = c.hidden_size, c.num_attention_heads
        r, dn, dr, dv = (c.kv_lora_rank, c.qk_nope_head_dim,
                         c.qk_rope_head_dim, c.v_head_dim)
        d = {
            "kv_a_proj": (H, r + dr),
            "kv_a_layernorm": (r,),
            "w_kc": (Hq, r, dn),
            "w_vc": (Hq, r, dv),
            "o_proj": (Hq * dv, H),
        }
        if c.q_lora_rank:
            d.update({
                "q_a_proj": (H, c.q_lora_rank),
                "q_a_layernorm": (c.q_lora_rank,),
                "q_b_proj": (c.q_lora_rank, Hq * self.qk_dim),
            })
        else:
            d["q_proj"] = (H, Hq * self.qk_dim)
        return d

    def _mlp_shapes(self, c, dense: bool):
        H = c.hidden_size
        if dense or not c.is_moe:
            I = c.intermediate_size
            return {"gate_proj": (H, I), "up_proj": (H, I),
                    "down_proj": (I, H)}
        E, Im = c.num_experts, c.moe_intermediate_size
        d = {
            "router": (H, E), "correction_bias": (E,),
            "w_gate_up": (E, H, 2 * Im), "w_down": (E, Im, H),
        }
        if c.num_shared_experts:
            Is = Im * c.num_shared_experts
            d.update({
                "shared_gate_proj": (H, Is), "shared_up_proj": (H, Is),
                "shared_down_proj": (Is, H),
            })
        return d

    def _layer_shapes(self, c, layer_id: int):
        kind = self.layer_types[layer_id]
        base = {"input_layernorm": (c.hidden_size,),
                "post_attention_layernorm": (c.hidden_size,)}
        attn = (self._kda_shapes(c) if kind == "linear_attention"
                else self._mla_shapes(c))
        mlp = self._mlp_shapes(c, layer_id < self.n_dense_mlp)
        return {**base, **attn, **mlp}

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        shapes: Dict[str, Any] = {
            "embed_tokens": (c.vocab_size, c.hidden_size),
            "norm": (c.hidden_size,),
        }
        # group layers by (kind, dense-vs-moe) signature so stacking works
        self.groups: Dict[str, list] = {}
        for i, kind in enumerate(self.layer_types):
            key = f"{'lin' if kind == 'linear_attention' else 'full'}_" \
                  f"{'dense' if i < self.n_dense_mlp or not c.is_moe else 'moe'}"
            self.groups.setdefault(key, []).append(i)
        for key, ids in self.groups.items():
            per = self._layer_shapes(c, ids[0])
            shapes[key] = {k: (len(ids),) + v for k, v in per.items()}
        if not c.tie_word_embeddings:
            shapes["lm_head"] = (c.hidden_size, c.vocab_size)
        return shapes

    def param_specs(self) -> Dict[str, Any]:
        c = self.config
        shapes = self.param_shapes()
        specs: Dict[str, Any] = {
            "embed_tokens": P("tp", None), "norm": P(),
        }
        moe_specs = {
            "w_gate_up": P(None, "tp", None, None),
            "w_down": P(None, "tp", None, None),
        }
        for key in self.groups:
            specs[key] = {
                k: moe_specs.get(k, P()) for k in shapes[key]
            }
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
        for key in self.groups:
            for k in params[key]:
                if ("layernorm" in k or k == "kda_o_norm"):
                    params[key][k] = jnp.ones_like(params[key][k])
                elif k in ("correction_bias",):
                    params[key][k] = jnp.zeros_like(
                        params[key][k]).astype(jnp.float32)
                elif k == "kda_A_log":
                    params[key][k] = jnp.zeros_like(
                        params[key][k]).astype(jnp.float32)
                elif k == "kda_dt_bias":
                    params[key][k] = jnp.ones_like(
                        params[key][k]).astype(jnp.float32)
        return params

    # ------------------------------------------------------------------
    def _kda_layer(self, lp, normed, kv: HybridKVCache, lin_idx, batch):
        B, S, H = normed.shape
        h, d = self.kh, self.kd
        eps = self.config.rms_norm_eps
        R_trash = kv.conv.shape[1] - 1
        idx = jnp.where(batch.state_idx < 0, R_trash, batch.state_idx)
        conv_state = kv.conv[lin_idx][idx]
        rec_state = kv.rec[lin_idx][idx]
        if batch.mode.is_extend():
            fresh = (batch.positions[:, 0] == 0) & (batch.q_lens > 0)
            conv_state = jnp.where(fresh[:, None, None], 0, conv_state)
            rec_state = jnp.where(fresh[:, None, None, None], 0, rec_state)

        q = normed @ lp["kda_q_proj"]
        k = normed @ lp["kda_k_proj"]
        v = normed @ lp["kda_v_proj"]
        mixed = jnp.concatenate([q, k, v], axis=-1)      # [B, S, 3hd]
        conv_w = jnp.concatenate(
            [lp["kda_q_conv"], lp["kda_k_conv"], lp["kda_v_conv"]], axis=0
        )
        act, conv_state = causal_conv1d(
            mixed, conv_state, conv_w, batch.q_lens
        )
        q, k, v = jnp.split(act, 3, axis=-1)
        q = q.reshape(B, S, h, d)
        k = k.reshape(B, S, h, d)
        v = v.reshape(B, S, h, d)
        beta = jax.nn.sigmoid(
            (normed @ lp["kda_b_proj"]).astype(jnp.float32))
        # per-channel gate (fla kda_gate: -exp(A)*softplus(x + dt_bias))
        gproj = ((normed @ lp["kda_f_a"]) @ lp["kda_f_b"]).astype(
            jnp.float32) + lp["kda_dt_bias"].astype(jnp.float32)
        g = -jnp.exp(lp["kda_A_log"].astype(jnp.float32))[
            :, None] * jax.nn.softplus(gproj.reshape(B, S, h, d))

        out, rec_state = kda_delta_rule(
            q, k, v, g.astype(v.dtype), beta.astype(v.dtype), rec_state,
            q_len=batch.q_lens if S > 1 else None,
        )
        # sigmoid-gated RMS norm (FusedRMSNormGated activation="sigmoid")
        g2 = ((normed @ lp["kda_g_a"]) @ lp["kda_g_b"]).reshape(
            B, S, h, d)
        o32 = out.astype(jnp.float32)
        var = jnp.mean(o32 * o32, axis=-1, keepdims=True)
        o32 = o32 * jax.lax.rsqrt(var + eps) * lp["kda_o_norm"].astype(
            jnp.float32)
        o32 = o32 * jax.nn.sigmoid(g2.astype(jnp.float32))
        out = o32.astype(normed.dtype).reshape(B, S, h * d)
        out = out @ lp["kda_o_proj"]

        kv = HybridKVCache(
            mha=kv.mha,
            conv=kv.conv.at[lin_idx, idx].set(conv_state),
            rec=kv.rec.at[lin_idx, idx].set(rec_state),
        )
        return out, kv

    def _mla_layer(self, lp, normed, kv: HybridKVCache, full_idx, batch,
                   cos, sin):
        c = self.config
        B, S, H = normed.shape
        Hq = c.num_attention_heads
        dn, dr = c.qk_nope_head_dim, c.qk_rope_head_dim
        r = c.kv_lora_rank
        eps = c.rms_norm_eps
        if c.q_lora_rank:
            q = rms_norm(normed @ lp["q_a_proj"], lp["q_a_layernorm"], eps)
            q = q @ lp["q_b_proj"]
        else:
            q = normed @ lp["q_proj"]
        q = q.reshape(B, S, Hq, self.qk_dim)
        q_nope, q_pe = q[..., :dn], q[..., dn:]
        kv_a = normed @ lp["kv_a_proj"]
        ckv, k_pe = kv_a[..., :r], kv_a[..., r:]
        ckv = rms_norm(ckv, lp["kv_a_layernorm"], eps)
        if not self.nope and dr > 0:
            q_pe = apply_rope(q_pe, cos, sin, interleaved=True)
            k_pe = apply_rope(k_pe, cos, sin, interleaved=True)
        out, mla = self.attn(
            kv.mha, full_idx, q_nope, q_pe, ckv, k_pe, batch,
            lp["w_kc"], lp["w_vc"], self.sm_scale,
        )
        out = out.reshape(B, S, Hq * c.v_head_dim) @ lp["o_proj"]
        return out, HybridKVCache(mha=mla, conv=kv.conv, rec=kv.rec)

    def _mlp(self, lp, x2d, dense: bool):
        c = self.config
        if dense or not c.is_moe:
            return (jax.nn.silu(x2d @ lp["gate_proj"])
                    * (x2d @ lp["up_proj"])) @ lp["down_proj"]
        logits = x2d.astype(jnp.float32) @ lp["router"].astype(
            jnp.float32)
        from sglang_fluentllm_tpu.ops.moe.layer import model_moe_forward

        out = model_moe_forward(
            self, x2d, logits, lp["w_gate_up"], lp["w_down"], c,
            correction_bias=lp["correction_bias"],
        )
        if c.num_shared_experts:
            out = out + (jax.nn.silu(x2d @ lp["shared_gate_proj"])
                         * (x2d @ lp["shared_up_proj"])
                         ) @ lp["shared_down_proj"]
        return out

    def forward(self, params, kv_cache: HybridKVCache,
                batch: ForwardBatch):
        c = self.config
        eps = c.rms_norm_eps
        B, S = batch.input_ids.shape
        h = jnp.take(params["embed_tokens"], batch.input_ids, axis=0)
        cos = self.rope.cos[batch.positions]
        sin = self.rope.sin[batch.positions]

        group_pos = {k: 0 for k in self.groups}
        lin_i = full_i = 0
        for i, kind in enumerate(self.layer_types):
            key = f"{'lin' if kind == 'linear_attention' else 'full'}_" \
                  f"{'dense' if i < self.n_dense_mlp or not c.is_moe else 'moe'}"
            gi = group_pos[key]
            group_pos[key] += 1
            lp = jax.tree.map(lambda x, j=gi: x[j], params[key])
            normed = rms_norm(h, lp["input_layernorm"], eps)
            if kind == "linear_attention":
                out, kv_cache = self._kda_layer(
                    lp, normed, kv_cache, lin_i, batch)
                lin_i += 1
            else:
                out, kv_cache = self._mla_layer(
                    lp, normed, kv_cache, full_i, batch, cos, sin)
                full_i += 1
            h = h + out
            normed2 = rms_norm(h, lp["post_attention_layernorm"], eps)
            mlp_out = self._mlp(
                lp, normed2.reshape(B * S, -1),
                dense=i < self.n_dense_mlp,
            )
            h = h + mlp_out.reshape(B, S, -1)
        return kv_cache, rms_norm(h, params["norm"], eps)

    def compute_logits(self, params, hidden):
        w = (params["embed_tokens"].T if self.config.tie_word_embeddings
             else params["lm_head"])
        return (hidden @ w).astype(jnp.float32)

    # ------------------------------------------------------------------
    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        c = self.config
        L = c.num_hidden_layers
        Hq = c.num_attention_heads
        dn, dv = c.qk_nope_head_dim, c.v_head_dim
        r = c.kv_lora_rank
        st: Dict[int, Dict[str, Any]] = {i: {} for i in range(L)}
        experts: Dict[int, Dict[Any, Dict[str, np.ndarray]]] = {
            i: {} for i in range(L)}
        top: Dict[str, Any] = {}
        mapping = {
            "input_layernorm.weight": ("input_layernorm", ""),
            "post_attention_layernorm.weight":
                ("post_attention_layernorm", ""),
            # KDA
            "self_attn.q_proj.weight": ("kda_q_proj", "T"),
            "self_attn.k_proj.weight": ("kda_k_proj", "T"),
            "self_attn.v_proj.weight": ("kda_v_proj", "T"),
            "self_attn.q_conv1d.weight": ("kda_q_conv", "conv"),
            "self_attn.k_conv1d.weight": ("kda_k_conv", "conv"),
            "self_attn.v_conv1d.weight": ("kda_v_conv", "conv"),
            "self_attn.f_a_proj.weight": ("kda_f_a", "T"),
            "self_attn.f_b_proj.weight": ("kda_f_b", "T"),
            "self_attn.g_a_proj.weight": ("kda_g_a", "T"),
            "self_attn.g_b_proj.weight": ("kda_g_b", "T"),
            "self_attn.b_proj.weight": ("kda_b_proj", "T"),
            "self_attn.dt_bias": ("kda_dt_bias", ""),
            "self_attn.A_log": ("kda_A_log", "flat"),
            "self_attn.o_norm.weight": ("kda_o_norm", ""),
            "self_attn.o_proj.weight": ("kda_o_proj", "T"),
            # MLA
            "self_attn.q_a_proj.weight": ("q_a_proj", "T"),
            "self_attn.q_a_layernorm.weight": ("q_a_layernorm", ""),
            "self_attn.q_b_proj.weight": ("q_b_proj", "T"),
            "self_attn.kv_a_proj_with_mqa.weight": ("kv_a_proj", "T"),
            "self_attn.kv_a_layernorm.weight": ("kv_a_layernorm", ""),
            "self_attn.o_proj.weight#mla": ("o_proj", "T"),
            # MLP / MoE
            "mlp.gate_proj.weight": ("gate_proj", "T"),
            "mlp.up_proj.weight": ("up_proj", "T"),
            "mlp.down_proj.weight": ("down_proj", "T"),
            "mlp.gate.weight": ("router", "T"),
            "mlp.gate.e_score_correction_bias": ("correction_bias", ""),
            "mlp.shared_experts.gate_proj.weight":
                ("shared_gate_proj", "T"),
            "mlp.shared_experts.up_proj.weight": ("shared_up_proj", "T"),
            "mlp.shared_experts.down_proj.weight":
                ("shared_down_proj", "T"),
        }
        kda_set = set(self.lin_ids)
        for name, w in named_tensors:
            if name.startswith("model."):
                name = name[len("model."):]
            name = name.replace("block_sparse_moe.", "mlp.")
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
                if rest == "self_attn.o_proj.weight" and \
                        li not in kda_set:
                    rest = "self_attn.o_proj.weight#mla"
                if rest == "self_attn.kv_b_proj.weight":
                    kvb = np.asarray(w).T.reshape(r, Hq, dn + dv)
                    st[li]["w_kc"] = np.transpose(
                        kvb[..., :dn], (1, 0, 2))
                    st[li]["w_vc"] = np.transpose(
                        kvb[..., dn:], (1, 0, 2))
                elif rest in mapping:
                    key, op = mapping[rest]
                    w = np.asarray(w)
                    if op == "T":
                        w = w.T
                    elif op == "conv":
                        w = w.reshape(w.shape[0], -1)  # [hd, 1?, K]->[hd,K]
                    elif op == "flat":
                        w = w.reshape(-1)
                    st[li][key] = w
                elif rest.startswith("mlp.experts."):
                    e = int(parts[4])
                    experts[li].setdefault(e, {})[parts[5]] = w
        E = c.num_experts
        for li in range(L):
            if not experts[li]:
                continue
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
        f32 = {"correction_bias", "kda_A_log", "kda_dt_bias"}
        for key, ids in self.groups.items():
            params[key] = {}
            for k in shapes[key]:
                mats = [st[i][k] for i in ids]
                params[key][k] = jnp.asarray(
                    np.stack(mats),
                    dtype=jnp.float32 if k in f32 else dtype)
        return params
