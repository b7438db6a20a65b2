"""Qwen3-Next (hybrid Gated-DeltaNet + full attention, MoE).

Reference: ``srt/models/qwen3_next.py`` + ``srt/layers/attention/
fla_backend.py`` (fla kernels); semantics follow HF
``modeling_qwen3_next`` exactly (tests do checkpoint round-trip parity).

Structure per ``config.layer_types``:
- ``linear_attention`` layers: Gated DeltaNet (``ops/linear_attn.py``)
  with depthwise causal conv; per-request conv/recurrent state rows in
  the HybridKVCache pool (``mem/kv_cache.py``), indexed by
  ``batch.state_idx``.
- ``full_attention`` layers: GQA with per-head output GATE (q_proj emits
  query|gate per head), q/k head RMSNorm, partial rotary (0.25).
- MLP: Qwen3-MoE style sparse block (softmax top-k + norm_topk_prob +
  shared expert with sigmoid gate).

Checkpoint mapping: ``in_proj_qkvz``/``in_proj_ba`` are split at load
into separate q/k/v/z/b/a projections (the fused layout packs them per
key-head group); full-attention ``q_proj`` is split into query and gate
halves per head.
"""

from __future__ import annotations

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
    gated_delta_rule,
)
from sglang_fluentllm_tpu.ops.moe.layer import moe_forward
from sglang_fluentllm_tpu.ops.rotary import RotaryEmbedding, apply_rope
from sglang_fluentllm_tpu.runtime.forward_batch import ForwardBatch


@register("Qwen3NextForCausalLM")
class Qwen3NextForCausalLM:
    def __init__(self, config: ModelConfig, attn_backend):
        self.config = config
        self.attn = attn_backend
        self.sm_scale = config.head_dim ** -0.5
        hf = config.hf_config
        self.rotary_dim = int(
            config.head_dim * hf.get("partial_rotary_factor", 0.25)
        )
        self.rope = RotaryEmbedding(
            self.rotary_dim,
            max(config.context_length or 0, config.max_position_embeddings),
            config.rope_theta,
            config.rope_scaling,
        )
        self.hk = hf.get("linear_num_key_heads", 1)
        self.hv = hf.get("linear_num_value_heads", self.hk)
        self.dk = hf.get("linear_key_head_dim", config.head_dim)
        self.dv = hf.get("linear_value_head_dim", self.dk)
        self.conv_K = hf.get("linear_conv_kernel_dim", 4)
        self.layer_types = list(config.layer_types)
        self.lin_ids = config.linear_layer_ids
        self.full_ids = config.full_attn_layer_ids
        self.use_gmm = jax.default_backend() == "tpu"
        self.ep_mesh = None
        self.ep_axis = "tp"
        self.shared_I = hf.get("shared_expert_intermediate_size",
                               config.intermediate_size)

    # ------------------------------------------------------------------
    def _linear_shapes(self, c):
        H = c.hidden_size
        hk, hv, dk, dv = self.hk, self.hv, self.dk, self.dv
        return {
            "input_layernorm": (H,),
            "post_attention_layernorm": (H,),
            "wq": (H, hk * dk), "wk": (H, hk * dk),
            "wv": (H, hv * dv), "wz": (H, hv * dv),
            "wb": (H, hv), "wa": (H, hv),
            "conv_w": (2 * hk * dk + hv * dv, self.conv_K),
            "A_log": (hv,), "dt_bias": (hv,),
            "gdn_norm": (dv,),
            "out_proj": (hv * dv, H),
        }

    def _full_shapes(self, c):
        H = c.hidden_size
        D, Hq, Hk = c.head_dim, c.num_attention_heads, c.num_key_value_heads
        return {
            "input_layernorm": (H,),
            "post_attention_layernorm": (H,),
            "q_proj": (H, Hq * D), "gate_proj_attn": (H, Hq * D),
            "k_proj": (H, Hk * D), "v_proj": (H, Hk * D),
            "o_proj": (Hq * D, H),
            "q_norm": (D,), "k_norm": (D,),
        }

    def _mlp_shapes(self, c):
        H = c.hidden_size
        E, Im = c.num_experts, c.moe_intermediate_size
        return {
            "router": (H, E),
            "w_gate_up": (E, H, 2 * Im),
            "w_down": (E, Im, H),
            "shared_gate_up": (H, 2 * self.shared_I),
            "shared_down": (self.shared_I, H),
            "shared_gate": (H, 1),
        }

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        lin = {**self._linear_shapes(c), **self._mlp_shapes(c)}
        full = {**self._full_shapes(c), **self._mlp_shapes(c)}
        shapes: Dict[str, Any] = {
            "embed_tokens": (c.vocab_size, c.hidden_size),
            "norm": (c.hidden_size,),
        }
        if self.lin_ids:
            shapes["linear_layers"] = {
                k: (len(self.lin_ids),) + v for k, v in lin.items()
            }
        if self.full_ids:
            shapes["full_layers"] = {
                k: (len(self.full_ids),) + v for k, v in full.items()
            }
        if not c.tie_word_embeddings:
            shapes["lm_head"] = (c.hidden_size, c.vocab_size)
        return shapes

    def param_specs(self) -> Dict[str, Any]:
        # linear-state layers replicated (correctness first); MoE experts
        # sharded over tp like the other MoE families
        c = self.config

        def lay(d, moe=True):
            out = {k: P() for k in d}
            if moe:
                out.update({
                    "w_gate_up": P(None, "tp", None, None),
                    "w_down": P(None, "tp", None, None),
                    "shared_gate_up": P(None, None, "tp"),
                    "shared_down": P(None, "tp", None),
                })
            return out

        specs: Dict[str, Any] = {
            "embed_tokens": P("tp", None), "norm": P(),
        }
        if self.lin_ids:
            specs["linear_layers"] = lay(
                self.param_shapes()["linear_layers"])
        if self.full_ids:
            specs["full_layers"] = lay(self.param_shapes()["full_layers"])
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
        for grp in ("linear_layers", "full_layers"):
            if grp not in params:
                continue
            for k in params[grp]:
                if "layernorm" in k or k in ("q_norm", "k_norm",
                                             "gdn_norm"):
                    params[grp][k] = jnp.ones_like(params[grp][k])
                elif k == "A_log":
                    params[grp][k] = jnp.zeros_like(
                        params[grp][k]) + jnp.log(jnp.asarray(
                            1.0, params[grp][k].dtype))
                elif k == "dt_bias":
                    params[grp][k] = jnp.ones_like(params[grp][k])
        return params

    # ------------------------------------------------------------------
    def _gdn_layer(self, lp, normed, kv: HybridKVCache, lin_idx,
                   batch: ForwardBatch):
        """One Gated DeltaNet layer (HF Qwen3NextGatedDeltaNet.forward)."""
        B, S, H = normed.shape
        hk, hv, dk, dv = self.hk, self.hv, self.dk, self.dv
        R_trash = kv.conv.shape[1] - 1
        idx = jnp.where(batch.state_idx < 0, R_trash, batch.state_idx)
        conv_state = kv.conv[lin_idx][idx]        # [B, conv_dim, K]
        rec_state = kv.rec[lin_idx][idx]          # [B, hv, dk, dv]
        from sglang_fluentllm_tpu.runtime.forward_batch import (
            ForwardMode,
        )

        verify = batch.mode == ForwardMode.TARGET_VERIFY
        if batch.mode.is_extend() and not verify:
            # rows starting at position 0 are FRESH sequences: the pool
            # row may hold a finished/retracted request's state — reset
            fresh = (batch.positions[:, 0] == 0) & (batch.q_lens > 0)
            conv_state = jnp.where(
                fresh[:, None, None], 0, conv_state)
            rec_state = jnp.where(
                fresh[:, None, None, None], 0, rec_state)

        q = normed @ lp["wq"]
        k = normed @ lp["wk"]
        v = normed @ lp["wv"]
        z = (normed @ lp["wz"]).reshape(B, S, hv, dv)
        b = (normed @ lp["wb"]).astype(jnp.float32)
        a = (normed @ lp["wa"]).astype(jnp.float32)

        mixed = jnp.concatenate([q, k, v], axis=-1)  # [B, S, conv_dim]
        act, conv_state = causal_conv1d(
            mixed, conv_state, lp["conv_w"], batch.q_lens
        )
        q, k, v = jnp.split(act, [hk * dk, 2 * hk * dk], axis=-1)
        q = q.reshape(B, S, hk, dk)
        k = k.reshape(B, S, hk, dk)
        v = v.reshape(B, S, hv, dv)
        beta = jax.nn.sigmoid(b)
        g = -jnp.exp(lp["A_log"].astype(jnp.float32)) * jax.nn.softplus(
            a + lp["dt_bias"].astype(jnp.float32)
        )
        G = hv // hk
        if G > 1:
            q = jnp.repeat(q, G, axis=2)
            k = jnp.repeat(k, G, axis=2)

        aux = None
        if verify:
            # spec verify: per-token recurrence + exact-inverse records
            # so rejected tokens can be rolled back out of the state
            # (rollback_linear_state below)
            from sglang_fluentllm_tpu.ops.linear_attn import (
                gated_delta_rule_aux,
            )

            conv_pre = kv.conv[lin_idx][idx]
            out, rec_state, rec_aux = gated_delta_rule_aux(
                q, k, v, g.astype(jnp.float32),
                beta.astype(jnp.float32), rec_state, batch.q_lens,
            )
            aux = {"rec": rec_aux, "conv_pre": conv_pre, "mixed": mixed}
        else:
            out, rec_state = gated_delta_rule(
                q, k, v, g.astype(v.dtype), beta.astype(v.dtype),
                rec_state,
                q_len=batch.q_lens if S > 1 else None,
            )
        # gated RMS norm then merge heads (Qwen3NextRMSNormGated)
        out32 = out.astype(jnp.float32)
        var = jnp.mean(out32 * out32, axis=-1, keepdims=True)
        out32 = out32 * jax.lax.rsqrt(var + self.config.rms_norm_eps)
        out32 = out32 * lp["gdn_norm"].astype(jnp.float32)
        out32 = out32 * jax.nn.silu(z.astype(jnp.float32))
        out = out32.astype(normed.dtype).reshape(B, S, hv * dv)
        out = out @ lp["out_proj"]

        kv = HybridKVCache(
            mha=kv.mha,
            conv=kv.conv.at[lin_idx, idx].set(conv_state),
            rec=kv.rec.at[lin_idx, idx].set(rec_state),
            aux=(kv.aux or []) + [aux] if aux is not None else kv.aux,
        )
        return out, kv

    def _full_layer(self, lp, normed, kv: HybridKVCache, full_idx,
                    batch, cos, sin):
        c = self.config
        B, S, H = normed.shape
        Hq, Hk, D = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        eps = c.rms_norm_eps
        q = (normed @ lp["q_proj"]).reshape(B, S, Hq, D)
        gate = normed @ lp["gate_proj_attn"]
        k = (normed @ lp["k_proj"]).reshape(B, S, Hk, D)
        v = (normed @ lp["v_proj"]).reshape(B, S, Hk, D)
        q = rms_norm(q, lp["q_norm"], eps)
        k = rms_norm(k, lp["k_norm"], eps)
        r = self.rotary_dim
        q = jnp.concatenate(
            [apply_rope(q[..., :r], cos, sin), q[..., r:]], axis=-1)
        k = jnp.concatenate(
            [apply_rope(k[..., :r], cos, sin), k[..., r:]], axis=-1)
        attn_out, mha = self.attn(
            kv.mha, full_idx, q, k, v, batch, self.sm_scale
        )
        attn_out = attn_out.reshape(B, S, Hq * D) * jax.nn.sigmoid(gate)
        out = attn_out @ lp["o_proj"]
        return out, HybridKVCache(mha=mha, conv=kv.conv, rec=kv.rec,
                                  aux=kv.aux)

    def _moe(self, lp, x2d):
        c = self.config
        logits = x2d @ lp["router"]
        from sglang_fluentllm_tpu.ops.moe.layer import model_moe_forward

        out = model_moe_forward(
            self, x2d, logits, lp["w_gate_up"], lp["w_down"], c,
        )
        h = x2d @ lp["shared_gate_up"]
        g, u = jnp.split(h, 2, axis=-1)
        shared = (jax.nn.silu(g) * u) @ lp["shared_down"]
        gate = jax.nn.sigmoid(x2d @ lp["shared_gate"])
        return out + gate * shared

    def forward(self, params, kv_cache: HybridKVCache,
                batch: ForwardBatch):
        c = self.config
        eps = c.rms_norm_eps
        B, S = batch.input_ids.shape
        h = jnp.take(params["embed_tokens"], batch.input_ids, axis=0)
        cos = self.rope.cos[batch.positions]
        sin = self.rope.sin[batch.positions]

        lin_i = full_i = 0
        for kind in self.layer_types:
            if kind == "linear_attention":
                lp = jax.tree.map(
                    lambda x, i=lin_i: x[i], params["linear_layers"])
                normed = rms_norm(h, lp["input_layernorm"], eps)
                out, kv_cache = self._gdn_layer(
                    lp, normed, kv_cache, lin_i, batch)
                lin_i += 1
            else:
                lp = jax.tree.map(
                    lambda x, i=full_i: x[i], params["full_layers"])
                normed = rms_norm(h, lp["input_layernorm"], eps)
                out, kv_cache = self._full_layer(
                    lp, normed, kv_cache, full_i, batch, cos, sin)
                full_i += 1
            h = h + out
            normed2 = rms_norm(h, lp["post_attention_layernorm"], eps)
            moe_out = self._moe(lp, normed2.reshape(B * S, -1))
            h = h + moe_out.reshape(B, S, -1)
        return kv_cache, rms_norm(h, params["norm"], eps)

    def compute_logits(self, params, hidden):
        w = (params["embed_tokens"].T if self.config.tie_word_embeddings
             else params["lm_head"])
        return (hidden @ w).astype(jnp.float32)

    def rollback_linear_state(self, kv_cache: HybridKVCache,
                              batch: ForwardBatch,
                              kept: jax.Array) -> HybridKVCache:
        """After spec acceptance: invert the conv/rec updates of the
        window tokens beyond ``kept`` per row (exact; reference MambaPool
        speculative-state restore role). ``kv_cache.aux`` comes from the
        TARGET_VERIFY forward."""
        from sglang_fluentllm_tpu.ops.linear_attn import gdn_rollback

        assert kv_cache.aux is not None
        conv, rec = kv_cache.conv, kv_cache.rec
        R_trash = conv.shape[1] - 1
        idx = jnp.where(batch.state_idx < 0, R_trash, batch.state_idx)
        K = conv.shape[-1]
        S = batch.input_ids.shape[1]
        for lin_i, aux in enumerate(kv_cache.aux):
            new_rec = gdn_rollback(rec[lin_i][idx], aux["rec"], kept)
            # conv tail = last K inputs of (pre-window tail ++ kept
            # window inputs): pure index arithmetic, no inversion needed
            mixed = aux["mixed"]                  # [B, S, conv_dim]
            pre = aux["conv_pre"]                 # [B, conv_dim, K]
            j = jnp.arange(K, dtype=jnp.int32)[None, :]       # [1, K]
            comb = kept[:, None] + j                          # [B, K]
            from_pre = comb < K
            pre_col = jnp.clip(comb, 0, K - 1)
            win_col = jnp.clip(comb - K, 0, S - 1)
            pre_vals = jnp.take_along_axis(
                pre, pre_col[:, None, :], axis=2)             # [B,C,K]
            win_vals = jnp.take_along_axis(
                mixed, win_col[:, :, None], axis=1
            ).swapaxes(1, 2)                                  # [B,C,K]
            new_conv = jnp.where(
                from_pre[:, None, :], pre_vals,
                win_vals.astype(pre.dtype))
            rec = rec.at[lin_i, idx].set(new_rec)
            conv = conv.at[lin_i, idx].set(new_conv)
        return HybridKVCache(mha=kv_cache.mha, conv=conv, rec=rec)

    # ------------------------------------------------------------------
    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        c = self.config
        hk, hv, dk, dv = self.hk, self.hv, self.dk, self.dv
        G = hv // hk
        L, E = c.num_hidden_layers, c.num_experts
        st: Dict[int, Dict[str, Any]] = {i: {} for i in range(L)}
        experts: Dict[int, Dict[Any, Dict[str, np.ndarray]]] = {
            i: {} for i in range(L)}
        top: Dict[str, Any] = {}

        def split_qkvz(w):
            # [H, hk*(2dk + 2*G*dv)] grouped per key head
            Hd = w.shape[0]
            wg = w.reshape(Hd, hk, 2 * dk + 2 * G * dv)
            wq = wg[:, :, :dk].reshape(Hd, hk * dk)
            wk_ = wg[:, :, dk:2 * dk].reshape(Hd, hk * dk)
            wv_ = wg[:, :, 2 * dk:2 * dk + G * dv].reshape(Hd, hv * dv)
            wz = wg[:, :, 2 * dk + G * dv:].reshape(Hd, hv * dv)
            return wq, wk_, wv_, wz

        def split_ba(w):
            Hd = w.shape[0]
            wg = w.reshape(Hd, hk, 2 * G)
            wb = wg[:, :, :G].reshape(Hd, hv)
            wa = wg[:, :, G:].reshape(Hd, hv)
            return wb, wa

        mapping = {
            "input_layernorm.weight": ("input_layernorm", False),
            "post_attention_layernorm.weight":
                ("post_attention_layernorm", False),
            "linear_attn.A_log": ("A_log", False),
            "linear_attn.dt_bias": ("dt_bias", False),
            "linear_attn.norm.weight": ("gdn_norm", False),
            "linear_attn.out_proj.weight": ("out_proj", True),
            "self_attn.k_proj.weight": ("k_proj", True),
            "self_attn.v_proj.weight": ("v_proj", True),
            "self_attn.o_proj.weight": ("o_proj", True),
            "self_attn.q_norm.weight": ("q_norm", False),
            "self_attn.k_norm.weight": ("k_norm", False),
            "mlp.gate.weight": ("router", True),
            "mlp.shared_expert_gate.weight": ("shared_gate", True),
        }
        D, Hq = c.head_dim, c.num_attention_heads
        # Qwen3NextRMSNorm is ZERO-CENTERED: stored weight w, applied as
        # (1 + w) (modeling_qwen3_next.Qwen3NextRMSNorm). Our rms_norm op
        # multiplies by w directly, so shift at load. gdn_norm
        # (RMSNormGated) is standard ones-init — no shift.
        centered = {"input_layernorm", "post_attention_layernorm",
                    "q_norm", "k_norm"}
        for name, w in named_tensors:
            if name.startswith("model."):
                name = name[len("model."):]
            if name == "embed_tokens.weight":
                top["embed_tokens"] = w
            elif name == "norm.weight":
                top["norm"] = np.asarray(w) + 1.0
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
                    if key in centered:
                        w = np.asarray(w) + 1.0
                    st[li][key] = w.T if tr else w
                elif rest == "linear_attn.in_proj_qkvz.weight":
                    (st[li]["wq"], st[li]["wk"], st[li]["wv"],
                     st[li]["wz"]) = split_qkvz(np.asarray(w).T)
                elif rest == "linear_attn.in_proj_ba.weight":
                    st[li]["wb"], st[li]["wa"] = split_ba(
                        np.asarray(w).T)
                elif rest == "linear_attn.conv1d.weight":
                    st[li]["conv_w"] = np.asarray(w)[:, 0, :]
                elif rest == "self_attn.q_proj.weight":
                    # [Hq*D*2, H] -> query | gate halves per head
                    wt = np.asarray(w).T.reshape(-1, Hq, 2 * D)
                    st[li]["q_proj"] = wt[:, :, :D].reshape(-1, Hq * D)
                    st[li]["gate_proj_attn"] = wt[:, :, D:].reshape(
                        -1, Hq * D)
                elif rest.startswith("mlp.shared_expert."):
                    experts[li].setdefault("shared", {})[parts[4]] = w
                elif rest.startswith("mlp.experts."):
                    e = int(parts[4])
                    experts[li].setdefault(e, {})[parts[5]] = w
        for li in range(L):
            emap = experts[li]
            st[li]["w_gate_up"] = np.stack([
                np.concatenate([emap[e]["gate_proj"].T,
                                emap[e]["up_proj"].T], axis=1)
                for e in range(E)])
            st[li]["w_down"] = np.stack(
                [emap[e]["down_proj"].T for e in range(E)])
            sh = emap["shared"]
            st[li]["shared_gate_up"] = np.concatenate(
                [sh["gate_proj"].T, sh["up_proj"].T], axis=1)
            st[li]["shared_down"] = sh["down_proj"].T

        shapes = self.param_shapes()
        params: Dict[str, Any] = {
            "embed_tokens": jnp.asarray(top["embed_tokens"], dtype=dtype),
            "norm": jnp.asarray(top["norm"], dtype=dtype),
        }
        if not c.tie_word_embeddings:
            params["lm_head"] = jnp.asarray(top["lm_head"], dtype=dtype)
        f32_keys = {"A_log", "dt_bias"}
        if self.lin_ids:
            params["linear_layers"] = {
                k: jnp.asarray(
                    np.stack([st[i][k] for i in self.lin_ids]),
                    dtype=jnp.float32 if k in f32_keys else dtype)
                for k in shapes["linear_layers"]
            }
        if self.full_ids:
            params["full_layers"] = {
                k: jnp.asarray(
                    np.stack([st[i][k] for i in self.full_ids]),
                    dtype=dtype)
                for k in shapes["full_layers"]
            }
        return params
