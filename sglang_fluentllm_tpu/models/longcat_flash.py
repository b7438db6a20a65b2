"""LongCat Flash (ScMoE) causal LM — the reference fork's flagship.

Parity target: reference ``srt/models/longcat_flash.py``
(``FLASHDecoderLayer:253``). Each decoder layer is a shortcut-MoE block:

    r  = h + r
    x1 = post_norm0(attn0(in_norm0(r)) + r)     # r accumulates
    moe = MoE(x1)            # router over E + zero experts, bias-corrected
    x2 = in_norm1(mlp0(x1) + r)
    x3 = post_norm1(attn1(x2) + r)
    h' = mlp1(x3) + moe      # shortcut branch rejoins after the 2nd block

i.e. two sequential (MLA attention + dense MLP) sub-blocks with one MoE
spanning them; zero experts (ids >= E) contribute identity scaled by the
router weight (``layers/moe/layer.py:61-72`` semantics). KV pool depth is
2x num layers (two attentions per layer).
"""

from __future__ import annotations

import dataclasses
import math
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


@register("FLASHForCausalLM", "LongcatFlashForCausalLM")
class LongcatFlashForCausalLM:
    def __init__(self, config: ModelConfig, attn_backend):
        self.config = config
        self.attn = attn_backend
        c = config
        self.qk_dim = (c.qk_nope_head_dim + c.qk_rope_head_dim) \
            or c.head_dim
        self.sm_scale = self.qk_dim ** -0.5
        self.rope = RotaryEmbedding(
            c.qk_rope_head_dim or c.head_dim,
            max(c.context_length or 0, c.max_position_embeddings),
            c.rope_theta,
            c.rope_scaling,
            interleaved=True,
        )
        self.use_gmm = jax.default_backend() == "tpu"
        self.ep_mesh = None
        self.ep_axis = "tp"
        self.oep = None
        if c.use_over_embedding:
            from sglang_fluentllm_tpu.ops.over_embedding import (
                oep_constants,
            )

            M, K, N = c.oep_dims
            F = (N - 1) * K
            assert c.hidden_size % F == 0, (
                f"hidden {c.hidden_size} not divisible by {F} hash "
                "families")
            mods, weights, offsets = oep_constants(c.vocab_size, M, K, N)
            self.oep = {
                "K": K, "N": N, "F": F,
                "oe_hidden": c.hidden_size // F,
                "table_rows": int(mods.astype(np.int64).sum()),
                "mods": jnp.asarray(mods),
                "weights": jnp.asarray(weights),
                "offsets": jnp.asarray(offsets),
                "row_sums": np.concatenate(
                    [[0], np.cumsum(mods.astype(np.int64))]),
            }

    # ------------------------------------------------------------------
    def _attn_shapes(self, j: str) -> Dict[str, Any]:
        c = self.config
        L, H, Hq = c.num_hidden_layers, c.hidden_size, c.num_attention_heads
        r, dr, dv = c.kv_lora_rank, c.qk_rope_head_dim, c.v_head_dim
        dn = c.qk_nope_head_dim
        shapes = {
            f"kv_a_proj{j}": (L, H, r + dr),
            f"kv_a_layernorm{j}": (L, r),
            f"w_kc{j}": (L, Hq, r, dn),
            f"w_vc{j}": (L, Hq, r, dv),
            f"o_proj{j}": (L, Hq * dv, H),
        }
        if c.q_lora_rank:
            shapes.update({
                f"q_a_proj{j}": (L, H, c.q_lora_rank),
                f"q_a_layernorm{j}": (L, c.q_lora_rank),
                f"q_b_proj{j}": (L, c.q_lora_rank, Hq * self.qk_dim),
            })
        else:
            shapes[f"q_proj{j}"] = (L, H, Hq * self.qk_dim)
        return shapes

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        L, H, I = c.num_hidden_layers, c.hidden_size, c.intermediate_size
        Im, E = c.moe_intermediate_size or I, c.num_experts
        Et = E + c.num_zero_experts
        layers: Dict[str, Any] = {}
        for j in ("0", "1"):
            layers.update({
                f"input_layernorm{j}": (L, H),
                f"post_attention_layernorm{j}": (L, H),
                f"gate_up{j}": (L, H, 2 * I),
                f"down{j}": (L, I, H),
            })
            layers.update(self._attn_shapes(j))
        layers.update({
            "router": (L, H, Et),
            "correction_bias": (L, Et),
            "w_gate_up": (L, E, H, 2 * Im),
            "w_down": (L, E, Im, H),
        })
        shapes = {
            "embed_tokens": (c.vocab_size, H),
            "layers": layers,
            "norm": (H,),
            "lm_head": (H, c.vocab_size),
        }
        if self.oep is not None:
            shapes["oe_table"] = (self.oep["table_rows"],
                                  self.oep["oe_hidden"])
            shapes["oe_proj"] = (self.oep["F"], self.oep["oe_hidden"], H)
        return shapes

    def param_specs(self) -> Dict[str, Any]:
        shapes = self.param_shapes()

        def spec_for(key, shape):
            if key in ("w_gate_up", "w_down"):
                return P(None, "tp", None, None)   # expert parallel
            if key.startswith(("q_b_proj", "q_proj", "gate_up")):
                return P(*([None] * (len(shape) - 1)), "tp")
            if key.startswith(("o_proj", "down")):
                return P(None, "tp", None)
            if key.startswith(("w_kc", "w_vc")):
                return P(None, "tp", None, None)
            return P()

        specs = {
            "embed_tokens": P("tp", None),
            "norm": P(),
            "lm_head": P(None, "tp"),
            "layers": {
                k: spec_for(k, v) for k, v in shapes["layers"].items()
            },
        }
        if self.oep is not None:
            # the fused n-gram table is small next to the word embedding
            # (sum of moduli ~ F * M rows of hidden/F dims); replicated
            # gather needs no collective (reference shards it TP with an
            # AllToAll — an optimization, over_embedding.py:85)
            specs["oe_table"] = P()
            specs["oe_proj"] = P()
        return specs

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16):
        rng = np.random.RandomState(seed)

        def build(tree):
            if isinstance(tree, dict):
                return {k: build(v) for k, v in tree.items()}
            return jnp.asarray(
                rng.standard_normal(tree).astype(np.float32) * 0.02,
                dtype=dtype)

        p = build(self.param_shapes())
        p["norm"] = jnp.ones_like(p["norm"])
        for k in p["layers"]:
            if "layernorm" in k:
                p["layers"][k] = jnp.ones_like(p["layers"][k])
            if k == "correction_bias":
                p["layers"][k] = jnp.zeros_like(p["layers"][k])
        return p

    # ------------------------------------------------------------------
    def _mla(self, lp, j, x, kv_cache, kv_layer, batch, cos, sin):
        c = self.config
        B, S, H = x.shape
        Hq = c.num_attention_heads
        dn, dr, r = c.qk_nope_head_dim, c.qk_rope_head_dim, c.kv_lora_rank
        eps = c.rms_norm_eps
        if c.q_lora_rank:
            q = rms_norm(x @ lp[f"q_a_proj{j}"],
                         lp[f"q_a_layernorm{j}"], eps)
            q = q @ lp[f"q_b_proj{j}"]
        else:
            q = x @ lp[f"q_proj{j}"]
        q = q.reshape(B, S, Hq, self.qk_dim)
        q_nope, q_pe = q[..., :dn], q[..., dn:]
        kv_a = x @ lp[f"kv_a_proj{j}"]
        ckv, k_pe = kv_a[..., :r], kv_a[..., r:]
        ckv = rms_norm(ckv, lp[f"kv_a_layernorm{j}"], eps)
        q_pe = apply_rope(q_pe, cos, sin, interleaved=True)
        k_pe = apply_rope(k_pe, cos, sin, interleaved=True)
        out, kv_cache = self.attn(
            kv_cache, kv_layer, q_nope, q_pe, ckv, k_pe, batch,
            lp[f"w_kc{j}"], lp[f"w_vc{j}"], self.sm_scale,
        )
        return out.reshape(B, S, Hq * c.v_head_dim) @ lp[f"o_proj{j}"], \
            kv_cache

    def _oep_embed(self, params, ring, batch: ForwardBatch):
        """(hidden, ring'): hashed n-gram embedding (reference
        FusedOverEmbedding.forward, over_embedding.py:231) with the
        device token-history ring standing in for oe_token_table."""
        from sglang_fluentllm_tpu.ops.over_embedding import (
            RING_W,
            ngram_ids,
            oep_combine,
            ring_history,
            ring_update_extend,
        )

        o = self.oep
        N = o["N"]
        B, S = batch.input_ids.shape
        R_trash = ring.shape[0] - 1
        rows = jnp.where(batch.state_idx < 0, R_trash, batch.state_idx)
        if batch.mode.is_decode():
            pos = batch.positions[:, 0]
            hist = ring_history(ring, rows, pos, N - 1)   # [B, N-1]
            toks = jnp.concatenate(
                [batch.input_ids[:, :1], hist], axis=1)[:, None, :]
            ring = ring.at[rows, pos % RING_W].set(batch.input_ids[:, 0])
        else:
            start = batch.positions[:, 0]
            tail = batch.hist_tail
            # -1 = host doesn't know (overlap mixed rows): patch from
            # the ring, which decode has kept current for those rows
            j = jnp.arange(RING_W, 0, -1, dtype=jnp.int32)[None, :]
            p_tail = start[:, None] - j
            ring_vals = jnp.take_along_axis(
                ring[rows], p_tail % RING_W, axis=1)
            tail = jnp.where(tail < 0,
                             jnp.where(p_tail >= 0, ring_vals, 0), tail)
            tokens_ext = jnp.concatenate([tail, batch.input_ids], axis=1)
            ring = ring_update_extend(
                ring, rows, tokens_ext, start, batch.q_lens)
            toks = jnp.stack(
                [tokens_ext[:, RING_W - d:RING_W - d + S]
                 for d in range(N)], axis=-1)             # [B, S, N]
        ids = ngram_ids(toks, o["mods"], o["weights"], o["offsets"],
                        o["K"])                           # [B, S|1, F]
        word = jnp.take(params["embed_tokens"], batch.input_ids, axis=0)
        h = oep_combine(word, params["oe_table"], params["oe_proj"], ids)
        return h, ring

    def _decoder_layer(self, lp, r, kv_cache, kv_base, batch, cos, sin):
        """One ScMoE decoder block (two MLA attentions + shortcut MoE,
        reference FLASHDecoderLayer:253); reused by the NEXTN draft
        (``spec/nextn.py`` LongcatNextNDraftModel)."""
        c = self.config
        eps = c.rms_norm_eps
        B, S = r.shape[:2]
        x1 = rms_norm(r, lp["input_layernorm0"], eps)
        a0, kv_cache = self._mla(
            lp, "0", x1, kv_cache, kv_base, batch, cos, sin
        )
        r = r + a0
        x1 = rms_norm(r, lp["post_attention_layernorm0"], eps)

        # shortcut MoE branch from x1
        flat = x1.reshape(B * S, -1)
        logits = flat @ lp["router"]
        moe_out = moe_forward(
            flat, logits, lp["w_gate_up"], lp["w_down"], c,
            correction_bias=lp["correction_bias"],
            use_gmm=self.use_gmm,
        ).reshape(B, S, -1)

        # dense branch continues
        g, u = jnp.split(x1 @ lp["gate_up0"], 2, axis=-1)
        r = r + (jax.nn.silu(g) * u) @ lp["down0"]
        x2 = rms_norm(r, lp["input_layernorm1"], eps)
        a1, kv_cache = self._mla(
            lp, "1", x2, kv_cache, kv_base + 1, batch, cos, sin
        )
        r = r + a1
        x3 = rms_norm(r, lp["post_attention_layernorm1"], eps)
        g, u = jnp.split(x3 @ lp["gate_up1"], 2, axis=-1)
        m1 = (jax.nn.silu(g) * u) @ lp["down1"]
        # shortcut rejoins; both flow into the next layer's residual
        return r + m1 + moe_out, kv_cache

    def eagle3_capture_ids(self):
        """Default EAGLE-3 aux-hidden capture layers (same recipe as the
        reference llama target, ``models/llama.py:713``), clamped +
        deduped for small models. Reference ``models/longcat_flash.py:385``
        threads ``layers_to_capture`` through the decoder layers."""
        L = self.config.num_hidden_layers
        return tuple(sorted({min(max(i, 1), L) for i in (2, L // 2, L - 3)}))

    def forward_with_aux(self, params, kv_cache, batch: ForwardBatch,
                         capture_ids):
        """Forward capturing the residual stream entering layers
        ``capture_ids`` (EAGLE-3, reference ``models/longcat_eagle3.py``).
        Returns (kv, h_final, aux [B, S, len(ids)*H])."""
        return self._forward_tower(params, kv_cache, batch,
                                   tuple(capture_ids))

    def forward(self, params, kv_cache, batch: ForwardBatch):
        kv_cache, h, _ = self._forward_tower(params, kv_cache, batch, None)
        return kv_cache, h

    def _forward_tower(self, params, kv_cache, batch: ForwardBatch,
                       capture_ids):
        c = self.config
        eps = c.rms_norm_eps
        B, S = batch.input_ids.shape
        oep_wrap = None
        if self.oep is not None:
            oep_wrap = kv_cache
            h, new_ring = self._oep_embed(params, kv_cache.ring, batch)
            kv_cache = kv_cache.inner
        else:
            h = jnp.take(params["embed_tokens"], batch.input_ids, axis=0)
        cos = self.rope.cos[batch.positions]
        sin = self.rope.sin[batch.positions]
        cap_arr = (jnp.asarray(capture_ids, jnp.int32)
                   if capture_ids else None)
        aux0 = (jnp.zeros((len(capture_ids), B, S, c.hidden_size), h.dtype)
                if capture_ids else jnp.zeros((), h.dtype))

        def layer_fn(carry, xs):
            r, kv_cache, aux = carry
            lp, layer_id = xs
            r, kv_cache = self._decoder_layer(
                lp, r, kv_cache, 2 * layer_id, batch, cos, sin
            )
            if cap_arr is not None:
                sel = (cap_arr == layer_id + 1).astype(aux.dtype)
                aux = aux + sel[:, None, None, None] * r[None]
            return (r, kv_cache, aux), None

        (r, kv_cache, aux), _ = jax.lax.scan(
            layer_fn, (h, kv_cache, aux0),
            (params["layers"],
             jnp.arange(c.num_hidden_layers, dtype=jnp.int32)),
        )
        if oep_wrap is not None:
            kv_cache = dataclasses.replace(
                oep_wrap, inner=kv_cache, ring=new_ring)
        if capture_ids:
            nc = len(capture_ids)
            aux = aux.transpose(1, 2, 0, 3).reshape(B, S, nc * c.hidden_size)
        return kv_cache, rms_norm(r, params["norm"], eps), aux

    def compute_logits(self, params, hidden):
        return (hidden @ params["lm_head"]).astype(jnp.float32)

    # ------------------------------------------------------------------
    @staticmethod
    def _oep_collect(name, w, top) -> bool:
        """Route OEP checkpoint tensors (reference load_weight name
        forms, over_embedding.py:182-228): family tables
        ``model.oe_embed_tokens{i}`` / ``ngram_embeddings.embedders.{i}``
        and projections ``oe_embed_proj{i}`` / ``post_projs.{i}``."""
        base = name.split(".weight")[0]
        if ".oe_embed_tokens" in name or "embedders." in name:
            i = (int(base.split("embedders.")[1].split(".")[0])
                 if "embedders." in name
                 else int(base.split("oe_embed_tokens")[1]))
            top.setdefault("_oe_fams", {})[i] = w
            return True
        if ".oe_embed_proj" in name or "post_projs." in name:
            i = (int(base.split("post_projs.")[1].split(".")[0])
                 if "post_projs." in name
                 else int(base.split("oe_embed_proj")[1]))
            top.setdefault("_oe_projs", {})[i] = np.asarray(w).T
            return True
        return False

    def _oep_finish(self, top, params, dtype):
        if self.oep is None:
            return
        o = self.oep
        fams, projs = top["_oe_fams"], top["_oe_projs"]
        table = np.zeros((o["table_rows"], o["oe_hidden"]), np.float32)
        for i in range(o["F"]):
            lo, hi = int(o["row_sums"][i]), int(o["row_sums"][i + 1])
            assert fams[i].shape[0] == hi - lo, (
                f"family {i}: {fams[i].shape[0]} rows != modulus "
                f"{hi - lo}")
            table[lo:hi] = fams[i]
        params["oe_table"] = jnp.asarray(table, dtype=dtype)
        params["oe_proj"] = jnp.asarray(
            np.stack([projs[i] for i in range(o["F"])]), dtype=dtype)

    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        c = self.config
        L, E = c.num_hidden_layers, c.num_experts
        Hq = c.num_attention_heads
        dn, dv, r = c.qk_nope_head_dim, c.v_head_dim, c.kv_lora_rank
        dr = c.qk_rope_head_dim
        st: Dict[int, Dict[str, Any]] = {i: {} for i in range(L)}
        experts: Dict[int, Dict[int, Dict[str, np.ndarray]]] = {
            i: {} for i in range(L)}
        top: Dict[str, Any] = {}
        for name, w in named_tensors:
            if name.startswith("model."):
                name = name[len("model."):]
            if name == "embed_tokens.weight":
                top["embed_tokens"] = w
            elif name == "norm.weight":
                top["norm"] = w
            elif name == "lm_head.weight":
                top["lm_head"] = w.T
            elif self.oep is not None and self._oep_collect(name, w, top):
                pass
            elif name.startswith("layers."):
                parts = name.split(".")
                li = int(parts[1])
                if li >= L:
                    continue
                rest = ".".join(parts[2:])
                s = st[li]
                for j in ("0", "1"):
                    if rest == f"self_attn.{j}.q_a_proj.weight":
                        s[f"q_a_proj{j}"] = w.T
                    elif rest == f"self_attn.{j}.q_a_layernorm.weight":
                        s[f"q_a_layernorm{j}"] = w
                    elif rest == f"self_attn.{j}.q_b_proj.weight":
                        s[f"q_b_proj{j}"] = w.T
                    elif rest == f"self_attn.{j}.q_proj.weight":
                        s[f"q_proj{j}"] = w.T
                    elif rest == f"self_attn.{j}.kv_a_proj_with_mqa.weight":
                        s[f"kv_a_proj{j}"] = w.T
                    elif rest == (
                        f"self_attn.{j}.fused_qkv_a_proj_with_mqa.weight"
                    ):
                        # fused [q_lora | kv_lora+rope, H]
                        fq = w.T
                        s[f"q_a_proj{j}"] = fq[:, : c.q_lora_rank]
                        s[f"kv_a_proj{j}"] = fq[:, c.q_lora_rank:]
                    elif rest == f"self_attn.{j}.kv_a_layernorm.weight":
                        s[f"kv_a_layernorm{j}"] = w
                    elif rest == f"self_attn.{j}.kv_b_proj.weight":
                        kvb = w.T.reshape(r, Hq, dn + dv)
                        s[f"w_kc{j}"] = np.transpose(
                            kvb[..., :dn], (1, 0, 2))
                        s[f"w_vc{j}"] = np.transpose(
                            kvb[..., dn:], (1, 0, 2))
                    elif rest == f"self_attn.{j}.o_proj.weight":
                        s[f"o_proj{j}"] = w.T
                    elif rest == f"input_layernorm.{j}.weight":
                        s[f"input_layernorm{j}"] = w
                    elif rest == f"post_attention_layernorm.{j}.weight":
                        s[f"post_attention_layernorm{j}"] = w
                    elif rest == f"mlps.{j}.gate_up_proj.weight":
                        s[f"gate_up{j}"] = w.T
                    elif rest == f"mlps.{j}.gate_proj.weight":
                        s.setdefault(f"_gate{j}", w.T)
                    elif rest == f"mlps.{j}.up_proj.weight":
                        s.setdefault(f"_up{j}", w.T)
                    elif rest == f"mlps.{j}.down_proj.weight":
                        s[f"down{j}"] = w.T
                if rest == "mlp.gate.classifier.weight":
                    s["router"] = w.T
                elif rest == "mlp.gate.e_score_correction_bias":
                    s["correction_bias"] = w
                elif rest.startswith("mlp.experts."):
                    e = int(parts[4])
                    experts[li].setdefault(e, {})[parts[5]] = w
        for li in range(L):
            s = st[li]
            for j in ("0", "1"):
                if f"gate_up{j}" not in s and f"_gate{j}" in s:
                    s[f"gate_up{j}"] = np.concatenate(
                        [s.pop(f"_gate{j}"), s.pop(f"_up{j}")], axis=1)
            emap = experts[li]
            if emap:
                s["w_gate_up"] = np.stack([
                    np.concatenate([emap[e]["gate_proj"].T,
                                    emap[e]["up_proj"].T], axis=1)
                    for e in range(E)])
                s["w_down"] = np.stack(
                    [emap[e]["down_proj"].T for e in range(E)])
        params: Dict[str, Any] = {
            "embed_tokens": jnp.asarray(top["embed_tokens"], dtype=dtype),
            "norm": jnp.asarray(top["norm"], dtype=dtype),
            "lm_head": jnp.asarray(top["lm_head"], dtype=dtype),
            "layers": {},
        }
        for k in self.param_shapes()["layers"]:
            mats = [st[i][k] for i in range(L)]
            kd = jnp.float32 if k == "correction_bias" else dtype
            params["layers"][k] = jnp.asarray(np.stack(mats), dtype=kd)
        self._oep_finish(top, params, dtype)
        return params


@register("ShortcutMoEForCausalLM")
class ShortcutMoEForCausalLM(LongcatFlashForCausalLM):
    """LongCat-Ultra (reference ``models/longcat_ultra.py``,
    ``ShortcutMoEForCausalLM``): the same ScMoE block topology — two
    attention+dense-MLP passes with the MoE branch computed from the
    first attention's output and rejoined after the second MLP — but
    with standard GQA attention instead of MLA. KV pool depth stays
    2 x num_hidden_layers (two attentions per decoder layer)."""

    def __init__(self, config, attn_backend):
        super().__init__(config, attn_backend)
        c = config
        self.sm_scale = c.head_dim ** -0.5
        self.rope = RotaryEmbedding(
            c.head_dim,
            max(c.context_length or 0, c.max_position_embeddings),
            c.rope_theta,
            c.rope_scaling,
        )
        self.qkv_bias = bool(c.attention_bias
                             or c.hf_config.get("bias"))

    def _attn_shapes(self, j: str) -> Dict[str, Any]:
        c = self.config
        L, H = c.num_hidden_layers, c.hidden_size
        D, Hq, Hk = c.head_dim, c.num_attention_heads, c.num_key_value_heads
        shapes = {
            f"q_proj{j}": (L, H, Hq * D),
            f"k_proj{j}": (L, H, Hk * D),
            f"v_proj{j}": (L, H, Hk * D),
            f"o_proj{j}": (L, Hq * D, H),
        }
        if self.qkv_bias:
            shapes.update({
                f"q_bias{j}": (L, Hq * D),
                f"k_bias{j}": (L, Hk * D),
                f"v_bias{j}": (L, Hk * D),
            })
        return shapes

    def _mla(self, lp, j, x, kv_cache, kv_layer, batch, cos, sin):
        # GQA attend in place of the MLA block (same forward topology)
        c = self.config
        B, S, H = x.shape
        D, Hq, Hk = c.head_dim, c.num_attention_heads, c.num_key_value_heads
        q = x @ lp[f"q_proj{j}"]
        k = x @ lp[f"k_proj{j}"]
        v = x @ lp[f"v_proj{j}"]
        if self.qkv_bias:
            q = q + lp[f"q_bias{j}"]
            k = k + lp[f"k_bias{j}"]
            v = v + lp[f"v_bias{j}"]
        q = apply_rope(q.reshape(B, S, Hq, D), cos, sin)
        k = apply_rope(k.reshape(B, S, Hk, D), cos, sin)
        v = v.reshape(B, S, Hk, D)
        out, kv_cache = self.attn(
            kv_cache, kv_layer, q, k, v, batch, self.sm_scale
        )
        return out.reshape(B, S, Hq * D) @ lp[f"o_proj{j}"], kv_cache

    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        c = self.config
        L, E = c.num_hidden_layers, c.num_experts
        st: Dict[int, Dict[str, Any]] = {i: {} for i in range(L)}
        experts: Dict[int, Dict[int, Dict[str, np.ndarray]]] = {
            i: {} for i in range(L)}
        top: Dict[str, Any] = {}
        for name, w in named_tensors:
            if name.startswith("model."):
                name = name[len("model."):]
            if name == "embed_tokens.weight":
                top["embed_tokens"] = w
            elif name == "norm.weight":
                top["norm"] = w
            elif name == "lm_head.weight":
                top["lm_head"] = w.T
            elif self.oep is not None and self._oep_collect(name, w, top):
                pass
            elif name.startswith("layers."):
                parts = name.split(".")
                li = int(parts[1])
                if li >= L:
                    continue
                rest = ".".join(parts[2:])
                import re as _re

                m = _re.match(
                    r"self_attn\.([01])\.(q|k|v|o)_proj\.(weight|bias)",
                    rest)
                if m:
                    j, p, kind = m.groups()
                    key = (f"{p}_proj{j}" if kind == "weight"
                           else f"{p}_bias{j}")
                    st[li][key] = (np.asarray(w).T if kind == "weight"
                                   else w)
                    continue
                m = _re.match(
                    r"input_layernorm\.([01])\.weight", rest)
                if m:
                    st[li][f"input_layernorm{m.group(1)}"] = w
                    continue
                m = _re.match(
                    r"post_attention_layernorm\.([01])\.weight", rest)
                if m:
                    st[li][f"post_attention_layernorm{m.group(1)}"] = w
                    continue
                m = _re.match(
                    r"mlps\.([01])\.(gate|up|down)_proj\.weight", rest)
                if m:
                    j, p = m.groups()
                    if p == "down":
                        st[li][f"down{j}"] = np.asarray(w).T
                    else:
                        st[li].setdefault(f"_gu{j}", {})[p] = (
                            np.asarray(w).T)
                    continue
                if rest == "mlp.gate.weight":
                    st[li]["router"] = np.asarray(w).T
                elif rest == "mlp.gate.e_score_correction_bias":
                    st[li]["correction_bias"] = w
                elif rest.startswith("mlp.experts."):
                    e = int(parts[4])
                    experts[li].setdefault(e, {})[parts[5]] = w
        Et = E + c.num_zero_experts
        for li in range(L):
            for j in ("0", "1"):
                gu = st[li].pop(f"_gu{j}", None)
                if gu:
                    st[li][f"gate_up{j}"] = np.concatenate(
                        [gu["gate"], gu["up"]], axis=1)
            emap = experts[li]
            st[li]["w_gate_up"] = np.stack([
                np.concatenate([emap[e]["gate_proj"].T,
                                emap[e]["up_proj"].T], axis=1)
                for e in range(E)])
            st[li]["w_down"] = np.stack(
                [emap[e]["down_proj"].T for e in range(E)])
            st[li].setdefault(
                "correction_bias", np.zeros((Et,), np.float32))

        shapes = self.param_shapes()
        params: Dict[str, Any] = {
            "embed_tokens": jnp.asarray(top["embed_tokens"], dtype=dtype),
            "norm": jnp.asarray(top["norm"], dtype=dtype),
            "lm_head": jnp.asarray(top["lm_head"], dtype=dtype),
            "layers": {},
        }
        for k in shapes["layers"]:
            params["layers"][k] = jnp.asarray(
                np.stack([st[i][k] for i in range(L)]), dtype=dtype)
        self._oep_finish(top, params, dtype)
        return params
