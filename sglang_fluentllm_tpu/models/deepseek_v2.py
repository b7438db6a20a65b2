"""DeepSeek-V2/V3-class MLA (+MoE) causal LM — the flagship family.

Parity target: reference ``srt/models/deepseek_v2.py`` (1,668 LoC,
``DeepseekV2AttentionMLA:356`` with normal/absorbed paths at ``:622-1087``).
TPU design notes:
- MLA latents (ckv + rope-k) are cached compressed (``memory_pool.py:591``
  layout); the attention backend picks absorbed vs normal per mode;
- RoPE on the rope head uses the interleaved (GPT-J) rotation — DeepSeek
  checkpoints store rope dims pair-interleaved; since q and k share the
  permutation, scores are identical to HF's deinterleave+rotate_half;
- dense-replace layers run unrolled; the uniform MoE tower is one lax.scan;
- MoE experts run as megablox grouped GEMM (ops/moe/layer.py).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Iterator, Tuple

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


def _yarn_mscale(scale: float, mscale: float) -> float:
    if scale <= 1 or mscale == 0:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


@register("DeepseekV2ForCausalLM", "DeepseekV3ForCausalLM",
          "DeepseekV32ForCausalLM")
class DeepseekV2ForCausalLM:
    def __init__(self, config: ModelConfig, attn_backend):
        self.config = config
        self.attn = attn_backend
        c = config
        self.qk_dim = c.qk_nope_head_dim + c.qk_rope_head_dim
        self.sm_scale = self.qk_dim ** -0.5
        rs = c.rope_scaling or {}
        if rs.get("type", rs.get("rope_type", "")) in ("yarn", "deepseek_yarn"):
            m = _yarn_mscale(rs.get("factor", 1.0),
                             rs.get("mscale_all_dim", 0.0))
            self.sm_scale *= m * m
            rs = dict(rs)
            rs.setdefault("rope_type", "deepseek_yarn")
        self.rope = RotaryEmbedding(
            c.qk_rope_head_dim,
            max(c.context_length or 0, c.max_position_embeddings),
            c.rope_theta,
            rs or None,
            interleaved=True,
        )
        # DSA (V3.2 lightning indexer; reference deepseek_v32.py +
        # dsa/nsa_indexer.py). cli_factor layer-sharing is approximated by
        # computing the indexer per layer (cli_factor=1 semantics).
        self.dsa = c.is_dsa
        hf = c.hf_config
        if self.dsa:
            self.idx_heads = hf.get("index_n_heads", 64)
            self.idx_dim = hf.get("index_head_dim", 128)
            self.idx_topk = hf.get("index_topk", 2048)
            self.idx_norm_type = hf.get("index_k_norm_type", "layer")
            assert c.q_lora_rank, "DSA requires q_lora_rank"
        self.use_gmm = jax.default_backend() == "tpu"
        # set by ModelRunner when expert parallelism is enabled
        self.ep_mesh = None
        # fixed-capacity all-to-all dispatch (DeepEP analog): set by the
        # runner to an EpLocationTables to replace the replicated-token EP
        self.ep_tables = None
        self.ep_capacity_factor = 2.0
        # ExpertDistributionRecorder hook (io_callback per MoE layer)
        self.expert_recorder = None
        self.ep_axis = "tp"
        self.n_dense = max(
            c.first_k_dense_replace if c.is_moe else c.num_hidden_layers, 0
        )
        if not c.is_moe:
            self.n_dense = c.num_hidden_layers
        self.n_moe = c.num_hidden_layers - self.n_dense

    # ------------------------------------------------------------------
    def _attn_shapes(self) -> Dict[str, Any]:
        c = self.config
        H, Hq = c.hidden_size, c.num_attention_heads
        r, dn, dr, dv = (c.kv_lora_rank, c.qk_nope_head_dim,
                         c.qk_rope_head_dim, c.v_head_dim)
        shapes = {
            "input_layernorm": (H,),
            "post_attention_layernorm": (H,),
            "kv_a_proj": (H, r + dr),
            "kv_a_layernorm": (r,),
            "w_kc": (Hq, r, dn),
            "w_vc": (Hq, r, dv),
            "o_proj": (Hq * dv, H),
        }
        if c.q_lora_rank:
            shapes.update({
                "q_a_proj": (H, c.q_lora_rank),
                "q_a_layernorm": (c.q_lora_rank,),
                "q_b_proj": (c.q_lora_rank, Hq * self.qk_dim),
            })
        else:
            shapes["q_proj"] = (H, Hq * self.qk_dim)
        if self.dsa:
            shapes.update({
                "idx_wq_b": (c.q_lora_rank, self.idx_heads * self.idx_dim),
                "idx_wk": (H, self.idx_dim),
                "idx_k_norm_w": (self.idx_dim,),
                "idx_k_norm_b": (self.idx_dim,),
                "idx_weights_proj": (H, self.idx_heads),
            })
        return shapes

    def _attn_specs(self) -> Dict[str, Any]:
        c = self.config
        specs = {
            "input_layernorm": P(),
            "post_attention_layernorm": P(),
            "kv_a_proj": P(),            # latent proj replicated (small)
            "kv_a_layernorm": P(),
            "w_kc": P("tp", None, None),  # head-sharded
            "w_vc": P("tp", None, None),
            "o_proj": P("tp", None),
        }
        if c.q_lora_rank:
            specs.update({
                "q_a_proj": P(),
                "q_a_layernorm": P(),
                "q_b_proj": P(None, "tp"),
            })
        else:
            specs["q_proj"] = P(None, "tp")
        if self.dsa:
            specs.update({
                "idx_wq_b": P(), "idx_wk": P(), "idx_k_norm_w": P(),
                "idx_k_norm_b": P(), "idx_weights_proj": P(),
            })
        return specs

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        H, I = c.hidden_size, c.intermediate_size
        shapes: Dict[str, Any] = {
            "embed_tokens": (c.vocab_size, H),
            "norm": (H,),
            "lm_head": (H, c.vocab_size),
        }
        if c.tie_word_embeddings:
            del shapes["lm_head"]
        dense = self._attn_shapes() | {
            "gate_proj": (H, I),
            "up_proj": (H, I),
            "down_proj": (I, H),
        }
        if self.n_dense:
            shapes["dense_layers"] = {
                k: (self.n_dense,) + v for k, v in dense.items()
            }
        if self.n_moe:
            Im = c.moe_intermediate_size
            E = c.num_experts
            Et = E + c.num_zero_experts
            # EP dispatch owns placement: weight rows are PHYSICAL slots
            # (E + redundant, fixed at init so rebalances never change
            # shapes) and the logical->physical tables live in the params
            # pytree as runtime arrays (VERDICT r2 #8)
            t = getattr(self, "ep_tables", None)
            Ep = t.num_physical if t is not None else E
            moe = self._attn_shapes() | {
                "router": (H, Et),
                "w_gate_up": (Ep, H, 2 * Im),
                "w_down": (Ep, Im, H),
            }
            if t is not None:
                moe["ep_l2p"] = (E, t.l2p.shape[1])
                moe["ep_n_rep"] = (E,)
            if c.topk_method == "noaux_tc":
                moe["correction_bias"] = (Et,)
            if c.num_shared_experts:
                Is = Im * c.num_shared_experts
                moe.update({
                    "shared_gate_proj": (H, Is),
                    "shared_up_proj": (H, Is),
                    "shared_down_proj": (Is, H),
                })
            shapes["moe_layers"] = {
                k: (self.n_moe,) + v for k, v in moe.items()
            }
        return shapes

    def param_specs(self) -> Dict[str, Any]:
        c = self.config

        def add_layer_axis(d):
            return {k: P(*((None,) + tuple(v))) for k, v in d.items()}

        dense = self._attn_specs() | {
            "gate_proj": P(None, "tp"),
            "up_proj": P(None, "tp"),
            "down_proj": P("tp", None),
        }
        specs: Dict[str, Any] = {
            "embed_tokens": P("tp", None),
            "norm": P(),
        }
        if self.n_dense:
            specs["dense_layers"] = add_layer_axis(dense)
        if not c.tie_word_embeddings:
            specs["lm_head"] = P(None, "tp")
        if self.n_moe:
            moe = self._attn_specs() | {
                "router": P(),
                "w_gate_up": P("tp", None, None),   # expert-sharded (EP)
                "w_down": P("tp", None, None),
            }
            if getattr(self, "ep_tables", None) is not None:
                moe["ep_l2p"] = P(None)     # replicated routing tables
                moe["ep_n_rep"] = P()
            if c.topk_method == "noaux_tc":
                moe["correction_bias"] = P()
            if c.num_shared_experts:
                moe.update({
                    "shared_gate_proj": P(None, "tp"),
                    "shared_up_proj": P(None, "tp"),
                    "shared_down_proj": P("tp", None),
                })
            specs["moe_layers"] = add_layer_axis(moe)
        return specs

    def _expand_physical(self, params):
        """Materialize physical expert slots + runtime routing tables from
        LOGICAL expert weights (keeps dummy-weight rng-stream parity with
        non-EP engines; replicas share their logical expert's weights)."""
        t = getattr(self, "ep_tables", None)
        if t is None or "moe_layers" not in params:
            return params
        ml = params["moe_layers"]
        if ml["w_gate_up"].shape[1] != t.num_physical:
            p2l = jnp.asarray(t.initial_p2l(), jnp.int32)
            ml["w_gate_up"] = jnp.take(ml["w_gate_up"], p2l, axis=1)
            ml["w_down"] = jnp.take(ml["w_down"], p2l, axis=1)
        L = ml["w_gate_up"].shape[0]
        ml["ep_l2p"] = jnp.tile(
            jnp.asarray(t.l2p, jnp.int32)[None], (L, 1, 1)
        )
        ml["ep_n_rep"] = jnp.tile(
            jnp.asarray(t.n_rep, jnp.int32)[None], (L, 1)
        )
        return params

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16):
        rng = np.random.RandomState(seed)

        def build(tree):
            if isinstance(tree, dict):
                return {k: build(v) for k, v in tree.items()}
            return jnp.asarray(
                rng.standard_normal(tree).astype(np.float32) * 0.02,
                dtype=dtype,
            )

        # build at LOGICAL shapes (same rng stream as non-EP engines),
        # then expand to physical slots
        ep_t, self.ep_tables = getattr(self, "ep_tables", None), None
        try:
            params = build(self.param_shapes())
        finally:
            self.ep_tables = ep_t
        params["norm"] = jnp.ones_like(params["norm"])
        for grp in ("dense_layers", "moe_layers"):
            if grp not in params:
                continue
            for k in params[grp]:
                if "layernorm" in k or k == "idx_k_norm_w":
                    params[grp][k] = jnp.ones_like(params[grp][k])
                if k in ("correction_bias", "idx_k_norm_b"):
                    params[grp][k] = jnp.zeros_like(params[grp][k])
        return self._expand_physical(params)

    # ------------------------------------------------------------------
    def _mla_block(self, lp, h, kv_cache, layer_id, batch, cos, sin):
        c = self.config
        B, S, H = h.shape
        Hq = c.num_attention_heads
        dn, dr = c.qk_nope_head_dim, c.qk_rope_head_dim
        r = c.kv_lora_rank
        eps = c.rms_norm_eps

        q_lora = None
        if c.q_lora_rank:
            q_lora = rms_norm(h @ lp["q_a_proj"], lp["q_a_layernorm"], eps)
            q = q_lora @ lp["q_b_proj"]
        else:
            q = h @ lp["q_proj"]
        q = q.reshape(B, S, Hq, self.qk_dim)
        q_nope, q_pe = q[..., :dn], q[..., dn:]

        kv_a = h @ lp["kv_a_proj"]                   # [B, S, r + dr]
        ckv, k_pe = kv_a[..., :r], kv_a[..., r:]
        ckv = rms_norm(ckv, lp["kv_a_layernorm"], eps)
        q_pe = apply_rope(q_pe, cos, sin, interleaved=True)
        k_pe = apply_rope(k_pe, cos, sin, interleaved=True)

        if self.dsa:
            out, kv_cache = self._dsa_attend(
                lp, h, q_lora, q_nope, q_pe, ckv, k_pe, kv_cache,
                layer_id, batch, cos, sin,
            )
        else:
            out, kv_cache = self.attn(
                kv_cache, layer_id, q_nope, q_pe, ckv, k_pe, batch,
                lp["w_kc"], lp["w_vc"], self.sm_scale,
            )
        out = out.reshape(B, S, Hq * c.v_head_dim) @ lp["o_proj"]
        return out, kv_cache

    def _dsa_attend(self, lp, h, q_lora, q_nope, q_pe, ckv, k_pe,
                    kv_cache, layer_id, batch, cos, sin):
        """V3.2 sparse attention (reference ``deepseek_v32.py:309`` +
        ``dsa/nsa_indexer.py:899``): write index keys per token; decode
        selects top-``index_topk`` context tokens via the lightning
        indexer and MLA-attends over only the selected latents; extend
        with context beyond index_topk runs chunked per-query selection
        (``_dsa_extend_sparse``), shorter extends stay dense (selection
        would keep every token anyway)."""
        import jax.numpy as jnp

        from sglang_fluentllm_tpu.mem.kv_cache import (
            MLAKVCache,
            MLAKVCacheDSA,
            mla_write,
            padded_head_dim,
        )
        from sglang_fluentllm_tpu.ops.attention.dsa import (
            gather_slots,
            indexer_scores,
            mla_sparse_attend,
            select_topk,
        )
        from sglang_fluentllm_tpu.ops.attention.ref_backend import (
            page_gather,
        )

        c = self.config
        B, S, Hq, dn = q_nope.shape
        r, dr, dv = c.kv_lora_rank, c.qk_rope_head_dim, c.v_head_dim
        eps = c.rms_norm_eps
        d_idx = self.idx_dim
        loc = batch.out_cache_loc.reshape(-1)

        # --- index keys for the new tokens (IndexerBf16.forward) ---
        k_idx = h @ lp["idx_wk"]                      # [B, S, d_idx]
        if self.idx_norm_type == "rms":
            k_idx = rms_norm(k_idx, lp["idx_k_norm_w"], eps)
        else:  # V32LayerNorm: f32 layernorm with bias
            x32 = k_idx.astype(jnp.float32)
            mu = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.var(x32, axis=-1, keepdims=True)
            k_idx = ((x32 - mu) * jax.lax.rsqrt(var + eps)
                     * lp["idx_k_norm_w"] + lp["idx_k_norm_b"]
                     ).astype(k_idx.dtype)
        k_idx = jnp.concatenate(
            [apply_rope(k_idx[..., :dr], cos, sin, interleaved=True),
             k_idx[..., dr:]], axis=-1,
        )
        idx_pad = kv_cache.idx.shape[-1]
        rows = jnp.pad(
            k_idx.reshape(B * S, d_idx), ((0, 0), (0, idx_pad - d_idx))
        ).astype(kv_cache.idx.dtype)
        idx_new = kv_cache.idx.at[layer_id, loc].set(rows)

        if not batch.mode.is_decode():
            T = batch.page_tables.shape[1] * batch.page_size
            if T <= self.idx_topk or batch.custom_mask is not None:
                # short context: selection would keep everything — dense
                # MLA (the backend writes the latents)
                out, mla = self.attn(
                    MLAKVCache(lat=kv_cache.lat), layer_id, q_nope, q_pe,
                    ckv, k_pe, batch, lp["w_kc"], lp["w_vc"],
                    self.sm_scale,
                )
                return out, MLAKVCacheDSA(lat=mla.lat, idx=idx_new)
            return self._dsa_extend_sparse(
                lp, h, q_lora, q_nope, q_pe, ckv, k_pe, kv_cache,
                idx_new, layer_id, batch, cos, sin,
            )

        return self._dsa_decode_sparse(
            lp, h, q_lora, q_nope, q_pe, ckv, k_pe, kv_cache, idx_new,
            layer_id, batch, cos, sin,
        )

    def _dsa_q_eff(self, lp, q_nope, q_pe, lat_dim):
        """Absorbed queries in the lane-padded latent layout
        [..., Hq, r_pad + rope_pad]."""
        import jax.numpy as jnp

        from sglang_fluentllm_tpu.mem.kv_cache import padded_head_dim

        c = self.config
        r, dr = c.kv_lora_rank, c.qk_rope_head_dim
        r_pad = padded_head_dim(r)
        q_kc = jnp.einsum(
            "...hd,hrd->...hr", q_nope.astype(jnp.float32),
            lp["w_kc"].astype(jnp.float32),
        )
        q_eff = jnp.zeros(q_kc.shape[:-1] + (lat_dim,), jnp.float32)
        q_eff = q_eff.at[..., :r].set(q_kc)
        q_eff = q_eff.at[..., r_pad:r_pad + dr].set(
            q_pe.astype(jnp.float32))
        return q_eff

    def _dsa_extend_sparse(self, lp, h, q_lora, q_nope, q_pe, ckv, k_pe,
                           kv_cache, idx_new, layer_id, batch, cos, sin):
        """Extend-phase DSA: per-query top-k over the full cached context
        (reference ``nsa_indexer._get_topk_paged_extend`` +
        sparse flashmla extend), processed in query chunks so the
        gathered [Cq, topk, dim] latents stay bounded."""
        import jax
        import jax.numpy as jnp

        from sglang_fluentllm_tpu.mem.kv_cache import (
            MLAKVCache,
            MLAKVCacheDSA,
            mla_write,
        )
        from sglang_fluentllm_tpu.ops.attention.dsa import (
            gather_slots,
            mla_sparse_attend_multi,
            select_topk,
        )
        from sglang_fluentllm_tpu.ops.attention.ref_backend import (
            page_gather,
        )

        c = self.config
        B, S, Hq, dn = q_nope.shape
        r, dr, dv = c.kv_lora_rank, c.qk_rope_head_dim, c.v_head_dim
        d_idx = self.idx_dim
        loc = batch.out_cache_loc.reshape(-1)
        mla = mla_write(
            MLAKVCache(lat=kv_cache.lat), layer_id, loc,
            ckv.reshape(B * S, r), k_pe.reshape(B * S, dr),
        )
        kv_cache = MLAKVCacheDSA(lat=mla.lat, idx=idx_new)

        # index queries + weights for every position
        q_idx = (q_lora @ lp["idx_wq_b"]).reshape(
            B, S, self.idx_heads, d_idx)
        q_idx = jnp.concatenate(
            [apply_rope(q_idx[..., :dr], cos, sin, interleaved=True),
             q_idx[..., dr:]], axis=-1,
        )
        w = (h.astype(jnp.float32) @ lp["idx_weights_proj"].astype(
            jnp.float32)) * (self.idx_heads ** -0.5) * (d_idx ** -0.5)
        keys = page_gather(
            kv_cache.idx[layer_id], batch.page_tables, batch.page_size
        )[..., :d_idx]                                  # [B, T, d]
        T = keys.shape[1]
        q_eff = self._dsa_q_eff(
            lp, q_nope, q_pe, kv_cache.lat.shape[-1])   # [B,S,Hq,dim]
        lat_l = kv_cache.lat[layer_id]
        K = min(self.idx_topk, T)

        Cq = max(1, min(8, S))
        Sp = -(-S // Cq) * Cq

        def pad_q(x):
            return jnp.pad(
                x, [(0, 0), (0, Sp - S)] + [(0, 0)] * (x.ndim - 2))

        q_idx_p = pad_q(q_idx)
        w_p = pad_q(w)
        q_eff_p = pad_q(q_eff)
        pos_p = jnp.pad(batch.positions, ((0, 0), (0, Sp - S)))

        def chunk_fn(_, ci):
            sl = ci * Cq
            qi = jax.lax.dynamic_slice_in_dim(q_idx_p, sl, Cq, 1)
            wi = jax.lax.dynamic_slice_in_dim(w_p, sl, Cq, 1)
            qe = jax.lax.dynamic_slice_in_dim(q_eff_p, sl, Cq, 1)
            pi = jax.lax.dynamic_slice_in_dim(pos_p, sl, Cq, 1)
            sc = jnp.einsum(
                "bqhd,btd->bhqt", qi.astype(jnp.float32),
                keys.astype(jnp.float32))
            sc = jnp.einsum("bqh,bhqt->bqt", wi, jax.nn.relu(sc))
            visible = (jnp.arange(T)[None, None, :]
                       <= pi[:, :, None])
            sc = jnp.where(visible, sc, -jnp.inf)
            # per-position top-k (flatten the chunk into the batch dim)
            pos2, valid2 = select_topk(sc.reshape(B * Cq, T), K)
            pt = jnp.repeat(batch.page_tables, Cq, axis=0)
            slots = gather_slots(pt, pos2, batch.page_size)
            ctx = mla_sparse_attend_multi(
                qe.reshape(B * Cq, 1, Hq, -1)[:, 0][:, None],
                lat_l,
                slots[:, None], valid2[:, None],
                c.kv_lora_rank, self.sm_scale,
            )[:, 0]                                    # [B*Cq, Hq, r]
            return None, ctx.reshape(B, Cq, Hq, -1)

        _, ctxs = jax.lax.scan(
            chunk_fn, None, jnp.arange(Sp // Cq, dtype=jnp.int32))
        ctx = jnp.moveaxis(ctxs, 0, 1).reshape(B, Sp, Hq, -1)[:, :S]
        out = jnp.einsum(
            "bshr,hrd->bshd", ctx, lp["w_vc"].astype(jnp.float32)
        ).astype(h.dtype)
        return out, kv_cache

    def _dsa_decode_sparse(self, lp, h, q_lora, q_nope, q_pe, ckv, k_pe,
                           kv_cache, idx_new, layer_id, batch, cos, sin):
        # --- decode: write latents, select, sparse-attend ---
        import jax.numpy as jnp

        from sglang_fluentllm_tpu.mem.kv_cache import (
            MLAKVCache,
            MLAKVCacheDSA,
            mla_write,
            padded_head_dim,
        )
        from sglang_fluentllm_tpu.ops.attention.dsa import (
            gather_slots,
            indexer_scores,
            mla_sparse_attend,
            select_topk,
        )
        from sglang_fluentllm_tpu.ops.attention.ref_backend import (
            page_gather,
        )

        c = self.config
        B, S, Hq, dn = q_nope.shape
        r, dr = c.kv_lora_rank, c.qk_rope_head_dim
        d_idx = self.idx_dim
        loc = batch.out_cache_loc.reshape(-1)
        mla = mla_write(
            MLAKVCache(lat=kv_cache.lat), layer_id, loc,
            ckv.reshape(B * S, r), k_pe.reshape(B * S, dr),
        )
        kv_cache = MLAKVCacheDSA(lat=mla.lat, idx=idx_new)

        q_idx = (q_lora[:, 0] @ lp["idx_wq_b"]).reshape(
            B, self.idx_heads, d_idx)
        q_idx = jnp.concatenate(
            [apply_rope(q_idx[..., :dr], cos[:, 0][:, None, :],
                        sin[:, 0][:, None, :], interleaved=True),
             q_idx[..., dr:]], axis=-1,
        )
        # weights_proj(x.float()) * h^-0.5 * softmax_scale(d^-0.5)
        w = (h[:, 0].astype(jnp.float32) @ lp["idx_weights_proj"]
             .astype(jnp.float32)) * (self.idx_heads ** -0.5)             * (d_idx ** -0.5)
        from sglang_fluentllm_tpu.ops.attention.pallas_dsa_indexer import (
            dsa_indexer_scores_paged,
            dsa_pallas_mode,
            supported as idx_supported,
        )

        mode = dsa_pallas_mode()
        if mode != "off" and idx_supported(
            batch.page_size, self.idx_heads, batch.page_tables.shape[1]
        ):
            # stream index keys straight from the paged pool (no HBM
            # materialization of the gathered [B, T, d] keys)
            scores = dsa_indexer_scores_paged(
                q_idx, w, kv_cache.idx, layer_id,
                batch.page_tables, batch.seq_lens,
                page_size=batch.page_size,
                interpret=(mode == "interpret"),
            )
        else:
            keys = page_gather(
                kv_cache.idx[layer_id], batch.page_tables,
                batch.page_size
            )[..., :d_idx]
            scores = indexer_scores(q_idx, w, keys, batch.seq_lens)
        pos, valid = select_topk(scores, self.idx_topk)
        slots = gather_slots(batch.page_tables, pos, batch.page_size)

        # absorbed query in the lane-padded latent layout
        r_pad = padded_head_dim(r)
        rope_pad = kv_cache.lat.shape[-1] - r_pad
        q_kc = jnp.einsum(
            "bhd,hrd->bhr", q_nope[:, 0].astype(jnp.float32),
            lp["w_kc"].astype(jnp.float32),
        )
        q_eff = jnp.zeros((B, Hq, r_pad + rope_pad), jnp.float32)
        q_eff = q_eff.at[..., :r].set(q_kc)
        q_eff = q_eff.at[..., r_pad:r_pad + dr].set(
            q_pe[:, 0].astype(jnp.float32))
        ctx = mla_sparse_attend(
            q_eff, kv_cache.lat[layer_id], slots, valid, r, self.sm_scale
        )                                             # [B, Hq, r] f32
        out = jnp.einsum(
            "bhr,hrd->bhd", ctx, lp["w_vc"].astype(jnp.float32)
        ).astype(h.dtype)
        return out[:, None], kv_cache

    def _dense_mlp(self, lp, x):
        return (jax.nn.silu(x @ lp["gate_proj"])
                * (x @ lp["up_proj"])) @ lp["down_proj"]

    def _moe_mlp(self, lp, x, layer_id=None):
        c = self.config
        B, S, H = x.shape
        flat = x.reshape(B * S, H)
        logits = flat @ lp["router"]
        if self.expert_recorder is not None and layer_id is not None:
            from sglang_fluentllm_tpu.ops.moe.topk import select_experts

            _, rec_ids = select_experts(
                logits, c, lp.get("correction_bias")
            )
            from jax.experimental import io_callback

            io_callback(
                self.expert_recorder.record, None, layer_id, rec_ids,
                ordered=False,
            )
        from sglang_fluentllm_tpu.ops.moe.layer import model_moe_forward

        out = model_moe_forward(
            self, flat, logits, lp["w_gate_up"], lp["w_down"], c,
            correction_bias=lp.get("correction_bias"),
            ep_l2p=lp.get("ep_l2p"), ep_n_rep=lp.get("ep_n_rep"),
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
            attn_out, kv_cache = self._mla_block(
                lp, normed, kv_cache, i, batch, cos, sin
            )
            h = h + attn_out
            normed2 = rms_norm(h, lp["post_attention_layernorm"], eps)
            h = h + self._dense_mlp(lp, normed2)

        if self.n_moe:
            def layer_fn(carry, xs):
                h, kv_cache = carry
                lp, layer_id = xs
                normed = rms_norm(h, lp["input_layernorm"], eps)
                attn_out, kv_cache = self._mla_block(
                    lp, normed, kv_cache, layer_id, batch, cos, sin
                )
                h = h + attn_out
                normed2 = rms_norm(h, lp["post_attention_layernorm"], eps)
                h = h + self._moe_mlp(lp, normed2, layer_id)
                return (h, kv_cache), None

            (h, kv_cache), _ = jax.lax.scan(
                layer_fn,
                (h, kv_cache),
                (params["moe_layers"],
                 self.n_dense + jnp.arange(self.n_moe, dtype=jnp.int32)),
            )

        h = rms_norm(h, params["norm"], eps)
        return kv_cache, h

    def compute_logits(self, params, hidden: jax.Array) -> jax.Array:
        if self.config.tie_word_embeddings:
            w = params["embed_tokens"].T
        else:
            w = params["lm_head"]
        return (hidden @ w).astype(jnp.float32)

    # ------------------------------------------------------------------
    def load_weights(self, named_tensors, dtype=jnp.bfloat16):
        c = self.config
        L = c.num_hidden_layers
        Hq = c.num_attention_heads
        dn, dv = c.qk_nope_head_dim, c.v_head_dim
        r = c.kv_lora_rank
        staging: Dict[int, Dict[str, Any]] = {i: {} for i in range(L)}
        top: Dict[str, Any] = {}
        experts: Dict[int, Dict[int, Dict[str, np.ndarray]]] = {
            i: {} for i in range(L)
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
                    continue  # NEXTN/MTP extra layers handled separately
                rest = ".".join(parts[2:])
                st = staging[li]
                if rest == "self_attn.q_proj.weight":
                    st["q_proj"] = w.T
                elif rest == "self_attn.q_a_proj.weight":
                    st["q_a_proj"] = w.T
                elif rest == "self_attn.q_a_layernorm.weight":
                    st["q_a_layernorm"] = w
                elif rest == "self_attn.q_b_proj.weight":
                    st["q_b_proj"] = w.T
                elif rest == "self_attn.kv_a_proj_with_mqa.weight":
                    st["kv_a_proj"] = w.T
                elif rest == "self_attn.kv_a_layernorm.weight":
                    st["kv_a_layernorm"] = w
                elif rest == "self_attn.kv_b_proj.weight":
                    kvb = w.T.reshape(r, Hq, dn + dv)
                    st["w_kc"] = np.transpose(kvb[..., :dn], (1, 0, 2))
                    st["w_vc"] = np.transpose(kvb[..., dn:], (1, 0, 2))
                elif rest == "self_attn.o_proj.weight":
                    st["o_proj"] = w.T
                elif rest == "self_attn.fused_qkv_a_proj_with_mqa.weight":
                    # V3.2 fused layout: q_lora | index_k | kv_lora+rope
                    wt = np.asarray(w).T
                    ql = c.q_lora_rank
                    di = self.idx_dim if self.dsa else 0
                    st["q_a_proj"] = wt[:, :ql]
                    if di:
                        st["idx_wk"] = wt[:, ql:ql + di]
                    st["kv_a_proj"] = wt[:, ql + di:]
                elif rest == "self_attn.indexer.wq_b.weight":
                    st["idx_wq_b"] = w.T
                elif rest == "self_attn.indexer.wk.weight":
                    st["idx_wk"] = w.T
                elif rest == "self_attn.indexer.k_norm.weight":
                    st["idx_k_norm_w"] = w
                elif rest == "self_attn.indexer.k_norm.bias":
                    st["idx_k_norm_b"] = w
                elif rest == "self_attn.indexer.weights_proj.weight":
                    st["idx_weights_proj"] = w.T
                elif rest == "input_layernorm.weight":
                    st["input_layernorm"] = w
                elif rest == "post_attention_layernorm.weight":
                    st["post_attention_layernorm"] = w
                elif rest.startswith("mlp.gate_proj"):
                    st["gate_proj"] = w.T
                elif rest.startswith("mlp.up_proj"):
                    st["up_proj"] = w.T
                elif rest.startswith("mlp.down_proj"):
                    st["down_proj"] = w.T
                elif rest == "mlp.gate.weight":
                    st["router"] = w.T
                elif rest == "mlp.gate.e_score_correction_bias":
                    st["correction_bias"] = w
                elif rest.startswith("mlp.shared_experts.gate_proj"):
                    st["shared_gate_proj"] = w.T
                elif rest.startswith("mlp.shared_experts.up_proj"):
                    st["shared_up_proj"] = w.T
                elif rest.startswith("mlp.shared_experts.down_proj"):
                    st["shared_down_proj"] = w.T
                elif rest.startswith("mlp.experts."):
                    e = int(parts[4])
                    key = parts[5]
                    experts[li].setdefault(e, {})[key] = w

        # pack experts into stacked [E, ...] arrays
        for li, emap in experts.items():
            if not emap:
                continue
            E = c.num_experts
            gate_up = np.stack([
                np.concatenate(
                    [emap[e]["gate_proj"].T, emap[e]["up_proj"].T], axis=1
                )
                for e in range(E)
            ])
            down = np.stack([emap[e]["down_proj"].T for e in range(E)])
            staging[li]["w_gate_up"] = gate_up
            staging[li]["w_down"] = down

        shapes = self.param_shapes()
        params: Dict[str, Any] = {
            "embed_tokens": jnp.asarray(top["embed_tokens"], dtype=dtype),
            "norm": jnp.asarray(top["norm"], dtype=dtype),
        }
        if not c.tie_word_embeddings:
            params["lm_head"] = jnp.asarray(top["lm_head"], dtype=dtype)

        def stack(group_keys, indices):
            out = {}
            for k in group_keys:
                mats = []
                for li in indices:
                    if k not in staging[li]:
                        raise ValueError(f"missing {k} for layer {li}")
                    mats.append(staging[li][k])
                out[k] = jnp.asarray(np.stack(mats), dtype=dtype)
                if k in ("correction_bias",):
                    out[k] = jnp.asarray(np.stack(mats), dtype=jnp.float32)
            return out

        if self.n_dense:
            params["dense_layers"] = stack(
                shapes["dense_layers"].keys(), range(self.n_dense)
            )
        if self.n_moe:
            params["moe_layers"] = stack(
                [k for k in shapes["moe_layers"]
                 if not k.startswith("ep_")],
                range(self.n_dense, L),
            )
        # checkpoints store LOGICAL experts; replicate into physical slots
        return self._expand_physical(params)
