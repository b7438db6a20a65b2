"""Speculative decoding: draft + verify + sample fused in ONE jitted program.

Analog of the reference's ``speculative/`` stack (``base_spec_worker.py:44``,
``eagle_worker.py``, ``pld_worker.py``, ``spec_decoding_cuda_graph_runner.py:91``
— whose headline is fusing draft(multi-step)+target-verify+sample into a
single CUDA graph). On TPU the whole window is one XLA program by
construction (SURVEY §7 phase 5).

Algorithms:

- **EAGLE** (standalone draft checkpoint): k fused draft steps + verify.
- **NEXTN / MTP** (reference ``models/deepseek_nextn.py`` /
  ``flash_nextn.py``): a one-layer draft FED BY TARGET HIDDEN STATES and
  sharing the target's embedding/lm-head (``base_spec_worker.py:144``).
  The carried hidden state lives in a device-resident ``[max_reqs, H]``
  array indexed by req slot — no host round-trip between windows.
- **PLD** (prompt-lookup decoding, reference ``pld_worker.py:15-76``):
  drafts come from an n-gram match over the request's own token history
  (host-side numpy — the sequences live on the host anyway), verified by
  the same fused target program; no draft model at all.

Chain speculation (topk=1, the reference's production config
``Quick_Start.md:28-60`` NEXTN steps=3 topk=1). Acceptance is exact-match
against the target's own sampled token per position — LOSSLESS: every
emitted token is a target-model sample regardless of draft quality.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_fluentllm_tpu.config import ModelConfig, ServerArgs
from sglang_fluentllm_tpu.mem.kv_cache import create_kv_cache
from sglang_fluentllm_tpu.models import get_model_class
from sglang_fluentllm_tpu.ops.sampler import compute_logprobs, sample
from sglang_fluentllm_tpu.runtime.forward_batch import ForwardBatch, ForwardMode
from sglang_fluentllm_tpu.runtime.packing import pack_batch, unpack_batch
from sglang_fluentllm_tpu.runtime.weight_loader import load_model_params

logger = logging.getLogger(__name__)


def propose_pld_drafts(token_ids: List[int], k: int,
                       max_ngram: int = 3) -> np.ndarray:
    """Prompt-lookup: find the most recent earlier occurrence of the
    current suffix n-gram and copy the k tokens that followed it
    (reference pld_worker.py ngram_matching semantics, host-side)."""
    seq = np.asarray(token_ids, np.int32)
    L = len(seq)
    for n in range(min(max_ngram, L - 1), 0, -1):
        suffix = seq[L - n:]
        # search latest i < L-n with seq[i:i+n] == suffix
        for i in range(L - n - 1, -1, -1):
            if np.array_equal(seq[i : i + n], suffix):
                cont = seq[i + n : i + n + k]
                out = np.zeros((k,), np.int32)
                out[: len(cont)] = cont
                return out
    return np.zeros((k,), np.int32)


class SpecWorker:
    """Owns the draft (model or lookup) + the fused spec-decode programs."""

    def __init__(self, runner, server_args: ServerArgs):
        self.runner = runner
        self.algorithm = server_args.speculative_algorithm
        self.num_steps = server_args.speculative_num_steps
        # tree speculation (VERDICT r2 #10): topk root branches, each
        # extended as a greedy chain — a static root-branched draft tree
        # verified with per-node masks in ONE fused window
        self.topk = max(1, int(server_args.speculative_eagle_topk))
        self.draft_model = None
        self.draft_params = None
        self.draft_kv = None
        self.hidden_state = None

        from sglang_fluentllm_tpu.ops.attention.pallas_decode_multirow import (
            RUN_SLACK_PAGES,
        )

        num_slots = (
            (runner.num_pages + 1 + RUN_SLACK_PAGES) * server_args.page_size
        )

        if server_args.speculative_draft_model_path:
            self.draft_config = ModelConfig.from_model_path(
                server_args.speculative_draft_model_path,
                context_length=server_args.context_length,
            )
        else:
            # geometry defaults to the target's (shared embed/lm-head
            # forces matching hidden/vocab anyway)
            self.draft_config = runner.model_config
        # EAGLE-1 checkpoints declare an *Eagle arch (llama_eagle layout:
        # fc-fused draft fed by target hidden); plain-LM checkpoints under
        # --speculative-algorithm EAGLE run as standalone drafts
        is_eagle_ckpt = "Eagle" in str(self.draft_config.architectures)
        if self.algorithm == "EAGLE" and is_eagle_ckpt:
            self.algorithm = "EAGLE"  # hidden-chaining family below
        elif self.algorithm == "EAGLE":
            self.algorithm = "STANDALONE"

        if self.algorithm == "PLD":
            pass  # lookup drafts need no model
        elif self.algorithm in ("NEXTN", "EAGLE3", "EAGLE"):
            from sglang_fluentllm_tpu.spec.nextn import (
                DeepseekNextNDraftModel,
                EagleDraftModel,
                MoeNextNDraftModel,
                NextNDraftModel,
            )

            if self.algorithm == "EAGLE3":
                # true EAGLE-3: draft fed by CONCATENATED aux hidden
                # states captured from multiple target layers, reduced
                # draft vocab + d2t map (reference models/llama_eagle3.py)
                from sglang_fluentllm_tpu.spec.nextn import (
                    Eagle3DraftModel,
                    LongcatEagle3DraftModel,
                )

                if (runner.model_config.is_mla
                        and hasattr(runner.model, "_attn_shapes")):
                    # LongCat flagship: MLA midlayer draft (reference
                    # models/longcat_eagle3.py)
                    cls = LongcatEagle3DraftModel
                else:
                    cls = Eagle3DraftModel
            elif self.algorithm == "EAGLE":
                cls = EagleDraftModel
            elif runner.model_config.is_mla and hasattr(
                runner.model, "_mla_block"
            ):
                # V3-class MTP: the draft layer is a full MLA (+MoE)
                # block (reference models/deepseek_nextn.py). Models
                # without the deepseek block API (LongCat ScMoE) fall
                # back to the llama-style shared-weight draft.
                cls = DeepseekNextNDraftModel
            elif (runner.model_config.is_mla
                  and hasattr(runner.model, "_decoder_layer")):
                # LongCat ScMoE MTP (reference models/flash_nextn.py):
                # full ScMoE block or dense MLA block draft
                from sglang_fluentllm_tpu.spec.nextn import (
                    LongcatNextNDraftModel,
                )

                cls = LongcatNextNDraftModel
            elif (runner.model_config.is_hybrid_linear
                  and hasattr(runner.model, "_full_layer")):
                # Qwen3-Next MTP: the draft layer is the gated
                # full-attention block (reference qwen3_next_mtp.py
                # forces full_attention_interval = 1)
                from sglang_fluentllm_tpu.spec.nextn import (
                    Qwen3NextMtpDraftModel,
                )

                cls = Qwen3NextMtpDraftModel
            elif (runner.model_config.is_moe
                  and hasattr(runner.model, "_attn_block")
                  and hasattr(runner.model, "_moe_mlp")):
                # GLM-4.5-class MTP: full MHA+MoE draft block
                # (reference models/glm4_moe_nextn.py)
                cls = MoeNextNDraftModel
            else:
                cls = NextNDraftModel
            self.draft_model = cls(
                self.draft_config, runner.model, runner.attn_backend
            )
            if server_args.speculative_draft_model_path:
                draft_args = dataclasses.replace(
                    server_args,
                    model_path=server_args.speculative_draft_model_path,
                )
                draft_params = load_model_params(
                    self.draft_model, draft_args, runner.dtype
                )
            else:
                draft_params = self.draft_model.init_dummy_params(
                    seed=1, dtype=runner.dtype
                )
            self.draft_params = runner._shard(
                draft_params, self.draft_model.param_specs()
            )
            # drop OEP markers: the draft has no token-history ring (it
            # embeds through the plain shared table), so its KV cache
            # must not get the OEP ring wrapper
            hf_no_oep = {
                k: v for k, v in self.draft_config.hf_config.items()
                if k not in ("oe_vocab_size_ratio",
                             "ngram_vocab_size_ratio")
            }
            one_layer = dataclasses.replace(
                self.draft_config, num_hidden_layers=1,
                layer_types=None,
                hf_config=hf_no_oep,
                num_kv_layers=getattr(
                    self.draft_model, "draft_kv_layers", None),
            )
            self.draft_kv = create_kv_cache(
                one_layer, num_slots, dtype=runner.dtype,
            )
            H = runner.model_config.hidden_size
            # EAGLE3 carries the target's nc*H aux concat between windows
            Hs = getattr(self.draft_model, "hidden_feed_dim", H)
            self.hidden_state = jnp.zeros(
                (runner.max_reqs, Hs), runner.dtype
            )
        else:  # STANDALONE: independent small-LM draft checkpoint
            assert server_args.speculative_draft_model_path, (
                "STANDALONE requires --speculative-draft-model-path"
            )
            self.draft_config = ModelConfig.from_model_path(
                server_args.speculative_draft_model_path,
                context_length=server_args.context_length,
            )
            draft_cls = get_model_class(self.draft_config.architectures)
            self.draft_model = draft_cls(
                self.draft_config, runner.attn_backend
            )
            draft_args = dataclasses.replace(
                server_args,
                model_path=server_args.speculative_draft_model_path,
            )
            draft_params = load_model_params(
                self.draft_model, draft_args, runner.dtype
            )
            self.draft_params = runner._shard(
                draft_params, self.draft_model.param_specs()
            )
            self.draft_kv = create_kv_cache(
                self.draft_config, num_slots, dtype=runner.dtype,
                kv_cache_dtype=server_args.kv_cache_dtype,
            )
        if self.topk > 1 and runner.model_config.is_hybrid_linear:
            # linear-attention state advances sequentially — a draft TREE
            # cannot be verified in one pass (no custom-mask analog for
            # the delta-rule recurrence), and the exact-inverse rollback
            # only unwinds a suffix of a CHAIN
            raise NotImplementedError(
                "--speculative-eagle-topk > 1 is unsupported for "
                "hybrid-linear targets (GDN/KDA recurrent state is "
                "sequential); use topk=1 chain speculation"
            )
        self._init_jit()
        logger.info(
            "spec decoding: %s, steps=%d topk=%d",
            self.algorithm, self.num_steps, self.topk,
        )

    @property
    def alloc_span(self) -> int:
        """KV slots a window may touch beyond the base position (chain: K;
        tree: topk*K scratch nodes)."""
        return self.topk * self.num_steps

    # ------------------------------------------------------------------
    def _init_jit(self):
        target = self.runner.model
        draft = self.draft_model
        base_key = self.runner.rng_base
        algo = self.algorithm
        cap = self.runner.FUTURE_CAP
        # EAGLE3: target forwards also return the multi-layer aux-hidden
        # concat, which is what feeds the draft (not the final hidden)
        eagle3_ids = getattr(draft, "capture_ids", None)
        eagle3 = algo == "EAGLE3" and eagle3_ids is not None

        def _target_fwd(params_t, kv_t, fb):
            """(kv, h_for_logits, feed_for_draft)."""
            if eagle3:
                return target.forward_with_aux(
                    params_t, kv_t, fb, eagle3_ids)
            kv_t, h = target.forward(params_t, kv_t, fb)
            return kv_t, h, h

        def _ring_resolve(future_map, future_seq, batch):
            """Resolve the window's input token AND base sequence length
            from the device rings: negative input ids reference the slot
            the PREVIOUS window (or prefill) wrote, so spec windows chain
            with pipeline depth > 1 and no host sync on accept lengths
            (reference eagle_worker_overlap.py:86)."""
            raw = batch.input_ids[:, 0]
            neg = raw < 0
            slot = (-raw - 1) % cap
            t_last = jnp.where(neg, future_map[slot], raw)
            base_seq = jnp.where(neg, future_seq[slot], batch.seq_lens)
            return t_last, base_seq

        def _window_slots(page_tables, base_seq, K, ps):
            """KV slots for window positions [base_seq-1, base_seq-1+K],
            computed on-device from the page table (the host only knows an
            upper bound on seq while windows are in flight)."""
            pos = (
                base_seq[:, None] - 1
                + jnp.arange(K + 1, dtype=jnp.int32)[None, :]
            )
            pos = jnp.maximum(pos, 0)  # padded rows -> padding page 0
            pages = jnp.take_along_axis(page_tables, pos // ps, axis=1)
            return pages * ps + pos % ps

        # OEP targets (LongCat over-embedding): every verify is an extend
        # whose n-gram history tail is patched from the device token ring
        # (hist_tail = -1 sentinel). Rejected window tokens leave stale
        # ring entries ONLY at positions >= the accepted end, and the next
        # window overwrites those positions from its own input before any
        # read — position-indexed rings make spec rollback free (the
        # reference instead negates oe_token_table rows for in-flight
        # drafts, over_embedding.py/flash_nextn.py).
        oep_ring_w = None
        if getattr(target, "oep", None) is not None:
            from sglang_fluentllm_tpu.ops.over_embedding import RING_W
            oep_ring_w = RING_W

        def _verify(params_t, kv_t, batch, window, sampling, key0, K, B):
            """One target extend over [t_last, d_1..d_K]; exact-match
            acceptance; returns (kv_t, feed, out_tokens, counts, logprobs)
            where feed is the hidden handed to the NEXT draft window (the
            final hidden, or the aux concat for EAGLE3)."""
            base_seq = batch.seq_lens
            pos = base_seq[:, None] - 1 + jnp.arange(K + 1)[None, :]
            verify = ForwardBatch(
                input_ids=window,
                positions=pos.astype(jnp.int32),
                out_cache_loc=batch.out_cache_loc,
                page_tables=batch.page_tables,
                seq_lens=base_seq + K,
                q_lens=jnp.where(batch.q_lens > 0, K + 1, 0),
                hist_tail=(jnp.full((B, oep_ring_w), -1, jnp.int32)
                           if oep_ring_w else None),
                state_idx=batch.state_idx,
                mode=ForwardMode.TARGET_VERIFY,
                page_size=batch.page_size,
                pages_are_runs=batch.pages_are_runs,
            )
            kv_t, h, feed = _target_fwd(params_t, kv_t, verify)
            logits = target.compute_logits(
                params_t, h.reshape(B * (K + 1), -1)
            ).reshape(B, K + 1, -1)

            t_samp = jnp.stack(
                [
                    sample(logits[:, j], sampling,
                           jax.random.fold_in(key0, j))
                    for j in range(K + 1)
                ],
                axis=1,
            )                                            # [B, K+1]
            drafts = window[:, 1:]
            matches = t_samp[:, :K] == drafts            # [B, K]
            prefix_ok = jnp.cumprod(matches.astype(jnp.int32), axis=1)
            accept = jnp.sum(prefix_ok, axis=1)          # [B] in [0, K]
            jidx = jnp.arange(K + 1)[None, :]
            bonus = jnp.take_along_axis(t_samp, accept[:, None], axis=1)
            out_tokens = jnp.where(
                jidx < accept[:, None],
                jnp.pad(drafts, ((0, 0), (0, 1))),
                jnp.where(jidx == accept[:, None], bonus, -1),
            ).astype(jnp.int32)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            safe = jnp.maximum(out_tokens, 0)
            out_logprobs = jnp.take_along_axis(
                logp, safe[:, :, None], axis=2
            )[..., 0]
            if getattr(kv_t, "aux", None) is not None:
                # hybrid-linear target: roll rejected window tokens back
                # out of the conv/delta-rule state (exact inverse)
                kv_t = target.rollback_linear_state(
                    kv_t, verify, accept + 1)
            return kv_t, feed, out_tokens, accept + 1, out_logprobs

        if algo == "PLD":
            def pld_fn(params_t, kv_t, future_map, future_seq, ints,
                       floats, meta):
                """PLD verify window in the overlap pipeline (VERDICT r2
                weak #8): the window's base token/seq resolve from the
                device rings like NEXTN, so PLD no longer forces the
                engine synchronous. Drafts come from the RESOLVED host
                history (they lag in-flight tokens; verify catches the
                staleness — stale drafts just reject)."""
                K = meta.S - 1
                B = meta.B
                drafts = ints[-(B * K + 2):-2].reshape(B, K)
                write_offset = ints[-2]
                batch, sampling = unpack_batch(
                    ints[: -(B * K + 2)], floats, meta, None
                )
                key0 = jax.random.fold_in(base_key, ints[-1])
                t_last, base_seq = _ring_resolve(
                    future_map, future_seq, batch
                )
                slots = _window_slots(
                    batch.page_tables, base_seq, K, meta.page_size
                )
                batch = dataclasses.replace(
                    batch, seq_lens=base_seq, out_cache_loc=slots
                )
                window = jnp.concatenate(
                    [t_last[:, None], drafts], axis=1
                )
                kv_t, _h, toks, counts, lps = _verify(
                    params_t, kv_t, batch, window, sampling, key0, K, B
                )
                last_tok = jnp.take_along_axis(
                    toks, (counts - 1)[:, None], axis=1
                )[:, 0]
                future_map = jax.lax.dynamic_update_slice(
                    future_map, last_tok, (write_offset,)
                )
                future_seq = jax.lax.dynamic_update_slice(
                    future_seq, base_seq + counts, (write_offset,)
                )
                return kv_t, future_map, future_seq, toks, counts, lps

            self._pld_step = jax.jit(
                pld_fn, donate_argnums=(1, 2, 3), static_argnums=(6,)
            )
            return

        if algo in ("NEXTN", "EAGLE3", "EAGLE"):
            def nextn_fn(params_t, kv_t, params_d, kv_d, hid_state,
                         future_map, future_seq, ints, floats, meta):
                K = meta.S - 1
                B = meta.B
                req_idx = ints[-(B + 2):-2]
                write_offset = ints[-2]
                batch, sampling = unpack_batch(
                    ints[: -(B + 2)], floats, meta, None
                )
                key0 = jax.random.fold_in(base_key, ints[-1])
                t_last, base_seq = _ring_resolve(
                    future_map, future_seq, batch
                )
                slots = _window_slots(
                    batch.page_tables, base_seq, K, meta.page_size
                )
                batch = dataclasses.replace(
                    batch, seq_lens=base_seq, out_cache_loc=slots
                )
                hid0 = hid_state[req_idx]        # [B, H] (nc*H for EAGLE3)
                if eagle3:
                    # reduce the carried aux concat to H BEFORE the scan so
                    # the chained carry has a stable [B, H] shape (the fc
                    # is only ever applied to target aux, reference
                    # llama_eagle3.py:191-192)
                    hid0 = (hid0.astype(params_d["fc"].dtype)
                            @ params_d["fc"] + params_d["fc_bias"])

                def dstep(carry, j):
                    kv_d, tok, hid = carry
                    sub = ForwardBatch(
                        input_ids=tok[:, None],
                        positions=(base_seq - 1 + j)[:, None],
                        out_cache_loc=jax.lax.dynamic_slice_in_dim(
                            slots, j, 1, axis=1
                        ),
                        page_tables=batch.page_tables,
                        seq_lens=base_seq + j,
                        q_lens=batch.q_lens,
                        mode=ForwardMode.DECODE,
                        page_size=meta.page_size,
                        pages_are_runs=meta.runs,
                    )
                    kv_d, hd = draft.forward(
                        params_d, params_t, kv_d, sub, hid[:, None],
                        **({"hidden_is_aux": False} if eagle3 else {}),
                    )
                    logits = draft.compute_logits(
                        params_d, params_t, hd[:, 0]
                    )
                    d = sample(logits, sampling,
                               jax.random.fold_in(key0, 1000 + j))
                    return (kv_d, d, hd[:, 0]), d

                (kv_d, _, _), drafts = jax.lax.scan(
                    dstep, (kv_d, t_last, hid0),
                    jnp.arange(K + 1, dtype=jnp.int32),
                )
                drafts = drafts.T[:, :K]
                window = jnp.concatenate(
                    [t_last[:, None], drafts], axis=1
                )
                kv_t, h, toks, counts, lps = _verify(
                    params_t, kv_t, batch, window, sampling, key0, K, B
                )
                # carry hidden of the last ACCEPTED position for the next
                # window's first draft step
                new_hid = jnp.take_along_axis(
                    h, (counts - 1)[:, None, None], axis=1
                )[:, 0].astype(hid_state.dtype)
                hid_state = hid_state.at[req_idx].set(new_hid)
                # ring write: last accepted token + post-window seq, read
                # by the NEXT window while this one is still unresolved
                last_tok = jnp.take_along_axis(
                    toks, (counts - 1)[:, None], axis=1
                )[:, 0]
                future_map = jax.lax.dynamic_update_slice(
                    future_map, last_tok, (write_offset,)
                )
                future_seq = jax.lax.dynamic_update_slice(
                    future_seq, base_seq + counts, (write_offset,)
                )
                return (kv_t, kv_d, hid_state, future_map, future_seq,
                        toks, counts, lps)

            topk = self.topk

            def nextn_fn_tree(params_t, kv_t, params_d, kv_d, hid_state,
                              future_map, future_seq, ints, floats, meta):
                """Root-branched draft TREE for the hidden-chained families
                (VERDICT r3 #4; reference eagle_utils.py tree masks +
                base_spec_worker.py:379-424 for EAGLE/NEXTN): the draft's
                top-``topk`` first tokens each extend as a greedy chain fed
                by the draft's own hidden, ONE target extend verifies all
                ``N = 1 + topk*K`` nodes under per-node ancestor masks, and
                accept = the deepest target-matching path.

                KV discipline matches spec_fn_tree: tree nodes write TARGET
                KV at window-INDEX scratch slots; the winning path's rows
                are copied to position slots (kv_copy_rows); the DRAFT pool
                is repaired with one teacher-forced extend over the
                accepted path fed by the TARGET's hiddens at the parent
                nodes (reference draft-extend-after-verify semantics)."""
                import numpy as _np

                from sglang_fluentllm_tpu.mem.kv_cache import kv_copy_rows

                K = meta.S - 1
                B = meta.B
                N = 1 + topk * K
                req_idx = ints[-(B + 2):-2]
                write_offset = ints[-2]
                batch, sampling = unpack_batch(
                    ints[: -(B + 2)], floats, meta, None
                )
                key0 = jax.random.fold_in(base_key, ints[-1])
                t_last, base_seq = _ring_resolve(
                    future_map, future_seq, batch
                )
                slots = _window_slots(
                    batch.page_tables, base_seq, topk * K, meta.page_size
                )                                         # [B, N]
                batch = dataclasses.replace(
                    batch, seq_lens=base_seq, out_cache_loc=slots
                )
                hid0 = hid_state[req_idx]    # [B, H] (nc*H for EAGLE3)
                if eagle3:
                    hid0 = (hid0.astype(params_d["fc"].dtype)
                            @ params_d["fc"] + params_d["fc_bias"])

                # ---- draft root step -> top-k branch tokens ----
                sub0 = ForwardBatch(
                    input_ids=t_last[:, None],
                    positions=(base_seq - 1)[:, None],
                    out_cache_loc=slots[:, :1],
                    page_tables=batch.page_tables,
                    seq_lens=base_seq,
                    q_lens=batch.q_lens,
                    mode=ForwardMode.DECODE,
                    page_size=meta.page_size,
                    pages_are_runs=meta.runs,
                )
                kv_d, h0 = draft.forward(
                    params_d, params_t, kv_d, sub0, hid0[:, None],
                    **({"hidden_is_aux": False} if eagle3 else {}),
                )
                logits0 = draft.compute_logits(
                    params_d, params_t, h0[:, 0]
                )
                _, branch = jax.lax.top_k(logits0, topk)  # [B, topk]
                branch = branch.astype(jnp.int32)

                # ---- extend each branch as a greedy hidden-fed chain ----
                # (chains share draft-pool position slots 1..K-1; repaired
                # below)
                def dstep(carry, j):
                    kv_d, tok, hid = carry
                    sub = ForwardBatch(
                        input_ids=tok[:, None],
                        positions=(base_seq - 1 + j)[:, None],
                        out_cache_loc=jax.lax.dynamic_slice_in_dim(
                            slots, j, 1, axis=1
                        ),
                        page_tables=batch.page_tables,
                        seq_lens=base_seq + j,
                        q_lens=batch.q_lens,
                        mode=ForwardMode.DECODE,
                        page_size=meta.page_size,
                        pages_are_runs=meta.runs,
                    )
                    kv_d, hd = draft.forward(
                        params_d, params_t, kv_d, sub, hid[:, None],
                        **({"hidden_is_aux": False} if eagle3 else {}),
                    )
                    logits = draft.compute_logits(
                        params_d, params_t, hd[:, 0]
                    )
                    d = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    return (kv_d, d, hd[:, 0]), d

                chains = []
                for c in range(topk):
                    if K > 1:
                        (kv_d, _, _), rest = jax.lax.scan(
                            dstep, (kv_d, branch[:, c], h0[:, 0]),
                            jnp.arange(1, K, dtype=jnp.int32),
                        )
                        chain_c = jnp.concatenate(
                            [branch[:, c:c + 1], rest.T], axis=1
                        )                                 # [B, K]
                    else:
                        chain_c = branch[:, c:c + 1]
                    chains.append(chain_c)
                window = jnp.concatenate(
                    [t_last[:, None]] + chains, axis=1
                )                                         # [B, N]

                # ---- verify: one target extend over all tree nodes ----
                depth = _np.concatenate(
                    [[0]] + [_np.arange(1, K + 1)] * topk
                ).astype(_np.int32)                       # [N]
                pos = base_seq[:, None] - 1 + jnp.asarray(depth)[None, :]
                tree_mask = _np.zeros((N, N), bool)
                tree_mask[:, 0] = True                    # all see the root
                for c in range(topk):
                    for j in range(K):
                        i = 1 + c * K + j
                        tree_mask[i, 1 + c * K: i + 1] = True
                tree_mask[0, 1:] = False
                cm = jnp.broadcast_to(
                    jnp.asarray(tree_mask)[None], (B, N, N)
                )
                verify = ForwardBatch(
                    input_ids=window,
                    positions=pos.astype(jnp.int32),
                    out_cache_loc=slots,
                    page_tables=batch.page_tables,
                    seq_lens=base_seq - 1 + N,
                    q_lens=jnp.where(batch.q_lens > 0, N, 0),
                    custom_mask=cm,
                    hist_tail=(jnp.full((B, oep_ring_w), -1, jnp.int32)
                               if oep_ring_w else None),
                    state_idx=batch.state_idx,
                    mode=ForwardMode.TARGET_VERIFY,
                    page_size=batch.page_size,
                    pages_are_runs=batch.pages_are_runs,
                )
                kv_t, h, feed = _target_fwd(params_t, kv_t, verify)
                logits = target.compute_logits(
                    params_t, h.reshape(B * N, -1)
                ).reshape(B, N, -1)
                t_samp = jnp.stack(
                    [
                        sample(logits[:, i], sampling,
                               jax.random.fold_in(key0, i))
                        for i in range(N)
                    ],
                    axis=1,
                )                                         # [B, N]

                # ---- deepest matching path ----
                root_s = t_samp[:, 0]
                accs = []
                for c in range(topk):
                    ch = window[:, 1 + c * K: 1 + c * K + K]
                    preds = jnp.concatenate(
                        [root_s[:, None],
                         t_samp[:, 1 + c * K: 1 + c * K + K - 1]],
                        axis=1,
                    )                                     # [B, K]
                    m = (ch == preds).astype(jnp.int32)
                    accs.append(
                        jnp.sum(jnp.cumprod(m, axis=1), axis=1))
                accs = jnp.stack(accs, axis=1)            # [B, topk]
                accept = jnp.max(accs, axis=1)            # [B]
                best = jnp.argmax(accs, axis=1).astype(jnp.int32)

                stacked = jnp.stack(chains, axis=1)       # [B, topk, K]
                best_chain = jnp.take_along_axis(
                    stacked, best[:, None, None], axis=1
                )[:, 0]                                   # [B, K]
                jidx = jnp.arange(K + 1, dtype=jnp.int32)[None, :]
                parent_idx = jnp.where(
                    jidx == 0, 0,
                    1 + best[:, None] * K + jidx - 1,
                )                                         # [B, K+1]
                last_node = jnp.take_along_axis(
                    parent_idx, accept[:, None], axis=1
                )                                         # [B, 1]
                bonus = jnp.take_along_axis(
                    t_samp, last_node, axis=1
                )[:, 0]
                out_tokens = jnp.where(
                    jidx < accept[:, None],
                    jnp.pad(best_chain, ((0, 0), (0, 1))),
                    jnp.where(
                        jidx == accept[:, None], bonus[:, None], -1),
                ).astype(jnp.int32)
                logp = jax.nn.log_softmax(
                    logits.astype(jnp.float32), axis=-1)
                node_logp = jnp.take_along_axis(
                    logp, parent_idx[:, :, None] % N, axis=1
                )                                         # [B, K+1, V]
                out_logprobs = jnp.take_along_axis(
                    node_logp,
                    jnp.maximum(out_tokens, 0)[:, :, None], axis=2,
                )[..., 0]

                # ---- materialize the winning path at position slots ----
                kidx = jnp.arange(K, dtype=jnp.int32)[None, :]
                src_idx = 1 + best[:, None] * K + kidx    # [B, K]
                src = jnp.take_along_axis(slots, src_idx, axis=1)
                dst = slots[:, 1:K + 1]
                src = jnp.where(kidx < accept[:, None], src, dst)
                kv_t = kv_copy_rows(
                    kv_t, src.reshape(-1), dst.reshape(-1))

                # ---- draft repair: teacher-forced extend over the path,
                # fed by the target's hiddens at each token's parent node
                # (reference draft-extend-after-verify) ----
                feed_repair = jnp.take_along_axis(
                    feed, parent_idx[:, :K, None], axis=1
                )                                         # [B, K, Hs]
                repair = ForwardBatch(
                    input_ids=best_chain,
                    positions=(base_seq[:, None]
                               + jnp.arange(K, dtype=jnp.int32)[None, :]),
                    out_cache_loc=slots[:, 1:K + 1],
                    page_tables=batch.page_tables,
                    seq_lens=base_seq + K,
                    q_lens=jnp.where(batch.q_lens > 0, K, 0),
                    mode=ForwardMode.TARGET_VERIFY,
                    page_size=meta.page_size,
                    pages_are_runs=meta.runs,
                )
                kv_d, _ = draft.forward(
                    params_d, params_t, kv_d, repair, feed_repair,
                    **({"hidden_is_aux": True} if eagle3 else {}),
                )

                # carry the target hidden (aux concat for EAGLE3) of the
                # last accepted node into the next window's root step
                new_hid = jnp.take_along_axis(
                    feed, last_node[:, :, None], axis=1
                )[:, 0].astype(hid_state.dtype)
                hid_state = hid_state.at[req_idx].set(new_hid)

                counts = accept + 1
                last_tok = jnp.take_along_axis(
                    out_tokens, (counts - 1)[:, None], axis=1
                )[:, 0]
                future_map = jax.lax.dynamic_update_slice(
                    future_map, last_tok, (write_offset,)
                )
                future_seq = jax.lax.dynamic_update_slice(
                    future_seq, base_seq + counts, (write_offset,)
                )
                return (kv_t, kv_d, hid_state, future_map, future_seq,
                        out_tokens, counts, out_logprobs)

            self._spec_step = jax.jit(
                nextn_fn_tree if topk > 1 else nextn_fn,
                donate_argnums=(1, 3, 4, 5, 6),
                static_argnums=(9,),
            )

            def nextn_prefill(params_t, kv_t, params_d, kv_d, hid_state,
                              future_map, future_seq, ints, floats, meta):
                """Target prefill + sample + draft-layer prefill + hidden
                state init, fused (reference forward_prefill_spec +
                capture_hidden_mode=FULL)."""
                B = meta.B
                req_idx = ints[-(B + 2):-2]
                write_offset = ints[-2]
                batch, sampling = unpack_batch(
                    ints[: -(B + 2)], floats, meta, None
                )
                key = jax.random.fold_in(base_key, ints[-1])
                kv_t, h, feed = _target_fwd(params_t, kv_t, batch)
                idx = jnp.clip(batch.q_lens - 1, 0, h.shape[1] - 1)
                h_last = jnp.take_along_axis(
                    h, idx[:, None, None], axis=1
                )[:, 0]
                logits = target.compute_logits(params_t, h_last)
                ids = sample(logits, sampling, key)
                logprobs = compute_logprobs(logits, ids)
                # draft prefill over the same tokens, fed by target hidden
                # (aux concat for EAGLE3)
                kv_d, _hd = draft.forward(
                    params_d, params_t, kv_d, batch, feed,
                    **({"hidden_is_aux": True} if eagle3 else {}),
                )
                feed_last = jnp.take_along_axis(
                    feed, idx[:, None, None], axis=1
                )[:, 0]
                hid_state = hid_state.at[req_idx].set(
                    feed_last.astype(hid_state.dtype)
                )
                future_map = jax.lax.dynamic_update_slice(
                    future_map, ids, (write_offset,)
                )
                future_seq = jax.lax.dynamic_update_slice(
                    future_seq, batch.seq_lens + 1, (write_offset,)
                )
                return (kv_t, kv_d, hid_state, future_map, future_seq,
                        ids, logprobs)

            self._spec_prefill = jax.jit(
                nextn_prefill, donate_argnums=(1, 3, 4, 5, 6),
                static_argnums=(9,),
            )
            return

        # ---- EAGLE (standalone draft model) ----
        topk = self.topk

        def spec_fn_tree(params_t, kv_t, params_d, kv_d, future_map,
                         future_seq, ints, floats, meta):
            """Root-branched draft TREE (VERDICT r2 #10, reference
            eagle_utils.py tree paths): the draft's top-``topk`` first
            tokens each extend as a greedy chain; ONE target extend
            verifies all ``N = 1 + topk*K`` nodes under a per-node
            ancestor mask; accept = the deepest target-matching path.

            KV discipline: tree nodes write TARGET KV at window-INDEX
            scratch slots; after acceptance the winning path's rows are
            copied to the position-determined slots future windows read
            (kv_copy_rows). The DRAFT pool is repaired with one
            teacher-forced extend over the accepted path (sequential
            chain drafting overwrites position slots per branch)."""
            import numpy as _np

            from sglang_fluentllm_tpu.mem.kv_cache import kv_copy_rows

            batch, sampling = unpack_batch(ints[:-2], floats, meta, None)
            write_offset = ints[-2]
            key0 = jax.random.fold_in(base_key, ints[-1])
            K = meta.S - 1
            B = meta.B
            N = 1 + topk * K
            t_last, base_seq = _ring_resolve(future_map, future_seq, batch)
            slots = _window_slots(
                batch.page_tables, base_seq, topk * K, meta.page_size
            )                                             # [B, N]
            batch = dataclasses.replace(
                batch, seq_lens=base_seq, out_cache_loc=slots
            )

            # ---- draft: root step -> top-k branch tokens ----
            sub0 = ForwardBatch(
                input_ids=t_last[:, None],
                positions=(base_seq - 1)[:, None],
                out_cache_loc=slots[:, :1],
                page_tables=batch.page_tables,
                seq_lens=base_seq,
                q_lens=batch.q_lens,
                mode=ForwardMode.DECODE,
                page_size=meta.page_size,
                pages_are_runs=meta.runs,
            )
            kv_d, h0 = draft.forward(params_d, kv_d, sub0)
            logits0 = draft.compute_logits(params_d, h0[:, 0])
            _, branch = jax.lax.top_k(logits0, topk)      # [B, topk]
            branch = branch.astype(jnp.int32)

            # ---- draft: extend each branch as a greedy chain ----
            # (sequential python loop, topk small; each chain re-uses the
            # POSITION slots 1..K-1 of the draft pool — repaired below)
            def dstep(carry, j):
                kv_d, tok = carry
                sub = ForwardBatch(
                    input_ids=tok[:, None],
                    positions=(base_seq - 1 + j)[:, None],
                    out_cache_loc=jax.lax.dynamic_slice_in_dim(
                        slots, j, 1, axis=1
                    ),
                    page_tables=batch.page_tables,
                    seq_lens=base_seq + j,
                    q_lens=batch.q_lens,
                    mode=ForwardMode.DECODE,
                    page_size=meta.page_size,
                    pages_are_runs=meta.runs,
                )
                kv_d, h = draft.forward(params_d, kv_d, sub)
                logits = draft.compute_logits(params_d, h[:, 0])
                d = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (kv_d, d), d

            chains = []
            for c in range(topk):
                if K > 1:
                    (kv_d, _), rest = jax.lax.scan(
                        dstep, (kv_d, branch[:, c]),
                        jnp.arange(1, K, dtype=jnp.int32),
                    )
                    chain_c = jnp.concatenate(
                        [branch[:, c:c + 1], rest.T], axis=1
                    )                                     # [B, K]
                else:
                    chain_c = branch[:, c:c + 1]
                chains.append(chain_c)
            window = jnp.concatenate([t_last[:, None]] + chains, axis=1)

            # ---- verify: one target extend over all tree nodes ----
            depth = _np.concatenate(
                [[0]] + [_np.arange(1, K + 1)] * topk
            ).astype(_np.int32)                           # [N]
            pos = base_seq[:, None] - 1 + jnp.asarray(depth)[None, :]
            tree_mask = _np.zeros((N, N), bool)
            tree_mask[:, 0] = True                        # all see the root
            for c in range(topk):
                for j in range(K):
                    i = 1 + c * K + j
                    tree_mask[i, 1 + c * K: i + 1] = True  # own ancestors
            tree_mask[0, 1:] = False
            cm = jnp.broadcast_to(jnp.asarray(tree_mask)[None], (B, N, N))
            verify = ForwardBatch(
                input_ids=window,
                positions=pos.astype(jnp.int32),
                out_cache_loc=slots,
                page_tables=batch.page_tables,
                seq_lens=base_seq - 1 + N,
                q_lens=jnp.where(batch.q_lens > 0, N, 0),
                custom_mask=cm,
                hist_tail=(jnp.full((B, oep_ring_w), -1, jnp.int32)
                           if oep_ring_w else None),
                state_idx=batch.state_idx,
                mode=ForwardMode.TARGET_VERIFY,
                page_size=batch.page_size,
                pages_are_runs=batch.pages_are_runs,
            )
            kv_t, h, _feed = _target_fwd(params_t, kv_t, verify)
            logits = target.compute_logits(
                params_t, h.reshape(B * N, -1)
            ).reshape(B, N, -1)
            t_samp = jnp.stack(
                [
                    sample(logits[:, i], sampling,
                           jax.random.fold_in(key0, i))
                    for i in range(N)
                ],
                axis=1,
            )                                             # [B, N]

            # ---- deepest matching path ----
            root_s = t_samp[:, 0]
            accs = []
            for c in range(topk):
                ch = window[:, 1 + c * K: 1 + c * K + K]  # [B, K]
                preds = jnp.concatenate(
                    [root_s[:, None],
                     t_samp[:, 1 + c * K: 1 + c * K + K - 1]],
                    axis=1,
                )                                         # [B, K]
                m = (ch == preds).astype(jnp.int32)
                accs.append(jnp.sum(jnp.cumprod(m, axis=1), axis=1))
            accs = jnp.stack(accs, axis=1)                # [B, topk]
            accept = jnp.max(accs, axis=1)                # [B]
            best = jnp.argmax(accs, axis=1).astype(jnp.int32)

            stacked = jnp.stack(chains, axis=1)           # [B, topk, K]
            best_chain = jnp.take_along_axis(
                stacked, best[:, None, None], axis=1
            )[:, 0]                                       # [B, K]
            jidx = jnp.arange(K + 1, dtype=jnp.int32)[None, :]
            parent_idx = jnp.where(
                jidx == 0, 0,
                1 + best[:, None] * K + jidx - 1,
            )                                             # [B, K+1]
            bonus = jnp.take_along_axis(
                t_samp,
                jnp.take_along_axis(parent_idx, accept[:, None], axis=1),
                axis=1,
            )[:, 0]
            out_tokens = jnp.where(
                jidx < accept[:, None],
                jnp.pad(best_chain, ((0, 0), (0, 1))),
                jnp.where(jidx == accept[:, None], bonus[:, None], -1),
            ).astype(jnp.int32)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            node_logp = jnp.take_along_axis(
                logp, parent_idx[:, :, None] % N, axis=1
            )                                             # [B, K+1, V]
            out_logprobs = jnp.take_along_axis(
                node_logp, jnp.maximum(out_tokens, 0)[:, :, None], axis=2
            )[..., 0]

            # ---- materialize the winning path at position slots ----
            kidx = jnp.arange(K, dtype=jnp.int32)[None, :]
            src_idx = 1 + best[:, None] * K + kidx       # [B, K]
            src = jnp.take_along_axis(slots, src_idx, axis=1)
            dst = slots[:, 1:K + 1]
            src = jnp.where(kidx < accept[:, None], src, dst)
            kv_t = kv_copy_rows(kv_t, src.reshape(-1), dst.reshape(-1))

            # ---- draft repair: teacher-forced extend over the path ----
            repair = ForwardBatch(
                input_ids=best_chain,
                positions=(base_seq[:, None]
                           + jnp.arange(K, dtype=jnp.int32)[None, :]),
                out_cache_loc=slots[:, 1:K + 1],
                page_tables=batch.page_tables,
                seq_lens=base_seq + K,
                q_lens=jnp.where(batch.q_lens > 0, K, 0),
                mode=ForwardMode.TARGET_VERIFY,
                page_size=meta.page_size,
                pages_are_runs=meta.runs,
            )
            kv_d, _ = draft.forward(params_d, kv_d, repair)

            counts = accept + 1
            last_tok = jnp.take_along_axis(
                out_tokens, (counts - 1)[:, None], axis=1
            )[:, 0]
            future_map = jax.lax.dynamic_update_slice(
                future_map, last_tok, (write_offset,)
            )
            future_seq = jax.lax.dynamic_update_slice(
                future_seq, base_seq + counts, (write_offset,)
            )
            return (kv_t, kv_d, future_map, future_seq, out_tokens,
                    counts, out_logprobs)

        def spec_fn(params_t, kv_t, params_d, kv_d, future_map, future_seq,
                    ints, floats, meta):
            batch, sampling = unpack_batch(ints[:-2], floats, meta, None)
            write_offset = ints[-2]
            key0 = jax.random.fold_in(base_key, ints[-1])
            K = meta.S - 1
            B = meta.B
            t_last, base_seq = _ring_resolve(future_map, future_seq, batch)
            slots = _window_slots(
                batch.page_tables, base_seq, K, meta.page_size
            )
            batch = dataclasses.replace(
                batch, seq_lens=base_seq, out_cache_loc=slots
            )

            def dstep(carry, j):
                kv_d, tok = carry
                sub = ForwardBatch(
                    input_ids=tok[:, None],
                    positions=(base_seq - 1 + j)[:, None],
                    out_cache_loc=jax.lax.dynamic_slice_in_dim(
                        slots, j, 1, axis=1
                    ),
                    page_tables=batch.page_tables,
                    seq_lens=base_seq + j,
                    q_lens=batch.q_lens,
                    mode=ForwardMode.DECODE,
                    page_size=meta.page_size,
                    pages_are_runs=meta.runs,
                )
                kv_d, h = draft.forward(params_d, kv_d, sub)
                logits = draft.compute_logits(params_d, h[:, 0])
                d = sample(logits, sampling,
                           jax.random.fold_in(key0, 1000 + j))
                return (kv_d, d), d

            (kv_d, _), drafts = jax.lax.scan(
                dstep, (kv_d, t_last), jnp.arange(K + 1, dtype=jnp.int32)
            )
            drafts = drafts.T[:, :K]
            window = jnp.concatenate([t_last[:, None], drafts], axis=1)
            kv_t, _h, toks, counts, lps = _verify(
                params_t, kv_t, batch, window, sampling, key0, K, B
            )
            last_tok = jnp.take_along_axis(
                toks, (counts - 1)[:, None], axis=1
            )[:, 0]
            future_map = jax.lax.dynamic_update_slice(
                future_map, last_tok, (write_offset,)
            )
            future_seq = jax.lax.dynamic_update_slice(
                future_seq, base_seq + counts, (write_offset,)
            )
            return kv_t, kv_d, future_map, future_seq, toks, counts, lps

        self._spec_step = jax.jit(
            spec_fn_tree if topk > 1 else spec_fn,
            donate_argnums=(1, 3, 4, 5), static_argnums=(8,),
        )

        def draft_extend_fn(params_d, kv_d, ints, floats, meta):
            """Draft-side prefill over the same extend batch so the draft
            KV covers the prompt (reference forward_prefill_spec,
            eagle_worker.py:192)."""
            batch, _ = unpack_batch(ints[:-2], floats, meta, None)
            kv_d, _h = draft.forward(params_d, kv_d, batch)
            return kv_d

        self._draft_extend = jax.jit(
            draft_extend_fn, donate_argnums=(1,), static_argnums=(4,)
        )

    # ------------------------------------------------------------------
    @property
    def needs_prefill_hook(self) -> bool:
        return self.algorithm in ("NEXTN", "EAGLE3", "EAGLE")

    def forward_prefill(self, batch: ForwardBatch, sampling,
                        future_offset: int, req_idx: List[int]):
        """NEXTN fused prefill (target + draft + hidden init)."""
        r = self.runner
        if r.broadcaster is not None:
            r.broadcaster.publish(
                ("spec_prefill", batch, sampling, future_offset, req_idx)
            )
        r.step_counter += 1
        ints, floats, meta = pack_batch(batch, sampling)
        ri = np.zeros((meta.B,), np.int32)
        ri[: len(req_idx)] = req_idx
        ints = np.concatenate(
            [ints, ri, [future_offset % r.FUTURE_CAP, r.step_counter]]
        ).astype(np.int32)
        (r.kv_cache, self.draft_kv, self.hidden_state, r.future_map,
         r.future_seq, ids, logprobs) = self._spec_prefill(
            r.params, r.kv_cache, self.draft_params, self.draft_kv,
            self.hidden_state, r.future_map, r.future_seq,
            jnp.asarray(ints), jnp.asarray(floats), meta,
        )
        return ids, logprobs

    def forward_draft_extend(self, batch: ForwardBatch, sampling):
        """EAGLE: populate draft KV for a prefill/chunk batch."""
        if self.algorithm == "PLD":
            return
        if self.runner.broadcaster is not None:
            self.runner.broadcaster.publish(
                ("spec_draft_extend", batch, sampling)
            )
        ints, floats, meta = pack_batch(batch, sampling)
        ints = np.concatenate([ints, [0, 0]]).astype(np.int32)
        self.draft_kv = self._draft_extend(
            self.draft_params, self.draft_kv,
            jnp.asarray(ints), jnp.asarray(floats), meta,
        )

    def forward_spec(self, batch: ForwardBatch, sampling,
                     drafts: Optional[np.ndarray] = None,
                     req_idx: Optional[List[int]] = None,
                     future_offset: int = 0) -> Tuple:
        """Returns device arrays (tokens [B, K+1] -1-padded, counts [B],
        logprobs [B, K+1]) WITHOUT syncing. The window's last accepted
        token and post-window seq_len are written into the future rings at
        ``future_offset`` so the next window can launch before this one
        resolves (spec x overlap)."""
        r = self.runner
        if r.broadcaster is not None:
            r.broadcaster.publish(
                ("spec", batch, sampling, drafts, req_idx, future_offset)
            )
        r.step_counter += 1
        ints, floats, meta = pack_batch(batch, sampling)
        offset = future_offset % r.FUTURE_CAP
        if self.algorithm == "PLD":
            K = meta.S - 1
            d = np.zeros((meta.B, K), np.int32)
            if drafts is not None:
                d[: drafts.shape[0]] = drafts
            ints = np.concatenate(
                [ints, d.reshape(-1), [offset, r.step_counter]]
            ).astype(np.int32)
            (r.kv_cache, r.future_map, r.future_seq, tokens, counts,
             logprobs) = self._pld_step(
                r.params, r.kv_cache, r.future_map, r.future_seq,
                jnp.asarray(ints), jnp.asarray(floats), meta,
            )
            return tokens, counts, logprobs
        if self.algorithm in ("NEXTN", "EAGLE3", "EAGLE"):
            ri = np.zeros((meta.B,), np.int32)
            if req_idx:
                ri[: len(req_idx)] = req_idx
            ints = np.concatenate(
                [ints, ri, [offset, r.step_counter]]
            ).astype(np.int32)
            (r.kv_cache, self.draft_kv, self.hidden_state, r.future_map,
             r.future_seq, tokens, counts, logprobs) = self._spec_step(
                r.params, r.kv_cache, self.draft_params, self.draft_kv,
                self.hidden_state, r.future_map, r.future_seq,
                jnp.asarray(ints), jnp.asarray(floats), meta,
            )
            return tokens, counts, logprobs
        ints = np.concatenate(
            [ints, [offset, r.step_counter]]
        ).astype(np.int32)
        (r.kv_cache, self.draft_kv, r.future_map, r.future_seq, tokens,
         counts, logprobs) = self._spec_step(
            r.params, r.kv_cache, self.draft_params, self.draft_kv,
            r.future_map, r.future_seq,
            jnp.asarray(ints), jnp.asarray(floats), meta,
        )
        return tokens, counts, logprobs
