"""Speculative decoding: draft + verify + sample fused in ONE jitted program.

Analog of the reference's ``speculative/`` stack (``base_spec_worker.py:44``,
``eagle_worker.py``, ``spec_decoding_cuda_graph_runner.py:91`` — whose
headline is fusing draft(multi-step)+target-verify+sample into a single CUDA
graph). On TPU the whole window is one XLA program by construction
(SURVEY §7 phase 5).

Chain speculation (topk=1, the reference's production config
``Quick_Start.md:28-60`` NEXTN steps=3 topk=1):

- draft proposes d_1..d_k by k fused single-token steps;
- target verifies the window [t_last, d_1..d_k] in one extend forward
  (k+1 logit rows);
- acceptance is exact-match against the target's own sampled token per
  position (greedy: argmax match) — LOSSLESS: every emitted token is a
  target-model sample; the accepted prefix plus one bonus token advance
  the sequence by accept_len+1;
- KV bookkeeping needs no rollback: the next window's first position
  overwrites any stale slots (chain property), and the draft cache shares
  the target's page table (reference shares req_to_token, SURVEY B.1).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_fluentllm_tpu.config import ModelConfig, ServerArgs
from sglang_fluentllm_tpu.mem.kv_cache import create_kv_cache
from sglang_fluentllm_tpu.models import get_model_class
from sglang_fluentllm_tpu.ops.sampler import sample
from sglang_fluentllm_tpu.runtime.forward_batch import ForwardBatch, ForwardMode
from sglang_fluentllm_tpu.runtime.packing import unpack_batch
from sglang_fluentllm_tpu.runtime.weight_loader import load_model_params

logger = logging.getLogger(__name__)


class SpecWorker:
    """Owns the draft model + the fused spec-decode program."""

    def __init__(self, runner, server_args: ServerArgs):
        self.runner = runner
        self.algorithm = server_args.speculative_algorithm
        self.num_steps = server_args.speculative_num_steps
        assert server_args.speculative_draft_model_path, (
            "speculative decoding requires --speculative-draft-model-path"
        )
        self.draft_config = ModelConfig.from_model_path(
            server_args.speculative_draft_model_path,
            context_length=server_args.context_length,
        )
        draft_cls = get_model_class(self.draft_config.architectures)
        self.draft_model = draft_cls(self.draft_config, runner.attn_backend)

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
        # draft KV pool mirrors the target's slot space (shared page table)
        from sglang_fluentllm_tpu.ops.attention.pallas_decode_multirow import (
            RUN_SLACK_PAGES,
        )

        num_slots = (
            (runner.num_pages + 1 + RUN_SLACK_PAGES) * server_args.page_size
        )
        self.draft_kv = create_kv_cache(
            self.draft_config, num_slots, dtype=runner.dtype,
            kv_cache_dtype=server_args.kv_cache_dtype,
        )
        self._init_jit()
        logger.info(
            "spec decoding: %s, draft=%s, steps=%d",
            self.algorithm,
            self.draft_config.architectures,
            self.num_steps,
        )

    # ------------------------------------------------------------------
    def _init_jit(self):
        target = self.runner.model
        draft = self.draft_model
        cap = self.runner.FUTURE_CAP
        base_key = self.runner.rng_base

        def spec_fn(params_t, kv_t, params_d, kv_d, ints, floats, meta):
            batch, sampling = unpack_batch(ints[:-2], floats, meta, None)
            key0 = jax.random.fold_in(base_key, ints[-1])
            K = meta.S - 1  # draft tokens per window
            B = meta.B
            t_last = batch.input_ids[:, 0]              # [B]
            slots = batch.out_cache_loc                 # [B, K+1]
            base_seq = batch.seq_lens                   # [B] incl. t_last

            # ---- draft phase: K fused single-token steps ----
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
                )
                kv_d, h = draft.forward(params_d, kv_d, sub)
                logits = draft.compute_logits(params_d, h[:, 0])
                d = sample(logits, sampling, jax.random.fold_in(key0, 1000 + j))
                return (kv_d, d), d

            # K+1 steps: the extra step writes the draft KV of d_K (needed
            # by the next window when the full chain is accepted); its
            # output is discarded.
            (kv_d, _), drafts = jax.lax.scan(
                dstep, (kv_d, t_last), jnp.arange(K + 1, dtype=jnp.int32)
            )
            drafts = drafts.T[:, :K]                     # [B, K] = d_1..d_K

            # ---- verify phase: one target extend over the window ----
            window = jnp.concatenate([t_last[:, None], drafts], axis=1)
            pos = base_seq[:, None] - 1 + jnp.arange(K + 1)[None, :]
            verify = ForwardBatch(
                input_ids=window,
                positions=pos.astype(jnp.int32),
                out_cache_loc=slots,
                page_tables=batch.page_tables,
                seq_lens=base_seq + K,
                q_lens=jnp.where(batch.q_lens > 0, K + 1, 0),
                mode=ForwardMode.TARGET_VERIFY,
                page_size=meta.page_size,
            )
            kv_t, h = target.forward(params_t, kv_t, verify)  # [B, K+1, H]
            logits = target.compute_logits(
                params_t, h.reshape(B * (K + 1), -1)
            ).reshape(B, K + 1, -1)

            # target's own sample at every position (lossless acceptance)
            def tsample(j):
                return sample(
                    logits[:, j], sampling, jax.random.fold_in(key0, j)
                )

            t_samp = jnp.stack(
                [tsample(j) for j in range(K + 1)], axis=1
            )                                            # [B, K+1]

            # accept d_j while it equals the target sample at j-1
            matches = t_samp[:, :K] == drafts            # [B, K]
            prefix_ok = jnp.cumprod(matches.astype(jnp.int32), axis=1)
            accept = jnp.sum(prefix_ok, axis=1)          # [B] in [0, K]
            # emitted tokens: d_1..d_accept then bonus = t_samp[:, accept]
            jidx = jnp.arange(K + 1)[None, :]
            bonus = jnp.take_along_axis(
                t_samp, accept[:, None], axis=1
            )                                            # [B, 1]
            out_tokens = jnp.where(
                jidx < accept[:, None],
                jnp.pad(drafts, ((0, 0), (0, 1))),
                jnp.where(jidx == accept[:, None], bonus, -1),
            ).astype(jnp.int32)                          # [B, K+1]
            logp = jax.nn.log_softmax(
                logits.astype(jnp.float32), axis=-1
            )
            safe = jnp.maximum(out_tokens, 0)
            out_logprobs = jnp.take_along_axis(
                logp, safe[:, :, None], axis=2
            )[..., 0]
            return kv_t, kv_d, out_tokens, accept + 1, out_logprobs

        self._spec_step = jax.jit(
            spec_fn, donate_argnums=(1, 3), static_argnums=(6,)
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
    def forward_draft_extend(self, batch: ForwardBatch, sampling):
        """Populate draft KV for a prefill/chunk batch."""
        from sglang_fluentllm_tpu.runtime.packing import pack_batch

        ints, floats, meta = pack_batch(batch, sampling)
        ints = np.concatenate([ints, [0, 0]]).astype(np.int32)
        self.draft_kv = self._draft_extend(
            self.draft_params, self.draft_kv,
            jnp.asarray(ints), jnp.asarray(floats), meta,
        )

    def forward_spec(self, batch: ForwardBatch, sampling) -> Tuple:
        """Returns device arrays (tokens [B, K+1] -1-padded, counts [B],
        logprobs [B, K+1])."""
        from sglang_fluentllm_tpu.runtime.packing import pack_batch

        r = self.runner
        r.step_counter += 1
        ints, floats, meta = pack_batch(batch, sampling)
        ints = np.concatenate([ints, [0, r.step_counter]]).astype(np.int32)
        (r.kv_cache, self.draft_kv, tokens, counts,
         logprobs) = self._spec_step(
            r.params, r.kv_cache, self.draft_params, self.draft_kv,
            jnp.asarray(ints), jnp.asarray(floats), meta,
        )
        return tokens, counts, logprobs
