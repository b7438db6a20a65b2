"""ModelRunner — owns the device(s): params, KV pool, jitted step programs.

Analog of the reference's ``model_executor/model_runner.py``
(``ModelRunner:70``). Key translations (SURVEY §7 / B.2):
- NCCL process groups        -> a ``jax.sharding.Mesh`` with axes (dp, tp)
- CUDA-graph capture/replay  -> jit-compiled programs cached per bucket shape
  (padding discipline lives in BatchBuilder)
- per-GPU scheduler process  -> one runner per host process; all local chips
  participate through sharding annotations.
"""

from __future__ import annotations

import dataclasses
import logging
import math
import time
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from sglang_fluentllm_tpu.config import ModelConfig, ServerArgs
from sglang_fluentllm_tpu.mem import (
    KVAllocator,
    ReqPool,
    create_kv_cache,
    kv_cell_bytes_per_token,
)
from sglang_fluentllm_tpu.models import get_model_class
from sglang_fluentllm_tpu.ops.attention.ref_backend import (
    RefAttentionBackend,
    RefMLABackend,
)
from sglang_fluentllm_tpu.ops.sampler import (
    SamplingMetadata,
    compute_logprobs,
    compute_top_logprobs,
    sample,
)
from sglang_fluentllm_tpu.runtime.batch_builder import BatchBuilder
from sglang_fluentllm_tpu.runtime.forward_batch import ForwardBatch
from sglang_fluentllm_tpu.runtime.offloader import onramp_params
from sglang_fluentllm_tpu.runtime.packing import pack_batch, unpack_batch
from sglang_fluentllm_tpu.runtime.weight_loader import load_model_params

logger = logging.getLogger(__name__)

DTYPE_MAP = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float16": jnp.float16,
}


def select_attn_backend(server_args: ServerArgs, config: ModelConfig):
    """AttnInitializer analog (reference attn_initializer.py:48-105):
    pick the attention kernel family from model properties. On TPU the
    Pallas paged kernels are the default; the jnp reference backends serve
    CPU tests and numerics debugging."""
    name = server_args.attention_backend
    on_tpu = jax.default_backend() == "tpu"
    if name in (None, "auto") and config.hf_config.get(
        "duo_attention_config"
    ):
        # DuoAttention head-split serving (duo_attn_backend.py role)
        from sglang_fluentllm_tpu.ops.attention.duo import (
            DuoAttentionBackend,
        )

        return DuoAttentionBackend(config)
    if name in (None, "auto"):
        if config.is_mla:
            name = "mla_paged" if on_tpu else "mla"
        else:
            name = "paged" if on_tpu else "ref"
    def maybe_double_sparsity(inner):
        if not server_args.enable_double_sparsity:
            return inner
        import json as _json

        from sglang_fluentllm_tpu.ops.attention.double_sparsity import (
            DoubleSparsityBackend,
        )

        chan_cfg = None
        if server_args.ds_channel_config:
            with open(server_args.ds_channel_config) as fp:
                chan_cfg = _json.load(fp)
        return DoubleSparsityBackend.from_config(
            inner, config, chan_cfg,
            server_args.ds_heavy_channel_num,
            server_args.ds_heavy_token_num,
            server_args.ds_sparse_decode_threshold,
        )

    if name == "paged":
        from sglang_fluentllm_tpu.ops.attention.paged_backend import (
            PagedAttentionBackend,
        )

        return maybe_double_sparsity(PagedAttentionBackend())
    if name == "paged_stock":
        from sglang_fluentllm_tpu.ops.attention.paged_backend import (
            StockPagedAttentionBackend,
        )

        return StockPagedAttentionBackend()
    if name == "mla_paged":
        from sglang_fluentllm_tpu.ops.attention.mla_paged_backend import (
            MLAPagedBackend,
        )

        return MLAPagedBackend()
    if name == "ref":
        return maybe_double_sparsity(RefAttentionBackend())
    if name in ("ref_mla", "mla"):
        return RefMLABackend()
    raise ValueError(f"unknown attention backend {name}")


class ModelRunner:
    def __init__(
        self,
        server_args: ServerArgs,
        model_config: Optional[ModelConfig] = None,
        mesh: Optional[Mesh] = None,
    ):
        self.server_args = server_args
        self.model_config = model_config or ModelConfig.from_server_args(
            server_args
        )
        self.dtype = DTYPE_MAP[server_args.dtype]

        if server_args.nnodes > 1:
            from sglang_fluentllm_tpu.parallel.multihost import (
                maybe_init_distributed,
            )

            maybe_init_distributed(server_args)
        devices = jax.devices()
        if mesh is None:
            from sglang_fluentllm_tpu.parallel.multihost import build_mesh

            n = server_args.tp_size * server_args.dp_size
            assert n <= len(devices), (
                f"need {n} devices, have {len(devices)}"
            )
            mesh = build_mesh(server_args.dp_size, server_args.tp_size)
        # Engine-level DP-attention (reference layers/dp_attention.py:97,
        # scheduler.py:1649 prepare_dp_attn_batch): attn_tp < tp splits the
        # tp axis into G attention groups. The mesh's dp axis carries the
        # groups; attention + KV pools shard over it, everything else keeps
        # 'tp' (= attn_tp wide) sharding with batch rows data-parallel over
        # the groups.
        self.dp_attn_size = server_args.dp_attn_size
        if self.dp_attn_size > 1:
            devs = mesh.devices.reshape(-1)
            mesh = Mesh(
                devs.reshape(-1, server_args.attn_tp_size), ("dp", "tp")
            )
        self.mesh = mesh
        # multi-host step broadcast (rank 0 only; see parallel/multihost.py).
        # Attached BEFORE any jit step so followers replay the full call
        # sequence, warmup included.
        self.broadcaster = None
        if server_args.nnodes > 1 and server_args.node_rank == 0:
            from sglang_fluentllm_tpu.parallel.multihost import (
                StepBroadcaster,
                follower_port,
            )

            self.broadcaster = StepBroadcaster(
                follower_port(server_args), server_args.nnodes - 1
            )

        self.attn_backend = select_attn_backend(server_args, self.model_config)
        if self.dp_attn_size > 1:
            from sglang_fluentllm_tpu.ops.attention.ref_backend import (
                RefMLABackend,
            )
            from sglang_fluentllm_tpu.parallel.dp_attention import (
                DpShardedAttention,
                DpShardedMLAAttention,
            )

            if self.model_config.is_hybrid_linear:
                raise NotImplementedError(
                    "DP-attention does not yet support hybrid-linear models"
                )
            if getattr(self.attn_backend, "name", "") == "duo":
                raise NotImplementedError(
                    "DP-attention does not yet support DuoAttention"
                )
            wrapper = (
                DpShardedMLAAttention
                if isinstance(self.attn_backend, RefMLABackend)
                else DpShardedAttention
            )
            self.attn_backend = wrapper(self.attn_backend, self.mesh)
        model_cls = get_model_class(self.model_config.architectures)
        self.model = model_cls(self.model_config, self.attn_backend)
        if (
            self.model_config.is_moe
            and server_args.moe_parallel_strategy == "ep"
            and server_args.tp_size > 1
        ):
            # expert parallelism over the tp axis (reference: MoE EP group
            # derives from the TP group, parallel_state.py:1317)
            self.model.ep_mesh = self.mesh
            self.model.ep_axis = "tp"
            if (
                server_args.enable_ep_dispatch
                and self.model_config.num_experts % server_args.tp_size
                == 0
            ):
                # token-sharded all-to-all dispatch is the DEFAULT EP path
                # (VERDICT r2 #5); the replicated psum path remains the
                # tiny-batch fallback inside moe_forward_ep_auto
                from sglang_fluentllm_tpu.parallel.ep_dispatch import (
                    EpDispatchStats,
                    EpLocationTables,
                )

                # physical slot count (incl. EPLB redundancy) is FIXED here
                # so rebalances only swap runtime tables + permute weight
                # rows — no program ever retraces (VERDICT r2 #8)
                self.model.ep_tables = EpLocationTables.initial(
                    self.model_config.num_experts, server_args.tp_size,
                    server_args.ep_num_redundant_experts,
                )
                self.model.ep_capacity_factor = (
                    server_args.ep_dispatch_capacity_factor
                )
                self.model.ep_dispatch_min_tokens = (
                    server_args.ep_dispatch_min_tokens
                )
                self.ep_dispatch_stats = EpDispatchStats(
                    server_args.ep_dispatch_capacity_factor
                )
                # drop-counter io_callback only when observability is on
                # (one async host callback per MoE layer call otherwise)
                if (
                    server_args.enable_metrics
                    or server_args.enable_expert_distribution_recorder
                ):
                    self.model.ep_dispatch_stats = self.ep_dispatch_stats
        self.expert_recorder = None
        if (
            server_args.enable_expert_distribution_recorder
            and self.model_config.is_moe
        ):
            from sglang_fluentllm_tpu.parallel.eplb import (
                ExpertDistributionRecorder,
            )

            self.expert_recorder = ExpertDistributionRecorder(
                self.model_config.num_hidden_layers,
                self.model_config.num_experts,
            )
            self.model.expert_recorder = self.expert_recorder

        self.rng_base = jax.random.PRNGKey(server_args.random_seed or 0)
        self.step_counter = 0
        self._future_ct = 0

        if server_args.enable_slow_host_check:
            from sglang_fluentllm_tpu.utils.slow_host_detector import (
                execute as _slow_check,
            )

            _slow_check()
        self._load_params()
        self._init_memory_pool()
        self._init_jit()

        # speculative decoding worker (draft model + fused program)
        self.spec_worker = None
        if server_args.speculative_algorithm:
            from sglang_fluentllm_tpu.spec.spec_worker import SpecWorker

            self.spec_worker = SpecWorker(self, server_args)

    # ------------------------------------------------------------------
    def _shard(self, tree, specs):
        from sglang_fluentllm_tpu.ops.quant.fp8 import QuantizedWeight
        from sglang_fluentllm_tpu.ops.quant.int8 import QuantizedWeightInt8

        if math.prod(self.mesh.devices.shape) == 1:
            return jax.device_put(tree, self.mesh.devices.flatten()[0])
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
            tree,
            specs,
            is_leaf=lambda x: isinstance(
                x, (QuantizedWeight, QuantizedWeightInt8)),
        )

    def _load_params(self):
        params = load_model_params(self.model, self.server_args, self.dtype)
        params = self._maybe_quantize(params)
        self.params = self._shard(params, self.model.param_specs())
        self._offload_mask = None
        if self.server_args.cpu_offload_gb > 0:
            from sglang_fluentllm_tpu.runtime.offloader import (
                offload_params,
            )

            self.params, _, self._offload_mask = offload_params(
                self.params, jax.tree.map(lambda x: x.sharding,
                                          self.params),
                self.server_args.cpu_offload_gb,
            )
        n_params = sum(x.size for x in jax.tree.leaves(self.params))
        logger.info("loaded %.2fM params", n_params / 1e6)

    def _maybe_quantize(self, params):
        """Weight quantization of the decoder projections: FP8 block
        scales (reference Fp8Config weight-only path) or W8A8 INT8
        per-channel (reference w8a8_int8.py — activations quantize
        per token inside the matmul dispatch)."""
        q = self.server_args.quantization
        if q not in ("fp8", "w8a8_int8", "w4a16"):
            return params
        if not getattr(self.model, "supports_fp8_weights", False):
            logger.warning(
                "model %s does not support quantized weights; skipping",
                type(self.model).__name__,
            )
            return params
        if q == "fp8":
            from sglang_fluentllm_tpu.ops.quant.fp8 import quantize_weight
        elif q == "w4a16":
            # GPTQ-class weight-only int4 (reference compressed-tensors
            # pack-quantized w4a16): 4x less weight HBM traffic at decode
            from sglang_fluentllm_tpu.ops.quant.int4 import (
                quantize_weight_int4 as quantize_weight,
            )
        else:
            from sglang_fluentllm_tpu.ops.quant.int8 import (
                quantize_weight_int8 as quantize_weight,
            )

        n_quant = 0
        layers = params.get("layers", {})
        for key, leaf in list(layers.items()):
            if (
                hasattr(leaf, "ndim") and leaf.ndim >= 3
                and "bias" not in key and "norm" not in key
                and not key.startswith("ep_")  # int routing tables
            ):
                layers[key] = quantize_weight(np.asarray(leaf))
                n_quant += 1
        logger.info("%s-quantized %d stacked weights", q, n_quant)
        return params

    def _init_memory_pool(self):
        sa = self.server_args
        mc = self.model_config
        cell = kv_cell_bytes_per_token(
            mc,
            dtype_bytes=jnp.dtype(self.dtype).itemsize,
            kv_cache_dtype=sa.kv_cache_dtype,
            attn_tp_size=1,  # pool is logically global; sharded over tp
        )
        if sa.max_total_tokens:
            max_tokens = sa.max_total_tokens
        else:
            free = self._free_device_memory()
            if free is None:
                max_tokens = 1 << 16
            else:
                max_tokens = int(free * sa.mem_fraction_static) // cell
        # DP-attention: max_total_tokens is the TOTAL budget; each of the G
        # groups owns an equal pool slice (sharded over its attn_tp devices)
        G = self.dp_attn_size
        num_pages = max(1, max_tokens // G // sa.page_size)
        self.num_pages = num_pages  # per group
        self.max_total_tokens = num_pages * sa.page_size * G
        max_context = min(
            mc.context_length or 1 << 20, self.max_total_tokens
        )
        self.max_context_len = max_context

        # max running reqs clamp (reference attn_initializer.py:127-136)
        if sa.max_running_requests:
            self.max_reqs = sa.max_running_requests
        else:
            self.max_reqs = int(
                np.clip(self.max_total_tokens // 2048, 32, 4096)
            )

        # +RUN_SLACK_PAGES: the multirow decode kernel's coalesced-run DMA
        # may over-read up to one chunk past the last valid page
        from sglang_fluentllm_tpu.ops.attention.pallas_decode_multirow import (
            RUN_SLACK_PAGES,
        )

        num_slots = (num_pages + 1 + RUN_SLACK_PAGES) * sa.page_size
        self.num_kv_slots = num_slots
        kv_cache = create_kv_cache(
            mc, num_slots, dtype=self.dtype,
            kv_cache_dtype=sa.kv_cache_dtype, max_reqs=self.max_reqs,
        )
        if G > 1:
            from sglang_fluentllm_tpu.mem.kv_cache import OEPKVCache

            if isinstance(kv_cache, OEPKVCache):
                raise NotImplementedError(
                    "DP-attention does not yet support over-embedding"
                )
            # per-group pool slices stacked on a leading dp dim; the
            # DpSharded* wrapper drops the dim inside shard_map
            kv_cache = jax.tree.map(
                lambda x: jnp.zeros((G,) + x.shape, x.dtype), kv_cache
            )
        self.kv_cache = self._shard(kv_cache, self._kv_spec(kv_cache))
        if mc.is_hybrid_linear:
            # linear-state rows are request-keyed, not token-keyed: radix
            # prefix reuse would skip the recurrent replay (reference
            # MambaRadixCache restrictions) — force it off
            sa.disable_radix_cache = True
        # over-embedding composes with spec decoding: verify extends patch
        # their n-gram tails from the position-indexed device ring
        # (spec_worker._verify), so rejected-token ring writes are
        # harmless — each window overwrites its own positions before
        # reading. Draft models use the plain shared embedding (the
        # reference instead negates oe_token_table row 0 during draft
        # prefill — a draft-quality detail; acceptance stays lossless).

        from sglang_fluentllm_tpu.mem.dp_grouped import GroupedKVAllocator

        self.allocator = GroupedKVAllocator(
            num_pages, sa.page_size, self.max_reqs, max_context,
            n_groups=G,
        )
        self.req_pool = ReqPool(self.max_reqs)
        self.batch_builder = BatchBuilder(
            sa.page_size, sa.decode_bs_buckets, sa.prefill_token_buckets,
            dp_groups=G, page_stride=self.allocator.stride,
        )
        logger.info(
            "KV pool: %d pages x %d = %d tokens (%.2f GiB), max_reqs=%d",
            num_pages, sa.page_size, self.max_total_tokens,
            self.max_total_tokens * cell / (1 << 30), self.max_reqs,
        )

    def _free_device_memory(self) -> Optional[int]:
        try:
            stats = jax.local_devices()[0].memory_stats()
            limit = stats.get("bytes_limit")
            used = stats.get("bytes_in_use", 0)
            if limit:
                return (limit - used)
        except Exception:
            pass
        return None

    # ------------------------------------------------------------------
    FUTURE_CAP = 1 << 14

    def _kv_spec(self, kv_cache):
        """Sharding for the KV pool: MHA over kv heads (tp); MLA latents
        and hybrid linear states replicated. Under DP-attention the pool
        gains a leading group dim sharded over 'dp'."""
        from sglang_fluentllm_tpu.mem.kv_cache import (
            HybridKVCache,
            MHAKVCache,
            OEPKVCache,
        )

        if self.dp_attn_size > 1:
            save, self.dp_attn_size = self.dp_attn_size, 1
            try:
                inner = self._kv_spec(
                    jax.tree.map(lambda x: x[0], kv_cache)
                )
            finally:
                self.dp_attn_size = save
            return jax.tree.map(
                lambda s: P(*(("dp",) + tuple(s))), inner
            )
        if isinstance(kv_cache, OEPKVCache):
            return OEPKVCache(
                inner=self._kv_spec(kv_cache.inner), ring=P()
            )
        if isinstance(kv_cache, HybridKVCache):
            inner = kv_cache.mha
            if isinstance(inner, MHAKVCache):
                inner_spec = MHAKVCache(k=P(None, "tp", None, None),
                                        v=P(None, "tp", None, None))
            else:  # MLA inner (Kimi-linear): replicated latents
                inner_spec = jax.tree.map(lambda _: P(), inner)
            return HybridKVCache(mha=inner_spec, conv=P(), rec=P())
        from sglang_fluentllm_tpu.mem.kv_cache import NSAKVCache

        if isinstance(kv_cache, NSAKVCache):
            # compressed rows shard on kv heads like the pool (dim 3)
            return NSAKVCache(
                pool=self._kv_spec(kv_cache.pool),
                ck=P(None, None, None, "tp", None),
                cv=P(None, None, None, "tp", None),
            )
        if hasattr(kv_cache, "k"):
            return type(kv_cache)(
                k=P(None, "tp", None, None), v=P(None, "tp", None, None)
            )
        return jax.tree.map(lambda _: P(), kv_cache)

    def _init_jit(self):
        model = self.model
        cap = self.FUTURE_CAP
        # dense-window decode eligibility (see multi_step_fn): plain
        # MHA/GQA pools behind the Ref/Paged backend family only
        from sglang_fluentllm_tpu.mem.kv_cache import (
            MHAKVCache as _MHA,
            MLAKVCache as _MLA,
            MLAKVCacheFP8 as _MLA8,
        )
        from sglang_fluentllm_tpu.ops.attention.ref_backend import (
            RefAttentionBackend as _RefMHA,
            RefMLABackend as _RefMLA,
        )

        from sglang_fluentllm_tpu.mem.kv_cache import NSAKVCache as _NSA

        self._dense_window_ok = self.dp_attn_size == 1 and (
            (isinstance(self.attn_backend, _RefMHA)
             and isinstance(self.kv_cache, (_MHA, _NSA)))
            or (isinstance(self.attn_backend, _RefMLA)
                and isinstance(self.kv_cache, (_MLA, _MLA8)))
        )
        self._dense_window_cap = int(
            self.server_args.decode_dense_window_bytes
        )
        # Device-resident ring of sampled token ids — the analog of the
        # reference's future_token_ids_map (tp_worker_overlap_thread.py:44):
        # negative input ids are placeholders resolved on-device, so decode
        # steps chain without any host sync (SURVEY A.4 TPU translation).
        self.future_map = jnp.zeros((cap,), jnp.int32)
        # Parallel ring of post-step sequence lengths: slot s holds the
        # request's seq_len right after the token in future_map[s] was
        # emitted. Speculative windows (data-dependent growth) read their
        # base seq from here, which is what lets spec enter the overlap
        # pipeline (reference eagle_worker_overlap.py:86 device-resident
        # accept lengths).
        self.future_seq = jnp.zeros((cap,), jnp.int32)

        base_key = self.rng_base

        def step_fn(params, kv_cache, future_map, future_seq, ints, floats,
                    meta, custom_mask):
            # unpack the single-transfer batch (runtime/packing.py); the
            # trailing two ints are [future_write_offset, step_counter]
            params = onramp_params(params, self._offload_mask)
            batch, sampling = unpack_batch(
                ints[:-2], floats, meta, custom_mask
            )
            write_offset = ints[-2]
            key = jax.random.fold_in(base_key, ints[-1])
            ids_in = batch.input_ids
            resolved = jnp.where(
                ids_in < 0, future_map[(-ids_in - 1) % cap], ids_in
            )
            batch = dataclasses.replace(batch, input_ids=resolved)
            kv_cache, h = model.forward(params, kv_cache, batch)
            # last-token hidden per request (LogitsProcessor pruning analog,
            # reference logits_processor.py:219-290)
            idx = jnp.clip(batch.q_lens - 1, 0, h.shape[1] - 1)
            h_last = jnp.take_along_axis(
                h, idx[:, None, None], axis=1
            )[:, 0]
            logits = model.compute_logits(params, h_last)
            if meta.has_custom:
                # user logit processors run host-side via pure_callback
                # (pipeline depth is clamped to 1 for such batches, so
                # _custom_rows is unambiguous)
                logits = jax.pure_callback(
                    self._apply_custom_logits,
                    jax.ShapeDtypeStruct(logits.shape, logits.dtype),
                    logits,
                )
            ids = sample(logits, sampling, key)
            if meta.has_think:
                # force the think-end token when a row crosses its
                # budget (reference apply_thinking_budgets)
                ids = jnp.where(
                    (sampling.think_stop > 0)
                    & (batch.seq_lens >= sampling.think_stop)
                    & (batch.seq_lens < sampling.think_stop + 1),
                    sampling.think_end, ids,
                )
            if meta.want_lp or meta.topk > 0:
                logprobs = compute_logprobs(logits, ids)
            else:
                logprobs = jnp.zeros(ids.shape, jnp.float32)
            if meta.topk > 0:
                tk_vals, tk_ids = compute_top_logprobs(logits, meta.topk)
            else:
                tk_vals = tk_ids = jnp.zeros((0,), jnp.float32)
            if meta.inp_lp and meta.S > 1:
                inp_lp = _input_logprobs(
                    params, h, batch.input_ids
                )                        # [B, S] (position s -> P(tok s+1))
            else:
                inp_lp = jnp.zeros((0,), jnp.float32)
            future_map = jax.lax.dynamic_update_slice(
                future_map, ids, (write_offset,)
            )
            future_seq = jax.lax.dynamic_update_slice(
                future_seq, batch.seq_lens + 1, (write_offset,)
            )
            return (kv_cache, future_map, future_seq, ids, logprobs,
                    (tk_vals, tk_ids, inp_lp))

        def _input_logprobs(params, h, input_ids):
            """Per-position logprobs of the actual next input token,
            computed in row chunks so [T, V] logits never materialize
            (reference input_token_logprobs assembly,
            scheduler_post_process_mixin.py logprob path)."""
            B, S, Hd = h.shape
            hs = h.reshape(B * S, Hd)
            # target of position (i, s) is input_ids[i, s+1]; the final
            # position's logprob is the sampled token's (already returned)
            tgt = jnp.concatenate(
                [input_ids[:, 1:],
                 jnp.zeros((B, 1), jnp.int32)], axis=1
            ).reshape(B * S)
            CH = 512
            T = B * S
            Tp = -(-T // CH) * CH
            hs = jnp.pad(hs, ((0, Tp - T), (0, 0)))
            tgt = jnp.pad(tgt, (0, Tp - T))

            def f(args):
                hc, tc = args
                lg = model.compute_logits(params, hc)
                lp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
                return jnp.take_along_axis(lp, tc[:, None], axis=-1)[:, 0]

            out = jax.lax.map(
                f, (hs.reshape(-1, CH, Hd), tgt.reshape(-1, CH))
            )
            return out.reshape(Tp)[:T].reshape(B, S)

        self._step = jax.jit(
            step_fn, donate_argnums=(1, 2, 3), static_argnums=(6,)
        )

        def multi_step_fn(params, kv_cache, future_map, future_seq, ints,
                          floats, meta, grammar):
            """k fused decode steps (meta.S == k): one dispatch, one
            transfer, k sampled tokens per row. The [B, k] batch fields
            carry per-step slots; positions/seq_lens advance on-device.

            Penalty counts and grammar DFA states live in the scan carry
            (VERDICT r2 #7): masks/penalties refresh EVERY step on device,
            so constrained batches keep the fused window instead of
            collapsing the engine to k=1. ``grammar`` is either None or
            (masks [S, W] u32, keys [nnz] i32, vals [nnz] i32,
            state0 [B] i32, -1 = unconstrained row)."""
            from sglang_fluentllm_tpu.ops.sampler import (
                penalty_counts_from_ids,
                unpack_mask_words,
            )

            params = onramp_params(params, self._offload_mask)
            batch, sampling = unpack_batch(ints[:-2], floats, meta, None)
            write_offset = ints[-2]
            key0 = jax.random.fold_in(base_key, ints[-1])
            k_steps = meta.S
            V = self.model_config.vocab_size
            # dense-window KV: gather the paged history ONCE per window so
            # the k in-window steps run pure-XLA attention with zero
            # Mosaic launches (the axon runtime charges ~130 us fixed per
            # pallas call — 24 layers x 130 us dominated short-context
            # decode; see mem/kv_cache.WindowKV)
            use_dense = False
            if self._dense_window_ok:
                Tp = batch.page_tables.shape[1] * meta.page_size
                if hasattr(self.kv_cache, "k"):       # MHA pool
                    Lk, Hk, _s, Dp = self.kv_cache.k.shape
                    hist_bytes = Lk * meta.B * Tp * Hk * Dp * 2 * 2
                else:                                  # MLA latent pool
                    from sglang_fluentllm_tpu.mem.kv_cache import (
                        fp8_tail_dim,
                        padded_head_dim,
                    )

                    mc = self.model_config
                    rope_w = (
                        fp8_tail_dim(mc.qk_rope_head_dim)
                        if hasattr(self.kv_cache, "ckv")
                        else padded_head_dim(mc.qk_rope_head_dim)
                    )
                    W = padded_head_dim(mc.kv_lora_rank) + rope_w
                    Lk = self.model_config.num_hidden_layers
                    hist_bytes = Lk * meta.B * Tp * W * 2
                use_dense = hist_bytes <= self._dense_window_cap
            if use_dense:
                if hasattr(self.kv_cache, "k"):
                    from sglang_fluentllm_tpu.mem.kv_cache import (
                        window_kv_gather,
                    )

                    kv_cache = window_kv_gather(
                        kv_cache, batch.page_tables, meta.page_size
                    )
                else:
                    from sglang_fluentllm_tpu.mem.kv_cache import (
                        mla_window_gather,
                    )

                    mc = self.model_config
                    kv_cache = mla_window_gather(
                        kv_cache, batch.page_tables, meta.page_size,
                        mc.kv_lora_rank, mc.qk_rope_head_dim,
                    )
            first_ids = jnp.where(
                batch.input_ids[:, 0] < 0,
                future_map[(-batch.input_ids[:, 0] - 1) % cap],
                batch.input_ids[:, 0],
            )
            counts0 = (penalty_counts_from_ids(sampling, meta.B, V)
                       if meta.pen_len else None)
            minrem0 = (sampling.min_new_remaining
                       if meta.pen_len else None)
            gstate0 = grammar[3] if grammar is not None else None
            # greedy fast path: vocab-chunked running argmax fused with the
            # lm_head GEMM — the [B, V] f32 logits round trip costs ~0.7 ms
            # per step at 152k vocab (decode profile: iota_reduce 0.36 ms +
            # the fat f32 store in the GEMM fusion)
            fused_greedy = (
                sampling.all_greedy
                and not (meta.want_lp or meta.topk or meta.inp_lp)
                and not meta.pen_len and not meta.has_think
                and grammar is None and not meta.has_custom
                and hasattr(model, "lm_head_weight")
            )

            def greedy_chunked(params, hl):
                # STATIC slices unrolled (a lax.scan + dynamic_slice pair
                # materializes a copy of every weight chunk — measured
                # 1.5x slower than the plain full-logits path)
                w = model.lm_head_weight(params)       # [H, V]
                CH = 19200
                bv = jnp.full((meta.B,), -jnp.inf, jnp.float32)
                bi = jnp.zeros((meta.B,), jnp.int32)
                for c0 in range(0, V, CH):
                    wc = w[:, c0:min(c0 + CH, V)]
                    lg = jax.lax.dot_general(
                        hl, wc, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    m = jnp.max(lg, axis=-1)
                    a = (jnp.argmax(lg, axis=-1).astype(jnp.int32) + c0)
                    upd = m > bv
                    bv = jnp.where(upd, m, bv)
                    bi = jnp.where(upd, a, bi)
                return bi

            def one_step(carry, j):
                kv_cache, ids, tstop, counts, minrem, gstate = carry
                sub = dataclasses.replace(
                    batch,
                    input_ids=ids[:, None],
                    positions=(batch.seq_lens - 1 + j)[:, None],
                    out_cache_loc=jax.lax.dynamic_slice_in_dim(
                        batch.out_cache_loc, j, 1, axis=1
                    ),
                    seq_lens=batch.seq_lens + j,
                    q_lens=batch.q_lens,
                )
                kv_cache, h = model.forward(params, kv_cache, sub)
                if fused_greedy:
                    new_ids = greedy_chunked(params, h[:, 0])
                    return ((kv_cache, new_ids, tstop, counts, minrem,
                             gstate),
                            (new_ids,
                             jnp.zeros(new_ids.shape, jnp.float32),
                             (jnp.zeros((0,), jnp.float32),
                              jnp.zeros((0,), jnp.float32))))
                logits = model.compute_logits(params, h[:, 0])
                allowed = None
                if grammar is not None:
                    gm, gk, gv = grammar[0], grammar[1], grammar[2]
                    words = gm[jnp.clip(gstate, 0, gm.shape[0] - 1)]
                    allowed = unpack_mask_words(words, V)
                    # unconstrained / terminated rows: everything allowed
                    allowed = jnp.where(
                        (gstate < 0)[:, None], True, allowed
                    )
                pen_state = (
                    (counts, minrem) if counts is not None else None
                )
                new_ids = sample(
                    logits, sampling, jax.random.fold_in(key0, j),
                    penalty_state=pen_state, allowed_mask=allowed,
                )
                if meta.has_think:
                    # force at the budget, and deactivate a row as soon
                    # as it closes naturally WITHIN this fused window
                    # (across windows the scheduler deactivates from
                    # resolved output_ids)
                    natural = new_ids == sampling.think_end
                    force = (tstop > 0) & (sub.seq_lens == tstop)
                    new_ids = jnp.where(force, sampling.think_end,
                                        new_ids)
                    tstop = jnp.where(natural | force, -1, tstop)
                if counts is not None:
                    counts = counts.at[
                        jnp.arange(meta.B), new_ids
                    ].add(1.0)
                    minrem = jnp.maximum(minrem - 1, 0)
                if grammar is not None:
                    tkey = gstate * V + new_ids
                    idx = jnp.clip(
                        jnp.searchsorted(gk, tkey), 0, gk.shape[0] - 1
                    )
                    hit = gk[idx] == tkey
                    gstate = jnp.where(
                        gstate < 0, gstate,
                        jnp.where(hit, gv[idx], -1),
                    )
                if meta.want_lp or meta.topk > 0:
                    logprobs = compute_logprobs(logits, new_ids)
                else:
                    logprobs = jnp.zeros(new_ids.shape, jnp.float32)
                if meta.topk > 0:
                    tk = compute_top_logprobs(logits, meta.topk)
                else:
                    tk = (jnp.zeros((0,), jnp.float32),
                          jnp.zeros((0,), jnp.float32))
                return ((kv_cache, new_ids, tstop, counts, minrem,
                         gstate),
                        (new_ids, logprobs, tk))

            tstop0 = (sampling.think_stop if meta.has_think
                      else jnp.zeros((meta.B,), jnp.int32))
            ((kv_cache, last_ids, _, _, _, _),
             (all_ids, all_logprobs, all_tk)) = (
                jax.lax.scan(
                    one_step,
                    (kv_cache, first_ids, tstop0, counts0, minrem0,
                     gstate0),
                    jnp.arange(k_steps, dtype=jnp.int32),
                )
            )
            if use_dense:
                # deferred window pool writes: ONE bulk scatter of the
                # window's new rows (in-window appends only touched the
                # dense buffer)
                from sglang_fluentllm_tpu.mem.kv_cache import (
                    mla_window_close,
                    window_close,
                )

                positions = (
                    batch.seq_lens[:, None] - 1
                    + jnp.arange(k_steps, dtype=jnp.int32)[None, :]
                )
                if hasattr(kv_cache, "hk"):
                    kv_cache = window_close(
                        kv_cache, positions, batch.out_cache_loc
                    )
                else:
                    mc = self.model_config
                    kv_cache = mla_window_close(
                        kv_cache, positions, batch.out_cache_loc,
                        mc.kv_lora_rank, mc.qk_rope_head_dim,
                    )
            future_map = jax.lax.dynamic_update_slice(
                future_map, last_ids, (write_offset,)
            )
            future_seq = jax.lax.dynamic_update_slice(
                future_seq, batch.seq_lens + k_steps, (write_offset,)
            )
            extras = (all_tk[0], all_tk[1], jnp.zeros((0,), jnp.float32))
            return (kv_cache, future_map, future_seq, all_ids,
                    all_logprobs, extras)

        self._multi_step = jax.jit(
            multi_step_fn, donate_argnums=(1, 2, 3), static_argnums=(6,)
        )

        def hidden_fn(params, kv_cache, batch: ForwardBatch):
            """Pooled last-token hidden state (embedding path — reference
            Engine.encode / serving_embedding role)."""
            params = onramp_params(params, self._offload_mask)
            kv_cache, h = model.forward(params, kv_cache, batch)
            idx = jnp.clip(batch.q_lens - 1, 0, h.shape[1] - 1)
            h_last = jnp.take_along_axis(
                h, idx[:, None, None], axis=1
            )[:, 0].astype(jnp.float32)
            norm = jnp.linalg.norm(h_last, axis=-1, keepdims=True)
            return kv_cache, h_last / jnp.maximum(norm, 1e-9)

        self._hidden_step = jax.jit(hidden_fn, donate_argnums=(1,))

        def score_fn(params, kv_cache, batch: ForwardBatch, label_ids):
            """Next-token log-probs at given label ids (scoring path —
            reference Engine.score / serving_score.py role)."""
            params = onramp_params(params, self._offload_mask)
            kv_cache, h = model.forward(params, kv_cache, batch)
            idx = jnp.clip(batch.q_lens - 1, 0, h.shape[1] - 1)
            h_last = jnp.take_along_axis(
                h, idx[:, None, None], axis=1
            )[:, 0]
            logits = model.compute_logits(params, h_last)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            return kv_cache, jnp.take(lp, label_ids, axis=-1)

        self._score_step = jax.jit(score_fn, donate_argnums=(1,))

        if getattr(model, "is_classification", False):
            def classify_fn(params, kv_cache, batch: ForwardBatch):
                """Last-token classification logits (reference /classify
                reward-model serving)."""
                params = onramp_params(params, self._offload_mask)
                kv_cache, h = model.forward(params, kv_cache, batch)
                idx = jnp.clip(batch.q_lens - 1, 0, h.shape[1] - 1)
                h_last = jnp.take_along_axis(
                    h, idx[:, None, None], axis=1
                )[:, 0]
                return kv_cache, model.compute_classification(
                    params, h_last)

            self._classify_step = jax.jit(classify_fn, donate_argnums=(1,))

        def logits_fn(params, kv_cache, batch: ForwardBatch):
            """Full per-position logits (for verify / logprob queries)."""
            params = onramp_params(params, self._offload_mask)
            kv_cache, h = model.forward(params, kv_cache, batch)
            logits = model.compute_logits(
                params, h.reshape(-1, h.shape[-1])
            ).reshape(h.shape[0], h.shape[1], -1)
            return kv_cache, logits

        self._logits_step = jax.jit(logits_fn, donate_argnums=(1,))

    # ------------------------------------------------------------------
    def _apply_custom_logits(self, logits):
        """pure_callback target (reference applies processors on the
        sampler's device tensors; here the rows round-trip to host as
        numpy — acceptable because such batches are depth-1/k=1)."""
        import numpy as np

        rows = getattr(self, "_custom_rows", None)
        if not rows:
            return logits
        out = np.asarray(logits).copy()
        for i, proc, params in rows:
            if i < out.shape[0]:
                out[i] = np.asarray(
                    proc(out[i:i + 1], [params or {}])
                )[0]
        return out

    def forward_batch_generation(
        self,
        batch: ForwardBatch,
        sampling: SamplingMetadata,
        future_offset: int = 0,
        grammar=None,  # (masks, keys, vals, state0) for in-window DFA
    ) -> Tuple[jax.Array, jax.Array]:
        """Run one forward+sample step. Returns device arrays (ids [B] or
        [k, B], logprobs likewise, extras = (topk_vals, topk_ids,
        input_logprobs) with shape-(0,) placeholders when unrequested)
        logprobs [B]) WITHOUT syncing — overlap scheduling resolves them one
        iteration later. Sampled ids are also written into the on-device
        future map at [future_offset, future_offset + B)."""
        if self.broadcaster is not None:
            self.broadcaster.publish(
                ("gen", batch, sampling, future_offset)
            )
        self.step_counter += 1
        self._custom_rows = sampling.custom_procs
        ints, floats, meta = pack_batch(batch, sampling)
        ints = np.concatenate(
            [ints, [future_offset % self.FUTURE_CAP, self.step_counter]]
        ).astype(np.int32)
        from sglang_fluentllm_tpu.runtime.forward_batch import ForwardMode

        if meta.mode == ForwardMode.DECODE and meta.S > 1:
            # fused multi-step decode: ids/logprobs come back [k, B]
            (self.kv_cache, self.future_map, self.future_seq, ids,
             logprobs, extras) = self._multi_step(
                self.params, self.kv_cache, self.future_map,
                self.future_seq, jnp.asarray(ints), jnp.asarray(floats),
                meta, grammar,
            )
            return ids, logprobs, extras
        cm = batch.custom_mask
        if cm is not None:
            cm = jnp.asarray(cm)
        (self.kv_cache, self.future_map, self.future_seq, ids, logprobs,
         extras) = self._step(
            self.params, self.kv_cache, self.future_map, self.future_seq,
            jnp.asarray(ints), jnp.asarray(floats), meta, cm,
        )
        return ids, logprobs, extras

    def claim_future_slots(self, n: int) -> int:
        """Reserve n contiguous ring slots; returns a monotonically
        increasing VIRTUAL base offset (physical slot = virtual % cap).
        Virtual ids never repeat, so slot identity comparisons at resolve
        time are exact even after the physical ring wraps."""
        cap = self.FUTURE_CAP
        phys = self._future_ct % cap
        if phys + n > cap:
            # keep the physical range contiguous: skip to the wrap boundary
            self._future_ct += cap - phys
        base = self._future_ct
        self._future_ct += n
        return base

    def encode_batch(self, items) -> np.ndarray:
        """Embed a list of ExtendItems; KV pages are caller-managed."""
        if self.broadcaster is not None:
            self.broadcaster.publish(("encode", items))
        batch = self.batch_builder.build_extend(items)
        self.kv_cache, h = self._hidden_step(
            self.params, self.kv_cache, batch
        )
        return np.asarray(jax.device_get(h))[: len(items)]

    def classify_batch(self, items) -> np.ndarray:
        """Classification logits for ExtendItems ([B, num_labels])."""
        if self.broadcaster is not None:
            self.broadcaster.publish(("classify", items))
        batch = self.batch_builder.build_extend(items)
        self.kv_cache, logits = self._classify_step(
            self.params, self.kv_cache, batch
        )
        return np.asarray(jax.device_get(logits))[: len(items)]

    def score_batch(self, items, label_ids: "np.ndarray") -> np.ndarray:
        """Next-token logprobs at ``label_ids`` for a list of ExtendItems
        ([B, n_labels]); KV pages are caller-managed."""
        if self.broadcaster is not None:
            self.broadcaster.publish(("score", items, label_ids))
        batch = self.batch_builder.build_extend(items)
        self.kv_cache, lp = self._score_step(
            self.params, self.kv_cache, batch, jnp.asarray(label_ids)
        )
        return np.asarray(jax.device_get(lp))[: len(items)]

    def forward_logits(self, batch: ForwardBatch) -> jax.Array:
        self.kv_cache, logits = self._logits_step(
            self.params, self.kv_cache, batch
        )
        return logits

    # ------------------------------------------------------------------
    # HiCache page movement (role of jit_kernel/hicache.cuh batched copies)
    # ------------------------------------------------------------------
    def _page_views(self, kv):
        """Per-array (reshaped-to-pages view, page_axis) descriptors.
        Leaves that are not slot-indexed (per-request state rows: hybrid
        conv/rec, OEP ring, NSA compressed rows) yield (None, None) and
        are skipped by the hicache page movers — host tiers hold paged
        token KV only, per-request state is recomputed on re-extend."""
        ps = self.server_args.page_size
        slots = self.num_kv_slots
        out = []
        for leaf in jax.tree.leaves(kv):
            if leaf.ndim == 4 and leaf.shape[2] == slots:
                L, H, S, D = leaf.shape   # MHA [L, H, slots, D]
                out.append((leaf.reshape(L, H, S // ps, ps, D), 2))
            elif leaf.ndim == 3 and leaf.shape[1] == slots:
                L, S, D = leaf.shape      # MLA [L, slots, dims]
                out.append((leaf.reshape(L, S // ps, ps, D), 1))
            else:
                out.append((None, None))
        return out

    def extract_pages_device(self, pages):
        """Gather page KV across all layers; returns DEVICE arrays with
        the page axis second ([L, nb, ...]) without any host sync — the
        async-hicache write-back path device_gets them off-thread."""
        import jax.numpy as jnp

        from sglang_fluentllm_tpu.utils import next_power_of_2

        n = len(pages)
        nb = next_power_of_2(max(n, 1))
        ids = np.zeros((nb,), np.int32)
        ids[:n] = pages

        def gather(kv, ids):
            outs = []
            for view, axis in self._page_views(kv):
                if view is None:   # per-request state leaf, not paged
                    continue
                g = jnp.take(view, ids, axis=axis)
                # move page axis to position 1
                g = jnp.moveaxis(g, axis, 1)
                outs.append(g)
            return tuple(outs)

        if not hasattr(self, "_gather_pages_jit"):
            self._gather_pages_jit = jax.jit(gather)
        dev = self._gather_pages_jit(self.kv_cache, jnp.asarray(ids))
        return dev, n

    def extract_pages(self, pages):
        """Gather page KV across all layers -> tuple of numpy arrays with
        the page axis SECOND: [L, n, ...]."""
        dev, n = self.extract_pages_device(pages)
        host = jax.device_get(dev)
        return tuple(np.asarray(x[:, :n]) for x in host)

    @staticmethod
    def stack_page_blobs(pages, blobs):
        """Host-side staging: per-page blob tuples -> padded stacked
        arrays ([L, nb, ...]); runs on the hicache background thread."""
        from sglang_fluentllm_tpu.utils import next_power_of_2

        n = len(pages)
        nb = next_power_of_2(max(n, 1))
        stacked = []
        for ai in range(len(blobs[0])):
            arr = np.stack([b[ai] for b in blobs], axis=1)  # [L, n, ...]
            pad = np.zeros(
                arr.shape[:1] + (nb - n,) + arr.shape[2:], arr.dtype
            )
            stacked.append(np.concatenate([arr, pad], axis=1))
        return stacked

    def insert_staged(self, pages, staged):
        """Scatter staged (device or host) [L, nb, ...] arrays into the
        pool at the given pages; async dispatch, no host sync."""
        import jax.numpy as jnp

        n = len(pages)
        nb = staged[0].shape[1]
        ids = np.zeros((nb,), np.int32)  # padding -> page 0 (scratch)
        ids[:n] = pages
        stacked = staged

        def scatter(kv, ids, vals):
            leaves, treedef = jax.tree.flatten(kv)
            new_leaves = []
            vals_it = iter(vals)
            for leaf, (view, axis) in zip(leaves, self._page_views(kv)):
                if view is None:   # per-request state leaf, not paged
                    new_leaves.append(leaf)
                    continue
                val = next(vals_it)
                v = jnp.moveaxis(val, 1, axis)
                idx = [slice(None)] * view.ndim
                idx[axis] = ids
                new = view.at[tuple(idx)].set(v.astype(view.dtype))
                new_leaves.append(new.reshape(leaf.shape))
            return jax.tree.unflatten(treedef, new_leaves)

        if not hasattr(self, "_scatter_pages_jit"):
            self._scatter_pages_jit = jax.jit(
                scatter, donate_argnums=(0,)
            )
        self.kv_cache = self._scatter_pages_jit(
            self.kv_cache, jnp.asarray(ids),
            tuple(jnp.asarray(x) for x in stacked),
        )

    def insert_pages(self, pages, blobs):
        """Scatter per-page blobs (list of tuples) back into the pool."""
        self.insert_staged(pages, self.stack_page_blobs(pages, blobs))

    # ------------------------------------------------------------------
    # Weight update / memory RPCs (reference model_executor WeightMixin +
    # torch_memory_saver release/resume, scheduler.py:1963-2022)
    # ------------------------------------------------------------------
    def update_weights_from_disk(self, model_path: str):
        if self.broadcaster is not None:
            self.broadcaster.publish(
                ("update_weights_from_disk", model_path)
            )
        from sglang_fluentllm_tpu.runtime.weight_loader import (
            iterate_safetensors,
        )

        params = self.model.load_weights(
            iterate_safetensors(model_path), dtype=self.dtype
        )
        self.params = self._shard(params, self.model.param_specs())
        self.server_args.model_path = model_path
        logger.info("weights updated from %s", model_path)

    def update_weights_from_tensor(self, named_tensors, flush: bool = True):
        """RLHF in-place weight update (reference
        ``http_server.py:629`` /update_weights_from_tensor,
        ``model_executor/weight_mixin.py``). Tensors are STAGED across
        calls (trainers chunk large checkpoints); ``flush=True`` rebuilds
        the stacked param pytree from the staged set and swaps it in."""
        if self.broadcaster is not None:
            self.broadcaster.publish(
                ("update_weights_from_tensor", named_tensors, flush)
            )
        if not hasattr(self, "_staged_weights"):
            self._staged_weights = {}
        for name, arr in named_tensors:
            self._staged_weights[name] = np.asarray(arr)
        if not flush:
            return len(self._staged_weights)
        try:
            params = self.model.load_weights(
                list(self._staged_weights.items()), dtype=self.dtype
            )
        finally:
            self._staged_weights = {}
        self.params = self._shard(params, self.model.param_specs())
        logger.info("weights updated from %d staged tensors",
                    len(jax.tree.leaves(params)))

    def init_weights_update_group(self, master_address: str,
                                  master_port: int):
        """Connect to the trainer's weight-broadcast endpoint (reference
        init_weights_update_group joins a NCCL group with the trainer,
        weight_mixin.py; the TPU-native transport is a TCP stream over
        DCN — the trainer serves tensors, this process reads them)."""
        import socket

        sock = socket.create_connection(
            (master_address, master_port), timeout=60.0
        )
        self._weight_group_sock = sock
        logger.info("weights update group connected to %s:%d",
                    master_address, master_port)

    def update_weights_from_distributed(self, names, dtypes, shapes,
                                        flush: bool = True):
        """Stream tensors (in request order) from the trainer socket
        established by init_weights_update_group; stage + flush like
        update_weights_from_tensor (reference
        update_weights_from_distributed, NCCL broadcast per tensor)."""
        sock = getattr(self, "_weight_group_sock", None)
        if sock is None:
            raise RuntimeError("init_weights_update_group not called")
        def _np_dtype(dt):
            try:
                return np.dtype(dt)
            except TypeError:
                import ml_dtypes  # bfloat16 et al. (ships with jax)

                return np.dtype(getattr(ml_dtypes, str(dt)))

        staged = []
        for name, dt, shape in zip(names, dtypes, shapes):
            dt = _np_dtype(dt)
            nbytes = int(dt.itemsize * int(np.prod(shape or [1])))
            buf = bytearray(nbytes)
            view = memoryview(buf)
            got = 0
            while got < nbytes:
                n = sock.recv_into(view[got:], nbytes - got)
                if n == 0:
                    raise RuntimeError(
                        f"trainer socket closed mid-tensor ({name})"
                    )
                got += n
            staged.append(
                (name, np.frombuffer(bytes(buf), dtype=dt).reshape(shape))
            )
        return self.update_weights_from_tensor(staged, flush=flush)

    def save_sharded_model(self, path: str, max_shard_gb: float = 4.0):
        """Persist the CURRENT (possibly RLHF-updated) weights as
        sharded safetensors in the runner's native pytree layout
        (reference ``Engine.save_sharded_model`` / scheduler RPC).
        Reloadable with ``--load-format native``."""
        import json as _json
        import os as _os

        from jax.tree_util import tree_flatten_with_path

        from safetensors.numpy import save_file

        _os.makedirs(path, exist_ok=True)
        leaves, _ = tree_flatten_with_path(jax.device_get(self.params))
        flat = {}
        for kp, v in leaves:
            key = "/".join(
                str(getattr(k, "key", getattr(k, "idx", k)))
                for k in kp
            )
            flat[key] = np.asarray(v)
        limit = int(max_shard_gb * (1 << 30))
        shards, cur, size = [], {}, 0
        for k, v in flat.items():
            if cur and size + v.nbytes > limit:
                shards.append(cur)
                cur, size = {}, 0
            cur[k] = v
            size += v.nbytes
        if cur:
            shards.append(cur)
        index = {"metadata": {"format": "sft_native"}, "weight_map": {}}
        n = len(shards)
        for i, shard in enumerate(shards):
            fname = f"model-{i + 1:05d}-of-{n:05d}.safetensors"
            save_file(shard, _os.path.join(path, fname))
            for k in shard:
                index["weight_map"][k] = fname
        with open(_os.path.join(path,
                                "model.safetensors.index.json"),
                  "w") as fp:
            _json.dump(index, fp)
        logger.info("saved %d tensors in %d shards to %s",
                    len(flat), n, path)
        return {"shards": n, "tensors": len(flat)}

    def get_weights_by_name(self, name: str, truncate_size: int = 100):
        node = self.params
        for part in name.split("."):
            if isinstance(node, dict) and part in node:
                node = node[part]
            else:
                return None
        arr = np.asarray(jax.device_get(node)).reshape(-1)[:truncate_size]
        return arr.tolist()

    def rebalance_experts(self):
        """EPLB: re-derive PER-LAYER expert placement from the recorded
        load and apply it WITHOUT recompiling (reference
        eplb_manager.rebalance:54 + eplb_algorithms/deepseek.py:84).

        Physical slot count and table shapes were fixed at init, routing
        tables live in the params pytree as runtime arrays, so applying a
        placement = permute weight rows per layer + swap the table arrays.
        The canonical logical weights are retained so repeated rebalances
        re-materialize physical slots from a stable source."""
        assert self.expert_recorder is not None, (
            "--enable-expert-distribution-recorder required"
        )
        from sglang_fluentllm_tpu.metrics import collector as _mc

        if _mc.ACTIVE is not None:
            _mc.ACTIVE.eplb_rebalances.labels(**_mc.ACTIVE._labels).inc()
            _mc.ACTIVE.eplb_last_rebalance_ts.labels(
                **_mc.ACTIVE._labels).set(time.time())
        if self.broadcaster is not None:
            self.broadcaster.publish(("rebalance",))
        t0 = getattr(self.model, "ep_tables", None)
        assert t0 is not None, "--enable-ep-dispatch required"
        import dataclasses as _dc

        from jax.sharding import PartitionSpec as PS

        from sglang_fluentllm_tpu.parallel.eplb import (
            load_imbalance,
            rebalance_experts,
            stacked_tables,
        )

        n = self.server_args.tp_size
        n_phys = t0.num_physical
        max_rep = int(t0.l2p.shape[1])
        ml = self.params["moe_layers"]
        L_moe = int(ml["w_gate_up"].shape[0])
        # per-layer load: moe stack row j <-> absolute layer n_dense + j
        n_dense = int(getattr(self.model, "n_dense", 0))
        counts = self.expert_recorder.counts
        if counts.shape[0] >= n_dense + L_moe:
            load = counts[n_dense:n_dense + L_moe].astype(np.float64)
        else:  # recorder/layer mismatch: aggregate, same placement per layer
            load = np.repeat(
                counts.sum(0)[None].astype(np.float64), L_moe, axis=0
            )
        meta = rebalance_experts(
            load, n_phys, n, num_nodes=max(1, self.server_args.nnodes)
        )
        l2p_np, n_rep_np = stacked_tables(meta, max_rep)

        if not hasattr(self, "_logical_moe_w"):
            # recover logical rows from each expert's first replica slot
            first = np.asarray(jax.device_get(ml["ep_l2p"]))[:, :, 0]
            take_l = jax.vmap(lambda w, i: jnp.take(w, i, axis=0))
            idx = jnp.asarray(first, jnp.int32)
            self._logical_moe_w = (
                take_l(ml["w_gate_up"], idx), take_l(ml["w_down"], idx)
            )
        p2l = jnp.asarray(meta.physical_to_logical, jnp.int32)  # [L, P]
        take_l = jax.vmap(lambda w, i: jnp.take(w, i, axis=0))
        w1p = take_l(self._logical_moe_w[0], p2l)
        w2p = take_l(self._logical_moe_w[1], p2l)
        l2p_dev = jnp.asarray(l2p_np)
        n_rep_dev = jnp.asarray(n_rep_np)
        if math.prod(self.mesh.devices.shape) > 1:
            spec = NamedSharding(self.mesh, PS(None, "tp", None, None))
            w1p = jax.device_put(w1p, spec)
            w2p = jax.device_put(w2p, spec)
            rep_spec = NamedSharding(self.mesh, PS())
            l2p_dev = jax.device_put(l2p_dev, rep_spec)
            n_rep_dev = jax.device_put(n_rep_dev, rep_spec)
        # runtime-array swap: same shapes/dtypes/shardings -> the cached
        # step programs keep serving, now with the new placement
        ml["w_gate_up"] = w1p
        ml["w_down"] = w2p
        ml["ep_l2p"] = l2p_dev
        ml["ep_n_rep"] = n_rep_dev
        self.model.ep_tables = _dc.replace(
            t0, l2p=jnp.asarray(l2p_np[0]), n_rep=jnp.asarray(n_rep_np[0]),
            is_identity=False,
        )
        # capacity autotune: observed drops mean the factor was too small;
        # bump it, which (alone among rebalance effects) needs a retrace
        stats = getattr(self, "ep_dispatch_stats", None)
        if stats is not None and stats.dropped > 0:
            new_cf = stats.suggest_capacity_factor()
            logger.warning(
                "EP dispatch capacity_factor %.2f -> %.2f after %d "
                "dropped assignments (retracing step programs)",
                stats.capacity_factor, new_cf, stats.dropped,
            )
            stats.capacity_factor = new_cf
            stats.dropped = 0
            self.model.ep_capacity_factor = new_cf
            self._init_jit()
        imb = load_imbalance(load, meta, n)
        logger.info(
            "EPLB rebalance applied per-layer (L=%d): physical=%d "
            "ranks=%d imbalance=%.3f (no retrace)",
            L_moe, n_phys, n, imb,
        )
        return meta

    def release_kv_cache(self):
        """Free the KV pool HBM (colocated-training sleep mode)."""
        if self.broadcaster is not None:
            self.broadcaster.publish(("release_kv",))
        self._kv_released = jax.tree.map(
            lambda x: (x.shape, x.dtype), self.kv_cache
        )
        self.kv_cache = None

    def resume_kv_cache(self):
        if self.kv_cache is not None:
            return
        if self.broadcaster is not None:
            self.broadcaster.publish(("resume_kv",))
        from sglang_fluentllm_tpu.ops.attention.pallas_decode_multirow import (
            RUN_SLACK_PAGES,
        )

        sa = self.server_args
        num_slots = (self.num_pages + 1 + RUN_SLACK_PAGES) * sa.page_size
        kv = create_kv_cache(
            self.model_config, num_slots, dtype=self.dtype,
            kv_cache_dtype=sa.kv_cache_dtype, max_reqs=self.max_reqs,
        )
        self.kv_cache = self._shard(kv, self._kv_spec(kv))
