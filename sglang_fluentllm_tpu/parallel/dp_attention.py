"""Token-level DP-attention: per-group KV pools sharded over the dp axis.

Analog of the reference's ``layers/dp_attention.py``
(``initialize_dp_attention:97``, ``dp_gather:315``/``dp_scatter:349``) and
the scheduler's ``prepare_dp_attn_batch``/``get_idle_batch`` alignment
(``scheduler.py:1649,1720``), redesigned for XLA SPMD:

- Every dp group owns a private KV pool slice: pool arrays carry a leading
  ``dp`` dim sharded ``P('dp')``; page ids are group-local.
- Batch rows are sharded over ``dp`` (each group contributes its own
  requests, padded to a common per-group bucket). A group with no work
  contributes all-padding rows (``seq_len == 0``) — the reference's
  idle-batch fabrication reduces to row padding because all groups run ONE
  jit program, so collectives are aligned by construction.
- Attention (+ KV write) runs under ``shard_map`` over ``dp`` so the paged
  gather/scatter stays group-local — no cross-group traffic; everything
  outside attention (dense/MoE/logits) keeps XLA auto-sharding with the
  batch dim mapped to ``dp``, which is exactly the reference's
  "attention dp, rest of the model full-TP" split without explicit
  dp_gather/dp_scatter copies.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from sglang_fluentllm_tpu.mem.kv_cache import MHAKVCache
from sglang_fluentllm_tpu.runtime.forward_batch import ForwardBatch


def create_dp_kv_cache(config, num_slots: int, dp: int, dtype):
    """Per-group pools stacked on a leading dp dim."""
    from sglang_fluentllm_tpu.mem.kv_cache import create_kv_cache

    one = create_kv_cache(config, num_slots, dtype=dtype)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (dp,) + x.shape), one
    )


def dp_kv_specs(kv_cache) -> object:
    """PartitionSpecs: leading dim 'dp'; kv heads additionally 'tp' for
    MHA pools."""
    if isinstance(kv_cache, MHAKVCache):
        return MHAKVCache(
            k=P("dp", None, "tp", None, None),
            v=P("dp", None, "tp", None, None),
        )
    return jax.tree.map(lambda _: P("dp"), kv_cache)


def _shard_map_fn():
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    import inspect

    kwargs = {}
    sig = inspect.signature(shard_map).parameters
    if "check_rep" in sig:
        kwargs["check_rep"] = False
    elif "check_vma" in sig:
        kwargs["check_vma"] = False
    return shard_map, kwargs


def _batch_split(batch: ForwardBatch):
    """(statics dict, row-sharded array dict) split of a ForwardBatch."""
    statics = dict(mode=batch.mode, page_size=batch.page_size,
                   pages_are_runs=batch.pages_are_runs)
    arrays = dict(
        input_ids=batch.input_ids,
        positions=batch.positions,
        out_cache_loc=batch.out_cache_loc,
        page_tables=batch.page_tables,
        seq_lens=batch.seq_lens,
        q_lens=batch.q_lens,
    )
    if batch.custom_mask is not None:
        arrays["custom_mask"] = batch.custom_mask
    if batch.state_idx is not None:
        arrays["state_idx"] = batch.state_idx
    return statics, arrays


class _DpShardedBase:
    """shard_map plumbing shared by the MHA and MLA group-local wrappers."""

    def __init__(self, inner, mesh: Mesh):
        self.inner = inner
        self.mesh = mesh

    def _run(self, kv_cache, layer_id, rowed, replicated, batch, call):
        """Run ``call(kv_local, layer, rowed..., batch_local, replicated...)``
        group-locally: kv + batch rows sharded over 'dp', the rest
        replicated."""
        shard_map, kwargs = _shard_map_fn()
        statics, arrays = _batch_split(batch)

        def local(kv, layer, row_args, arr, rep_args):
            kv = jax.tree.map(lambda x: x[0], kv)   # drop group dim
            b = ForwardBatch(
                custom_mask=arr.get("custom_mask"),
                state_idx=arr.get("state_idx"),
                **{k: v for k, v in arr.items()
                   if k not in ("custom_mask", "state_idx")},
                **statics,
            )
            out, kv = call(kv, layer, row_args, b, rep_args)
            kv = jax.tree.map(lambda x: x[None], kv)
            return out, kv

        kv_spec = jax.tree.map(lambda _: P("dp"), kv_cache)
        arr_spec = {k: P("dp") for k in arrays}
        out, kv_cache = shard_map(
            local,
            mesh=self.mesh,
            in_specs=(kv_spec, P(), tuple(P("dp") for _ in rowed),
                      arr_spec, jax.tree.map(lambda _: P(), replicated)),
            out_specs=(P("dp"), kv_spec),
            **kwargs,
        )(kv_cache, jnp.asarray(layer_id, jnp.int32), tuple(rowed),
          arrays, replicated)
        return out, kv_cache


class DpShardedAttention(_DpShardedBase):
    """Wraps a single-group MHA/GQA attention backend; runs it group-locally
    under shard_map over the 'dp' mesh axis."""

    name = "dp_sharded"

    def __call__(
        self,
        kv_cache,           # pytree with leading dp dim, sharded P('dp')
        layer_id,
        q: jax.Array,       # [B_global, S, Hq, D], rows sharded over dp
        k_new: jax.Array,
        v_new: jax.Array,
        batch: ForwardBatch,
        sm_scale: float,
        logit_cap: float = 0.0,
        window=None,
        sinks=None,
    ) -> Tuple[jax.Array, object]:
        inner = self.inner
        # window/sinks may be traced (per-layer window tables), so they
        # ride along as explicit replicated operands, not closure captures
        extras = {}
        if window is not None:
            extras["window"] = jnp.asarray(window, jnp.int32)
        if sinks is not None:
            extras["sinks"] = sinks

        def call(kv, layer, row_args, b, ex):
            q_l, k_l, v_l = row_args
            return inner(kv, layer, q_l, k_l, v_l, b, sm_scale,
                         logit_cap, window=ex.get("window"),
                         sinks=ex.get("sinks"))

        return self._run(kv_cache, layer_id, (q, k_new, v_new), extras,
                         batch, call)


class DpShardedMLAAttention(_DpShardedBase):
    """Group-local wrapper over an MLA backend (absorbed-latent signature).

    w_kc/w_vc are weights — replicated into each group (the reference keeps
    attention weights replicated across dp-attention groups too,
    ``layers/dp_attention.py`` attn-tp group broadcast)."""

    name = "dp_sharded_mla"

    def __call__(self, kv_cache, layer_id, q_nope, q_pe, ckv_new, kpe_new,
                 batch, w_kc, w_vc, sm_scale) -> Tuple[jax.Array, object]:
        inner = self.inner

        def call(kv, layer, row_args, b, rep):
            qn, qp, ckv, kpe = row_args
            return inner(kv, layer, qn, qp, ckv, kpe, b,
                         rep["w_kc"], rep["w_vc"], sm_scale)

        return self._run(
            kv_cache, layer_id, (q_nope, q_pe, ckv_new, kpe_new),
            {"w_kc": w_kc, "w_vc": w_vc}, batch, call,
        )


def build_dp_batch(group_batches) -> ForwardBatch:
    """Stack per-group batches (equal bucket shapes) into one global batch
    whose rows lay out group-major — the dp-sharded layout."""
    b0 = group_batches[0]
    fields = {}
    for f in dataclasses.fields(ForwardBatch):
        v0 = getattr(b0, f.name)
        if f.metadata.get("static") or v0 is None:
            fields[f.name] = v0
        else:
            fields[f.name] = jnp.concatenate(
                [jnp.asarray(getattr(b, f.name)) for b in group_batches],
                axis=0,
            )
    return ForwardBatch(**fields)
