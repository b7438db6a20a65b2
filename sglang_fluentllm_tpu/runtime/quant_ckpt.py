"""Quantized-checkpoint adapters: GPTQ / AWQ / compressed-tensors.

Analog of the reference's ``layers/quantization/{gptq,awq}.py`` and
``layers/quantization/compressed_tensors/`` checkpoint compatibility: HF
checkpoints quantized by those toolchains load directly. The adapter
dequantizes the packed int4 tensors to float at LOAD time (module by
module, streaming) and yields plain ``<module>.weight`` tensors, so every
model's ``load_weights`` works unchanged; pass ``--quantization w4a16``
to re-quantize into the TPU-native kernel layout (ops/quant/int4.py) and
keep the 4-bit HBM stream at serve time.

Packing contracts implemented (the de-facto formats):
- **GPTQ**: ``qweight`` int32 [K/8, N] — eight 4-bit codes per word along
  the IN dim, low nibble first; ``qzeros`` int32 [K/G, N/8] packed along
  OUT with the stored value = zero_point - 1; ``scales`` [K/G, N];
  optional ``g_idx`` [K] (act-order row->group map).
  W[k, n] = (code - zero) * scale, weight tensor yielded as [N, K] (HF
  nn.Linear [out, in]).
- **AWQ**: ``qweight`` int32 [K, N/8] packed along OUT with the
  interleaved nibble order (0,2,4,6,1,3,5,7); ``qzeros`` [K/G, N/8] same
  packing; ``scales`` [K/G, N]. W[k, n] = (code - zero) * scale.
- **compressed-tensors** (pack-quantized int4): ``weight_packed`` int32
  [out, in/8] — eight SIGNED 4-bit codes per word along IN, low nibble
  first; ``weight_scale`` [out, in/G] (or [out, 1]); optional
  ``weight_zero_point``; ``weight_shape`` records the true [out, in].
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Iterator, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

AWQ_ORDER = np.asarray([0, 2, 4, 6, 1, 3, 5, 7])


def load_quant_config(model_path: str) -> Optional[Dict[str, Any]]:
    cfg_path = os.path.join(model_path, "config.json")
    if not os.path.exists(cfg_path):
        return None
    with open(cfg_path) as fp:
        cfg = json.load(fp)
    qc = cfg.get("quantization_config")
    if not qc:
        return None
    method = (qc.get("quant_method") or qc.get("format") or "").lower()
    if method in ("gptq", "awq"):
        return {"method": method,
                "bits": int(qc.get("bits", 4)),
                "group_size": int(qc.get("group_size", 128)),
                "sym": bool(qc.get("sym", False)),
                "desc_act": bool(qc.get("desc_act", False))}
    if method == "compressed-tensors" or "config_groups" in qc:
        groups = qc.get("config_groups") or {}
        bits, gs = 4, 128
        for g in groups.values():
            w = (g or {}).get("weights") or {}
            bits = int(w.get("num_bits", bits))
            gs = int(w.get("group_size") or gs)
        return {"method": "compressed-tensors", "bits": bits,
                "group_size": gs, "sym": True}
    logger.warning("unknown quantization_config method %r; ignoring",
                   method)
    return None


def _unpack_int32_nibbles(packed: np.ndarray, axis: int) -> np.ndarray:
    """int32 array -> uint8 codes, 8 per word along ``axis`` (low nibble
    first — the GPTQ/CT contract)."""
    u = packed.astype(np.uint32)
    parts = [((u >> (4 * i)) & 0xF).astype(np.uint8) for i in range(8)]
    return np.concatenate([np.expand_dims(p, axis + 1)
                           for p in parts], axis + 1).reshape(
        *packed.shape[:axis], packed.shape[axis] * 8,
        *packed.shape[axis + 1:]
    )


def dequant_gptq(t: Dict[str, np.ndarray], group_size: int) -> np.ndarray:
    """-> HF-layout weight [out, in] float32."""
    qweight = t["qweight"]
    scales = t["scales"].astype(np.float32)      # [K/G, N]
    codes = _unpack_int32_nibbles(qweight, 0)     # [K, N] uint8
    K, N = codes.shape
    if "g_idx" in t and t["g_idx"] is not None and t["g_idx"].size:
        gidx = t["g_idx"].astype(np.int64)        # [K] act-order groups
    else:
        gidx = np.arange(K) // group_size
    if "qzeros" in t and t["qzeros"] is not None:
        zcodes = _unpack_int32_nibbles(t["qzeros"], 1)   # [K/G, N]
        zeros = zcodes.astype(np.float32) + 1.0   # GPTQ stores zp - 1
    else:
        zeros = np.full(scales.shape, 8.0, np.float32)
    w = (codes.astype(np.float32) - zeros[gidx]) * scales[gidx]
    return np.ascontiguousarray(w.T)              # [N, K] = [out, in]


def dequant_awq(t: Dict[str, np.ndarray], group_size: int) -> np.ndarray:
    qweight = t["qweight"]                        # [K, N/8]
    scales = t["scales"].astype(np.float32)       # [K/G, N]
    codes = _unpack_int32_nibbles(qweight, 1)     # [K, N] interleaved
    K, N = codes.shape
    # undo the AWQ nibble interleave within each 8-wide lane group
    inv = np.argsort(AWQ_ORDER)
    codes = codes.reshape(K, N // 8, 8)[:, :, inv].reshape(K, N)
    zcodes = _unpack_int32_nibbles(t["qzeros"], 1)  # [K/G, N]
    zcodes = zcodes.reshape(-1, N // 8, 8)[:, :, inv].reshape(-1, N)
    gidx = np.arange(K) // group_size
    w = (codes.astype(np.float32) - zcodes.astype(np.float32)[gidx]) \
        * scales[gidx]
    return np.ascontiguousarray(w.T)              # [out, in]


def dequant_compressed_tensors(t: Dict[str, np.ndarray],
                               group_size: int) -> np.ndarray:
    packed = t["weight_packed"]                   # [out, in/8]
    scales = t["weight_scale"].astype(np.float32)  # [out, in/G] or [out,1]
    codes = _unpack_int32_nibbles(packed, 1).astype(np.int8)  # [out, in]
    codes = np.where(codes >= 8, codes - 16, codes)  # signed int4
    out_f, in_f = codes.shape
    if "weight_shape" in t and t["weight_shape"] is not None:
        shp = t["weight_shape"].astype(np.int64).reshape(-1)
        out_f, in_f = int(shp[0]), int(shp[1])
        codes = codes[:out_f, :in_f]
    if scales.ndim == 1:
        scales = scales[:, None]
    n_groups = scales.shape[1]
    g = (np.arange(in_f) // group_size if n_groups > 1
         else np.zeros(in_f, np.int64))
    g = np.minimum(g, n_groups - 1)
    w = codes.astype(np.float32) * scales[:, g]
    if "weight_zero_point" in t and t["weight_zero_point"] is not None:
        zp = t["weight_zero_point"].astype(np.float32)
        if zp.ndim == 1:
            zp = zp[:, None]
        w = w - zp[:, np.minimum(g, zp.shape[1] - 1)] * scales[:, g]
    return w                                      # already [out, in]


_GPTQ_PARTS = ("qweight", "qzeros", "scales", "g_idx")
_CT_PARTS = ("weight_packed", "weight_scale", "weight_zero_point",
             "weight_shape")


def wrap_quantized_checkpoint(
    it: Iterator[Tuple[str, np.ndarray]],
    qcfg: Dict[str, Any],
) -> Iterator[Tuple[str, np.ndarray]]:
    """Streams (name, tensor), collapsing each quantized module's packed
    tensors into one dequantized ``<module>.weight``."""
    assert qcfg["bits"] == 4, f"only 4-bit supported, got {qcfg['bits']}"
    method = qcfg["method"]
    parts = _CT_PARTS if method == "compressed-tensors" else _GPTQ_PARTS
    pend: Dict[str, Dict[str, np.ndarray]] = {}
    need = {"gptq": {"qweight", "scales"},
            "awq": {"qweight", "qzeros", "scales"},
            "compressed-tensors": {"weight_packed", "weight_scale"}}[method]

    def ready(mod):
        return need <= set(pend.get(mod, ()))

    def emit(mod):
        t = pend.pop(mod)
        if method == "gptq":
            w = dequant_gptq(t, qcfg["group_size"])
        elif method == "awq":
            w = dequant_awq(t, qcfg["group_size"])
        else:
            w = dequant_compressed_tensors(t, qcfg["group_size"])
        return mod + ".weight", w

    for name, tensor in it:
        hit = None
        for p in parts:
            suffix = "." + p
            if name.endswith(suffix):
                hit = (name[: -len(suffix)], p)
                break
        if hit is None:
            yield name, tensor
            continue
        mod, part = hit
        # a module's packed tensors arrive contiguously in practice:
        # starting a NEW module flushes every other completed one, so at
        # most ~one module's packed tensors are buffered at a time
        if mod not in pend:
            for done in [m for m in pend if ready(m)]:
                yield emit(done)
        pend.setdefault(mod, {})[part] = tensor
    for mod in list(pend):
        if ready(mod):
            yield emit(mod)
        else:
            logger.warning("incomplete quantized module %s: have %s",
                           mod, sorted(pend[mod]))
