"""GPTQ / AWQ / compressed-tensors checkpoint loading (VERDICT r3
missing #3; reference layers/quantization/{gptq,awq,compressed_tensors}).

Synthetic checkpoints are built by the INVERSE of each documented packing
and loaded through the real engine; outputs must equal an engine loaded
with the pre-dequantized plain weights (load-time dequant is exact)."""

import json
import os
import tempfile

import numpy as np
import pytest

from sglang_fluentllm_tpu.runtime.quant_ckpt import (
    AWQ_ORDER,
    dequant_awq,
    dequant_compressed_tensors,
    dequant_gptq,
    load_quant_config,
    wrap_quantized_checkpoint,
)

G = 32  # test group size


def pack_nibbles_int32(codes: np.ndarray, axis: int) -> np.ndarray:
    """uint4 codes -> int32 words, 8 per word along axis, low first."""
    c = np.moveaxis(codes.astype(np.uint32) & 0xF, axis, -1)
    *lead, K = c.shape
    c = c.reshape(*lead, K // 8, 8)
    word = np.zeros((*lead, K // 8), np.uint32)
    for i in range(8):
        word |= c[..., i] << (4 * i)
    return np.ascontiguousarray(np.moveaxis(word.view(np.int32), -1, axis))


def make_gptq(w: np.ndarray, group=G, with_gidx=False):
    """w: [out, in] float -> GPTQ tensors + exact dequant target."""
    K, N = w.shape[1], w.shape[0]      # packing operates on [in, out]
    wt = w.T.astype(np.float32)        # [K, N]
    rng = np.random.RandomState(0)
    if with_gidx:
        gidx = rng.permutation(np.repeat(np.arange(K // group), group))
    else:
        gidx = np.arange(K) // group
    n_g = K // group
    scales = np.zeros((n_g, N), np.float32)
    zeros = rng.randint(1, 15, (n_g, N)).astype(np.float32)
    codes = np.zeros((K, N), np.uint8)
    for g in range(n_g):
        rows = gidx == g
        amax = np.abs(wt[rows]).max(axis=0) + 1e-9
        # store-dtype round trip: checkpoints keep scales in f16
        scales[g] = (amax / 7.5).astype(np.float16).astype(np.float32)
        q = np.clip(np.rint(wt[rows] / scales[g] + zeros[g]), 0, 15)
        codes[rows] = q.astype(np.uint8)
    target = np.ascontiguousarray(
        ((codes.astype(np.float32) - zeros[gidx]) * scales[gidx]).T)
    t = {
        "qweight": pack_nibbles_int32(codes, 0),
        "qzeros": pack_nibbles_int32(
            (zeros - 1).astype(np.uint8), 1),
        "scales": scales.astype(np.float16),
        "g_idx": gidx.astype(np.int32),
    }
    return t, target.astype(np.float32)


def make_awq(w: np.ndarray, group=G):
    K, N = w.shape[1], w.shape[0]
    wt = w.T.astype(np.float32)
    rng = np.random.RandomState(1)
    n_g = K // group
    gidx = np.arange(K) // group
    scales = (np.abs(wt).reshape(n_g, group, N).max(1) / 7.5
              + 1e-9).astype(np.float16).astype(np.float32)
    zeros = rng.randint(1, 15, (n_g, N)).astype(np.float32)
    codes = np.clip(np.rint(wt / scales[gidx] + zeros[gidx]), 0, 15)
    codes = codes.astype(np.uint8)
    target = np.ascontiguousarray(
        ((codes.astype(np.float32) - zeros[gidx]) * scales[gidx]).T)

    def interleave(c):
        K2 = c.shape[0]
        return c.reshape(K2, N // 8, 8)[:, :, AWQ_ORDER].reshape(K2, N)

    t = {
        "qweight": pack_nibbles_int32(interleave(codes), 1),
        "qzeros": pack_nibbles_int32(
            interleave(zeros.astype(np.uint8)), 1),
        # safetensors serializes the raw buffer: non-C-contiguous arrays
        # (this one inherits F-order from w.T) save corrupted
        "scales": np.ascontiguousarray(scales.astype(np.float16)),
    }
    return t, target.astype(np.float32)


def make_ct(w: np.ndarray, group=G):
    """compressed-tensors pack-quantized signed int4."""
    out_f, in_f = w.shape
    n_g = in_f // group
    g = np.arange(in_f) // group
    scales = np.abs(w).reshape(out_f, n_g, group).max(-1) / 7.0 + 1e-9
    codes = np.clip(np.rint(w / scales[:, g]), -8, 7).astype(np.int8)
    target = codes.astype(np.float32) * scales[:, g]
    t = {
        "weight_packed": pack_nibbles_int32(
            (codes & 0xF).astype(np.uint8), 1),
        "weight_scale": scales.astype(np.float32),
        "weight_shape": np.asarray([out_f, in_f], np.int64),
    }
    return t, target.astype(np.float32)


class TestDequantUnits:
    def test_gptq_roundtrip(self):
        rng = np.random.RandomState(2)
        w = rng.standard_normal((48, 64)).astype(np.float32)
        t, target = make_gptq(w)
        got = dequant_gptq(t, G)
        # exact reconstruction of the packed codes (the synthetic zeros
        # are random, so this is a packing test, not an accuracy test)
        np.testing.assert_allclose(got, target, rtol=1e-3, atol=1e-3)

    def test_gptq_act_order(self):
        rng = np.random.RandomState(3)
        w = rng.standard_normal((48, 64)).astype(np.float32)
        t, target = make_gptq(w, with_gidx=True)
        got = dequant_gptq(t, G)
        np.testing.assert_allclose(got, target, rtol=1e-3, atol=1e-3)

    def test_awq_roundtrip(self):
        rng = np.random.RandomState(4)
        w = rng.standard_normal((48, 64)).astype(np.float32)
        t, target = make_awq(w)
        got = dequant_awq(t, G)
        np.testing.assert_allclose(got, target, rtol=1e-3, atol=1e-3)

    def test_ct_roundtrip(self):
        rng = np.random.RandomState(5)
        w = rng.standard_normal((48, 64)).astype(np.float32)
        t, target = make_ct(w)
        got = dequant_compressed_tensors(t, G)
        np.testing.assert_allclose(got, target, rtol=1e-5, atol=1e-5)


QUANT_MODULES = ("q_proj", "k_proj", "v_proj", "o_proj",
                 "gate_proj", "up_proj", "down_proj")


def build_quant_ckpt(method: str):
    """Tiny llama checkpoint in the given quantized format + a plain
    (pre-dequantized) twin for output comparison."""
    import safetensors.numpy

    from tests.utils import TINY_LLAMA_CFG

    rng = np.random.RandomState(7)
    H, I, V = 64, 128, 128
    Hq, Hk, D = 4, 2, 16
    shapes = {
        "q_proj": (Hq * D, H), "k_proj": (Hk * D, H),
        "v_proj": (Hk * D, H), "o_proj": (H, Hq * D),
        "gate_proj": (I, H), "up_proj": (I, H), "down_proj": (H, I),
    }
    plain, packed = {}, {}
    for l in range(2):
        for mod, shp in shapes.items():
            w = (rng.standard_normal(shp) * 0.05).astype(np.float32)
            sub = ("mlp" if "proj" in mod and mod[0] in "gud"
                   else "self_attn")
            base = f"model.layers.{l}.{sub}.{mod}"
            mk = {"gptq": make_gptq, "awq": make_awq,
                  "compressed-tensors": make_ct}[method]
            t, target = mk(w)
            plain[base + ".weight"] = target
            for part, arr in t.items():
                packed[f"{base}.{part}"] = arr
        for nm in ("input_layernorm", "post_attention_layernorm"):
            x = np.ones((H,), np.float32)
            plain[f"model.layers.{l}.{nm}.weight"] = x
            packed[f"model.layers.{l}.{nm}.weight"] = x
    for nm, shp in (("model.embed_tokens.weight", (V, H)),
                    ("model.norm.weight", (H,)),
                    ("lm_head.weight", (V, H))):
        x = ((rng.standard_normal(shp) * 0.05).astype(np.float32)
             if len(shp) > 1 else np.ones(shp, np.float32))
        plain[nm] = x
        packed[nm] = x

    qc = {"gptq": {"quant_method": "gptq", "bits": 4, "group_size": G,
                   "sym": False},
          "awq": {"quant_method": "awq", "bits": 4, "group_size": G},
          "compressed-tensors": {
              "quant_method": "compressed-tensors",
              "config_groups": {"group_0": {"weights": {
                  "num_bits": 4, "group_size": G, "symmetric": True}}},
          }}[method]
    dirs = []
    for sd, with_qc in ((packed, True), (plain, False)):
        d = tempfile.mkdtemp(prefix=f"qckpt_{method.replace('-', '')}_")
        cfg = dict(TINY_LLAMA_CFG)
        if with_qc:
            cfg["quantization_config"] = qc
        with open(os.path.join(d, "config.json"), "w") as fp:
            json.dump(cfg, fp)
        safetensors.numpy.save_file(sd, os.path.join(d,
                                                     "model.safetensors"))
        dirs.append(d)
    return dirs  # [packed_dir, plain_dir]


class TestEngineLoadsQuantCkpt:
    @pytest.mark.parametrize("method",
                             ["gptq", "awq", "compressed-tensors"])
    def test_outputs_match_plain_twin(self, method):
        from tests.utils import tiny_engine

        packed_dir, plain_dir = build_quant_ckpt(method)
        assert load_quant_config(packed_dir) is not None
        assert load_quant_config(plain_dir) is None
        sp = {"max_new_tokens": 6, "temperature": 0.0}
        prompt = [3, 11, 42, 7, 19]
        ref = tiny_engine(model_path_override=plain_dir,
                          load_format="safetensors").generate(
            input_ids=prompt, sampling_params=sp)
        got = tiny_engine(model_path_override=packed_dir,
                          load_format="safetensors").generate(
            input_ids=prompt, sampling_params=sp)
        assert got["output_ids"] == ref["output_ids"]

    def test_requantize_to_w4a16(self):
        """GPTQ checkpoint + --quantization w4a16: loads, re-quantizes
        into the kernel layout, still generates deterministically."""
        from sglang_fluentllm_tpu.ops.quant.int4 import (
            QuantizedWeightInt4,
        )
        from tests.utils import tiny_engine

        packed_dir, _ = build_quant_ckpt("gptq")
        e = tiny_engine(model_path_override=packed_dir,
                        load_format="safetensors",
                        quantization="w4a16")
        assert isinstance(
            e.runner.params["layers"]["q_proj"], QuantizedWeightInt4)
        sp = {"max_new_tokens": 5, "temperature": 0.0}
        o1 = e.generate(input_ids=[3, 11, 42], sampling_params=sp)
        o2 = e.generate(input_ids=[3, 11, 42], sampling_params=sp)
        assert o1["output_ids"] == o2["output_ids"]
        assert len(o1["output_ids"]) == 5
