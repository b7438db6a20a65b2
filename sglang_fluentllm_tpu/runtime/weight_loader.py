"""Checkpoint weight iteration.

Analog of the reference's ``model_loader/loader.py`` (``DefaultModelLoader:164``
— safetensors/pt shard iteration feeding per-module weight loaders, and
``DummyModelLoader:404`` — random init for perf testing without checkpoints).
The sharding/stacking transforms live in each model's ``load_weights``
(SURVEY B.7 inversion); this module just yields (name, ndarray).
"""

from __future__ import annotations

import glob
import json
import logging
import os
from typing import Iterator, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def iterate_safetensors(model_path: str) -> Iterator[Tuple[str, np.ndarray]]:
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    index_file = os.path.join(model_path, "model.safetensors.index.json")
    if not files and os.path.exists(index_file):
        with open(index_file) as fp:
            index = json.load(fp)
        files = sorted(
            os.path.join(model_path, f)
            for f in set(index["weight_map"].values())
        )
    if files:
        for f in files:
            with safe_open(f, framework="numpy") as sf:
                for name in sf.keys():
                    yield name, sf.get_tensor(name)
        return

    # torch .bin fallback
    bins = sorted(glob.glob(os.path.join(model_path, "pytorch_model*.bin")))
    if not bins:
        raise FileNotFoundError(
            f"no safetensors or pytorch_model*.bin under {model_path}"
        )
    import torch

    for f in bins:
        sd = torch.load(f, map_location="cpu", weights_only=True)
        for name, t in sd.items():
            yield name, t.float().numpy()


def load_model_params(model, server_args, dtype):
    """Returns the model's param pytree per load_format."""
    if server_args.load_format == "dummy":
        logger.info("loading dummy (random) weights")
        return model.init_dummy_params(seed=server_args.random_seed or 0,
                                       dtype=dtype)
    if server_args.load_format == "native":
        return load_native_params(model, server_args.model_path, dtype)
    logger.info("loading weights from %s", server_args.model_path)
    it = iterate_safetensors(server_args.model_path)
    from sglang_fluentllm_tpu.runtime.quant_ckpt import (
        load_quant_config,
        wrap_quantized_checkpoint,
    )

    qcfg = load_quant_config(server_args.model_path)
    if qcfg is not None:
        # GPTQ/AWQ/compressed-tensors checkpoint: dequantize packed int4
        # modules on load (pass --quantization w4a16 to re-quantize into
        # the TPU-native kernel layout and keep the 4-bit HBM stream)
        logger.info("quantized checkpoint (%s, %d-bit, group %d): "
                    "dequantizing on load", qcfg["method"], qcfg["bits"],
                    qcfg["group_size"])
        it = wrap_quantized_checkpoint(it, qcfg)
    return model.load_weights(it, dtype=dtype)


def load_native_params(model, path: str, dtype):
    """Load a runner-native sharded checkpoint (the format written by
    ``ModelRunner.save_sharded_model``): flat '/'-joined pytree keys,
    restored into the model's param_shapes structure."""
    import glob
    import os

    import jax.numpy as jnp
    from safetensors.numpy import load_file

    logger.info("loading native checkpoint from %s", path)
    flat = {}
    for f in sorted(glob.glob(os.path.join(path,
                                           "model-*.safetensors"))):
        flat.update(load_file(f))

    def build(tree, prefix):
        if isinstance(tree, dict):
            return {k: build(v, prefix + (str(k),))
                    for k, v in tree.items()}
        key = "/".join(prefix)
        # dtypes were saved from the live params — restore verbatim
        # (correction tables stay f32, weights keep their serving dtype)
        return jnp.asarray(flat[key])

    return build(model.param_shapes(), ())
