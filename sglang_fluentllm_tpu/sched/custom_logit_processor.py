"""Custom logit processors (reference
``srt/sampling/custom_logit_processor.py``): user-supplied callables
that rewrite next-token logits before sampling, shipped serialized with
the request and gated behind ``--enable-custom-logit-processor``.

TPU adaptation: sampling runs inside the fused jitted step, so the
processor executes through ``jax.pure_callback`` — the device ships the
[B, V] logits to the host, the Python callable edits the affected rows
as NUMPY arrays (the reference hands torch.cuda tensors), and the
result flows back into the in-jit sampler. Batches containing such
requests run with pipeline depth 1 and k=1 decode (like grammar-
constrained ones) so exactly one callback is in flight and the host-side
row registry is unambiguous.
"""

from __future__ import annotations

import json
from abc import ABC, abstractmethod
from functools import lru_cache
from typing import Any, Dict, List, Optional

try:
    import dill as _ser
except ImportError:  # pragma: no cover
    import pickle as _ser


@lru_cache(maxsize=None)
def _cache_from_str(json_str: str):
    data = json.loads(json_str)
    return _ser.loads(bytes.fromhex(data["callable"]))


class CustomLogitProcessor(ABC):
    """Callable rewriting logits rows.

    ``__call__(logits, custom_param_list)`` receives a float32 numpy
    array [n, V] (one row per request using this processor in the
    batch) and the matching list of per-request param dicts; it returns
    the adjusted [n, V] array.
    """

    @abstractmethod
    def __call__(
        self,
        logits,
        custom_param_list: Optional[List[Dict[str, Any]]] = None,
    ):
        raise NotImplementedError

    def to_str(self) -> str:
        return json.dumps({"callable": _ser.dumps(self).hex()})

    @classmethod
    def from_str(cls, json_str: str) -> "CustomLogitProcessor":
        return _cache_from_str(json_str)
