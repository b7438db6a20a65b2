"""Environment dump (reference check_env.py analog).

Run: python -m sglang_fluentllm_tpu.check_env
"""

from __future__ import annotations

import importlib
import json
import platform
import sys


def collect() -> dict:
    info = {
        "python": sys.version.split()[0],
        "platform": platform.platform(),
    }
    for mod in ("jax", "jaxlib", "numpy", "transformers", "safetensors",
                "aiohttp", "httpx", "pydantic", "prometheus_client", "zmq"):
        try:
            m = importlib.import_module(mod)
            info[mod] = getattr(m, "__version__", "present")
        except ImportError:
            info[mod] = None
    try:
        import jax

        info["jax_devices"] = [str(d) for d in jax.devices()]
        info["default_backend"] = jax.default_backend()
    except Exception as e:  # noqa: BLE001
        info["jax_devices"] = f"error: {e}"
    try:
        from sglang_fluentllm_tpu.mem.radix_cache_cpp import native_available

        info["native_radix"] = native_available()
    except Exception:
        info["native_radix"] = False
    import sglang_fluentllm_tpu

    info["sglang_fluentllm_tpu"] = sglang_fluentllm_tpu.__version__
    return info


if __name__ == "__main__":
    print(json.dumps(collect(), indent=2))
