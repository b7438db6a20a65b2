"""FP8 block-scaled GEMM vs bf16 at the Llama-3-8B layer geometry
(VERDICT r2 #2: 'FP8-GEMM-vs-bf16 at the 8B geometry').

Times the decode-regime matmuls (batch x [H, N]) for the 8B projections:
qkv [4096, 6144], o [4096, 4096], gate_up [4096, 28672], down
[14336, 4096] — bf16 jnp.dot vs the production fp8_block_matmul Pallas
kernel on the real chip. In-jit lax.scan repetition (the tunnel does not
block on block_until_ready).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = {
    "qkv_proj": (4096, 6144),
    "o_proj": (4096, 4096),
    "gate_up_proj": (4096, 28672),
    "down_proj": (14336, 4096),
}
B = int(os.environ.get("FP8_BENCH_BATCH", 64))
R = 20


def main():
    import jax
    import jax.numpy as jnp

    from sglang_fluentllm_tpu.ops.quant.fp8 import (
        fp8_block_matmul,
        quantize_weight,
    )

    rng = np.random.RandomState(0)
    results = {}
    for name, (K, N) in SHAPES.items():
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.02
        wb = jnp.asarray(w, jnp.bfloat16)
        qw = quantize_weight(w)
        x = jnp.asarray(rng.standard_normal((B, K)), jnp.bfloat16)

        def chain_bf16(x, w):
            def body(h, _):
                y = jnp.dot(h, w, preferred_element_type=jnp.float32)
                return (h + y[:, :K].astype(jnp.bfloat16) * 1e-6
                        if N >= K else
                        h.at[:, :N].add(y.astype(jnp.bfloat16) * 1e-6)), None
            h, _ = jax.lax.scan(body, x, None, length=R)
            return jnp.sum(h.astype(jnp.float32))

        # the raw fn, not the jitted wrapper: nested jit inside lax.scan
        # trips an MLIR lowering-cache KeyError on this jax build
        fp8_mm = getattr(fp8_block_matmul, "__wrapped__", fp8_block_matmul)

        def chain_fp8(x, w8=qw.w8, scale=qw.scale):
            def body(h, _):
                y = fp8_mm(h, w8, scale)
                return (h + y[:, :K].astype(jnp.bfloat16) * 1e-6
                        if N >= K else
                        h.at[:, :N].add(y.astype(jnp.bfloat16) * 1e-6)), None
            h, _ = jax.lax.scan(body, x, None, length=R)
            return jnp.sum(h.astype(jnp.float32))

        jb = jax.jit(chain_bf16)
        jf = jax.jit(chain_fp8)
        out = {}
        for label, fn, args in (("bf16", jb, (x, wb)), ("fp8", jf, (x,))):
            jax.device_get(fn(*args))
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                jax.device_get(fn(*args))
                best = min(best, (time.perf_counter() - t0) / R)
            out[label] = best * 1e3
        results[name] = out
        print(json.dumps({
            "metric": f"gemm8b_{name}",
            "bf16_ms": round(out["bf16"], 4),
            "fp8_ms": round(out["fp8"], 4),
            "speedup": round(out["bf16"] / out["fp8"], 3),
            "batch": B,
        }), flush=True)
    total_b = sum(v["bf16"] for v in results.values())
    total_f = sum(v["fp8"] for v in results.values())
    print(json.dumps({
        "metric": "fp8_gemm_vs_bf16_8b_layer",
        "value": round(total_b / total_f, 3),
        "unit": "x (>1 = fp8 faster)",
        "detail": {k: round(v["bf16"] / v["fp8"], 3)
                   for k, v in results.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
