"""Decode GEMM-chain ablation (VERDICT r2 #4): how much of the step gap
is GEMM streaming efficiency vs everything else.

Emulates ONLY the per-layer projection GEMMs of the qwen2.5-0.5B decode
step at batch 64 (no attention/norms/rotary), scanned over 24 layers x K
steps, in three arms:
  split — q/k/v/o/gate/up/down as 7 dots (current model structure)
  fused — qkv and gate_up concatenated (4 dots)
  probe — one giant ideal-streaming GEMM of equal total bytes

ms per step + achieved GB/s per arm. The (split - probe) delta bounds
what projection fusion + layout can recover.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 64
H, I = 896, 4864
HQ, HKV, D = 14, 2, 64
L, K = 24, 8


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)

    def mk(*shape):
        return jnp.asarray(
            rng.standard_normal(shape).astype(np.float32) * 0.02,
            jnp.bfloat16)

    split = {
        "q": mk(L, H, HQ * D), "k": mk(L, H, HKV * D),
        "v": mk(L, H, HKV * D), "o": mk(L, HQ * D, H),
        "g": mk(L, H, I), "u": mk(L, H, I), "d": mk(L, I, H),
    }
    fused = {
        "qkv": jnp.concatenate([split["q"], split["k"], split["v"]], -1),
        "o": split["o"],
        "gu": jnp.concatenate([split["g"], split["u"]], -1),
        "d": split["d"],
    }
    total_bytes = sum(x.size * 2 for x in split.values())

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    def step_split(x, p):
        def layer(h, lp):
            q = dot(h, lp["q"])
            k = dot(h, lp["k"])
            v = dot(h, lp["v"])
            a = q.at[:, :HKV * D].add(k + v)[:, :HQ * D]
            h = h + dot(a, lp["o"])
            g = dot(h, lp["g"])
            u = dot(h, lp["u"])
            h = h + dot(g * u, lp["d"])
            return h, None

        h, _ = jax.lax.scan(layer, x, p)
        return h

    def step_fused(x, p):
        def layer(h, lp):
            qkv = dot(h, lp["qkv"])
            q = qkv[:, :HQ * D]
            k = qkv[:, HQ * D:HQ * D + HKV * D]
            v = qkv[:, HQ * D + HKV * D:]
            a = q.at[:, :HKV * D].add(k + v)
            h = h + dot(a, lp["o"])
            gu = dot(h, lp["gu"])
            h = h + dot(gu[:, :I] * gu[:, I:], lp["d"])
            return h, None

        h, _ = jax.lax.scan(layer, x, p)
        return h

    def multi(step):
        def f(x, p):
            def s(h, _):
                return step(h, p), None

            h, _ = jax.lax.scan(s, x, None, length=K)
            return jnp.sum(h.astype(jnp.float32))

        return jax.jit(f)

    # ideal probe: one [Kp, Np] weight of equal bytes
    Kp = 8192
    Np = total_bytes // 2 // Kp
    wp = mk(Kp, Np)

    def probe(x, w):
        def s(h, _):
            y = jax.lax.dot_general(
                h, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return h + y[:, :Kp].astype(jnp.bfloat16) * 1e-6, None

        h, _ = jax.lax.scan(s, x, None, length=K)
        return jnp.sum(h.astype(jnp.float32))

    xs = jnp.asarray(rng.standard_normal((B, H)), jnp.bfloat16)
    xp = jnp.asarray(rng.standard_normal((B, Kp)), jnp.bfloat16)
    arms = [
        ("split", multi(step_split), (xs, split)),
        ("fused", multi(step_fused), (xs, fused)),
        ("probe", jax.jit(probe), (xp, wp)),
    ]
    for name, fn, args in arms:
        jax.device_get(fn(*args))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            jax.device_get(fn(*args))
            best = min(best, (time.perf_counter() - t0) / K)
        print(json.dumps({
            "arm": name,
            "step_ms": round(best * 1e3, 3),
            "achieved_gb_s": round(total_bytes / best / 1e9, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
