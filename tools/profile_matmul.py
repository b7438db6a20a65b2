"""Weight-streaming microbenchmarks on the real chip.

The axon-tunneled TPU dispatches asynchronously and block_until_ready
does not reliably block, so every measurement here loops R times INSIDE
one jit (with a data dependency) and fetches a scalar at the end: wall
time / R is the true per-iteration cost.

Usage: python tools/profile_matmul.py
"""

from __future__ import annotations

import time

import numpy as np

R = 50


def timed(jfn, *args):
    import jax

    out = jax.device_get(jfn(*args))   # compile + settle
    t0 = time.perf_counter()
    out = jax.device_get(jfn(*args))
    dt = (time.perf_counter() - t0) / R
    return dt, out


def main():
    import jax
    import jax.numpy as jnp

    print(f"platform={jax.devices()[0].platform}", flush=True)
    rng = np.random.RandomState(0)

    H, I, L = 896, 4864, 24
    V = 151936

    Ws = []
    for _ in range(L):
        Ws.append((
            jnp.asarray(rng.standard_normal((H, 2 * I)), jnp.bfloat16),
            jnp.asarray(rng.standard_normal((I, H)), jnp.bfloat16),
            jnp.asarray(rng.standard_normal((H, int(2.2 * H))),
                        jnp.bfloat16),
        ))
    stacked = tuple(jnp.stack([w[i] for w in Ws]) for i in range(3))
    total_bytes = sum(int(w.size) * 2 for w in stacked)

    lm_head = jnp.asarray(rng.standard_normal((H, V)), jnp.bfloat16)

    def chain_once(x, stacked):
        w1s, w2s, w3s = stacked

        def layer(h, ws):
            w1, w2, w3 = ws
            a = jnp.dot(h, w1, preferred_element_type=jnp.float32)
            g, u = jnp.split(a, 2, axis=-1)
            a = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
            b = jnp.dot(a, w2, preferred_element_type=jnp.float32)
            h = h + b.astype(jnp.bfloat16) * 1e-3
            c = jnp.dot(h, w3[:, :H], preferred_element_type=jnp.float32)
            return h + c.astype(jnp.bfloat16) * 1e-3, None

        h, _ = jax.lax.scan(layer, x, (w1s, w2s, w3s))
        return h

    def rep(fn):
        def run(x, *rest):
            def body(h, _):
                return fn(h, *rest), None
            h, _ = jax.lax.scan(body, x, None, length=R)
            return jnp.sum(h.astype(jnp.float32))
        return jax.jit(run)

    jchain = rep(chain_once)
    for B in (8, 64, 256, 1024):
        x = jnp.asarray(rng.standard_normal((B, H)), jnp.bfloat16)
        dt, _ = timed(jchain, x, stacked)
        print(f"gemm chain B={B:5d}: {1000*dt:7.3f} ms  "
              f"{total_bytes/dt/1e9:7.1f} GB/s", flush=True)

    # lm_head epilogue: logits -> log_softmax -> argmax, fed back via
    # embedding-style gather to keep the data dependency
    def ep_once(h, w):
        logits = jnp.dot(h, w, preferred_element_type=jnp.float32)
        lp = jax.nn.log_softmax(logits, axis=-1)
        ids = jnp.argmax(lp, axis=-1)
        return h + (ids[:, None] % 7).astype(jnp.bfloat16) * 1e-6

    jep = rep(ep_once)
    h64 = jnp.asarray(rng.standard_normal((64, H)), jnp.bfloat16)
    dt, _ = timed(jep, h64, lm_head)
    print(f"lm_head+softmax+argmax B=64: {1000*dt:7.3f} ms  "
          f"({lm_head.size*2/dt/1e9:6.1f} GB/s)", flush=True)

    def mm_once(h, w):
        y = jnp.dot(h, w, preferred_element_type=jnp.float32)
        return h + y[:, :H].astype(jnp.bfloat16) * 1e-6

    jmm = rep(mm_once)
    dt, _ = timed(jmm, h64, lm_head)
    print(f"lm_head matmul alone B=64: {1000*dt:7.3f} ms  "
          f"({lm_head.size*2/dt/1e9:6.1f} GB/s)", flush=True)

    K, N = 16384, 32768  # 1.07 GB bf16
    Wbig = jnp.asarray(
        rng.standard_normal((K, N)).astype(np.float32), jnp.bfloat16
    )

    def big_once(h, w):
        y = jnp.dot(h, w, preferred_element_type=jnp.float32)
        return h + y[:, :K].astype(jnp.bfloat16) * 1e-6

    jbig = rep(big_once)
    for B in (64, 256):
        x = jnp.asarray(rng.standard_normal((B, K)), jnp.bfloat16)
        dt, _ = timed(jbig, x, Wbig)
        print(f"single GEMM [B={B}]x[{K},{N}]: {1000*dt:7.3f} ms  "
              f"({Wbig.size*2/dt/1e9:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
