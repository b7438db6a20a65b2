"""Weight-streaming microbenchmarks on the real chip.

Answers: what effective HBM GB/s does a pure bf16 GEMM chain reach at
decode batch sizes?  Is the lm_head/logits epilogue expensive?  How does
the fused k-step window amortize?

Usage: python tools/profile_matmul.py
"""

from __future__ import annotations

import time

import numpy as np


def timeit(f, *args, repeat=20):
    import jax

    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeat):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeat


def main():
    import jax
    import jax.numpy as jnp

    print(f"platform={jax.devices()[0].platform}", flush=True)
    rng = np.random.RandomState(0)

    H, I, L = 896, 4864, 24
    V = 151936

    # per-layer decode GEMM set: qkvo ~ [H, H+2*kv+H] and mlp 3 mats
    # approximate with the two big mlp shapes + qkvo lumped
    Ws = []
    for _ in range(L):
        Ws.append((
            jnp.asarray(rng.standard_normal((H, 2 * I)), jnp.bfloat16),
            jnp.asarray(rng.standard_normal((I, H)), jnp.bfloat16),
            jnp.asarray(rng.standard_normal((H, int(2.2 * H))),
                        jnp.bfloat16),
        ))
    stacked = tuple(
        jnp.stack([w[i] for w in Ws]) for i in range(3)
    )
    total_bytes = sum(int(w.size) * 2 for w in stacked)

    lm_head = jnp.asarray(rng.standard_normal((H, V)), jnp.bfloat16)

    def chain(x, stacked):
        w1s, w2s, w3s = stacked

        def layer(h, ws):
            w1, w2, w3 = ws
            a = jnp.dot(h, w1, preferred_element_type=jnp.float32)
            g, u = jnp.split(a, 2, axis=-1)
            a = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
            b = jnp.dot(a, w2, preferred_element_type=jnp.float32)
            h = h + b.astype(jnp.bfloat16)
            c = jnp.dot(h, w3[:, :H], preferred_element_type=jnp.float32)
            return h + c.astype(jnp.bfloat16), None

        h, _ = jax.lax.scan(layer, x, (w1s, w2s, w3s))
        return h

    jchain = jax.jit(chain)
    for B in (8, 64, 256, 1024):
        x = jnp.asarray(rng.standard_normal((B, H)), jnp.bfloat16)
        dt = timeit(jchain, x, stacked)
        print(f"gemm chain B={B:5d}: {1000*dt:7.3f} ms  "
              f"{total_bytes/dt/1e9:7.1f} GB/s", flush=True)

    # logits epilogue
    def epilogue(h, w):
        logits = jnp.dot(h, w, preferred_element_type=jnp.float32)
        lp = jax.nn.log_softmax(logits, axis=-1)
        ids = jnp.argmax(logits, axis=-1)
        chosen = jnp.take_along_axis(lp, ids[:, None], axis=-1)[:, 0]
        return ids, chosen

    jep = jax.jit(epilogue)
    for B in (64,):
        h = jnp.asarray(rng.standard_normal((B, H)), jnp.bfloat16)
        dt = timeit(jep, h, lm_head)
        print(f"lm_head+softmax+argmax B={B}: {1000*dt:7.3f} ms  "
              f"({lm_head.size*2/dt/1e9:6.1f} GB/s)", flush=True)

    # logits matmul alone
    jmm = jax.jit(lambda h, w: jnp.dot(
        h, w, preferred_element_type=jnp.float32))
    h = jnp.asarray(rng.standard_normal((64, H)), jnp.bfloat16)
    dt = timeit(jmm, h, lm_head)
    print(f"lm_head matmul alone B=64: {1000*dt:7.3f} ms  "
          f"({lm_head.size*2/dt/1e9:6.1f} GB/s)", flush=True)

    # single big GEMM streaming 1 GB
    K = 16384
    N = 32768  # 16384*32768*2 = 1.07 GB
    Wbig = jnp.asarray(
        rng.standard_normal((K, N)).astype(np.float32), jnp.bfloat16
    )
    for B in (64, 256):
        x = jnp.asarray(rng.standard_normal((B, K)), jnp.bfloat16)
        dt = timeit(jmm, x, Wbig)
        print(f"single GEMM [B={B}]x[{K},{N}]: {1000*dt:7.3f} ms  "
              f"({Wbig.size*2/dt/1e9:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
