"""Is the e4m3->bf16 cast the FP8-MLA-kernel bottleneck? (round 5)

bench_mla_kernel_longctx measured the fp8-KV MLA decode kernel at 0.58x
of bf16-KV despite moving 1.67x fewer bytes — the compute path eats the
bandwidth win. Prime suspect: Mosaic's float8_e4m3fn -> bfloat16
convert. This microbench times, over the same [T, 512] tile stream the
kernel sees:

  astype     x.astype(bf16) on e4m3 data (what the kernel does)
  bitmath    manual integer widening: bf16_bits = s<<15 | (e+120)<<7
             | m<<4 (denormals -> 0), bitcast to bf16 — all vector int
             ops, the int4 kernel's fast unpack pattern
  int8       int8 -> bf16 convert (reference point)

Each variant: in-jit lax.scan with a data dependency, matmul consumer
so the cast feeds the MXU like the kernel's score dot.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T, R = 4096, 30
D = 512


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x8 = jnp.asarray(
        rng.standard_normal((T, D)) * 4.0, jnp.float8_e4m3fn)
    xi8 = jnp.asarray(rng.randint(-127, 127, (T, D)), jnp.int8)
    q = jnp.asarray(rng.standard_normal((8, D)) * 0.1, jnp.bfloat16)

    def consumer(k):
        return jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def chain(cast_fn, x):
        def body(c, _):
            k = cast_fn(x)
            s = consumer(k)
            return c + jnp.sum(s) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=R)
        return c

    def cast_astype(x):
        return x.astype(jnp.bfloat16)

    def cast_bitmath(x):
        u = jax.lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.int32)
        s = jnp.left_shift(jnp.right_shift(u, 7) & 1, 15)
        e = jnp.right_shift(u, 3) & 0xF
        m = u & 7
        bits = s | jnp.left_shift(e + 120, 7) | jnp.left_shift(m, 4)
        bits = jnp.where(e == 0, s, bits)  # denormals -> signed zero
        return jax.lax.bitcast_convert_type(
            bits.astype(jnp.uint16), jnp.bfloat16)

    def cast_int8(x):
        return x.astype(jnp.bfloat16)

    arms = (("astype", cast_astype, x8), ("bitmath", cast_bitmath, x8),
            ("int8", cast_int8, xi8))
    # numerics check first (bitmath must match astype on normals)
    a = np.asarray(cast_astype(x8), np.float32)
    b = np.asarray(cast_bitmath(x8), np.float32)
    max_err = float(np.max(np.abs(a - b)))
    res = {}
    for name, fn, x in arms:
        j = jax.jit(lambda x, fn=fn: chain(fn, x))
        jax.device_get(j(x))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            jax.device_get(j(x))
            best = min(best, (time.perf_counter() - t0) / R)
        res[name] = best * 1e6
        print(json.dumps({"arm": name, "us_per_tile": round(best * 1e6, 1),
                          "gb_s": round(T * D / best / 1e9, 1)}),
              flush=True)
    print(json.dumps({
        "metric": "fp8_cast_overhead",
        "astype_vs_int8": round(res["astype"] / res["int8"], 2),
        "bitmath_vs_astype": round(res["astype"] / res["bitmath"], 2),
        "bitmath_matches_astype_max_err": max_err,
    }), flush=True)


if __name__ == "__main__":
    main()
