"""ScMoE dense-branch overlap: measured, not argued (VERDICT r3 #9).

LongCat's SBO (reference ``models/longcat_flash_overlap.py:366-441``)
hand-interleaves MoE dispatch/combine with the dataflow-independent dense
FFN branch. The TPU position (docs/ARCHITECTURE.md) is that XLA schedules
independent branches concurrently when the dataflow permits. This tool
MEASURES the realized gain on the real chip:

  free       — out = dense(x) + moe(x)      (independent branches,
               the actual ScMoE structure)
  serialized — out = dense(x + eps*moe(x))  (artificial dependency forces
               the dense branch AFTER the MoE branch)

overlap_gain = serialized_time / free_time - 1: how much the artificial
serialization costs, i.e. how much concurrency XLA realizes for the real
layer. On one chip the MoE branch's all-to-all is absent, so this bounds
the COMPUTE-side interleave (gather/scatter + expert GEMMs vs dense GEMM);
the ICI side adds on a real slice.

Also inspects the compiled 8-virtual-device HLO of the EP-sharded layer
and reports whether the all-to-all is emitted in async start/done form
with dense ops scheduled between (the latency-hiding scheduler's overlap
signature) — on the CPU backend collectives may be synchronous, which is
reported as such rather than asserted away.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(H=2048, I_dense=8192, E=8, I_exp=1408, T=4096, topk=2):
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)

    def mk(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.02, jnp.bfloat16)

    x = mk(T, H)
    wd1, wd2 = mk(H, I_dense), mk(I_dense, H)
    router = mk(H, E)
    we1, we2 = mk(E, H, I_exp), mk(E, I_exp, H)

    def dense(x):
        return jax.nn.silu(x @ wd1) @ wd2

    def moe(x):
        logits = (x.astype(jnp.float32) @ router.astype(jnp.float32))
        w, idx = jax.lax.top_k(logits, topk)           # [T, topk]
        w = jax.nn.softmax(w, axis=-1).astype(jnp.bfloat16)
        out = jnp.zeros_like(x)
        for j in range(topk):
            # dense-gather formulation: per-expert GEMMs over masked rows
            oh = jax.nn.one_hot(idx[:, j], E, dtype=x.dtype)  # [T, E]
            for e in range(E):
                xe = x * oh[:, e:e + 1]
                ye = jax.nn.silu(xe @ we1[e]) @ we2[e]
                out = out + ye * w[:, j:j + 1] * oh[:, e:e + 1]
        return out

    @jax.jit
    def free(x):
        return dense(x) + moe(x)

    @jax.jit
    def serialized(x):
        m = moe(x)
        # token dependency: dense consumes a value derived from the MoE
        # output, forcing sequential scheduling
        return dense(x + m * jnp.bfloat16(1e-8)) + m

    return x, free, serialized


def bench(f, x, n=20):
    import jax

    jax.block_until_ready(f(x))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000


def hlo_schedule_check():
    """8-virtual-device EP layer: is the all-to-all asynchronous with
    compute scheduled inside the start/done window?"""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    if jax.default_backend() != "cpu" or len(jax.devices()) < 8:
        return {"checked": False,
                "reason": "needs XLA_FLAGS=--xla_force_host_platform_"
                          "device_count=8 JAX_PLATFORMS=cpu"}
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("ep",))
    rng = np.random.RandomState(0)
    H = 256
    x = jnp.asarray(rng.standard_normal((8 * 128, H)) * 0.1, jnp.bfloat16)
    wd = jnp.asarray(rng.standard_normal((H, H)) * 0.02, jnp.bfloat16)

    def blk(x, wd):
        y = jax.lax.all_to_all(x, "ep", 0, 0, tiled=True)
        d = x @ wd  # dataflow-independent dense branch
        y = jax.lax.all_to_all(y, "ep", 0, 0, tiled=True)
        return y + d

    f = shard_map(blk, mesh=mesh, in_specs=(P("ep"), P()),
                  out_specs=P("ep"))
    lowered = jax.jit(f).lower(x, wd)
    txt = lowered.compile().as_text()
    has_async = "all-to-all-start" in txt
    between = 0
    if has_async:
        lines = txt.splitlines()
        starts = [i for i, l in enumerate(lines) if "all-to-all-start" in l]
        dones = [i for i, l in enumerate(lines) if "all-to-all-done" in l]
        for s in starts:
            d = min((d for d in dones if d > s), default=s)
            between += sum(1 for l in lines[s + 1:d] if " dot(" in l
                           or " fusion(" in l)
    return {"checked": True, "async_all_to_all": has_async,
            "compute_ops_inside_start_done": between,
            "sync_note": None if has_async else
            "backend emits synchronous all-to-all; overlap is a real-"
            "slice property (LHS enables async collectives on TPU)"}


def main():
    import jax

    x, free, serialized = build()
    t_free = bench(free, x)
    t_ser = bench(serialized, x)
    out = {
        "metric": "scmoe_dense_branch_overlap",
        "platform": jax.devices()[0].platform,
        "free_ms": round(t_free, 3),
        "serialized_ms": round(t_ser, 3),
        "overlap_gain": round(t_ser / t_free - 1, 4),
        "hlo": hlo_schedule_check(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
