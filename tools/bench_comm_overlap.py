"""Comm-compute overlap evidence (VERDICT r2 missing #7: TBO/SBO).

The reference implements TBO (two-batch overlap) and LongCat's SBO by
hand-interleaving NCCL dispatch/combine with dense compute
(``models/longcat_flash_overlap.py:366-441``). The TPU position taken in
docs/ARCHITECTURE.md is that XLA's latency-hiding scheduler (LHS)
performs this overlap automatically when the dataflow permits — this
tool MEASURES that claim instead of asserting it.

Method: on an n-device mesh, time three jitted programs over identical
shapes inside shard_map:
  comm     — EP-style all-to-all round trip alone
  dense    — a dense GEMM chain alone (LongCat's parallel dense branch)
  both     — the two with NO data dependency (ScMoE layer structure)
overlap_efficiency = (comm + dense - both) / min(comm, dense):
1.0 = the cheaper phase fully hidden (SBO's goal), 0.0 = serialized.

On virtual CPU devices the collectives are memcpys, so the number
characterizes the SCHEDULER's willingness to interleave, not ICI; run on
a real slice for deployment numbers (methodology in docs/PERF.md).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    R = int(os.environ.get("OVL_ITERS", 10))

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from jax.sharding import PartitionSpec as P

    if len(jax.devices()) < n_dev:
        from jax.extend.backend import clear_backends

        clear_backends()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n_dev)
    devices = jax.devices()[:n_dev]
    mesh = Mesh(np.asarray(devices).reshape(1, n_dev), ("dp", "tp"))
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.standard_normal((T, H)) * 0.1, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((4 * H, H)) * 0.05, jnp.bfloat16)
    T_l = T // n_dev

    def comm_local(xs):
        xs = xs.reshape(n_dev, T_l // n_dev, H)
        y = jax.lax.all_to_all(xs, "tp", 0, 0, tiled=True)
        y = jax.lax.all_to_all(y, "tp", 0, 0, tiled=True)  # combine
        return y.reshape(T_l, H)

    def dense_local(xs, w1, w2):
        def body(h, _):
            y = jnp.dot(h, w1, preferred_element_type=jnp.float32)
            y = jnp.dot(y.astype(jnp.bfloat16), w2,
                        preferred_element_type=jnp.float32)
            return h + y.astype(jnp.bfloat16) * 1e-3, None

        h, _ = jax.lax.scan(body, xs, None, length=4)
        return h

    def make(kind):
        def local(xs, w1, w2):
            def step(h, _):
                if kind == "comm":
                    out = comm_local(h)
                elif kind == "dense":
                    out = dense_local(h, w1, w2)
                else:  # both, independent dataflow (ScMoE structure)
                    out = comm_local(h) + dense_local(h, w1, w2)
                return out, None

            h, _ = jax.lax.scan(step, xs, None, length=R)
            return h

        fn = shard_map(
            local, mesh=mesh,
            in_specs=(P("tp"), P(), P()), out_specs=P("tp"),
            check_vma=False,
        )
        return jax.jit(fn)

    results = {}
    for kind in ("comm", "dense", "both"):
        fn = make(kind)
        jax.device_get(fn(x, w1, w2))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(fn(x, w1, w2))
            best = min(best, (time.perf_counter() - t0) / R)
        results[kind] = best * 1e3
        print(json.dumps({"metric": f"overlap_{kind}",
                          "value": round(best * 1e3, 3),
                          "unit": "ms/iter"}), flush=True)
    hidden = results["comm"] + results["dense"] - results["both"]
    eff = hidden / max(1e-9, min(results["comm"], results["dense"]))
    print(json.dumps({
        "metric": "comm_compute_overlap_efficiency",
        "value": round(eff, 3),
        "unit": "1.0 = cheaper phase fully hidden (SBO goal)",
        "detail": {k: round(v, 3) for k, v in results.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
