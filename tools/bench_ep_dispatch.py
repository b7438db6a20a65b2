"""EP MoE path microbench: token-sharded all-to-all dispatch vs the
replicated-token psum path (VERDICT r2 #5 done criterion: record
dispatch-vs-replicated step time on the mesh).

Runs a DeepSeek-geometry MoE layer over an n-device mesh (virtual CPU
devices when real chips are scarce — timings then compare MECHANISM cost
shape, not absolute ICI numbers) and prints one JSON line per (T, path).

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
       python tools/bench_ep_dispatch.py [n_devices] [hidden] [experts]
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
    E = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    if len(jax.devices()) < n_dev:
        from jax.extend.backend import clear_backends

        clear_backends()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n_dev)
    devices = jax.devices()[:n_dev]
    mesh = Mesh(np.asarray(devices).reshape(1, n_dev), ("dp", "tp"))

    from sglang_fluentllm_tpu.config.model_config import ModelConfig
    from sglang_fluentllm_tpu.parallel.ep import moe_forward_ep
    from sglang_fluentllm_tpu.parallel.ep_dispatch import (
        EpLocationTables,
        moe_forward_ep_dispatch,
    )

    cfg = ModelConfig.from_hf_dict({
        "architectures": ["DeepseekV2ForCausalLM"],
        "model_type": "deepseek_v2",
        "hidden_size": H, "intermediate_size": 2 * H,
        "moe_intermediate_size": H // 2,
        "num_attention_heads": 8, "num_key_value_heads": 8,
        "num_hidden_layers": 1, "vocab_size": 1024,
        "max_position_embeddings": 4096,
        "kv_lora_rank": 64, "qk_nope_head_dim": 32,
        "qk_rope_head_dim": 16, "v_head_dim": 32,
        "n_routed_experts": E, "num_experts_per_tok": 6,
        "norm_topk_prob": False,
    })
    rng = np.random.RandomState(0)
    Im = cfg.moe_intermediate_size
    w1 = jnp.asarray(rng.standard_normal((E, H, 2 * Im)) * 0.05,
                     jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((E, Im, H)) * 0.05, jnp.bfloat16)
    tables = EpLocationTables.identity(E, n_dev)

    def timed(fn, *args, iters=int(os.environ.get("EP_BENCH_ITERS", 10))):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    t_list = tuple(
        int(t) for t in os.environ.get("EP_BENCH_T", "64,512,4096").split(",")
    )
    results = []
    for T in t_list:
        x = jnp.asarray(rng.standard_normal((T, H)) * 0.1, jnp.bfloat16)
        logits = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)

        disp = jax.jit(lambda x, lg: moe_forward_ep_dispatch(
            x, lg, w1, w2, cfg, mesh, tables, capacity_factor=2.0))
        repl = jax.jit(lambda x, lg: moe_forward_ep(
            x, lg, w1, w2, cfg, mesh, use_gmm=False, tables=tables))
        with mesh:
            ms_d = timed(disp, x, logits)
            ms_r = timed(repl, x, logits)
        for name, ms in (("dispatch", ms_d), ("replicated", ms_r)):
            rec = {"metric": f"ep_{name}_T{T}", "value": round(ms, 3),
                   "unit": "ms/layer", "n_dev": n_dev, "H": H, "E": E}
            results.append(rec)
            print(json.dumps(rec))
    speedup = {
        f"T{T}": round(
            next(r["value"] for r in results
                 if r["metric"] == f"ep_replicated_T{T}")
            / next(r["value"] for r in results
                   if r["metric"] == f"ep_dispatch_T{T}"), 2)
        for T in t_list
    }
    print(json.dumps({"metric": "ep_dispatch_speedup_vs_replicated",
                      "value": speedup, "unit": "x"}))


if __name__ == "__main__":
    main()
