"""Decode-step cost attribution THROUGH the real engine bench.

The only trustworthy timing on the axon-tunneled chip is end-to-end
wall clock over many engine decode steps (bench.py methodology; the
overlap pipeline hides per-dispatch sync latency). This tool re-runs
that measurement with surgical ablations to attribute the per-step
cost:

  full        unmodified production path
  nologits    lm_head matmul + softmax replaced by a 128-col slice
  stubattn    attention kernel replaced by a v-passthrough (KV write
              and all matmuls kept)
  k4/k16      decode window depth sweep (dispatch amortization)

Usage: python tools/bench_ablate.py [full nologits stubattn k4 k16]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_decode_bench(decode_steps=8, patch=None):
    import importlib

    import bench

    importlib.reload(bench)
    os.environ["SFT_BENCH_DECODE_STEPS"] = str(decode_steps)
    engine = bench.build_engine()
    if patch:
        patch(engine)
        engine.runner._init_jit()
    import numpy as np

    vocab = bench.QWEN25_05B["vocab_size"]

    def prompts(seed):
        r = np.random.RandomState(seed)
        return [
            [int(x) for x in r.randint(0, vocab, bench.PREFILL_LEN)]
            for _ in range(bench.BATCH_SIZE)
        ]

    bench.run(engine, prompts(99), bench.SHORT_NEW)
    engine.flush_cache()
    bench.run(engine, prompts(98), bench.LONG_NEW)
    engine.flush_cache()
    t_short = bench.run(engine, prompts(1), bench.SHORT_NEW)
    engine.flush_cache()
    t_long = bench.run(engine, prompts(2), bench.LONG_NEW)
    engine.flush_cache()
    n = bench.BATCH_SIZE * (bench.LONG_NEW - bench.SHORT_NEW)
    step_ms = 1000 * (t_long - t_short) / (bench.LONG_NEW - bench.SHORT_NEW)
    tps = n / (t_long - t_short)
    engine.shutdown()
    return step_ms, tps


def patch_nologits(engine):
    import jax.numpy as jnp

    model = engine.runner.model
    orig = model.compute_logits

    def tiny_logits(params, hidden):
        w = (params["embed_tokens"].T
             if model.config.tie_word_embeddings
             else params["lm_head"])
        # only 128 vocab columns -> lm_head stream + softmax nearly free
        small = (hidden @ w[:, :128]).astype(jnp.float32)
        return jnp.pad(small, ((0, 0), (0, w.shape[1] - 128)),
                       constant_values=-1e9)

    model.compute_logits = tiny_logits


def patch_stubattn(engine):
    import jax.numpy as jnp

    model = engine.runner.model

    class Stub:
        name = "stub"

        def __call__(self, kv, lid, q, k, v, b, s, **kw):
            G = q.shape[2] // k.shape[2]
            return jnp.repeat(v, G, axis=2), kv

    model.attn = Stub()
    engine.runner.attn_backend = Stub()


def main():
    sel = sys.argv[1:] or ["full", "nologits", "stubattn"]
    jobs = {
        "full": (8, None),
        "nologits": (8, patch_nologits),
        "stubattn": (8, patch_stubattn),
        "k4": (4, None),
        "k16": (16, None),
    }
    for name in sel:
        k, patch = jobs[name]
        t0 = time.time()
        step_ms, tps = run_decode_bench(k, patch)
        print(f"{name:10s} k={k:2d}  {step_ms:7.3f} ms/step  "
              f"{tps:8.0f} tok/s   (total {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
