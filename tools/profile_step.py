"""Decode-step component attribution on the real chip.

Builds the production ModelRunner for the bench model (qwen2.5-0.5B
geometry) and times the decode step's pieces with IN-JIT repetition
(the axon async-dispatch-safe method from profile_matmul.py): each
variant scans R iterations with a data dependency inside one jit, so
wall/R is the true per-step device time.

Variants:
  fwd            model.forward only (attention + KV write included)
  fwd+logits     + lm_head matmul
  fwd+log+samp   + greedy sample + logprobs (the full step_fn math)
  fwd_stub       forward with attention replaced by v-passthrough

Usage: python tools/profile_step.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

from tools.profile_decode import (  # noqa: E402
    B,
    K_STEPS,
    build_runner,
    make_decode_batch,
)

R = 30


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from sglang_fluentllm_tpu.ops.sampler import (
        SamplingMetadata,
        compute_logprobs,
        sample,
    )
    from sglang_fluentllm_tpu.runtime.packing import pack_batch, unpack_batch

    runner = build_runner()
    print(f"platform={jax.devices()[0].platform}", flush=True)
    batch = make_decode_batch(runner)
    sampling = SamplingMetadata.from_lists(
        [0.0] * B, [1.0] * B, [-1] * B, [0.0] * B, batch.batch_size
    )
    sampling = dataclasses.replace(sampling, all_greedy=True)
    ints, floats, meta = pack_batch(batch, sampling)
    ints = jnp.asarray(np.concatenate([ints, [0, 1]]).astype(np.int32))
    floats = jnp.asarray(floats)
    model = runner.model
    params = runner.params

    def make_step(with_logits, with_sample, stub_attn):
        def step(kv_cache, h_seed, key):
            fb, sm = unpack_batch(ints[:-2], floats, meta, None)
            ids0 = jnp.abs(fb.input_ids[:, :1]) % 151936 + h_seed
            fb = dataclasses.replace(
                fb,
                input_ids=ids0,
                positions=fb.positions[:, :1],
                out_cache_loc=fb.out_cache_loc[:, :1],
            )
            if stub_attn:
                orig = model.attn

                class _Stub:
                    def __call__(self, kv, lid, q, k, v, b, s, **kw):
                        G = q.shape[2] // k.shape[2]
                        return jnp.repeat(v, G, axis=2), kv

                model.attn = _Stub()
                kv_cache, hh = model.forward(params, kv_cache, fb)
                model.attn = orig
            else:
                kv_cache, hh = model.forward(params, kv_cache, fb)
            h_last = hh[:, 0]
            if not with_logits:
                return kv_cache, jnp.sum(
                    h_last.astype(jnp.float32)
                ).astype(jnp.int32) % 7
            logits = model.compute_logits(params, h_last)
            if not with_sample:
                return kv_cache, jnp.argmax(
                    logits[:, :8], axis=-1
                ).astype(jnp.int32)[0] % 7
            ids = sample(logits, sm, key)
            lp = compute_logprobs(logits, ids)
            return kv_cache, (ids[0] + jnp.sum(lp).astype(jnp.int32)) % 7

        def run(kv_cache, key):
            def body(carry, _):
                kv_cache, seed = carry
                kv_cache, seed = step(kv_cache, seed, key)
                return (kv_cache, seed), None

            (kv_cache, seed), _ = jax.lax.scan(
                body, (kv_cache, jnp.int32(0)), None, length=R
            )
            return kv_cache, seed

        return jax.jit(run, donate_argnums=(0,))

    key = jax.random.PRNGKey(0)
    for label, kwargs in [
        ("fwd only", dict(with_logits=False, with_sample=False,
                          stub_attn=False)),
        ("fwd+logits", dict(with_logits=True, with_sample=False,
                            stub_attn=False)),
        ("fwd+logits+sample", dict(with_logits=True, with_sample=True,
                                   stub_attn=False)),
        ("fwd(stub attn)", dict(with_logits=False, with_sample=False,
                                stub_attn=True)),
        ("fwd(stub)+logits+sample", dict(with_logits=True,
                                         with_sample=True,
                                         stub_attn=True)),
    ]:
        jfn = make_step(**kwargs)
        kv = runner.kv_cache
        kv, out = jfn(kv, key)
        jax.device_get(out)
        t0 = time.perf_counter()
        kv, out = jfn(kv, key)
        jax.device_get(out)
        dt = (time.perf_counter() - t0) / R
        runner.kv_cache = kv
        print(f"{label:26s} {1000*dt:7.3f} ms/step", flush=True)

    # the real production multi-step program for comparison
    from sglang_fluentllm_tpu.ops.sampler import SamplingMetadata as SM

    t0 = time.perf_counter()
    ids, lp, _ = runner.forward_batch_generation(batch, sampling, 0)
    got = jax.device_get(ids)
    dt0 = time.perf_counter() - t0
    t0 = time.perf_counter()
    N = 10
    for i in range(N):
        ids, lp, _ = runner.forward_batch_generation(batch, sampling, 0)
        got = jax.device_get(ids)
    dt = (time.perf_counter() - t0) / (N * K_STEPS)
    print(f"{'prod multi_step (w/ get)':26s} {1000*dt:7.3f} ms/step "
          f"(first call {dt0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
