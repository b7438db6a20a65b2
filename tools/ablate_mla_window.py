"""Interleaved A/B ablation of the fused MLA decode window, bf16-KV vs
FP8-per-token-KV, through the real engine scheduler (cancels the shared
axon chip's drift by alternating arms within one process).

Arms:
  bf16-win / fp8-win   : dense-window decode (default)
  bf16-paged / fp8-paged: dense windows disabled -> Pallas paged kernel
"""
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.bench_mla_fp8 import V2_LITE_ATTN, BATCH, PREFILL, PAGE, prompts

def build(kv_dtype, dense):
    from sglang_fluentllm_tpu.engine import Engine
    d = tempfile.mkdtemp(prefix="abl_mla_")
    with open(os.path.join(d, "config.json"), "w") as fp:
        json.dump(V2_LITE_ATTN, fp)
    e = Engine(
        model_path=d, load_format="dummy", skip_tokenizer_init=True,
        dtype="bfloat16", page_size=PAGE,
        max_total_tokens=BATCH * (PREFILL + 200 + 2 * PAGE),
        max_running_requests=2 * BATCH,
        decode_steps_per_launch=16,
        random_seed=0, kv_cache_dtype=kv_dtype,
    )
    if not dense:
        e.scheduler.runner._dense_window_ok = False
    return e

def steady_decode_ms(e, n_windows=12):
    """Prefill a batch, then time pure decode windows via scheduler steps."""
    from sglang_fluentllm_tpu.sched.req import Req
    from sglang_fluentllm_tpu.sched.sampling_params import SamplingParams
    sp = SamplingParams(max_new_tokens=16 * (n_windows + 4),
                        temperature=0.0, ignore_eos=True)
    reqs = []
    pr = prompts(7)
    for i, p in enumerate(pr):
        r = Req(rid=f"r{i}", input_ids=p, sampling_params=sp,
                eos_token_ids=set())
        e.scheduler.add_request(r)
        reqs.append(r)
    # drive until all prefilled and 2 windows resolved (warm)
    while min(len(r.output_ids) for r in reqs) < 32:
        e.scheduler.step()
    t0 = time.perf_counter()
    target = 32 + 16 * n_windows
    while min(len(r.output_ids) for r in reqs) < target:
        e.scheduler.step()
    dt = time.perf_counter() - t0
    # flush remaining
    while any(not r.finished() for r in reqs):
        e.scheduler.step()
    e.flush_cache()
    return dt / (16 * n_windows) * 1000  # ms per decode step

def main():
    arms = {}
    for name, kv, dense in (("bf16-win", "auto", True),
                            ("fp8-win", "fp8", True),
                            ("bf16-paged", "auto", False),
                            ("fp8-paged", "fp8", False)):
        arms[name] = build(kv, dense)
        steady_decode_ms(arms[name], n_windows=2)  # compile + warm
    results = {k: [] for k in arms}
    for rep in range(4):
        for name, e in arms.items():
            results[name].append(steady_decode_ms(e))
    out = {k: round(min(v), 3) for k, v in results.items()}
    print(json.dumps({"step_ms_best": out,
                      "all": {k: [round(x, 3) for x in v]
                              for k, v in results.items()}}))

if __name__ == "__main__":
    main()
