"""Colocated (device-to-device) PD TTFT — companion to bench_pd_ttft.py.

Same geometry as the HTTP-pair measurement (tiny-llama, 1024-token
prompt, 256-token chunked prefill) but on the colocated data plane
(``disagg/colocated.py``): KV pages ``jax.device_put`` from the prefill
mesh straight onto the decode mesh, no serialize/HTTP/deserialize. The
transfer "tail" is realized by blocking on the decode KV pool after the
prefill returns — the honest analog of the HTTP path's
``tail_transfer_ms`` (everything not hidden behind prefill compute).

Run bench_pd_ttft.py first for the HTTP numbers; this prints the same
JSON schema so the two are directly comparable.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROMPT_LEN = int(os.environ.get("PD_BENCH_PROMPT", 1024))
CHUNK = int(os.environ.get("PD_BENCH_CHUNK", 256))


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon plugin force-selects the TPU backend at interpreter
        # start; env alone doesn't stick (see tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")

    from sglang_fluentllm_tpu.disagg.colocated import ColocatedPDEngine
    from tests.utils import TINY_LLAMA_CFG, write_model_dir

    cfg = dict(TINY_LLAMA_CFG)
    cfg["max_position_embeddings"] = max(4096, PROMPT_LEN * 2)
    model_dir = write_model_dir(cfg)
    devs = jax.devices()
    pair = ColocatedPDEngine(
        prefill_devices=devs[:1], decode_devices=devs[1:2],
        model_path=model_dir, load_format="dummy",
        skip_tokenizer_init=True, dtype="float32",
        max_total_tokens=8192, page_size=4, random_seed=7,
        chunked_prefill_size=CHUNK, disable_jit_warmup=True,
    )
    prompt = [(7 * i + 3) % (cfg["vocab_size"] - 2) + 1
              for i in range(PROMPT_LEN)]
    sp = {"max_new_tokens": 4, "temperature": 0.0}
    try:
        results = []
        for trial in range(4):  # trial 0 pays jit compiles; drop it
            t0 = time.time()
            out = pair.generate(prompt, sp)
            pd = out["meta_info"]["pd"]
            # realize any still-in-flight install work (async dispatches)
            jax.block_until_ready(pair.decode.runner.kv_cache)
            total_ms = (time.time() - t0) * 1000
            ttft_ms = pd["latency"] * 1000  # includes transfer + install
            pair.prefill.flush_cache()
            pair.decode.flush_cache()
            rec = {
                "trial": trial,
                "ttft_ms": round(ttft_ms, 1),
                "e2e_ms": round(total_ms, 1),
                "pages_sent": pd["pages_sent"],
                "bytes_sent": pd["transfer_bytes"],
            }
            print(json.dumps(rec), flush=True)
            if trial > 0:
                results.append(rec)
        best = min(results, key=lambda r: r["ttft_ms"])
        print(json.dumps({
            "metric": "pd_colocated_ttft",
            "value": best["ttft_ms"],
            "unit": "ms (prefill + device-native transfer, first token ready)",
            "prompt_len": PROMPT_LEN,
            "chunked_prefill_size": CHUNK,
            "pages_sent": best["pages_sent"],
            "compare_to": "bench_pd_ttft.py ttft_ms (HTTP pair, same geometry)",
        }), flush=True)
    finally:
        pair.shutdown()


if __name__ == "__main__":
    main()
