"""PD transfer-granularity TTFT measurement (VERDICT r4 #5).

The reference's headline PD feature is LAYER-WISE KV transfer: layer k's
KV ships while layers >k still compute (mooncake/conn.py:763
LayerWiseTask, disaggregation/utils.py:408 StepCounter), so the
non-overlappable transfer tail shrinks from "one chunk's KV" to "one
layer of one chunk". Our TPU design streams per chunked-prefill chunk
(disagg/pd.py:96): chunk i ships while chunk i+1 computes, and the tail
is the LAST chunk's transfer.

This tool runs a real 1P1D pair on this rig with a long prompt and
measures that tail (`tail_transfer_ms`, exposed by /pd/prefill):

  ttft_ms           total prefill+transfer latency (first token ready)
  tail_ms           transfer time NOT hidden behind compute
  layerwise_tail    tail_ms / L — the ideal layer-wise tail (one layer
                    of the last chunk; same bytes, 1/L at the tail)
  chunk_cost_pct    (tail_ms - layerwise_tail) / ttft_ms * 100
                    — what chunk granularity costs vs layer-wise ideal

The transfer tail is a HOST-side quantity on this transport (serialize +
HTTP + decode-side install), so the CPU-jax 1P1D pair measures the term
in question directly; a faster forward only grows the tail's relative
share, which is reported against the measured prefill too.

Verdict bar: chunk_cost_pct < 5 justifies chunk granularity on this rig.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROMPT_LEN = int(os.environ.get("PD_BENCH_PROMPT", 1024))
CHUNK = int(os.environ.get("PD_BENCH_CHUNK", 256))
LAYERS = None  # read from the model config below


def main():
    import httpx

    from tests.server_utils import (
        kill_server,
        popen_launch_server,
        write_tiny_tokenizer,
    )
    from tests.utils import TINY_LLAMA_CFG, write_model_dir

    cfg = dict(TINY_LLAMA_CFG)
    cfg["max_position_embeddings"] = max(4096, PROMPT_LEN * 2)
    L = cfg["num_hidden_layers"]
    model_dir = write_model_dir(cfg)
    write_tiny_tokenizer(model_dir, cfg["vocab_size"])
    p_proc, p_url = popen_launch_server(
        model_dir, other_args=[
            "--disaggregation-mode", "prefill",
            "--chunked-prefill-size", str(CHUNK),
            "--max-total-tokens", "8192",
        ],
    )
    d_proc, d_url = popen_launch_server(
        model_dir, other_args=["--disaggregation-mode", "decode",
                               "--max-total-tokens", "8192"],
    )
    try:
        prompt = [(7 * i + 3) % (cfg["vocab_size"] - 2) + 1
                  for i in range(PROMPT_LEN)]
        results = []
        for trial in range(3):
            room = f"ttftbench{trial}"
            r = httpx.post(f"{d_url}/pd/start", json={
                "room": room, "input_ids": prompt,
                "sampling_params": {"max_new_tokens": 4,
                                    "temperature": 0.0},
            }, timeout=120)
            assert r.status_code == 200, r.text
            t0 = time.time()
            r = httpx.post(f"{p_url}/pd/prefill", json={
                "room": room, "input_ids": prompt,
                "sampling_params": {"max_new_tokens": 4,
                                    "temperature": 0.0},
                "decode_url": d_url,
                "decode_prefix_len": r.json()["decode_prefix_len"],
            }, timeout=600)
            ttft_ms = (time.time() - t0) * 1000
            if r.status_code != 200:
                print("prefill error", r.status_code, r.text[:500],
                      flush=True)
            info = r.json()
            assert info.get("success"), info
            httpx.post(f"{d_url}/pd/result", json={"room": room},
                       timeout=300)
            httpx.post(f"{p_url}/flush_cache", timeout=60)
            httpx.post(f"{d_url}/flush_cache", timeout=60)
            results.append((ttft_ms, info))
            print(json.dumps({
                "trial": trial, "ttft_ms": round(ttft_ms, 1),
                "tail_transfer_ms": round(info["tail_transfer_ms"], 1),
                "chunks": info["chunks"],
                "bytes_sent": info["bytes_sent"],
                "transfer_gb_s": round(info["transfer_gb_s"], 4),
            }), flush=True)
        ttft_ms, info = min(results, key=lambda x: x[0])
        tail = info["tail_transfer_ms"]
        lw_tail = tail / L
        cost_pct = (tail - lw_tail) / max(ttft_ms, 1e-6) * 100
        print(json.dumps({
            "metric": "pd_chunk_vs_layerwise_ttft_cost",
            "value": round(cost_pct, 2),
            "unit": "% of TTFT (chunk-granular tail vs layer-wise ideal)",
            "ttft_ms": round(ttft_ms, 1),
            "tail_ms": round(tail, 1),
            "layerwise_ideal_tail_ms": round(lw_tail, 1),
            "prompt_len": PROMPT_LEN,
            "chunked_prefill_size": CHUNK,
            "layers": L,
            "verdict_bar": "chunk granularity justified if < 5",
        }), flush=True)
    finally:
        kill_server(p_proc)
        kill_server(d_proc)


if __name__ == "__main__":
    main()
