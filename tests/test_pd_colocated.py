"""Colocated PD: device-to-device KV transfer across disjoint submeshes.

The DCN/ICI-native data plane (``disagg/colocated.py``): prefill and
decode engines live in one process on disjoint halves of the 8-device
virtual mesh, and KV pages cross between them via ``jax.device_put`` —
no host serialization. Parity target: the reference's RDMA transfer
engine data plane (``disaggregation/mooncake/conn.py``) with the same
control flow as our HTTP path (decode-prefix skip, chunk streaming,
prebuilt decode entry).
"""

import jax
import pytest

from tests.utils import TINY_LLAMA_CFG, write_model_dir

PROMPT = [3, 11, 42, 7, 19, 88, 5, 23, 54, 2, 9, 31]  # 12 tok = 3 pages
SP = {"max_new_tokens": 6, "temperature": 0.0}


@pytest.fixture(scope="module")
def pair():
    from sglang_fluentllm_tpu.disagg.colocated import ColocatedPDEngine

    devs = jax.devices()
    assert len(devs) >= 4, "conftest provides 8 virtual CPU devices"
    model_dir = write_model_dir(TINY_LLAMA_CFG)
    eng = ColocatedPDEngine(
        prefill_devices=devs[:2],
        decode_devices=devs[2:4],
        model_path=model_dir,
        load_format="dummy",
        skip_tokenizer_init=True,
        dtype="float32",
        max_total_tokens=4096,
        page_size=4,
        random_seed=7,
        disable_jit_warmup=True,
    )
    yield eng
    eng.shutdown()


@pytest.fixture(scope="module")
def baseline(pair):
    """Greedy output of the DECODE engine running standalone (same
    params/sharding), cache flushed afterwards so PD runs fresh."""
    out = pair.decode.generate(input_ids=PROMPT, sampling_params=SP)
    assert pair.decode.flush_cache()
    return out["output_ids"]


class TestColocatedPD:
    def test_meshes_are_disjoint(self, pair):
        p = set(d.id for d in pair.prefill.runner.mesh.devices.flat)
        d = set(d.id for d in pair.decode.runner.mesh.devices.flat)
        assert p and d and not (p & d)

    def test_generate_matches_standalone(self, pair, baseline):
        out = pair.generate(PROMPT, SP)
        assert out["output_ids"] == baseline
        pd = out["meta_info"]["pd"]
        assert pd["pages_sent"] == 3          # KV actually moved
        assert pd["transfer_bytes"] > 0

    def test_staged_arrays_land_on_decode_mesh(self, pair):
        """The transfer's target shardings must address ONLY decode-mesh
        devices — this is what makes the hop D2D instead of host-bounced."""
        shs = pair.transfer._target_shardings()
        decode_devs = set(
            d.id for d in pair.decode.runner.mesh.devices.flat
        )
        for sh in shs:
            assert set(d.id for d in sh.device_set) <= decode_devs

    def test_decode_radix_cache_skips_transfer(self, pair, baseline):
        """Second identical request: decode already holds the prefix ->
        no pages move (reference decode-radix-cache headline)."""
        out = pair.generate(PROMPT, SP)
        pd = out["meta_info"]["pd"]
        assert pd["pages_skipped_cached"] == 3
        assert pd["pages_sent"] == 0
        assert out["output_ids"] == baseline

    def test_longer_prompt_multi_chunk(self, pair):
        prompt = list(range(1, 41))  # 40 tok = 10 pages
        sp = {"max_new_tokens": 5, "temperature": 0.0}
        out = pair.generate(prompt, sp)
        assert len(out["output_ids"]) == 5
        assert out["meta_info"]["pd"]["pages_sent"] == 10
        assert pair.decode.flush_cache()
        base = pair.decode.generate(input_ids=prompt, sampling_params=sp)
        assert out["output_ids"] == base["output_ids"]

    def test_served_colocated_mode(self):
        """--disaggregation-mode colocated: ONE server hosts the pair;
        /generate runs prefill -> device transfer -> decode continuation
        and reports pd meta. Output must match a plain server."""
        import httpx

        from tests.server_utils import kill_server, popen_launch_server

        model_dir = write_model_dir(TINY_LLAMA_CFG)
        body = {"input_ids": PROMPT, "sampling_params": SP}
        proc, url = popen_launch_server(
            model_dir,
            other_args=["--disaggregation-mode", "colocated",
                        "--tp-size", "2",
                        "--skip-tokenizer-init"],
        )
        try:
            r = httpx.post(url + "/generate", json=body, timeout=300)
            assert r.status_code == 200, r.text
            out = r.json()
            pd = out["meta_info"]["pd"]
            assert pd["pages_sent"] == 3 and pd["transfer_bytes"] > 0
            # repeat: decode-side radix cache skips the transfer
            r2 = httpx.post(url + "/generate", json=body, timeout=300)
            pd2 = r2.json()["meta_info"]["pd"]
            assert pd2["pages_sent"] == 0
            assert pd2["pages_skipped_cached"] == 3
            assert r2.json()["output_ids"] == out["output_ids"]
        finally:
            kill_server(proc)
        # same ids from a plain (non-PD) server with the same seed
        proc, url = popen_launch_server(
            model_dir, other_args=["--tp-size", "2",
                                   "--skip-tokenizer-init"])
        try:
            r = httpx.post(url + "/generate", json=body, timeout=300)
            assert r.json()["output_ids"] == out["output_ids"]
        finally:
            kill_server(proc)

    def test_served_with_metrics(self):
        """--enable-metrics must not collide between the pair's engines
        (process-global Prometheus registry), and the device transfer
        must feed the kv_transfer_speed_gb_s gauge."""
        import httpx

        from tests.server_utils import kill_server, popen_launch_server

        model_dir = write_model_dir(TINY_LLAMA_CFG)
        proc, url = popen_launch_server(
            model_dir,
            other_args=["--disaggregation-mode", "colocated",
                        "--tp-size", "2", "--skip-tokenizer-init",
                        "--enable-metrics"],
        )
        try:
            r = httpx.post(url + "/generate", json={
                "input_ids": PROMPT, "sampling_params": SP,
            }, timeout=300)
            assert r.status_code == 200, r.text
            m = httpx.get(url + "/metrics", timeout=30).text
            lines = [l for l in m.splitlines()
                     if "kv_transfer_speed" in l
                     and not l.startswith("#")]
            assert lines and float(lines[0].rsplit(" ", 1)[1]) > 0
        finally:
            kill_server(proc)

    def test_served_concurrent_requests(self):
        """Three different prompts in flight at once: per-request chunk
        listeners and the ordered install queue must not cross wires."""
        import concurrent.futures

        import httpx

        from tests.server_utils import kill_server, popen_launch_server

        model_dir = write_model_dir(TINY_LLAMA_CFG)
        prompts = [
            [3, 11, 42, 7, 19, 88, 5, 23],
            [9, 1, 4, 16, 25, 36, 49, 64, 81, 100, 2, 3],
            [7, 7, 7, 7, 5, 5, 5, 5],
        ]
        sp = {"max_new_tokens": 5, "temperature": 0.0}
        proc, url = popen_launch_server(
            model_dir,
            other_args=["--disaggregation-mode", "colocated",
                        "--tp-size", "2", "--skip-tokenizer-init"],
        )
        try:
            def post(ids):
                r = httpx.post(url + "/generate", json={
                    "input_ids": ids, "sampling_params": sp,
                }, timeout=300)
                assert r.status_code == 200, r.text
                return r.json()
            with concurrent.futures.ThreadPoolExecutor(3) as ex:
                outs = list(ex.map(post, prompts))
            for ids, out in zip(prompts, outs):
                assert len(out["output_ids"]) == 5
                assert out["meta_info"]["pd"]["pages_sent"] == len(ids) // 4
        finally:
            kill_server(proc)
        # cross-check each against a plain server (same seed)
        proc, url = popen_launch_server(
            model_dir, other_args=["--tp-size", "2",
                                   "--skip-tokenizer-init"])
        try:
            for ids, out in zip(prompts, outs):
                r = httpx.post(url + "/generate", json={
                    "input_ids": ids, "sampling_params": sp,
                }, timeout=300)
                assert r.json()["output_ids"] == out["output_ids"], ids
        finally:
            kill_server(proc)

    def test_subpage_prompt_no_transfer(self, pair):
        """Prompt shorter than one page: nothing to transfer; the decode
        side re-extends the whole prompt after the preset first token."""
        prompt = [9, 8, 7]
        sp = {"max_new_tokens": 4, "temperature": 0.0}
        out = pair.generate(prompt, sp)
        assert len(out["output_ids"]) == 4
        assert out["meta_info"]["pd"]["pages_sent"] == 0
        assert pair.decode.flush_cache()
        base = pair.decode.generate(input_ids=prompt, sampling_params=sp)
        assert out["output_ids"] == base["output_ids"]

    def test_composes_with_spec_decode(self):
        """PD decode side running speculative decoding (the production
        PD pairing: transfer-fed prompts, spec-accelerated TPOT) — the
        prebuilt decode entry must feed the spec worker losslessly."""
        from sglang_fluentllm_tpu.disagg.colocated import (
            ColocatedPDEngine,
        )

        devs = jax.devices()
        model_dir = write_model_dir(TINY_LLAMA_CFG)
        pair = ColocatedPDEngine(
            prefill_devices=devs[:1], decode_devices=devs[1:2],
            model_path=model_dir, load_format="dummy",
            skip_tokenizer_init=True, dtype="float32",
            max_total_tokens=4096, page_size=4, random_seed=7,
            disable_jit_warmup=True,
            speculative_algorithm="PLD", speculative_num_steps=3,
        )
        try:
            out = pair.generate(PROMPT, SP)
            assert out["meta_info"]["pd"]["pages_sent"] == 3
            assert pair.decode.flush_cache()
            base = pair.decode.generate(
                input_ids=PROMPT, sampling_params=SP
            )
            assert out["output_ids"] == base["output_ids"]
        finally:
            pair.shutdown()

    def test_unaligned_tail_recomputes(self, pair):
        """Sub-page prompt tail isn't transferred; the decode side
        re-extends it (prebuilt entry requires page alignment)."""
        prompt = PROMPT + [77, 78]  # 14 tok: 3 pages + 2-token tail
        sp = {"max_new_tokens": 4, "temperature": 0.0}
        out = pair.generate(prompt, sp)
        assert len(out["output_ids"]) == 4
        assert pair.decode.flush_cache()
        base = pair.decode.generate(input_ids=prompt, sampling_params=sp)
        assert out["output_ids"] == base["output_ids"]
