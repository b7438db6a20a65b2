"""PD disaggregation e2e: two real servers + mini LB (CPU jax).

Parity targets: the reference's PD flow (SURVEY §3.4) incl. the decode-side
radix cache reducing transfer volume, via the HTTP/TCP transfer backend.
"""

import subprocess
import sys
import time

import httpx
import pytest

from tests.server_utils import (
    REPO_ROOT,
    find_free_port,
    kill_server,
    popen_launch_server,
    write_tiny_tokenizer,
)
from tests.utils import TINY_LLAMA_CFG, write_model_dir

PROMPT = [3, 11, 42, 7, 19, 88, 5, 23, 54]
SP = {"max_new_tokens": 7, "temperature": 0.0}


@pytest.fixture(scope="module")
def pd_cluster():
    model_dir = write_model_dir(TINY_LLAMA_CFG)
    write_tiny_tokenizer(model_dir, TINY_LLAMA_CFG["vocab_size"])
    p_proc, p_url = popen_launch_server(
        model_dir, other_args=["--disaggregation-mode", "prefill"]
    )
    d_proc, d_url = popen_launch_server(
        model_dir, other_args=["--disaggregation-mode", "decode"]
    )
    lb_port = find_free_port()
    import os

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    lb_proc = subprocess.Popen([
        sys.executable, "-m", "sglang_fluentllm_tpu.disagg.mini_lb",
        "--prefill", p_url, "--decode", d_url,
        "--port", str(lb_port),
    ], env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    lb_url = f"http://127.0.0.1:{lb_port}"
    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            if httpx.get(lb_url + "/health", timeout=2).status_code == 200:
                break
        except Exception:
            time.sleep(0.3)
    yield {"lb": lb_url, "prefill": p_url, "decode": d_url,
           "model_dir": model_dir}
    for proc in (lb_proc, p_proc, d_proc):
        kill_server(proc)


@pytest.fixture(scope="module")
def baseline(pd_cluster):
    """Single-server greedy output for the same prompt."""
    r = httpx.post(pd_cluster["prefill"] + "/generate", json={
        "input_ids": PROMPT, "sampling_params": SP}, timeout=300)
    out = r.json()["output_ids"]
    # clean the prefill server's cache so PD runs fresh
    httpx.post(pd_cluster["prefill"] + "/flush_cache", timeout=60)
    return out


class TestPDDisaggregation:
    def test_pd_generate_matches_single_server(self, pd_cluster, baseline):
        r = httpx.post(pd_cluster["lb"] + "/generate", json={
            "input_ids": PROMPT, "sampling_params": SP}, timeout=600)
        assert r.status_code == 200, r.text
        out = r.json()
        assert out["output_ids"] == baseline
        pd = out["meta_info"]["pd"]
        assert pd["pages_sent"] > 0          # KV actually transferred

    def test_decode_radix_cache_reduces_transfer(self, pd_cluster, baseline):
        """Second identical request: decode already holds the prefix ->
        prefill skips those pages (reference decode-radix-cache headline)."""
        r = httpx.post(pd_cluster["lb"] + "/generate", json={
            "input_ids": PROMPT, "sampling_params": SP}, timeout=600)
        out = r.json()
        pd = out["meta_info"]["pd"]
        assert pd["decode_prefix_len"] > 0
        assert pd["pages_sent"] == 0
        assert out["output_ids"] == baseline

    def test_pd_longer_prompt(self, pd_cluster):
        prompt = list(range(1, 40))
        r = httpx.post(pd_cluster["lb"] + "/generate", json={
            "input_ids": prompt,
            "sampling_params": {"max_new_tokens": 5, "temperature": 0.0},
        }, timeout=600)
        out = r.json()
        assert len(out["output_ids"]) == 5
        # compare against decode server running standalone
        httpx.post(pd_cluster["decode"] + "/flush_cache", timeout=60)
        rb = httpx.post(pd_cluster["decode"] + "/generate", json={
            "input_ids": prompt,
            "sampling_params": {"max_new_tokens": 5, "temperature": 0.0},
        }, timeout=300)
        assert out["output_ids"] == rb.json()["output_ids"]

    def test_pd_single_token_request(self, pd_cluster):
        r = httpx.post(pd_cluster["lb"] + "/generate", json={
            "input_ids": [9, 8, 7],
            "sampling_params": {"max_new_tokens": 1, "temperature": 0.0},
        }, timeout=600)
        assert r.status_code == 200, r.text
        assert len(r.json()["output_ids"]) == 1


class TestChunkStreamedTransfer:
    """Layer-wise/chunked KV streaming (reference mooncake LayerWiseTask /
    send_kv_chunk overlap) + failure detection."""

    def test_transfer_overlaps_prefill(self):
        """With a small chunked-prefill size and a multi-chunk prompt, the
        decode server must receive MULTIPLE /pd/receive_kv posts, i.e.
        transfer starts before the prefill finishes (VERDICT #7 done
        criterion: event ordering)."""
        model_dir = write_model_dir(TINY_LLAMA_CFG)
        write_tiny_tokenizer(model_dir, TINY_LLAMA_CFG["vocab_size"])
        p_proc, p_url = popen_launch_server(
            model_dir, other_args=[
                "--disaggregation-mode", "prefill",
                "--chunked-prefill-size", "8",
                "--page-size", "4",
                "--enable-metrics",
            ]
        )
        d_proc, d_url = popen_launch_server(
            model_dir, other_args=["--disaggregation-mode", "decode",
                                   "--page-size", "4",
                                   "--enable-metrics"]
        )
        try:
            long_prompt = list(range(2, 34))  # 32 tokens, 4 chunks of 8
            room = "chunktest1"
            r = httpx.post(f"{d_url}/pd/start", json={
                "room": room, "input_ids": long_prompt,
                "sampling_params": SP,
            }, timeout=60)
            assert r.status_code == 200
            r = httpx.post(f"{p_url}/pd/prefill", json={
                "room": room, "input_ids": long_prompt,
                "sampling_params": SP,
                "decode_url": d_url,
                "decode_prefix_len": r.json()["decode_prefix_len"],
            }, timeout=300)
            assert r.status_code == 200, r.text
            info = r.json()
            assert info["success"], info
            # at least one MID-STREAM chunk before the final marker:
            # transfer started while prefill still computed (the overlap
            # pipeline may coalesce resolved chunks into fewer sends)
            assert info["chunks"] >= 2, info
            # transfer throughput measured and non-trivial (VERDICT r4
            # #6: the gauge exists, feed it) + tail split exposed for
            # the layer-wise-granularity measurement
            assert info["bytes_sent"] > 0, info
            assert info["transfer_gb_s"] > 0, info
            assert "tail_transfer_ms" in info, info
            r = httpx.post(f"{d_url}/pd/result", json={"room": room},
                           timeout=300)
            out = r.json()
            assert len(out["output_ids"]) == SP["max_new_tokens"]
            # both sides fed the prometheus gauge
            for url in (p_url, d_url):
                m = httpx.get(f"{url}/metrics", timeout=60).text
                line = [
                    ln for ln in m.splitlines()
                    if "kv_transfer_speed_gb_s{" in ln
                ]
                assert line, m[:400]
                assert float(line[0].rsplit(" ", 1)[1]) > 0, line
        finally:
            kill_server(p_proc)
            kill_server(d_proc)

    def test_dead_decode_server_fails_room(self):
        """A killed decode peer must FAIL the prefill-side transfer
        quickly instead of hanging (reference heartbeat/KVPoll.Failed
        semantics)."""
        model_dir = write_model_dir(TINY_LLAMA_CFG)
        write_tiny_tokenizer(model_dir, TINY_LLAMA_CFG["vocab_size"])
        p_proc, p_url = popen_launch_server(
            model_dir, other_args=["--disaggregation-mode", "prefill",
                                   "--page-size", "4"]
        )
        try:
            dead_url = "http://127.0.0.1:9"  # discard port: refuses
            t0 = time.time()
            r = httpx.post(f"{p_url}/pd/prefill", json={
                "room": "deadroom", "input_ids": PROMPT,
                "sampling_params": SP,
                "decode_url": dead_url,
                "decode_prefix_len": 0,
            }, timeout=300)
            dt = time.time() - t0
            assert r.status_code == 500  # success: False -> 500
            info = r.json()
            assert info["success"] is False
            assert dt < 120
        finally:
            kill_server(p_proc)

    def test_stalled_room_fails_on_decode_side(self):
        """/pd/result for a room whose prefill peer never sends returns a
        stall error instead of blocking for the full timeout."""
        model_dir = write_model_dir(TINY_LLAMA_CFG)
        write_tiny_tokenizer(model_dir, TINY_LLAMA_CFG["vocab_size"])
        d_proc, d_url = popen_launch_server(
            model_dir, other_args=["--disaggregation-mode", "decode",
                                   "--page-size", "4"]
        )
        try:
            room = "ghostroom"
            httpx.post(f"{d_url}/pd/start", json={
                "room": room, "input_ids": PROMPT,
                "sampling_params": SP,
            }, timeout=60)
            t0 = time.time()
            r = httpx.post(f"{d_url}/pd/result",
                           json={"room": room, "stall_ttl": 3},
                           timeout=120)
            dt = time.time() - t0
            out = r.json()
            assert "error" in out, out
            assert dt < 60
        finally:
            kill_server(d_proc)


class TestRetractResumeAndPrebuilt:
    """In-process VERDICT r2 #9 checks: retracted decode requests resume
    from cached KV (no re-prefill of the published prefix) and
    transferred requests enter decode as a prebuilt batch."""

    def test_retract_resume_no_second_prefill(self):
        from tests.utils import TINY_LLAMA_CFG, tiny_engine

        e = tiny_engine(TINY_LLAMA_CFG, max_total_tokens=512,
                        max_running_requests=16)
        sp = {"max_new_tokens": 48, "temperature": 0.0,
              "ignore_eos": True}
        prompts = [[(7 * i + j) % 120 + 1 for j in range(16)]
                   for i in range(12)]
        outs = e.generate(input_ids=prompts, sampling_params=sp)
        assert all(len(o["output_ids"]) == 48 for o in outs)
        sched = e.scheduler
        assert sched.num_retracted > 0, "no retraction => test is vacuous"
        # retracted requests re-admit with their published prefix intact
        # when memory recovers (under sustained pressure the published KV
        # itself is evictable — by design); at least one resume must have
        # skipped its re-prefill here
        assert sched.retract_resume_hits > 0

    def test_retraction_resumes_from_cached_kv(self):
        """Deterministic retract-resume: force a retraction mid-decode,
        then assert the resumed request (a) matched the KV published at
        retraction (no second prefill of it) and (b) produces the same
        greedy output as an uninterrupted run."""
        from tests.utils import TINY_LLAMA_CFG, tiny_engine

        sp = {"max_new_tokens": 24, "temperature": 0.0,
              "ignore_eos": True}
        prompt = [3, 11, 42, 7, 19, 88, 5, 23]
        ref = tiny_engine(TINY_LLAMA_CFG).generate(
            input_ids=prompt, sampling_params=sp
        )["output_ids"]

        # small windows + no overlap so the retraction point is exact
        e = tiny_engine(TINY_LLAMA_CFG, decode_steps_per_launch=4,
                        disable_overlap_schedule=True)
        sched = e.scheduler
        from sglang_fluentllm_tpu.sched.req import Req
        from sglang_fluentllm_tpu.sched.sampling_params import (
            SamplingParams,
        )

        req = Req("rr", list(prompt),
                  SamplingParams(max_new_tokens=24, temperature=0.0,
                                 ignore_eos=True),
                  eos_token_ids=set())
        sched.add_request(req)
        while len(req.output_ids) < 8:
            sched.step()
        while req.inflight > 0:  # drain in-flight windows
            sched.step()
        assert req in sched.running_batch
        sched._retract_decode()
        assert req not in sched.running_batch
        while not req.finished():
            sched.step()
        assert sched.retract_resume_hits == 1
        assert req.output_ids == ref

    def test_prebuilt_decode_entry(self):
        from tests.utils import TINY_LLAMA_CFG, tiny_engine
        from sglang_fluentllm_tpu.sched.req import Req
        from sglang_fluentllm_tpu.sched.sampling_params import (
            SamplingParams,
        )

        e = tiny_engine(TINY_LLAMA_CFG)
        prompt = [3, 11, 42, 7, 19, 88, 5, 23]  # page-aligned (ps=4)
        ref = e.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": 5, "temperature": 0.0},
        )["output_ids"]
        # transferred-request analog: prompt KV is cached; first token
        # preset by the prefill server
        req = Req("prebuilt-room", list(prompt),
                  SamplingParams(max_new_tokens=5, temperature=0.0),
                  eos_token_ids=set())
        req.output_ids = [ref[0]]
        req.pd_prebuilt = True
        sched = e.scheduler
        before = sched.num_prebuilt_admitted
        sched.add_request(req)
        for _ in range(200):
            sched.step()
            if req.finished():
                break
            time.sleep(0.01)  # let the async window land (overlap mode)
        assert req.finished()
        assert sched.num_prebuilt_admitted == before + 1
        assert req.output_ids == ref  # identical continuation, no re-extend


class TestTransportRobustness:
    """VERDICT r3 #5: heartbeat + retry + room GC + chaos (peer death
    mid-transfer must abort cleanly and leave the surviving server up)."""

    def test_chunk_retry_then_success(self):
        """A flaky receiver that 503s the first attempt of each chunk:
        the sender retries with backoff and the room still succeeds."""
        import http.server
        import threading

        from sglang_fluentllm_tpu.disagg.conn import (
            ChunkedKVSender,
            KVPoll,
        )

        fails = {"n": 0}

        class Flaky(http.server.BaseHTTPRequestHandler):
            attempts = {}

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                self.rfile.read(n)
                if self.path == "/pd/heartbeat":
                    self.send_response(200)
                    self.end_headers()
                    self.wfile.write(b"{}")
                    return
                key = Flaky.attempts.get("k", 0)
                Flaky.attempts["k"] = key + 1
                if key % 2 == 0:  # fail every first attempt
                    fails["n"] += 1
                    self.send_response(503)
                else:
                    self.send_response(200)
                self.end_headers()
                self.wfile.write(b"{}")

            def log_message(self, *a):
                pass

        srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Flaky)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{srv.server_port}"
        try:
            s = ChunkedKVSender(url, "flakyroom", timeout=10.0)
            s.enqueue_device(None, 0, {"start_page": 0, "num_pages": 0,
                                       "token_ids": [], "last": False})
            s.finish({"start_page": 0, "num_pages": 0, "token_ids": [],
                      "last": True})
            assert s.wait_done(60.0) == KVPoll.Success
            assert s.chunks_sent == 2
            assert s.chunk_retries >= 2  # each chunk needed one retry
            assert fails["n"] >= 2
        finally:
            srv.shutdown()

    def test_decode_killed_mid_transfer_prefill_survives(self):
        """Kill the decode peer after the handshake: the prefill-side
        transfer fails bounded (retries exhausted), the request errors
        cleanly, and the prefill server keeps serving /generate."""
        model_dir = write_model_dir(TINY_LLAMA_CFG)
        write_tiny_tokenizer(model_dir, TINY_LLAMA_CFG["vocab_size"])
        p_proc, p_url = popen_launch_server(
            model_dir, other_args=["--disaggregation-mode", "prefill",
                                   "--page-size", "4"]
        )
        d_proc, d_url = popen_launch_server(
            model_dir, other_args=["--disaggregation-mode", "decode",
                                   "--page-size", "4"]
        )
        try:
            room = "chaos1"
            r = httpx.post(f"{d_url}/pd/start", json={
                "room": room, "input_ids": PROMPT,
                "sampling_params": SP}, timeout=60)
            assert r.status_code == 200
            kill_server(d_proc)  # decode dies between handshake and send
            t0 = time.time()
            r = httpx.post(f"{p_url}/pd/prefill", json={
                "room": room, "input_ids": PROMPT,
                "sampling_params": SP, "decode_url": d_url,
                "decode_prefix_len": 0}, timeout=300)
            assert r.status_code == 500
            assert r.json()["success"] is False
            assert time.time() - t0 < 120
            # prefill server is still healthy and serves normal traffic
            r = httpx.post(f"{p_url}/generate", json={
                "input_ids": PROMPT, "sampling_params": SP}, timeout=120)
            assert r.status_code == 200
            assert len(r.json()["output_ids"]) == SP["max_new_tokens"]
        finally:
            kill_server(p_proc)
            kill_server(d_proc)

    def test_heartbeat_keeps_room_alive_and_gc_culls_dead(self):
        """In-process PDManager: heartbeats refresh last_activity; the GC
        culls an incomplete room whose peer went silent past ROOM_TTL but
        leaves heartbeat-fresh rooms alone."""
        import asyncio

        from sglang_fluentllm_tpu.disagg.pd import PDManager
        from tests.utils import TINY_LLAMA_CFG, tiny_engine

        class _FakeAsyncEngine:
            def __init__(self, e):
                self.engine = e
                self.server_args = e.server_args
                self.scheduler = e.scheduler
                self.runner = e.scheduler.runner

            async def _run_rpc(self, fn):
                try:
                    return True, fn()
                except Exception as ex:  # noqa: BLE001
                    return False, ex

        e = tiny_engine(TINY_LLAMA_CFG)
        pd = PDManager(_FakeAsyncEngine(e))

        async def drive():
            await pd.start_room("alive", PROMPT, SP)
            await pd.start_room("dead", PROMPT, SP)
            # simulate time passing beyond ROOM_TTL for both
            past = time.time() - PDManager.ROOM_TTL - 1
            pd.rooms["alive"]["last_activity"] = past
            pd.rooms["dead"]["last_activity"] = past
            assert pd.heartbeat("alive")["success"]  # refreshes
            assert not pd.heartbeat("nosuch")["success"]
            pd._last_gc = 0.0
            pd.gc_rooms()
            assert "alive" in pd.rooms
            assert "dead" not in pd.rooms

        asyncio.run(drive())

    def test_prefill_heartbeats_reach_decode_room(self):
        """During a live PD transfer the decode room's stall clock is
        refreshed by the sender's heartbeat thread (route + thread e2e)."""
        model_dir = write_model_dir(TINY_LLAMA_CFG)
        write_tiny_tokenizer(model_dir, TINY_LLAMA_CFG["vocab_size"])
        d_proc, d_url = popen_launch_server(
            model_dir, other_args=["--disaggregation-mode", "decode",
                                   "--page-size", "4"]
        )
        try:
            room = "hbroom"
            httpx.post(f"{d_url}/pd/start", json={
                "room": room, "input_ids": PROMPT,
                "sampling_params": SP}, timeout=60)
            r = httpx.post(f"{d_url}/pd/heartbeat", json={"room": room},
                           timeout=10)
            assert r.status_code == 200 and r.json()["success"]
            r = httpx.post(f"{d_url}/pd/heartbeat",
                           json={"room": "unknown"}, timeout=10)
            assert r.status_code == 404
        finally:
            kill_server(d_proc)


class TestDecodeDuringTransfer:
    def test_decode_progresses_while_chunks_install(self, pd_cluster):
        """Decode must keep making progress while KV chunks for another
        room install (VERDICT r4 #6: transfer must not stall the decode
        loop). Liveness + a loose throughput bound (5x idle baseline —
        generous to survive loaded CI boxes)."""
        import threading

        d_url = pd_cluster["decode"]
        httpx.post(d_url + "/flush_cache", timeout=60)
        # idle baseline: 24 tokens of decode with nothing else running
        t0 = time.time()
        r = httpx.post(d_url + "/generate", json={
            "input_ids": PROMPT,
            "sampling_params": {"max_new_tokens": 24, "temperature": 0.0},
        }, timeout=300)
        assert r.status_code == 200
        baseline_s = max(time.time() - t0, 0.05)

        # stream chunks for a fresh room from a thread while decoding
        stop = threading.Event()
        chunk_counter = {"n": 0, "err": None}
        long_prompt = list(range(2, 66))  # 64 tokens

        def spam_chunks():
            try:
                i = 0
                while not stop.is_set():
                    room = f"xfer{i}"
                    rr = httpx.post(f"{d_url}/pd/start", json={
                        "room": room, "input_ids": long_prompt,
                        "sampling_params": {"max_new_tokens": 1,
                                            "temperature": 0.0},
                    }, timeout=60)
                    if rr.status_code != 200:
                        break
                    chunk_counter["n"] += 1
                    i += 1
                    time.sleep(0.02)
            except Exception as e:  # noqa: BLE001
                chunk_counter["err"] = e

        th = threading.Thread(target=spam_chunks, daemon=True)
        th.start()
        try:
            t0 = time.time()
            r = httpx.post(d_url + "/generate", json={
                "input_ids": PROMPT[:5],
                "sampling_params": {"max_new_tokens": 24,
                                    "temperature": 0.0},
            }, timeout=300)
            loaded_s = time.time() - t0
        finally:
            stop.set()
            th.join(timeout=10)
        assert r.status_code == 200
        assert len(r.json()["output_ids"]) == 24
        assert chunk_counter["n"] > 0  # the stream actually ran
        assert loaded_s < 5 * baseline_s + 2.0, (
            f"decode stalled during transfers: {loaded_s:.2f}s vs "
            f"baseline {baseline_s:.2f}s"
        )
