"""Score / rerank / responses-API e2e — OWN module + fresh server.

Split out of test_http_server.py (round 5): under full-suite load the
shared module server wedged on these four tests twice in a row (>20 min
ReadTimeouts) while the same class passes in 17 s in isolation — a
fresh server isolates the class from whatever state/memory pressure the
40 earlier requests build up, and these endpoints have their own jit
programs anyway. The server now dumps all-thread stacks on SIGUSR1
(entrypoints/http_server.py) so a recurrence is diagnosable.
"""

import functools
import json

import httpx as _httpx
import pytest


class _HttpxWithLongDefault:
    _VERBS = ("get", "post", "put", "delete", "stream", "request")

    def __getattr__(self, name):
        attr = getattr(_httpx, name)
        if name not in self._VERBS:
            return attr

        @functools.wraps(attr)
        def call(*a, **kw):
            kw.setdefault("timeout", 1200.0)
            return attr(*a, **kw)

        return call


httpx = _HttpxWithLongDefault()

from tests.server_utils import kill_server, popen_launch_server, write_tiny_tokenizer
from tests.utils import TINY_LLAMA_CFG, write_model_dir

PROMPT_IDS = [3, 11, 42, 7, 19, 88]
PROMPT_TEXT = "<3> <11> <42> <7> <19> <88>"


@pytest.fixture(scope="module")
def server():
    model_dir = write_model_dir(TINY_LLAMA_CFG)
    write_tiny_tokenizer(model_dir, TINY_LLAMA_CFG["vocab_size"])
    proc, base_url = popen_launch_server(model_dir)
    yield base_url
    kill_server(proc)


class TestScoreRerankResponses:
    def test_score(self, server):
        r = httpx.post(server + "/v1/score", json={
            "model": "test",
            "query": [3, 11, 42],
            "items": [[7], [19], [88]],
            "label_token_ids": [5, 9],
            "apply_softmax": True,
        })
        assert r.status_code == 200, r.text
        out = r.json()
        assert len(out["scores"]) == 3
        for row in out["scores"]:
            assert len(row) == 2
            assert abs(sum(row) - 1.0) < 1e-4

    def test_score_no_softmax_probs(self, server):
        r = httpx.post(server + "/v1/score", json={
            "model": "test",
            "query": [3, 11, 42],
            "items": [[7]],
            "label_token_ids": [5, 9, 23],
        })
        out = r.json()
        row = out["scores"][0]
        assert all(0.0 <= p <= 1.0 for p in row)
        # raw next-token probabilities over full vocab sum to < 1
        assert sum(row) < 1.0

    def test_score_bad_label(self, server):
        r = httpx.post(server + "/v1/score", json={
            "model": "test", "query": [3], "items": [[7]],
            "label_token_ids": [99999],
        })
        assert r.status_code == 400

    def test_rerank(self, server):
        r = httpx.post(server + "/v1/rerank", json={
            "query": PROMPT_TEXT,
            "documents": ["<3> <11>", "<88> <90>", "<42> <7>"],
        })
        assert r.status_code == 200, r.text
        out = r.json()
        assert len(out) == 3
        scores = [d["score"] for d in out]
        assert scores == sorted(scores, reverse=True)
        assert {d["index"] for d in out} == {0, 1, 2}

    def test_rerank_empty_doc(self, server):
        r = httpx.post(server + "/v1/rerank", json={
            "query": PROMPT_TEXT, "documents": ["ok", "  "],
        })
        assert r.status_code == 400

    def test_responses_basic_and_retrieve(self, server):
        r = httpx.post(server + "/v1/responses", json={
            "model": "test", "input": PROMPT_TEXT,
            "max_output_tokens": 4, "temperature": 0,
        })
        assert r.status_code == 200, r.text
        out = r.json()
        assert out["object"] == "response"
        assert out["status"] == "completed"
        text = out["output"][0]["content"][0]["text"]
        assert text
        assert out["usage"]["output_tokens"] == 4
        # retrieve by id
        got = httpx.get(server + f"/v1/responses/{out['id']}").json()
        assert got["id"] == out["id"]
        assert got["output"][0]["content"][0]["text"] == text

    def test_responses_chaining(self, server):
        r1 = httpx.post(server + "/v1/responses", json={
            "model": "test", "input": PROMPT_TEXT,
            "max_output_tokens": 3, "temperature": 0,
        }).json()
        r2 = httpx.post(server + "/v1/responses", json={
            "model": "test", "input": "<5> <9>",
            "previous_response_id": r1["id"],
            "max_output_tokens": 3, "temperature": 0,
        })
        assert r2.status_code == 200, r2.text
        assert r2.json()["previous_response_id"] == r1["id"]
        # unknown previous id -> 400
        bad = httpx.post(server + "/v1/responses", json={
            "model": "test", "input": "x",
            "previous_response_id": "resp_nope",
        })
        assert bad.status_code == 400

    def test_responses_stream(self, server):
        events = []
        with httpx.stream("POST", server + "/v1/responses", json={
            "model": "test", "input": PROMPT_TEXT,
            "max_output_tokens": 4, "temperature": 0, "stream": True,
        }) as r:
            assert r.status_code == 200
            for line in r.iter_lines():
                if line.startswith("event: "):
                    events.append(line[7:])
        assert events[0] == "response.created"
        assert events[-1] == "response.completed"
        assert "response.output_text.delta" in events
