"""Sequence-classification serving (/classify, reference reward-model
route): HF checkpoint round-trip parity + engine/HTTP plumbing."""

import numpy as np
import pytest

from tests.utils import TINY_LLAMA_CFG, tiny_engine

torch = pytest.importorskip("torch")

PROMPT = [3, 11, 42, 7, 19, 88]


class TestClassify:
    def _hf_dir(self):
        import tempfile

        from transformers import LlamaConfig, LlamaForSequenceClassification

        torch.manual_seed(3)
        common = {k: v for k, v in TINY_LLAMA_CFG.items()
                  if k not in ("architectures", "model_type",
                               "torch_dtype")}
        hf = LlamaForSequenceClassification(LlamaConfig(
            **common, num_labels=3, attn_implementation="eager",
            pad_token_id=0,
        ))
        hf.eval()
        d = tempfile.mkdtemp(prefix="cls_model_")
        hf.save_pretrained(d)
        return hf, d

    def test_matches_hf(self):
        hf, d = self._hf_dir()
        with torch.no_grad():
            ref = hf(torch.tensor([PROMPT])).logits[0].numpy()
        e = tiny_engine(model_path_override=d, load_format="safetensors")
        got = np.asarray(e.runner.classify_batch(self._items(e)))
        np.testing.assert_allclose(got[0], ref, rtol=2e-3, atol=2e-3)

    def _items(self, e):
        from sglang_fluentllm_tpu.runtime.batch_builder import ExtendItem

        runner = e.runner
        idx = runner.req_pool.alloc()
        slots = runner.allocator.alloc_extend(idx, 0, len(PROMPT))
        return [ExtendItem(
            input_ids=np.asarray(PROMPT, np.int32), prefix_len=0,
            slots=slots, pages=runner.allocator.req_pages(
                idx, len(PROMPT)),
        )]

    def test_http_classify(self):
        from tests.server_utils import (
            kill_server,
            popen_launch_server,
            write_tiny_tokenizer,
        )

        _, d = self._hf_dir()
        write_tiny_tokenizer(d, TINY_LLAMA_CFG["vocab_size"])
        proc, base = popen_launch_server(
            d, other_args=["--load-format", "safetensors"])
        try:
            import httpx

            r = httpx.post(base + "/classify", json={
                "input_ids": [PROMPT, [1, 2, 3]]}, timeout=300)
            assert r.status_code == 200, r.text
            out = r.json()["embedding"]
            assert len(out) == 2 and len(out[0]) == 3
        finally:
            kill_server(proc)

    def test_classify_rejected_for_causal_lm(self):
        import asyncio

        e = tiny_engine()
        # offline Engine has no classify; exercise the validation at the
        # runner level instead
        assert not getattr(e.runner.model, "is_classification", False)
