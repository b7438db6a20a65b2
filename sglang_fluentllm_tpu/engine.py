"""In-process Engine — offline generation API.

Analog of the reference's ``srt/entrypoints/engine.py`` (``Engine:92``,
``generate:172``). Single-host TPU design: no subprocess-per-GPU — the
scheduler + runner live in this process (JAX owns all local chips); the HTTP
server drives the same scheduler from a background thread.
"""

from __future__ import annotations

import json
import logging
import os
import uuid
from typing import Any, Dict, List, Optional, Union

from sglang_fluentllm_tpu.config import ModelConfig, ServerArgs
from sglang_fluentllm_tpu.runtime.model_runner import ModelRunner
from sglang_fluentllm_tpu.sched.detokenizer import Detokenizer
from sglang_fluentllm_tpu.sched.req import Req
from sglang_fluentllm_tpu.sched.sampling_params import (
    SamplingParams,
    resolve_think_end_id,
)
from sglang_fluentllm_tpu.sched.scheduler import Scheduler
from sglang_fluentllm_tpu.utils import configure_logger

logger = logging.getLogger(__name__)


def load_tokenizer(tokenizer_path: str):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(
        tokenizer_path, trust_remote_code=True, local_files_only=True
    )


def load_eos_ids(model_path: str, tokenizer) -> set:
    eos = set()
    if tokenizer is not None and tokenizer.eos_token_id is not None:
        eos.add(int(tokenizer.eos_token_id))
    gen_cfg = os.path.join(model_path, "generation_config.json")
    if os.path.exists(gen_cfg):
        try:
            with open(gen_cfg) as fp:
                cfg = json.load(fp)
            e = cfg.get("eos_token_id")
            if isinstance(e, int):
                eos.add(e)
            elif isinstance(e, list):
                eos.update(int(x) for x in e)
        except Exception:
            pass
    return eos


class Engine:
    def __init__(self, server_args: Optional[ServerArgs] = None,
                 mesh=None, **kwargs):
        if server_args is None:
            server_args = ServerArgs(**kwargs)
        self.server_args = server_args
        configure_logger(server_args.log_level)

        self.tokenizer = None
        if not server_args.skip_tokenizer_init:
            self.tokenizer = load_tokenizer(server_args.tokenizer_path)
        self.eos_token_ids = load_eos_ids(
            server_args.model_path, self.tokenizer
        )

        self.model_config = ModelConfig.from_server_args(server_args)
        if server_args.dp_size > 1:
            # request-level DP: N scheduler replicas on disjoint sub-meshes
            # (reference DataParallelController, data_parallel_controller.py)
            from sglang_fluentllm_tpu.sched.dp_controller import (
                DataParallelController,
            )

            self.scheduler = DataParallelController(
                server_args, self.model_config
            )
            self.runner = self.scheduler.runner
        else:
            self.runner = ModelRunner(server_args, self.model_config,
                                      mesh=mesh)
            self.scheduler = Scheduler(server_args, self.runner)
        self.detokenizer = (
            Detokenizer(self.tokenizer) if self.tokenizer else None
        )
        self._grammar_backend = None
        if server_args.debug_tensor_dump_output_folder:
            self.debug_tensor_dump()

    # ------------------------------------------------------------------
    def debug_tensor_dump(self, input_ids=None, out_folder=None):
        """One EXTEND forward; dump per-layer residual streams + final
        hidden + logits to ``<folder>/tensor_dump.npz`` for cross-impl
        numeric diffing (reference model_tensor_tracer.py:20 +
        --debug-tensor-dump-* flags, server_args.py:228-230).

        Per-layer capture uses the model's EAGLE-3 aux-capture tower
        (``forward_with_aux``) with every layer id; models without it
        dump only input/final/logits."""
        import os

        import jax
        import numpy as np

        from sglang_fluentllm_tpu.runtime.batch_builder import ExtendItem

        sa = self.server_args
        folder = out_folder or sa.debug_tensor_dump_output_folder
        assert folder, "debug_tensor_dump needs an output folder"
        if input_ids is None:
            spec = sa.debug_tensor_dump_input_ids
            if spec and os.path.exists(spec):
                input_ids = np.load(spec).astype(np.int32).tolist()
            elif spec:
                input_ids = [int(x) for x in spec.split(",")]
            else:
                v = self.model_config.vocab_size
                input_ids = [(7 * i + 3) % v for i in range(16)]
        ids = np.asarray(input_ids, np.int32)
        runner = self.runner
        model = runner.model
        idx = runner.req_pool.alloc()
        assert idx is not None
        slots = runner.allocator.alloc_extend(idx, 0, len(ids))
        assert slots is not None, "no KV room for tensor dump"
        try:
            item = ExtendItem(
                input_ids=ids,
                prefix_len=0,
                slots=slots,
                pages=runner.allocator.req_pages(idx, len(ids)),
            )
            batch = runner.batch_builder.build_extend([item])
            arrays = {"input_ids": ids}
            L = self.model_config.num_hidden_layers
            if hasattr(model, "forward_with_aux"):
                cap = tuple(range(1, L + 1))  # INPUT residual of each layer
                _, h, aux = model.forward_with_aux(
                    runner.params, runner.kv_cache, batch, cap
                )
                # aux is [B, S, L*H] (layer-major last dim)
                aux = np.asarray(jax.device_get(aux), np.float32)
                aux = aux[0, : len(ids)].reshape(len(ids), len(cap), -1)
                for li, lid in enumerate(cap):
                    arrays[f"layer_{lid:03d}_input"] = aux[:, li]
            else:
                _, h = model.forward(runner.params, runner.kv_cache, batch)
            arrays["final_hidden"] = np.asarray(
                jax.device_get(h), np.float32
            )[0, : len(ids)]
            logits = runner.forward_logits(batch)  # [B, S, V]
            arrays["logits"] = np.asarray(
                jax.device_get(logits), np.float32
            )[0, : len(ids)]
            os.makedirs(folder, exist_ok=True)
            path = os.path.join(folder, "tensor_dump.npz")
            np.savez(path, **arrays)
            logger.info("debug tensor dump written to %s (%d arrays)",
                        path, len(arrays))
            return path
        finally:
            runner.allocator.free_req_pages(idx, len(ids))
            runner.req_pool.free(idx)

    @property
    def grammar_backend(self):
        if self._grammar_backend is None:
            from sglang_fluentllm_tpu.constrained.backend import (
                GrammarBackend,
            )

            self._grammar_backend = GrammarBackend(
                self.tokenizer,
                self.model_config.vocab_size,
                self.eos_token_ids,
            )
        return self._grammar_backend

    # ------------------------------------------------------------------
    def generate(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        sampling_params: Optional[Union[Dict, List[Dict]]] = None,
        input_ids: Optional[Union[List[int], List[List[int]]]] = None,
        return_logprob: bool = False,
        rid: Optional[str] = None,
    ) -> Union[Dict, List[Dict]]:
        """Synchronous offline generation (batch ok). ``rid`` names the
        FIRST request (PD chunk listeners key on it)."""
        single, prompts, ids_list = self._normalize_inputs(prompt, input_ids)
        n = len(ids_list)
        if isinstance(sampling_params, list):
            sps = [SamplingParams.from_dict(s) for s in sampling_params]
        else:
            sps = [SamplingParams.from_dict(sampling_params) for _ in range(n)]
        for sp in sps:
            resolve_think_end_id(sp, self.tokenizer)
            if (sp.custom_logit_processor is not None
                    and not self.server_args.enable_custom_logit_processor):
                raise ValueError(
                    "custom_logit_processor requires "
                    "--enable-custom-logit-processor")
        if return_logprob:
            for sp in sps:
                sp.return_logprob = True

        reqs = []
        for i, (ids, sp) in enumerate(zip(ids_list, sps)):
            req = Req(
                rid=(rid if rid and i == 0 else uuid.uuid4().hex),
                input_ids=ids,
                sampling_params=sp,
                eos_token_ids=self.eos_token_ids,
            )
            if sp.json_schema or sp.regex or sp.ebnf:
                req.grammar_future = self.grammar_backend.grammar_for(sp)
            reqs.append(req)
            self.scheduler.add_request(req)

        results = {r.rid: r for r in reqs}
        texts = {r.rid: "" for r in reqs}
        while any(not r.finished() for r in reqs):
            outputs = self.scheduler.step()
            if not outputs and not self.scheduler.has_work():
                break
            for out in outputs:
                req = results[out.rid]
                if self.detokenizer is not None and out.new_token_ids:
                    text, stop = self.detokenizer.detokenize_incremental(
                        out.rid,
                        out.new_token_ids,
                        out.finished,
                        req.sampling_params.skip_special_tokens,
                        req.sampling_params.stop,
                    )
                    texts[out.rid] += text
                    if stop is not None and not req.finished():
                        req.set_finished_by_stop_str(stop)
                        self.scheduler.finish_request(req)

        out_dicts = [
            self._make_result(r, texts[r.rid]) for r in reqs
        ]
        return out_dicts[0] if single else out_dicts

    def generate_continuation(
        self,
        input_ids: List[int],
        first_tokens: List[int],
        sampling_params: Optional[Dict] = None,
        rid: Optional[str] = None,
    ) -> Dict:
        """Synchronous PD decode continuation (sync twin of
        AsyncEngine.generate_continuation): the prompt KV arrived by
        transfer, ``first_tokens`` were produced by the prefill peer.
        When the transferred KV covers the page-aligned prompt the
        scheduler admits the request straight into decode (reference
        decode.py:220 PreallocQueue prebuilt entry)."""
        sp = SamplingParams.from_dict(sampling_params)
        resolve_think_end_id(sp, self.tokenizer)
        req = Req(
            rid=rid or uuid.uuid4().hex,
            input_ids=list(input_ids),
            sampling_params=sp,
            eos_token_ids=self.eos_token_ids,
        )
        req.output_ids = list(first_tokens)
        req.pd_prebuilt = bool(first_tokens)
        req.check_finished()
        text = ""
        if not req.finished():
            self.scheduler.add_request(req)
            while not req.finished():
                outputs = self.scheduler.step()
                if not outputs and not self.scheduler.has_work():
                    break
                for out in outputs:
                    if out.rid != req.rid:
                        continue
                    if self.detokenizer is not None and out.new_token_ids:
                        delta, stop = (
                            self.detokenizer.detokenize_incremental(
                                out.rid, out.new_token_ids, out.finished,
                                sp.skip_special_tokens, sp.stop,
                            )
                        )
                        text += delta
                        if stop is not None and not req.finished():
                            req.set_finished_by_stop_str(stop)
                            self.scheduler.finish_request(req)
        return self._make_result(req, text)

    def _normalize_inputs(self, prompt, input_ids):
        if input_ids is not None:
            if not input_ids:
                raise ValueError("input_ids must be non-empty")
            single = isinstance(input_ids[0], int)
            ids_list = [input_ids] if single else list(input_ids)
            if any(not ids for ids in ids_list):
                raise ValueError("input_ids must be non-empty")
            return single, None, ids_list
        assert prompt is not None, "prompt or input_ids required"
        single = isinstance(prompt, str)
        prompts = [prompt] if single else list(prompt)
        assert self.tokenizer is not None
        ids_list = [self.tokenizer.encode(p) for p in prompts]
        return single, prompts, ids_list

    def _make_result(self, req: Req, text: str) -> Dict[str, Any]:
        meta: Dict[str, Any] = {
            "id": req.rid,
            "finish_reason": (
                req.finish_reason.to_dict() if req.finish_reason else None
            ),
            "prompt_tokens": len(req.origin_input_ids),
            "completion_tokens": len(req.output_ids),
            "cached_tokens": req.prefix_len,
        }
        if req.sampling_params.return_logprob:
            meta["output_token_logprobs"] = [
                (lp, tid) for lp, tid in zip(
                    req.output_token_logprobs, req.output_ids
                )
            ]
            if req.sampling_params.top_logprobs_num > 0:
                meta["output_top_logprobs"] = list(req.output_top_logprobs)
            if req.sampling_params.logprob_start_len >= 0:
                start = req.sampling_params.logprob_start_len
                meta["input_token_logprobs"] = [
                    (lp, tid) for lp, tid in zip(
                        req.input_token_logprobs, req.origin_input_ids
                    )
                ][start:]
        return {
            "text": text,
            "output_ids": list(req.output_ids),
            "meta_info": meta,
        }

    # ------------------------------------------------------------------
    def score(
        self,
        query=None,
        items=None,
        label_token_ids: Optional[List[int]] = None,
        apply_softmax: bool = False,
        item_first: bool = False,
    ) -> List[List[float]]:
        """Probability of each label token right after query+item
        (reference ``Engine.score``, ``engine.py:580``): one prefill per
        item, label logprobs gathered from the next-token distribution."""
        import numpy as np

        from sglang_fluentllm_tpu.runtime.batch_builder import ExtendItem

        if query is None or items is None:
            raise ValueError("score requires both query and items")
        if not label_token_ids:
            raise ValueError("score requires label_token_ids")
        V = self.model_config.vocab_size
        for t in label_token_ids:
            if not (0 <= int(t) < V):
                raise ValueError(f"label token id {t} out of vocab")

        def to_ids(x):
            if isinstance(x, str):
                assert self.tokenizer is not None, \
                    "text scoring requires a tokenizer"
                return self.tokenizer.encode(x)
            return list(x)

        q_ids = to_ids(query)
        if isinstance(items, str):
            items = [items]
        prompts = [
            (to_ids(it) + q_ids) if item_first else (q_ids + to_ids(it))
            for it in items
        ]
        runner = self.runner
        extend_items, idxs = [], []
        try:
            for ids in prompts:
                idx = runner.req_pool.alloc()
                assert idx is not None
                slots = runner.allocator.alloc_extend(idx, 0, len(ids))
                if slots is None:
                    self.scheduler.tree_cache.evict(
                        runner.allocator.pages_needed(0, len(ids)),
                        runner.allocator.release_pages,
                    )
                    slots = runner.allocator.alloc_extend(idx, 0, len(ids))
                assert slots is not None, "no KV room for score"
                idxs.append(idx)
                extend_items.append(ExtendItem(
                    input_ids=np.asarray(ids, np.int32),
                    prefix_len=0,
                    slots=slots,
                    pages=runner.allocator.req_pages(idx, len(ids)),
                ))
            lp = runner.score_batch(
                extend_items, np.asarray(label_token_ids, np.int32)
            )
            if apply_softmax:
                m = lp.max(axis=-1, keepdims=True)
                e = np.exp(lp - m)
                probs = e / e.sum(axis=-1, keepdims=True)
            else:
                probs = np.exp(lp)
            return [list(map(float, row)) for row in probs]
        finally:
            for idx, ids in zip(idxs, prompts):
                runner.allocator.free_req_pages(idx, len(ids))
                runner.req_pool.free(idx)

    def flush_cache(self) -> bool:
        return self.scheduler.flush_cache()

    def collective_rpc(self, method: str, **kwargs):
        """Invoke a named method on the model runner (reference
        ``Engine.collective_rpc``, engine.py:567 — there a zmq RPC to
        every scheduler process; here JAX owns all local chips from one
        process, and multi-host followers replay through the step
        broadcast). Raises AttributeError for unknown methods."""
        fn = getattr(self.runner, method, None)
        if fn is None or not callable(fn):
            raise AttributeError(f"runner has no RPC method {method!r}")
        return fn(**kwargs)

    def save_sharded_model(self, path: str, **kwargs):
        return self.collective_rpc("save_sharded_model", path=path,
                                   **kwargs)

    def get_server_info(self) -> Dict[str, Any]:
        return {
            "model_path": self.server_args.model_path,
            "max_total_num_tokens": self.runner.max_total_tokens,
            "max_running_requests": self.runner.max_reqs,
            "version": __import__("sglang_fluentllm_tpu").__version__,
        }

    def shutdown(self):
        pool = getattr(self.scheduler, "_fetch_pool", None)
        if pool is not None:
            pool.shutdown(wait=False)
