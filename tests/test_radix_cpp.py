"""Native C++ radix tree: equivalence vs the python implementation.

Builds the extension if missing, then fuzzes both implementations with the
same operation stream and requires identical observable behavior.
"""

import os
import random
import subprocess
import sys

import pytest

from tests.server_utils import REPO_ROOT


def _ensure_built():
    from sglang_fluentllm_tpu.mem.radix_cache_cpp import native_available

    if native_available():
        return True
    r = subprocess.run(
        [sys.executable, "setup.py", "build_ext", "--inplace"],
        cwd=REPO_ROOT, capture_output=True, text=True, timeout=300,
    )
    if r.returncode != 0:
        pytest.skip(f"native build failed: {r.stderr[-500:]}")
    import importlib

    import sglang_fluentllm_tpu

    importlib.invalidate_caches()
    from sglang_fluentllm_tpu.mem.radix_cache_cpp import native_available

    return native_available()


@pytest.fixture(scope="module")
def cpp_cache_cls():
    assert _ensure_built()
    from sglang_fluentllm_tpu.mem.radix_cache_cpp import RadixCacheCpp

    return RadixCacheCpp


PS = 4


def seq(n, start=0):
    return list(range(start, start + n))


class TestCppBasics:
    def test_insert_match(self, cpp_cache_cls):
        rc = cpp_cache_cls(page_size=PS)
        rc.insert(seq(8), [10, 11])
        m = rc.match_prefix(seq(8))
        assert m.prefix_len == 8 and m.page_ids == [10, 11]
        m = rc.match_prefix(seq(7))
        assert m.prefix_len == 4 and m.page_ids == [10]

    def test_split_and_dup(self, cpp_cache_cls):
        rc = cpp_cache_cls(page_size=PS)
        rc.insert(seq(12), [10, 11, 12])
        other = seq(8) + [100, 101, 102, 103]
        rc.insert(other, [10, 11, 20])
        assert rc.match_prefix(seq(12)).page_ids == [10, 11, 12]
        assert rc.match_prefix(other).page_ids == [10, 11, 20]
        dup = rc.insert(seq(12), [30, 31, 32])
        assert dup == 12

    def test_lock_and_evict(self, cpp_cache_cls):
        rc = cpp_cache_cls(page_size=PS)
        rc.insert(seq(8), [10, 11])
        m = rc.match_prefix(seq(8))
        rc.inc_lock_ref(m.last_node)
        assert rc.protected_size == 8
        freed = []
        rc.evict(10, lambda p: freed.extend(p))
        assert freed == []
        rc.dec_lock_ref(m.last_node)
        rc.evict(10, lambda p: freed.extend(p))
        assert sorted(freed) == [10, 11]
        assert rc.evictable_size == 0

    def test_evict_token_paths(self, cpp_cache_cls):
        rc = cpp_cache_cls(page_size=PS)
        rc.insert(seq(8), [1, 2])
        evicted = []
        rc.evict(2, lambda p: None,
                 on_evict=lambda toks, pages: evicted.append((toks, pages)))
        assert evicted == [(seq(8), [1, 2])]


class TestEquivalenceFuzz:
    def test_fuzz_vs_python(self, cpp_cache_cls):
        from sglang_fluentllm_tpu.mem.radix_cache import RadixCache

        rng = random.Random(0)
        py = RadixCache(page_size=PS)
        cpp = cpp_cache_cls(page_size=PS)
        next_page = [1]

        def rand_seq():
            # shared prefixes by construction
            base = rng.choice([seq(8), seq(12), seq(8, 100), seq(16)])
            extra = [rng.randrange(200, 260) for _ in
                     range(rng.choice([0, 4, 8]))]
            return base + extra

        for step in range(300):
            op = rng.random()
            ids = rand_seq()
            if op < 0.5:
                n_pages = len(ids) // PS
                pages = list(range(next_page[0], next_page[0] + n_pages))
                next_page[0] += n_pages
                d1 = py.insert(ids, pages)
                d2 = cpp.insert(ids, list(pages))
                assert d1 == d2, f"step {step}: dup {d1} != {d2}"
            elif op < 0.9:
                m1 = py.match_prefix(ids)
                m2 = cpp.match_prefix(ids)
                assert m1.prefix_len == m2.prefix_len, f"step {step}"
                assert m1.page_ids == m2.page_ids, f"step {step}"
            else:
                f1, f2 = [], []
                py.evict(2, lambda p: f1.extend(p))
                cpp.evict(2, lambda p: f2.extend(p))
                assert sorted(f1) == sorted(f2), f"step {step}"
            assert py.evictable_size == cpp.evictable_size, f"step {step}"


class TestEngineWithNativeRadix:
    def test_engine_native_matches_python(self, cpp_cache_cls):
        from tests.utils import tiny_engine

        sp = {"max_new_tokens": 8, "temperature": 0.0}
        prompt = [3, 11, 42, 7, 19, 88]
        e_py = tiny_engine(disable_native_radix=True)
        ref = e_py.generate(input_ids=prompt, sampling_params=sp)
        e_cpp = tiny_engine()
        from sglang_fluentllm_tpu.mem.radix_cache_cpp import RadixCacheCpp

        assert isinstance(e_cpp.scheduler.tree_cache, RadixCacheCpp)
        out = e_cpp.generate(input_ids=prompt, sampling_params=sp)
        assert out["output_ids"] == ref["output_ids"]
        out2 = e_cpp.generate(
            input_ids=prompt + [1, 2], sampling_params=sp)
        assert out2["meta_info"]["cached_tokens"] >= 4
