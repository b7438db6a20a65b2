import numpy as np
import pytest

from sglang_fluentllm_tpu.mem import KVAllocator, RadixCache, ReqPool


def make_alloc(num_pages=16, page_size=4, max_reqs=8, max_ctx=64):
    return KVAllocator(num_pages, page_size, max_reqs, max_ctx)


class TestKVAllocator:
    def test_basic_extend(self):
        a = make_alloc()
        slots = a.alloc_extend(0, 0, 6)  # needs 2 pages
        assert slots is not None and len(slots) == 6
        # slot 0 is padding; all slots >= page_size
        assert (slots >= a.page_size).all()
        # consecutive within a page
        assert slots[1] == slots[0] + 1

    def test_partial_page_reuse(self):
        a = make_alloc()
        s1 = a.alloc_extend(0, 0, 6)
        before = a.available_pages()
        s2 = a.alloc_extend(0, 6, 2)  # fits in the partial page
        assert a.available_pages() == before
        assert s2[0] == s1[-1] + 1

    def test_oom_returns_none(self):
        a = make_alloc(num_pages=2, page_size=4)
        assert a.alloc_extend(0, 0, 8) is not None
        assert a.alloc_extend(1, 0, 1) is None

    def test_free_and_reuse(self):
        a = make_alloc(num_pages=4, page_size=4)
        a.alloc_extend(0, 0, 16)
        assert a.available_pages() == 0
        a.free_req_pages(0, total_len=16)
        assert a.available_pages() == 4

    def test_deferred_free_group(self):
        a = make_alloc(num_pages=4, page_size=4)
        a.alloc_extend(0, 0, 16)
        a.free_group_begin()
        a.free_req_pages(0, total_len=16)
        assert a.available_pages() == 0  # deferred
        a.free_group_end()
        assert a.available_pages() == 4

    def test_free_with_skip(self):
        a = make_alloc()
        a.alloc_extend(0, 0, 8)
        pages = a.req_pages(0, 8)
        a.free_req_pages(0, total_len=8, skip_pages=[int(pages[0])])
        # only the non-skipped page was freed
        assert a.available_pages() == a.num_pages - 1

    def test_token_slots_roundtrip(self):
        a = make_alloc()
        a.alloc_extend(0, 0, 10)
        slots = a.token_slots(0, 0, 10)
        pages = a.req_pages(0, 10)
        expect = []
        for pos in range(10):
            expect.append(pages[pos // 4] * 4 + pos % 4)
        assert (slots == np.array(expect)).all()

    def test_prefix_pages_install(self):
        a = make_alloc()
        a.alloc_extend(0, 0, 8)
        pages = [int(p) for p in a.req_pages(0, 8)]
        a.set_prefix_pages(1, pages)
        s0 = a.token_slots(0, 0, 8)
        s1 = a.token_slots(1, 0, 8)
        assert (s0 == s1).all()


class TestReqPool:
    def test_alloc_free(self):
        p = ReqPool(4)
        idxs = [p.alloc() for _ in range(4)]
        assert sorted(idxs) == [0, 1, 2, 3]
        assert p.alloc() is None
        p.free(idxs[0])
        assert p.alloc() == idxs[0]
