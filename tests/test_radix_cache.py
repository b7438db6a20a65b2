from sglang_fluentllm_tpu.mem import KVAllocator, RadixCache


PS = 4


def seq(n, start=0):
    return list(range(start, start + n))


class TestRadixCache:
    def test_insert_and_match(self):
        rc = RadixCache(page_size=PS)
        ids = seq(8)
        rc.insert(ids, [10, 11])
        m = rc.match_prefix(ids)
        assert m.prefix_len == 8
        assert m.page_ids == [10, 11]

    def test_match_is_page_aligned(self):
        rc = RadixCache(page_size=PS)
        rc.insert(seq(8), [10, 11])
        m = rc.match_prefix(seq(7))  # only one full page matches
        assert m.prefix_len == 4
        assert m.page_ids == [10]

    def test_partial_node_split(self):
        rc = RadixCache(page_size=PS)
        rc.insert(seq(12), [10, 11, 12])
        # diverging suffix after 8 tokens
        other = seq(8) + [100, 101, 102, 103]
        rc.insert(other, [10, 11, 20])
        m1 = rc.match_prefix(seq(12))
        m2 = rc.match_prefix(other)
        assert m1.prefix_len == 12 and m1.page_ids == [10, 11, 12]
        assert m2.prefix_len == 12 and m2.page_ids == [10, 11, 20]

    def test_insert_dup_detection(self):
        rc = RadixCache(page_size=PS)
        rc.insert(seq(8), [10, 11])
        # same prefix written again with fresh pages 30,31 -> 8 dup tokens
        dup = rc.insert(seq(12), [30, 31, 12])
        assert dup == 8
        # tree keeps the original pages
        m = rc.match_prefix(seq(12))
        assert m.page_ids == [10, 11, 12]

    def test_lock_protects_from_eviction(self):
        rc = RadixCache(page_size=PS)
        rc.insert(seq(8), [10, 11])
        m = rc.match_prefix(seq(8))
        rc.inc_lock_ref(m.last_node)
        assert rc.protected_size == 8
        freed = []
        rc.evict(10, lambda pages: freed.extend(pages))
        assert freed == []
        rc.dec_lock_ref(m.last_node)
        rc.evict(10, lambda pages: freed.extend(pages))
        assert sorted(freed) == [10, 11]

    def test_evict_lru_order(self):
        rc = RadixCache(page_size=PS)
        rc.insert(seq(4), [10])
        rc.insert(seq(4, start=100), [11])
        rc.match_prefix(seq(4))  # touch first -> second is LRU
        freed = []
        rc.evict(1, lambda pages: freed.extend(pages))
        assert freed == [11]

    def test_evictable_size_tracking(self):
        rc = RadixCache(page_size=PS)
        rc.insert(seq(16), [1, 2, 3, 4])
        assert rc.evictable_size == 16
        # eviction is leaf-node granular: the single 4-page leaf goes at once
        rc.evict(2, lambda pages: None)
        assert rc.evictable_size == 0

    def test_disable(self):
        rc = RadixCache(page_size=PS, disable=True)
        assert rc.insert(seq(8), [1, 2]) == 0
        assert rc.match_prefix(seq(8)).prefix_len == 0

    def test_integration_with_allocator(self):
        """Finished request caching flow: insert + free duplicate pages."""
        alloc = KVAllocator(num_pages=32, page_size=PS, max_reqs=4,
                            max_context_len=64)
        rc = RadixCache(page_size=PS)
        # req 0 prefills 8 tokens
        ids = seq(8)
        alloc.alloc_extend(0, 0, 8)
        pages0 = [int(p) for p in alloc.req_pages(0, 8)]
        dup = rc.insert(ids, pages0)
        assert dup == 0
        # req 1 with same prefix: match, install, extend
        m = rc.match_prefix(ids + [200, 201])
        assert m.prefix_len == 8 and m.page_ids == pages0
        alloc.set_prefix_pages(1, m.page_ids)
        alloc.alloc_extend(1, 8, 2)
        # on finish, req1 inserts; its first 8-token pages are dups of tree's
        pages1 = [int(p) for p in alloc.req_pages(1, 10)]
        dup = rc.insert(seq(8) + [200, 201], pages1)
        assert dup == 8
        # free the request's pages, skipping tree-owned ones
        tree_pages = rc.match_prefix(seq(8) + [200, 201]).page_ids
        before = alloc.available_pages()
        alloc.free_req_pages(1, total_len=10, skip_pages=tree_pages)
        # pages 0..1 were shared with req0/tree (skipped); the partial third
        # page (tokens 8..9) is not cacheable and gets freed
        assert alloc.available_pages() == before + 1
