"""ByteLRU — the shared byte-budgeted cache behind the fragment caches."""

import threading

import numpy as np

from gmf_tpu.utils.lru import ByteLRU


def test_hit_miss_and_eviction():
    lru = ByteLRU(100)
    builds = []

    def make(key, nbytes):
        def build():
            builds.append(key)
            return f"v{key}", nbytes
        return build

    assert lru.get("a", make("a", 40)) == "va"
    assert lru.get("a", make("a", 40)) == "va"  # hit, no rebuild
    assert builds == ["a"] and lru.hits == 1 and lru.misses == 1
    lru.get("b", make("b", 40))
    lru.get("c", make("c", 40))  # 120 bytes > 100 -> evict LRU "a"
    assert "a" not in lru and "b" in lru and "c" in lru
    assert lru.nbytes == 80
    # rebuilding "a" evicts "b" (now least recent)
    lru.get("a", make("a", 40))
    assert "b" not in lru


def test_keeps_one_entry_over_budget():
    lru = ByteLRU(10)
    lru.get("big", lambda: ("x", 1000))
    assert len(lru) == 1  # a single over-budget entry is kept


def test_disabled_budget_builds_every_time():
    lru = ByteLRU(0)
    n = [0]

    def build():
        n[0] += 1
        return n[0], 8

    assert lru.get("k", build) == 1
    assert lru.get("k", build) == 2  # no caching
    assert len(lru) == 0


def test_reset():
    lru = ByteLRU(100)
    lru.get("a", lambda: (1, 10))
    lru.get("a", lambda: (1, 10))
    lru.reset()
    assert len(lru) == 0 and lru.nbytes == 0
    assert lru.hits == 0 and lru.misses == 0


def test_concurrent_builders_converge_to_first_insert():
    lru = ByteLRU(1 << 20)
    barrier = threading.Barrier(4)
    results = []

    def worker(i):
        def build():
            barrier.wait()  # all four miss together
            return ("val", i), 8

        results.append(lru.get("k", build))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # every caller got the SAME entry (first insert wins)
    assert len({id(r) for r in results}) == 1
    assert len(lru) == 1 and lru.nbytes == 8


def test_array_entries_byte_accounting():
    lru = ByteLRU(2 * 4000)
    a = np.zeros(1000, np.float32)

    def build(arr):
        return lambda: (arr, arr.nbytes)

    lru.get("a", build(a))
    assert lru.nbytes == 4000
    lru.get("b", build(np.zeros(1000, np.float32)))
    lru.get("c", build(np.zeros(1000, np.float32)))
    assert lru.nbytes == 8000 and len(lru) == 2
