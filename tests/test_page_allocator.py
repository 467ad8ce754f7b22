"""Property tests for the page allocator (SURVEY.md §4.5 — the paged
analog of the reference's pool invariants, alloc.cpp:73-201).

Every test runs against BOTH engines: the native C++ allocator and the
pure-Python fallback (identical semantics by contract); a final
cross-check drives both with one random op stream and diffs state.
"""

import numpy as np
import pytest

from simplellminference_tpu.memory.allocator import (NativePageAllocator,
                                                     PageAllocator,
                                                     PyPageAllocator)

IMPLS = [NativePageAllocator, PyPageAllocator]


@pytest.fixture(params=IMPLS, ids=["native", "python"])
def pa(request):
    return request.param(num_pages=32, page_size=16, max_seqs=4,
                         max_pages_per_seq=16)


def test_alloc_free_roundtrip(pa):
    assert pa.num_free == 32
    assert pa.alloc_seq(0, 40)          # 3 pages
    assert pa.num_free == 29
    assert pa.seq_len(0) == 40
    row = pa.row(0)
    assert (row[:3] >= 0).all() and (row[3:] == -1).all()
    assert len(set(row[:3].tolist())) == 3
    assert pa.free_seq(0) == 3
    assert pa.num_free == 32
    assert pa.seq_len(0) == -1


def test_extend_within_page_and_across(pa):
    assert pa.alloc_seq(1, 10)          # 1 page
    assert pa.extend(1, 16)             # still 1 page
    assert pa.num_free == 31
    assert pa.extend(1, 17)             # 2nd page
    assert pa.num_free == 30
    assert pa.seq_len(1) == 17


def test_oom_leaves_state_unchanged(pa):
    assert pa.alloc_seq(0, 16 * 16)     # 16 pages (per-seq max)
    assert pa.alloc_seq(1, 16 * 16)     # 16 more -> pool exhausted
    assert pa.num_free == 0
    assert not pa.alloc_seq(2, 1)       # OOM
    assert pa.seq_len(2) == -1
    assert not pa.extend(0, 16 * 16 + 1)  # over per-seq max
    assert pa.seq_len(0) == 16 * 16
    pa.free_seq(0)
    assert pa.num_free == 16
    assert not pa.extend(1, 16 * 16 + 1)  # per-seq cap even with free pages
    pa.free_seq(1)
    assert pa.num_free == 32


def test_double_alloc_and_bad_slot(pa):
    assert pa.alloc_seq(0, 5)
    assert not pa.alloc_seq(0, 5)       # slot busy
    assert not pa.alloc_seq(99, 5)      # out of range
    assert pa.free_seq(99) == -1


def test_prefix_sharing(pa):
    assert pa.alloc_seq(0, 33)          # 3 pages (partial last)
    # only FULL pages are shared: 33 -> 2 pages = 32 tokens
    assert pa.share_prefix(0, 1, 33) == 32
    assert pa.num_free == 29            # no new pages
    r0, r1 = pa.row(0), pa.row(1)
    assert (r0[:2] == r1[:2]).all() and r1[2] == -1
    assert pa.seq_len(1) == 32
    # dst grows with its OWN fresh pages beyond the shared prefix
    assert pa.extend(1, 40)
    r1 = pa.row(1)
    assert r1[2] >= 0 and r1[2] != r0[2]
    # freeing src releases only its exclusive (partial) page
    assert pa.free_seq(0) == 1
    assert pa.num_free == 29
    assert pa.free_seq(1) == 3          # 2 ex-shared + 1 own
    assert pa.num_free == 32
    # sub-page prefix: nothing shareable
    assert pa.alloc_seq(0, 33)
    assert pa.share_prefix(0, 1, 15) == 0
    # n_tokens caps the share
    assert pa.share_prefix(0, 1, 16) == 16
    assert pa.seq_len(1) == 16
    pa.free_seq(0), pa.free_seq(1)


def test_cow_last_page(pa):
    assert pa.alloc_seq(0, 32)          # 2 full pages
    assert pa.share_prefix(0, 1, 32) == 32
    r0 = pa.row(0)
    # both of seq 1's pages are shared: CoW must produce a fresh page
    newp = pa.cow_last_page(1)
    assert newp >= 0 and newp != r0[1]
    # seq 0's last page is exclusive again: CoW returns it unchanged
    assert pa.cow_last_page(0) == r0[1]
    assert pa.free_seq(0) == 1          # page 0 still shared with seq 1
    assert pa.free_seq(1) == 2          # ex-shared page 0 + the CoW page
    assert pa.num_free == 32


@pytest.mark.parametrize("impl", IMPLS, ids=["native", "python"])
def test_randomized_invariants(impl):
    rng = np.random.default_rng(0)
    pa = impl(num_pages=64, page_size=8, max_seqs=8,
              max_pages_per_seq=32)
    lens = {}
    for step in range(2000):
        slot = int(rng.integers(0, 8))
        if slot in lens:
            if rng.random() < 0.3:
                pa.free_seq(slot)
                del lens[slot]
            else:
                new_len = lens[slot] + int(rng.integers(0, 12))
                if pa.extend(slot, new_len):
                    lens[slot] = new_len
        else:
            t = int(rng.integers(1, 60))
            if pa.alloc_seq(slot, t):
                lens[slot] = t
        # invariant: free + sum(held pages) == total
        held = sum(-(-l // 8) for l in lens.values())
        assert pa.num_free + held == 64
        # invariant: no page in two tables (no sharing in this test)
        used = [p for s in lens for p in pa.row(s) if p >= 0]
        assert len(used) == len(set(used))


def test_prefix_detach_attach_release(pa):
    # slot 0 holds a 40-token sequence (3 pages of 16)
    assert pa.alloc_seq(0, 40)
    assert pa.num_free == 29
    h = pa.prefix_detach(0, 40)          # 2 FULL pages (32 tokens)
    assert h >= 0
    assert pa.prefix_tokens(h) == 32
    pa.free_seq(0)
    # the detached pages survive the slot free: only the partial page
    # returned to the pool
    assert pa.num_free == 30
    # attach into a fresh slot, full and partial
    assert pa.prefix_attach(h, 1, 32) == 32
    assert pa.seq_len(1) == 32
    assert pa.num_free == 30              # shared, no new pages
    assert pa.prefix_attach(h, 2, 17) == 16  # partial: one full page
    assert pa.seq_len(2) == 16
    # extend slot 1 past the shared prefix allocates fresh pages only
    assert pa.extend(1, 60)
    assert pa.num_free == 28
    pa.free_seq(1)
    pa.free_seq(2)
    assert pa.num_free == 30              # handle still pins its 2 pages
    assert pa.prefix_release(h) == 2
    assert pa.num_free == 32
    # dead handle rejects everything
    assert pa.prefix_tokens(h) == -1
    assert pa.prefix_attach(h, 3, 16) == -1
    assert pa.prefix_release(h) == -1


def test_prefix_detach_edge_cases(pa):
    assert pa.prefix_detach(0, 16) == -1     # slot not live
    assert pa.alloc_seq(0, 5)
    assert pa.prefix_detach(0, 5) == -1      # no full page to retain
    assert pa.extend(0, 16)
    h = pa.prefix_detach(0, 16)
    assert h >= 0 and pa.prefix_tokens(h) == 16
    # attach refuses a live destination slot
    assert pa.prefix_attach(h, 0, 16) == -1
    # attach with max_tokens below one page attaches nothing
    assert pa.prefix_attach(h, 1, 15) == 0
    assert pa.seq_len(1) == -1
    pa.free_seq(0)
    pa.prefix_release(h)
    assert pa.num_free == 32


def test_prefix_handle_slot_reuse(pa):
    """Released handle ids are recycled without cross-talk."""
    assert pa.alloc_seq(0, 32)
    h1 = pa.prefix_detach(0, 32)
    pa.prefix_release(h1)
    assert pa.alloc_seq(1, 16)
    h2 = pa.prefix_detach(1, 16)
    assert h2 == h1                       # recycled id
    assert pa.prefix_tokens(h2) == 16
    pa.free_seq(0)
    pa.free_seq(1)
    pa.prefix_release(h2)
    assert pa.num_free == 32


def test_native_and_python_lockstep():
    """One random op stream drives both engines; every observable
    (num_free, seq lens, rows, prefix handles, return values) must
    match at every step — the Python allocator is the executable spec
    the native one is held to."""
    rng = np.random.default_rng(7)
    kw = dict(num_pages=48, page_size=8, max_seqs=6, max_pages_per_seq=16)
    a, b = NativePageAllocator(**kw), PyPageAllocator(**kw)
    handles = []
    for step in range(3000):
        op = rng.integers(0, 8)
        slot = int(rng.integers(0, 6))
        if op == 0:
            t = int(rng.integers(0, 80))
            assert a.alloc_seq(slot, t) == b.alloc_seq(slot, t)
        elif op == 1:
            t = int(rng.integers(0, 100))
            assert a.extend(slot, t) == b.extend(slot, t)
        elif op == 2:
            assert a.free_seq(slot) == b.free_seq(slot)
        elif op == 3:
            dst = int(rng.integers(0, 6))
            t = int(rng.integers(0, 64))
            assert a.share_prefix(slot, dst, t) == \
                b.share_prefix(slot, dst, t)
        elif op == 4:
            t = int(rng.integers(0, 64))
            ha, hb = a.prefix_detach(slot, t), b.prefix_detach(slot, t)
            assert ha == hb
            if ha >= 0:
                handles.append(ha)
        elif op == 5 and handles:
            h = handles[int(rng.integers(0, len(handles)))]
            t = int(rng.integers(0, 64))
            assert a.prefix_attach(h, slot, t) == b.prefix_attach(h, slot, t)
        elif op == 6 and handles:
            i = int(rng.integers(0, len(handles)))
            h = handles.pop(i)
            assert a.prefix_release(h) == b.prefix_release(h)
        elif op == 7:
            assert a.cow_last_page(slot) == b.cow_last_page(slot)
        assert a.num_free == b.num_free, f"step {step}"
        for s in range(6):
            assert a.seq_len(s) == b.seq_len(s), f"step {step} slot {s}"
        np.testing.assert_array_equal(a.table(), b.table(),
                                      err_msg=f"step {step}")


def test_factory_fallback_env(monkeypatch):
    monkeypatch.setenv("SLI_PURE_PYTHON_ALLOCATOR", "1")
    pa = PageAllocator(num_pages=8, page_size=4, max_seqs=2,
                       max_pages_per_seq=4)
    assert isinstance(pa, PyPageAllocator)
    monkeypatch.delenv("SLI_PURE_PYTHON_ALLOCATOR")
    pa = PageAllocator(num_pages=8, page_size=4, max_seqs=2,
                       max_pages_per_seq=4)
    assert isinstance(pa, NativePageAllocator)
