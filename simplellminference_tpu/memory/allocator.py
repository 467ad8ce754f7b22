"""ctypes binding for the native paged allocator (native/paged_allocator.cpp).

API mirrors what the engine needs: slot-oriented alloc/extend/free with
OOM signalling (None/False returns — the engine preempts; compare the
reference's flush-and-retry-then-abort, alloc.cpp:118-131, and its fatal
LOG() policy we deliberately do not replicate, base.h:6-10).
"""

from __future__ import annotations

import ctypes

import numpy as np

from simplellminference_tpu.native import load_library


class PageAllocator:
    def __init__(self, num_pages: int, page_size: int, max_seqs: int,
                 max_pages_per_seq: int):
        self._lib = load_library("paged_allocator")
        lib = self._lib
        lib.pa_create.restype = ctypes.c_void_p
        lib.pa_create.argtypes = [ctypes.c_int32] * 4
        for fn, args in [
            ("pa_destroy", [ctypes.c_void_p]),
            ("pa_num_free", [ctypes.c_void_p]),
            ("pa_seq_len", [ctypes.c_void_p, ctypes.c_int32]),
            ("pa_alloc_seq", [ctypes.c_void_p, ctypes.c_int32,
                              ctypes.c_int32]),
            ("pa_extend", [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32]),
            ("pa_free_seq", [ctypes.c_void_p, ctypes.c_int32]),
            ("pa_share_prefix", [ctypes.c_void_p, ctypes.c_int32,
                                 ctypes.c_int32, ctypes.c_int32]),
            ("pa_prefix_detach", [ctypes.c_void_p, ctypes.c_int32,
                                  ctypes.c_int32]),
            ("pa_prefix_tokens", [ctypes.c_void_p, ctypes.c_int32]),
            ("pa_prefix_attach", [ctypes.c_void_p, ctypes.c_int32,
                                  ctypes.c_int32, ctypes.c_int32]),
            ("pa_prefix_release", [ctypes.c_void_p, ctypes.c_int32]),
            ("pa_cow_last_page", [ctypes.c_void_p, ctypes.c_int32]),
            ("pa_get_row", [ctypes.c_void_p, ctypes.c_int32,
                            ctypes.POINTER(ctypes.c_int32)]),
            ("pa_get_table", [ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_int32)]),
        ]:
            getattr(lib, fn).argtypes = args
            if fn != "pa_destroy" and "get" not in fn:
                getattr(lib, fn).restype = ctypes.c_int32

        self.num_pages = num_pages
        self.page_size = page_size
        self.max_seqs = max_seqs
        self.max_pages_per_seq = max_pages_per_seq
        self._h = lib.pa_create(num_pages, page_size, max_seqs,
                                max_pages_per_seq)
        if not self._h:
            raise MemoryError("pa_create failed")

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.pa_destroy(h)
            self._h = None

    @property
    def num_free(self) -> int:
        return self._lib.pa_num_free(self._h)

    def seq_len(self, slot: int) -> int:
        return self._lib.pa_seq_len(self._h, slot)

    def alloc_seq(self, slot: int, tokens: int) -> bool:
        return self._lib.pa_alloc_seq(self._h, slot, tokens) >= 0

    def extend(self, slot: int, new_len: int) -> bool:
        return self._lib.pa_extend(self._h, slot, new_len) >= 0

    def free_seq(self, slot: int) -> int:
        return self._lib.pa_free_seq(self._h, slot)

    def share_prefix(self, src: int, dst: int, n_tokens: int) -> int:
        """Share src's first full pages covering <= n_tokens into the
        FRESH slot dst (refcounted, zero-copy). Returns tokens shared
        (multiple of page_size; 0 = none), -1 on bad args."""
        return self._lib.pa_share_prefix(self._h, src, dst, n_tokens)

    def prefix_detach(self, slot: int, n_tokens: int) -> int:
        """Detach slot's first full pages covering <= n_tokens into a
        standalone refcounted handle (pages survive free_seq of the
        slot). Returns handle id >= 0, or -1 (nothing to retain)."""
        return self._lib.pa_prefix_detach(self._h, slot, n_tokens)

    def prefix_tokens(self, handle: int) -> int:
        return self._lib.pa_prefix_tokens(self._h, handle)

    def prefix_attach(self, handle: int, dst: int,
                      max_tokens: int) -> int:
        """Share a detached handle's first full pages covering
        <= max_tokens into FRESH slot dst. Returns tokens shared
        (multiple of page_size; 0 = nothing attachable), or -1."""
        return self._lib.pa_prefix_attach(self._h, handle, dst, max_tokens)

    def prefix_release(self, handle: int) -> int:
        """Drop a handle; pages whose refcount hits 0 return to the pool.
        Returns pages freed."""
        return self._lib.pa_prefix_release(self._h, handle)

    def cow_last_page(self, slot: int) -> int:
        return self._lib.pa_cow_last_page(self._h, slot)

    def row(self, slot: int) -> np.ndarray:
        out = np.full(self.max_pages_per_seq, -1, np.int32)
        self._lib.pa_get_row(
            self._h, slot, out.ctypes.data_as(
                ctypes.POINTER(ctypes.c_int32)))
        return out

    def table(self) -> np.ndarray:
        out = np.full((self.max_seqs, self.max_pages_per_seq), -1, np.int32)
        self._lib.pa_get_table(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out

    def pages_for(self, tokens: int) -> int:
        return -(-tokens // self.page_size)
