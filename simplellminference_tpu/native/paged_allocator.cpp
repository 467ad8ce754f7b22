// Paged KV-cache block allocator — host-side bookkeeping in C++.
//
// Native successor of the reference's CUDA caching allocator
// (mem::CUDADeviceAllocator, alloc.cpp:73-201): where that manages byte
// ranges inside cudaMalloc slabs with best-fit + coalescing, this manages
// fixed-size KV pages inside a preallocated device pool (pages live in
// jit-donated JAX buffers; only the BOOKKEEPING is host-side). The
// reference's flush-and-retry OOM policy (alloc.cpp:118-131) maps to the
// engine's preempt-and-requeue (engine/scheduler.py).
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).
//
// Model:
//   - num_pages fixed-size pages, free LIFO stack (hot pages stay hot).
//   - per-sequence page lists appended as the sequence grows.
//   - block_table: int32 [max_seqs, max_pages_per_seq], -1 = unmapped;
//     callers snapshot rows to device for the paged attention kernels.
//   - ref-counted pages: prefix sharing / copy-on-write beam search can
//     share pages between sequences (share_prefix()).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <new>
#include <vector>

namespace {

// A detached, refcounted page list living OUTSIDE any sequence slot —
// the substrate of the persistent prefix cache: the engine detaches a
// finished request's prompt pages into a handle (pages stay resident),
// attaches them into future slots with matching prompts, and releases
// handles under pool pressure (LRU policy lives in Python; this is pure
// refcount bookkeeping).
struct PrefixEntry {
  std::vector<int32_t> pages;
  int32_t tokens = 0;  // == pages.size() * page_size (full pages only)
  bool live = false;
};

struct Allocator {
  int32_t num_pages = 0;
  int32_t page_size = 0;
  int32_t max_seqs = 0;
  int32_t max_pages_per_seq = 0;

  std::vector<int32_t> free_stack;   // LIFO of free page ids
  std::vector<int32_t> ref_count;    // per page
  std::vector<int32_t> block_table;  // [max_seqs, max_pages_per_seq]
  std::vector<int32_t> seq_len;      // tokens per sequence slot (-1 = free)
  std::vector<PrefixEntry> prefixes; // detached prefix handles
  std::mutex mu;

  int32_t* row(int32_t seq) { return block_table.data() + (size_t)seq * max_pages_per_seq; }

  int32_t pages_for(int32_t tokens) const {
    return (tokens + page_size - 1) / page_size;
  }
};

}  // namespace

extern "C" {

void* pa_create(int32_t num_pages, int32_t page_size, int32_t max_seqs,
                int32_t max_pages_per_seq) {
  auto* a = new (std::nothrow) Allocator();
  if (!a) return nullptr;
  a->num_pages = num_pages;
  a->page_size = page_size;
  a->max_seqs = max_seqs;
  a->max_pages_per_seq = max_pages_per_seq;
  a->free_stack.reserve(num_pages);
  for (int32_t p = num_pages - 1; p >= 0; --p) a->free_stack.push_back(p);
  a->ref_count.assign(num_pages, 0);
  a->block_table.assign((size_t)max_seqs * max_pages_per_seq, -1);
  a->seq_len.assign(max_seqs, -1);
  return a;
}

void pa_destroy(void* h) { delete static_cast<Allocator*>(h); }

int32_t pa_num_free(void* h) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  return (int32_t)a->free_stack.size();
}

int32_t pa_seq_len(void* h, int32_t seq) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  if (seq < 0 || seq >= a->max_seqs) return -1;
  return a->seq_len[seq];
}

// Allocate a fresh sequence of `tokens` tokens in slot `seq`.
// Returns number of pages allocated, or -1 on OOM / bad args (state
// unchanged on failure — the engine then preempts or queues).
int32_t pa_alloc_seq(void* h, int32_t seq, int32_t tokens) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  if (seq < 0 || seq >= a->max_seqs || a->seq_len[seq] != -1 || tokens < 0)
    return -1;
  int32_t need = a->pages_for(tokens);
  if (need > a->max_pages_per_seq) return -1;
  if ((size_t)need > a->free_stack.size()) return -1;
  int32_t* r = a->row(seq);
  for (int32_t i = 0; i < need; ++i) {
    int32_t p = a->free_stack.back();
    a->free_stack.pop_back();
    a->ref_count[p] = 1;
    r[i] = p;
  }
  a->seq_len[seq] = tokens;
  return need;
}

// Grow slot `seq` to `new_len` tokens, allocating pages as needed.
// Returns pages newly allocated (>= 0), or -1 on OOM (state unchanged).
int32_t pa_extend(void* h, int32_t seq, int32_t new_len) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  if (seq < 0 || seq >= a->max_seqs || a->seq_len[seq] < 0 ||
      new_len < a->seq_len[seq])
    return -1;
  int32_t have = a->pages_for(a->seq_len[seq]);
  int32_t need = a->pages_for(new_len);
  if (need > a->max_pages_per_seq) return -1;
  int32_t extra = need - have;
  if ((size_t)extra > a->free_stack.size()) return -1;
  int32_t* r = a->row(seq);
  for (int32_t i = 0; i < extra; ++i) {
    int32_t p = a->free_stack.back();
    a->free_stack.pop_back();
    a->ref_count[p] = 1;
    r[have + i] = p;
  }
  a->seq_len[seq] = new_len;
  return extra;
}

// Release all pages of slot `seq` (refcount-aware). Returns pages freed.
int32_t pa_free_seq(void* h, int32_t seq) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  if (seq < 0 || seq >= a->max_seqs || a->seq_len[seq] < 0) return -1;
  int32_t have = a->pages_for(a->seq_len[seq]);
  int32_t* r = a->row(seq);
  int32_t freed = 0;
  for (int32_t i = 0; i < have; ++i) {
    int32_t p = r[i];
    if (p >= 0 && --a->ref_count[p] == 0) {
      a->free_stack.push_back(p);
      ++freed;
    }
    r[i] = -1;
  }
  a->seq_len[seq] = -1;
  return freed;
}

// Share the first floor(min(n_tokens, seq_len[src]) / page_size) FULL
// pages of `src` into the FRESH slot `dst` (refcount++, zero copies).
// Only whole pages are shared, so neither sequence ever writes a shared
// page (each writes at positions >= its own prompt >= the shared prefix);
// partial-page sharing would need pa_cow_last_page. dst's seq_len becomes
// the shared token count — callers pa_extend() for the remainder.
// Returns tokens shared (a multiple of page_size; 0 = nothing to share),
// or -1 on bad args.
int32_t pa_share_prefix(void* h, int32_t src, int32_t dst,
                        int32_t n_tokens) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  if (src < 0 || src >= a->max_seqs || a->seq_len[src] < 0) return -1;
  if (dst < 0 || dst >= a->max_seqs || a->seq_len[dst] != -1) return -1;
  if (n_tokens < 0) return -1;
  int32_t tok = n_tokens < a->seq_len[src] ? n_tokens : a->seq_len[src];
  int32_t pages = tok / a->page_size;  // FULL pages only
  if (pages <= 0) return 0;
  int32_t* rs = a->row(src);
  int32_t* rd = a->row(dst);
  for (int32_t i = 0; i < pages; ++i) {
    rd[i] = rs[i];
    ++a->ref_count[rs[i]];
  }
  a->seq_len[dst] = pages * a->page_size;
  return pages * a->page_size;
}

// ---- persistent prefix cache (detached refcounted page lists) ----

// Detach the first floor(min(n_tokens, seq_len[seq]) / page_size) FULL
// pages of live slot `seq` into a standalone handle (refcount++ on each
// page — they survive pa_free_seq of the slot). Returns a handle id
// >= 0, 0-token requests return -1 (nothing to retain), bad args -1.
int32_t pa_prefix_detach(void* h, int32_t seq, int32_t n_tokens) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  if (seq < 0 || seq >= a->max_seqs || a->seq_len[seq] < 0) return -1;
  int32_t tok = n_tokens < a->seq_len[seq] ? n_tokens : a->seq_len[seq];
  int32_t pages = tok / a->page_size;  // FULL pages only
  if (pages <= 0) return -1;
  // reuse a dead handle slot if any
  size_t id = a->prefixes.size();
  for (size_t i = 0; i < a->prefixes.size(); ++i)
    if (!a->prefixes[i].live) { id = i; break; }
  if (id == a->prefixes.size()) a->prefixes.emplace_back();
  PrefixEntry& e = a->prefixes[id];
  e.pages.assign(a->row(seq), a->row(seq) + pages);
  e.tokens = pages * a->page_size;
  e.live = true;
  for (int32_t p : e.pages) ++a->ref_count[p];
  return (int32_t)id;
}

// Tokens covered by a live handle (-1 if dead/bad).
int32_t pa_prefix_tokens(void* h, int32_t handle) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  if (handle < 0 || (size_t)handle >= a->prefixes.size() ||
      !a->prefixes[handle].live)
    return -1;
  return a->prefixes[handle].tokens;
}

// Share the first floor(min(max_tokens, e.tokens) / page_size) pages of
// a handle into the FRESH slot `dst` (refcount++, zero copies) — the
// detached-handle analog of pa_share_prefix. Partial attaches let an
// exactly-page-aligned recurring prompt reuse all but its last page (one
// token must always re-prefill to produce logits). dst's seq_len becomes
// the attached token count; callers pa_extend() for the remainder.
// Returns tokens shared (0 = nothing attachable), or -1 on bad args.
int32_t pa_prefix_attach(void* h, int32_t handle, int32_t dst,
                         int32_t max_tokens) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  if (handle < 0 || (size_t)handle >= a->prefixes.size() ||
      !a->prefixes[handle].live)
    return -1;
  if (dst < 0 || dst >= a->max_seqs || a->seq_len[dst] != -1) return -1;
  if (max_tokens < 0) return -1;
  PrefixEntry& e = a->prefixes[handle];
  int32_t tok = max_tokens < e.tokens ? max_tokens : e.tokens;
  int32_t pages = tok / a->page_size;
  if (pages <= 0) return 0;
  if (pages > a->max_pages_per_seq) return -1;
  int32_t* rd = a->row(dst);
  for (int32_t i = 0; i < pages; ++i) {
    rd[i] = e.pages[i];
    ++a->ref_count[e.pages[i]];
  }
  a->seq_len[dst] = pages * a->page_size;
  return pages * a->page_size;
}

// Release a handle: refcount-- its pages (pages whose count hits zero
// return to the pool). Returns pages freed to the pool, or -1.
int32_t pa_prefix_release(void* h, int32_t handle) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  if (handle < 0 || (size_t)handle >= a->prefixes.size() ||
      !a->prefixes[handle].live)
    return -1;
  PrefixEntry& e = a->prefixes[handle];
  int32_t freed = 0;
  for (int32_t p : e.pages)
    if (--a->ref_count[p] == 0) {
      a->free_stack.push_back(p);
      ++freed;
    }
  e.pages.clear();
  e.tokens = 0;
  e.live = false;
  return freed;
}

// Copy-on-write the last page of `seq` if shared. Returns the NEW page id
// (caller must device-copy old->new), the EXISTING id if not shared, or
// -1 on OOM.
int32_t pa_cow_last_page(void* h, int32_t seq) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  if (seq < 0 || seq >= a->max_seqs || a->seq_len[seq] <= 0) return -1;
  int32_t last = a->pages_for(a->seq_len[seq]) - 1;
  int32_t* r = a->row(seq);
  int32_t p = r[last];
  if (a->ref_count[p] == 1) return p;
  if (a->free_stack.empty()) return -1;
  int32_t np = a->free_stack.back();
  a->free_stack.pop_back();
  a->ref_count[np] = 1;
  --a->ref_count[p];
  r[last] = np;
  return np;
}

// Copy this slot's block-table row into out[max_pages_per_seq].
// Out-of-range slots fill with -1 (unmapped) instead of reading OOB.
void pa_get_row(void* h, int32_t seq, int32_t* out) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  if (seq < 0 || seq >= a->max_seqs) {
    for (int32_t i = 0; i < a->max_pages_per_seq; ++i) out[i] = -1;
    return;
  }
  std::memcpy(out, a->row(seq), sizeof(int32_t) * a->max_pages_per_seq);
}

// Bulk view: copy the whole block table into out[max_seqs*max_pages_per_seq].
void pa_get_table(void* h, int32_t* out) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  std::memcpy(out, a->block_table.data(),
              sizeof(int32_t) * a->block_table.size());
}

}  // extern "C"
