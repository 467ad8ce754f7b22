"""Memory layer: paged KV-cache allocator and device page pools.

Successor of the reference's L2 memory layer (mem::DeviceAllocator /
Buffer / Tensor / slice_KV_cache — SURVEY.md §2.2), rebuilt for TPU: device
memory is owned by XLA; what this layer manages is the *logical* paging of
the KV cache — native C++ bookkeeping (block tables, free lists, prefix
sharing) over a preallocated device page pool.
"""

from simplellminference_tpu.memory.allocator import PageAllocator  # noqa: F401
from simplellminference_tpu.memory.paged_kv import PagedKVCache  # noqa: F401
