"""Native (C++) host-side components, exposed via ctypes.

The reference implements its runtime in C++ (allocator alloc.cpp, buffer/
tensor, model driver); here the device path is XLA-compiled, and the native
layer covers what remains genuinely host-side: page-allocator bookkeeping
(paged_allocator.cpp — successor of the CUDA caching allocator) built as a
shared library on first use (no pybind11 in this image; C ABI + ctypes).
"""

from simplellminference_tpu.native.build import load_library  # noqa: F401
