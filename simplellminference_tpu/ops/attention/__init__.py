"""Attention kernels: flash prefill, (paged) flash decode, dense reference.

Successor of the reference's 3-kernel CUDA MHA pipeline
(score → safe-softmax → score·V, mha_kernel.cu:63-130) and its serial CPU
twin (mha_kernel.cpp:36-77). The TPU design never materializes [S, S]:
online-softmax blockwise kernels (flash) tiled to the MXU, with GQA handled
by head-group mapping (reference: mha.cpp:23).
"""
