"""Serving engine: continuous batching over the paged KV cache.

Capability successor of the reference's ``predict()`` loop
(model.cpp:142-187) — which serves exactly one request, sequentially —
extended to the BASELINE north star: admit/prefill/decode/finish scheduling
across request slots, paged KV with OOM→preempt (the continuous-batching
analog of the reference allocator's flush-and-retry, alloc.cpp:118-131),
multi-step decode bursts to amortize host dispatch, per-request sampling
and stop conditions, streaming detokenization, and engine metrics.
"""

from simplellminference_tpu.engine.engine import Engine  # noqa: F401
from simplellminference_tpu.engine.request import (  # noqa: F401
    Request,
    RequestState,
)
