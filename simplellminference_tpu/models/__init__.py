"""Model graphs as pure functions over params pytrees.

Successor of the reference's L5 hand-written interpreter
(``LlamaModel::forward``, model.cpp:40-140) — here the graph is a traced
function compiled once by XLA, with layers stacked and scanned via
``lax.scan`` for O(1) compile cost in depth.
"""

from simplellminference_tpu.models import llama  # noqa: F401
from simplellminference_tpu.models.registry import get_model_family  # noqa: F401
