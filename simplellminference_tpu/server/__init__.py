"""HTTP serving layer (OpenAI-style completions API over the engine)."""

from simplellminference_tpu.server.app import build_app, serve  # noqa: F401
