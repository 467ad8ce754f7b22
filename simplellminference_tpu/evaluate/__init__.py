"""Evaluation harnesses (perplexity; BASELINE.json quality gate)."""

from simplellminference_tpu.evaluate.ppl import perplexity  # noqa: F401
