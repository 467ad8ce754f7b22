"""Engine observability: counters + structured event log.

SURVEY.md §5 "Metrics/observability": the reference has nothing beyond a
fatal LOG macro and raw std::cout token printing (base.h:6-10,
model.cpp:155-182). Here: counters the BASELINE metrics are computed from
(tokens/s, TTFT percentiles, batch occupancy, page utilization) plus an
optional structured event stream (admit/preempt/finish) for tracing.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import time
from typing import Optional

logger = logging.getLogger("simplellminference_tpu.engine")


@dataclasses.dataclass
class EngineMetrics:
    tokens_generated: int = 0
    prompt_tokens: int = 0
    requests_finished: int = 0
    requests_failed: int = 0
    requests_cancelled: int = 0
    preemptions: int = 0
    engine_steps: int = 0
    decode_bursts: int = 0
    prefills: int = 0
    prefix_cache_hits: int = 0
    prefix_cache_persistent_hits: int = 0  # hits from RETAINED (finished)
    prefix_cache_evictions: int = 0
    prompt_tokens_cached: int = 0  # prompt tokens served by shared pages
    spec_steps: int = 0            # speculative verify steps (active rows)
    spec_accepted: int = 0         # draft tokens accepted
    # guided decoding dispatch modes: pipelined fan-out bursts (unguided
    # co-tenants keep multi-step bursts) vs serialized masked steps
    guided_fanout_bursts: int = 0
    guided_serial_steps: int = 0
    # time integrals for occupancy/utilization averages
    busy_slot_steps: int = 0
    total_slot_steps: int = 0
    used_page_steps: int = 0
    total_page_steps: int = 0
    ttfts: list = dataclasses.field(default_factory=list)
    start_t: float = dataclasses.field(default_factory=time.perf_counter)

    def observe_step(self, busy_slots: int, total_slots: int,
                     used_pages: int, total_pages: int):
        self.engine_steps += 1
        self.busy_slot_steps += busy_slots
        self.total_slot_steps += total_slots
        self.used_page_steps += used_pages
        self.total_page_steps += total_pages

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.start_t

    @property
    def tokens_per_sec(self) -> float:
        return self.tokens_generated / max(self.elapsed, 1e-9)

    @property
    def batch_occupancy(self) -> float:
        return self.busy_slot_steps / max(self.total_slot_steps, 1)

    @property
    def page_utilization(self) -> float:
        return self.used_page_steps / max(self.total_page_steps, 1)

    def ttft_percentile(self, p: float) -> Optional[float]:
        if not self.ttfts:
            return None
        xs = sorted(self.ttfts)
        i = min(int(len(xs) * p), len(xs) - 1)
        return xs[i]

    def summary(self) -> dict:
        return {
            "tokens_generated": self.tokens_generated,
            "prompt_tokens": self.prompt_tokens,
            "requests_finished": self.requests_finished,
            "requests_failed": self.requests_failed,
            "requests_cancelled": self.requests_cancelled,
            "preemptions": self.preemptions,
            "engine_steps": self.engine_steps,
            "decode_bursts": self.decode_bursts,
            "prefills": self.prefills,
            "prefix_cache_hits": self.prefix_cache_hits,
            "prefix_cache_persistent_hits":
            self.prefix_cache_persistent_hits,
            "prefix_cache_evictions": self.prefix_cache_evictions,
            "prompt_tokens_cached": self.prompt_tokens_cached,
            "spec_steps": self.spec_steps,
            "spec_accepted": self.spec_accepted,
            "spec_acceptance_rate": round(
                self.spec_accepted / self.spec_steps, 3)
            if self.spec_steps else 0.0,
            "tokens_per_sec": round(self.tokens_per_sec, 2),
            "batch_occupancy": round(self.batch_occupancy, 4),
            "page_utilization": round(self.page_utilization, 4),
            "ttft_p50_s": self.ttft_percentile(0.5),
            "ttft_p99_s": self.ttft_percentile(0.99),
        }


def log_event(event: str, **fields):
    """Structured engine event (admit/preempt/finish/oom)."""
    if logger.isEnabledFor(logging.INFO):
        logger.info(json.dumps({"event": event, "t": time.time(), **fields}))
