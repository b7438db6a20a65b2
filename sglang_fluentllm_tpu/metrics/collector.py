"""Prometheus metrics.

Analog of the reference's ``srt/metrics/collector.py``
(``SchedulerMetricsCollector:163`` ~40 series, ``TokenizerMetricsCollector:613``
TTFT/e2e). Exposed at ``/metrics`` when ``--enable-metrics``.
"""

from __future__ import annotations

import time
from typing import Optional

from prometheus_client import (
    CollectorRegistry,
    Counter,
    Gauge,
    Histogram,
    generate_latest,
)

REGISTRY = CollectorRegistry()
_NS = "sglang_fluentllm_tpu"

# process-wide handle for subsystems (grammar backend, PD, hicache) that
# have no reference to the engine; set when the collector is constructed
ACTIVE: Optional["SchedulerMetricsCollector"] = None

LATENCY_BUCKETS = (
    0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0,
    30.0, 60.0, 120.0,
)


class SchedulerMetricsCollector:
    """Scheduler-side gauges/counters, labeled by model."""

    def __init__(self, model_name: str):
        labels = {"model_name": model_name}
        self._labels = labels

        def gauge(name, doc):
            return Gauge(f"{_NS}:{name}", doc, list(labels),
                         registry=REGISTRY)

        def counter(name, doc):
            return Counter(f"{_NS}:{name}", doc, list(labels),
                           registry=REGISTRY)

        self.num_running_reqs = gauge(
            "num_running_reqs", "Number of running requests")
        self.num_waiting_reqs = gauge(
            "num_queue_reqs", "Number of queued requests")
        self.token_usage = gauge(
            "token_usage", "Fraction of KV pool in use")
        self.cache_hit_rate = gauge(
            "cache_hit_rate", "Cumulative prefix-cache hit rate")
        self.gen_throughput = gauge(
            "gen_throughput", "Decode tokens/s (rolling)")
        self.spec_accept_length = gauge(
            "spec_accept_length", "Mean speculative accept length")
        self.num_generated_tokens = counter(
            "num_generated_tokens", "Generated tokens total")
        self.num_prompt_tokens = counter(
            "num_prompt_tokens", "Prefilled prompt tokens total")
        self.num_retracted_reqs = counter(
            "num_retracted_reqs", "Requests retracted on KV pressure")
        self.num_requests = counter(
            "num_requests", "Requests completed")
        self.num_aborted_requests = counter(
            "num_aborted_requests", "Requests aborted")
        # --- reference collector.py:195-330 additional series ---
        self.num_used_tokens = gauge(
            "num_used_tokens", "KV tokens in use")
        self.total_retracted_reqs = gauge(
            "total_retracted_reqs", "Cumulative retracted requests")
        self.num_paused_reqs = gauge(
            "num_paused_reqs", "Requests paused by /pause_generation")
        self.utilization = gauge(
            "utilization", "max(token usage, running/max_running)")
        self.engine_startup_time = gauge(
            "engine_startup_time", "Engine init wall time (s)")
        self.engine_load_weights_time = gauge(
            "engine_load_weights_time", "Weight load wall time (s)")
        self.queue_time = Histogram(
            f"{_NS}:queue_time_s",
            "Waiting-queue residency per request", list(labels),
            registry=REGISTRY, buckets=LATENCY_BUCKETS,
        )
        # --- PD disaggregation (reference collector.py:238-279) ---
        self.num_prefill_inflight_queue_reqs = gauge(
            "num_prefill_inflight_queue_reqs",
            "PD prefill: requests with transfers in flight")
        self.num_decode_transfer_queue_reqs = gauge(
            "num_decode_transfer_queue_reqs",
            "PD decode: requests awaiting KV transfer")
        self.num_decode_prealloc_queue_reqs = gauge(
            "num_decode_prealloc_queue_reqs",
            "PD decode: rooms registered but no chunk received yet")
        self.num_bootstrap_failed_reqs = counter(
            "num_bootstrap_failed_reqs_total", "PD bootstrap failures")
        self.num_transfer_failed_reqs = counter(
            "num_transfer_failed_reqs_total", "PD KV transfer failures")
        self.kv_transfer_speed_gb_s = gauge(
            "kv_transfer_speed_gb_s", "PD KV transfer throughput (GB/s)")
        self.kv_transfer_latency_ms = gauge(
            "kv_transfer_latency_ms", "PD KV transfer latency (ms)")
        # --- grammar / constrained decoding (collector.py:377-416) ---
        self.grammar_compilation_time = Histogram(
            f"{_NS}:grammar_compilation_time_seconds",
            "Grammar compile time", list(labels), registry=REGISTRY,
            buckets=LATENCY_BUCKETS,
        )
        self.num_grammar_cache_hit = counter(
            "num_grammar_cache_hit_total", "Grammar compile cache hits")
        self.num_grammar_total = counter(
            "num_grammar_total", "Grammar-constrained requests")
        self.num_grammar_aborted = counter(
            "num_grammar_aborted_total", "Grammar compile failures")
        # --- EP dispatch (DeepEP analog) ---
        self.ep_dropped_assignments = gauge(
            "ep_dropped_assignments",
            "Token-assignments dropped by the fixed-capacity EP dispatcher "
            "(non-zero => raise --ep-dispatch-capacity-factor)")
        # --- hicache (reference collector.py:888-939 StorageMetrics) ---
        self.hicache_host_hit_tokens = counter(
            "hicache_host_hit_tokens_total", "Host-tier KV tokens reused")
        self.hicache_writeback_tokens = counter(
            "hicache_writeback_tokens_total",
            "KV tokens written back to host tier")
        self.hicache_storage_hit_tokens = counter(
            "hicache_storage_hit_tokens_total",
            "KV tokens restored from the storage backend")
        self.hicache_prefetch_pages = Histogram(
            f"{_NS}:hicache_prefetch_pages",
            "Pages staged per host->device load", list(labels),
            registry=REGISTRY, buckets=(1, 2, 4, 8, 16, 32, 64, 128, 256),
        )
        self.hicache_backup_pages = Histogram(
            f"{_NS}:hicache_backup_pages",
            "Pages per write-back batch", list(labels),
            registry=REGISTRY, buckets=(1, 2, 4, 8, 16, 32, 64, 128, 256),
        )
        self.hicache_load_seconds = Histogram(
            f"{_NS}:hicache_load_seconds",
            "Host->device staging latency per load", list(labels),
            registry=REGISTRY, buckets=LATENCY_BUCKETS,
        )
        # --- speculative decoding -----------------------------------
        self.spec_accept_length_hist = Histogram(
            f"{_NS}:spec_accept_length_hist",
            "Per-window speculative accept length", list(labels),
            registry=REGISTRY,
            buckets=(1, 2, 3, 4, 5, 6, 8, 10, 12, 16),
        )
        # --- grammar queue / EPLB ------------------------------------
        self.grammar_queue_depth = gauge(
            "grammar_queue_depth",
            "Requests waiting on grammar compilation")
        self.eplb_rebalances = counter(
            "eplb_rebalances_total", "EPLB expert-relocation events")
        self.eplb_last_rebalance_ts = gauge(
            "eplb_last_rebalance_ts",
            "Unix time of the last EPLB rebalance")
        # --- per-stage request latency (collector.py:499-505) --------
        self.request_latency_seconds = Histogram(
            f"{_NS}:request_latency_seconds",
            "Latency of each request stage", list(labels) + ["stage"],
            registry=REGISTRY, buckets=LATENCY_BUCKETS,
        )
        # --- per-launch forward wall time by batch mode ---------------
        self.batch_forward_seconds = Histogram(
            f"{_NS}:batch_forward_seconds",
            "Launch-to-resolve wall time per forward batch",
            list(labels) + ["mode"], registry=REGISTRY,
            buckets=(0.001, 0.0025, 0.005, 0.01, 0.025, 0.05, 0.1,
                     0.25, 0.5, 1.0, 2.5, 5.0),
        )
        global ACTIVE
        ACTIVE = self

    def observe_stage(self, stage: str, seconds: float):
        self.request_latency_seconds.labels(
            **self._labels, stage=stage).observe(seconds)

    def observe_forward(self, mode: str, seconds: float):
        self.batch_forward_seconds.labels(
            **self._labels, mode=mode).observe(seconds)

    def observe(self, scheduler, runner):
        lb = self._labels
        self.num_running_reqs.labels(**lb).set(
            len(scheduler.running_batch))
        self.num_waiting_reqs.labels(**lb).set(
            len(scheduler.waiting_queue))
        total = max(1, runner.max_total_tokens)
        used = total - runner.allocator.available_tokens()
        self.token_usage.labels(**lb).set(used / total)
        self.num_used_tokens.labels(**lb).set(used)
        self.total_retracted_reqs.labels(**lb).set(
            scheduler.num_retracted)
        self.utilization.labels(**lb).set(max(
            used / total,
            len(scheduler.running_batch) / max(1, runner.max_reqs),
        ))
        if getattr(scheduler, "spec_accept_ct", 0) > 0:
            self.spec_accept_length.labels(**lb).set(
                scheduler.spec_accept_sum / scheduler.spec_accept_ct)
        hits = getattr(scheduler, "num_cached_prompt_tokens", None)
        tot = getattr(scheduler, "num_prompt_tokens_seen", None)
        if hits is not None and tot:
            self.cache_hit_rate.labels(**lb).set(hits / max(1, tot))
        ep_stats = getattr(runner, "ep_dispatch_stats", None)
        if ep_stats is not None:
            self.ep_dropped_assignments.labels(**lb).set(ep_stats.dropped)
        gq = getattr(scheduler, "grammar_waiting", None)
        if gq is None:
            gq = sum(
                1 for r in scheduler.waiting_queue
                if getattr(r, "grammar_future", None) is not None
            )
        self.grammar_queue_depth.labels(**lb).set(gq)

    def observe_pd(self, pd):
        """PD room-queue depths (reference prealloc/inflight/transfer
        gauges): rooms with no chunk received yet are 'prealloc', rooms
        mid-stream are 'transfer'/'inflight'."""
        lb = self._labels
        prealloc = transferring = 0
        for r in pd.rooms.values():
            if r.get("result") is not None:
                continue
            if r.get("chunks", 0) == 0:
                prealloc += 1
            else:
                transferring += 1
        if pd.mode == "prefill":
            self.num_prefill_inflight_queue_reqs.labels(**lb).set(
                prealloc + transferring)
        else:
            self.num_decode_prealloc_queue_reqs.labels(**lb).set(prealloc)
            self.num_decode_transfer_queue_reqs.labels(**lb).set(
                transferring)


class RequestMetricsCollector:
    """Request-side latency histograms (TokenizerMetricsCollector analog)."""

    def __init__(self, model_name: str):
        labels = {"model_name": model_name}
        self._labels = labels
        self.ttft = Histogram(
            f"{_NS}:time_to_first_token_seconds",
            "TTFT", list(labels), registry=REGISTRY,
            buckets=LATENCY_BUCKETS,
        )
        self.e2e = Histogram(
            f"{_NS}:e2e_request_latency_seconds",
            "End-to-end request latency", list(labels), registry=REGISTRY,
            buckets=LATENCY_BUCKETS,
        )
        self.itl = Histogram(
            f"{_NS}:inter_token_latency_seconds",
            "Inter-token latency", list(labels), registry=REGISTRY,
            buckets=(0.002, 0.005, 0.01, 0.02, 0.05, 0.1, 0.25, 0.5, 1.0),
        )
        self.tpot = Histogram(
            f"{_NS}:time_per_output_token_seconds",
            "Decode time per output token (excl. TTFT)", list(labels),
            registry=REGISTRY,
            buckets=(0.002, 0.005, 0.01, 0.02, 0.05, 0.1, 0.25, 0.5, 1.0),
        )
        self.prompt_tokens = Histogram(
            f"{_NS}:prompt_tokens",
            "Prompt length", list(labels), registry=REGISTRY,
            buckets=(16, 64, 256, 1024, 4096, 16384, 65536),
        )
        self.completion_tokens = Histogram(
            f"{_NS}:completion_tokens",
            "Completion length", list(labels), registry=REGISTRY,
            buckets=(1, 8, 32, 128, 512, 2048, 8192),
        )

    def observe_ttft(self, seconds: float):
        self.ttft.labels(**self._labels).observe(seconds)

    def observe_finish(self, e2e: float, prompt_tokens: int,
                       completion_tokens: int,
                       ttft: Optional[float] = None):
        lb = self._labels
        self.e2e.labels(**lb).observe(e2e)
        self.prompt_tokens.labels(**lb).observe(prompt_tokens)
        self.completion_tokens.labels(**lb).observe(completion_tokens)
        if completion_tokens > 1:
            self.itl.labels(**lb).observe(e2e / completion_tokens)
            if ttft is not None:
                self.tpot.labels(**lb).observe(
                    max(0.0, e2e - ttft) / (completion_tokens - 1))


def render_metrics() -> str:
    return generate_latest(REGISTRY).decode()
