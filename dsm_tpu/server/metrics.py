"""Prometheus metrics (reference: moshi-server/src/metrics.rs).

Same metric families: ASR connection/step/channel gauges with the 20-80 ms
step-duration buckets, per-WS byte/message counters gated by
``MOSHI_STREAM_METRICS``, warmup counters, error counters, TTS synthesis /
RTF, codec encode/decode timings, device memory gauges.
"""

from __future__ import annotations

import os

from prometheus_client import (
    CollectorRegistry,
    Counter,
    Gauge,
    Histogram,
    generate_latest,
)

REGISTRY = CollectorRegistry()


def _h(name, doc, buckets):
    return Histogram(name, doc, registry=REGISTRY, buckets=buckets)


# ASR (metrics.rs asr section; step buckets 20-80 ms :21-26)
ASR_CONNECT = Counter("asr_connect", "ASR websocket connections", registry=REGISTRY)
ASR_MODEL_STEP_DURATION = _h(
    "asr_model_step_duration",
    "Batched ASR model step duration (s)",
    (0.02, 0.03, 0.04, 0.05, 0.06, 0.07, 0.08),
)
ASR_OPEN_CHANNELS = Gauge(
    "asr_open_channels", "Active ASR channels", registry=REGISTRY
)
ASR_STEPS_PER_CONNECTION = _h(
    "asr_steps_per_connection", "Model steps per connection",
    (10, 50, 100, 500, 1000, 5000),
)

# LM
LM_STEP_DURATION = _h(
    "lm_step_duration", "LM step duration (s)",
    (0.005, 0.01, 0.02, 0.05, 0.1, 0.2),
)
LM_BATCH_UTILIZATION = Gauge(
    "lm_batch_utilization", "Fraction of batch slots active", registry=REGISTRY
)
LM_QUEUE_DEPTH = Gauge("lm_queue_depth", "Pending work items", registry=REGISTRY)

# Codec
MIMI_ENCODE_DURATION = _h(
    "mimi_encode_duration", "Mimi encode step duration (s)",
    (0.001, 0.005, 0.01, 0.02, 0.05, 0.1),
)
MIMI_DECODE_DURATION = _h(
    "mimi_decode_duration", "Mimi decode step duration (s)",
    (0.001, 0.005, 0.01, 0.02, 0.05, 0.1),
)

# TTS
TTS_SYNTHESIS_DURATION = _h(
    "tts_synthesis_duration", "TTS synthesis wall time (s)",
    (0.1, 0.5, 1, 2, 5, 10, 30),
)
TTS_RTF = Gauge("tts_rtf", "TTS real-time factor", registry=REGISTRY)

# Warmup (main.rs:1082-1146 counters)
WARMUP_SUCCESS = Counter("warmup_success", "Module warmups ok", registry=REGISTRY)
WARMUP_FAILURE = Counter("warmup_failure", "Module warmups failed", registry=REGISTRY)
WARMUP_SKIPPED = Counter("warmup_skipped", "Module warmups skipped", registry=REGISTRY)

# Errors
WS_CLOSE_ERRORS = Counter(
    "ws_close_errors", "WS closes by code", ["code"], registry=REGISTRY
)
CONNECTION_ERRORS = Counter(
    "connection_errors", "Connection level errors", registry=REGISTRY
)
AUTH_ERRORS = Counter(
    "auth_errors", "Auth failures by code", ["code"], registry=REGISTRY
)

# Device memory
DEVICE_MEM_USED = Gauge(
    "device_memory_used_bytes", "Accelerator memory in use", registry=REGISTRY
)
DEVICE_MEM_TOTAL = Gauge(
    "device_memory_total_bytes", "Accelerator memory total", registry=REGISTRY
)


def stream_metrics_enabled() -> bool:
    """Per-WS byte counters are opt-in (metrics.rs:42-95)."""
    return os.environ.get("MOSHI_STREAM_METRICS", "") not in ("", "0", "false")


STREAM_IN_BYTES = Counter(
    "ws_in_bytes", "WS bytes received", ["module"], registry=REGISTRY
)
STREAM_IN_MESSAGES = Counter(
    "ws_in_messages", "WS messages received", ["module"], registry=REGISTRY
)
STREAM_OUT_BYTES = Counter(
    "ws_out_bytes", "WS bytes sent", ["module"], registry=REGISTRY
)
STREAM_OUT_MESSAGES = Counter(
    "ws_out_messages", "WS messages sent", ["module"], registry=REGISTRY
)


def render() -> bytes:
    return generate_latest(REGISTRY)


def update_device_memory() -> None:
    """Background VRAM-gauge equivalent (main.rs:1311-1326) via jax."""
    try:
        import jax

        stats = jax.devices()[0].memory_stats() or {}
        if "bytes_in_use" in stats:
            DEVICE_MEM_USED.set(stats["bytes_in_use"])
        if "bytes_limit" in stats:
            DEVICE_MEM_TOTAL.set(stats["bytes_limit"])
    except Exception:
        pass
