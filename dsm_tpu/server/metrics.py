"""Prometheus metrics (reference: moshi-server/src/metrics.rs).

Family names, labels, and histogram buckets match the reference exactly —
``tests/test_protocol.py::test_metric_family_parity`` diffs the rendered
families against the committed ``REFERENCE_FAMILIES`` list below.  The
device-memory gauges are the TPU analogue of the reference NVML VRAM
gauges (same ``system_*_vram_bytes`` names).
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

# The complete reference family list (moshi-server/src/metrics.rs).  Names
# are as they appear in the prometheus text exposition; the parity test
# asserts every one of these is rendered by this module.
REFERENCE_FAMILIES = (
    # asr (metrics.rs:15-40)
    "asr_connect",
    "asr_model_step_duration",
    "asr_connection_num_steps",
    "asr_open_channels",
    # per-WS stream counters, MOSHI_STREAM_METRICS-gated (:59-92)
    "asr_ws_in_bytes_total",
    "asr_ws_in_messages_total",
    "asr_ws_out_bytes_total",
    "asr_ws_out_messages_total",
    "lm_ws_in_bytes_total",
    "lm_ws_in_messages_total",
    "lm_ws_out_bytes_total",
    "lm_ws_out_messages_total",
    "tts_ws_in_bytes_total",
    "tts_ws_in_messages_total",
    "tts_ws_out_bytes_total",
    "tts_ws_out_messages_total",
    # warmup (:100-115)
    "warmup_duration_seconds",
    "warmup_success_total",
    "warmup_failure_total",
    "warmup_skipped_total",
    # system (:125-132)
    "system_free_vram_bytes",
    "system_used_vram_bytes",
    "system_total_vram_bytes",
    "system_gpu_utilization_percent",
    # errors (:144-166)
    "ws_close_total",
    "connection_error_total",
    "auth_error_total",
    # lm (:193-232)
    "lm_step_duration_seconds",
    "lm_tokens_per_second",
    "lm_batch_utilization",
    "lm_queue_depth",
    "lm_steps_total",
    "lm_active_connections",
    # mimi (:248-288)
    "mimi_encode_duration_seconds",
    "mimi_decode_duration_seconds",
    "mimi_frames_encoded_total",
    "mimi_frames_decoded_total",
    "mimi_batch_encode_duration_seconds",
    "mimi_batch_decode_duration_seconds",
    # tts (:310-348)
    "tts_synthesis_duration_seconds",
    "tts_audio_duration_seconds_total",
    "tts_realtime_factor",
    "tts_active_requests",
    "tts_requests_total",
    "tts_vocoder_duration_seconds",
    # memory (:369-397)
    "memory_tensor_allocations_total",
    "memory_peak_vram_bytes",
    "memory_current_vram_bytes",
    "memory_gpu_bytes_allocated_total",
    "memory_gpu_bytes_deallocated_total",
    # pipeline (:418-458)
    "pipeline_stalls_total",
    "pipeline_overlap_efficiency",
    "pipeline_preprocess_duration_seconds",
    "pipeline_postprocess_duration_seconds",
    "pipeline_batch_duration_seconds",
    "pipeline_channel_queue_depth",
)


def _h(name, doc, buckets, labels=()):
    return Histogram(name, doc, labels, registry=REGISTRY, buckets=buckets)


# -- ASR (metrics.rs:15-40) --------------------------------------------------
# `asr_connect` is a bare-named counter in the reference; the python client
# appends `_total` to Counter names, so a Gauge carries the exact name.
ASR_CONNECT = Gauge("asr_connect", "ASR websocket connections", registry=REGISTRY)
ASR_MODEL_STEP_DURATION = _h(
    "asr_model_step_duration",
    "Batched ASR model step duration (s)",
    (20e-3, 30e-3, 40e-3, 50e-3, 60e-3, 70e-3, 80e-3),
)
ASR_STEPS_PER_CONNECTION = _h(
    "asr_connection_num_steps", "Model steps per connection",
    (2.0, 25.0, 125.0, 250.0, 500.0, 750.0, 1125.0, 1500.0, 2250.0, 3000.0, 4500.0),
)
ASR_OPEN_CHANNELS = Gauge(
    "asr_open_channels", "Active ASR channels", registry=REGISTRY
)

# -- LM (metrics.rs:193-232) -------------------------------------------------
LM_STEP_DURATION = _h(
    "lm_step_duration_seconds", "LM step duration (s)",
    (0.005, 0.010, 0.020, 0.030, 0.040, 0.050, 0.075, 0.100, 0.150, 0.200),
)
LM_TOKENS_PER_SECOND = Gauge(
    "lm_tokens_per_second", "Real-time LM token throughput", registry=REGISTRY
)
LM_BATCH_UTILIZATION = _h(
    "lm_batch_utilization", "Fraction of batch slots active",
    (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0),
)
LM_QUEUE_DEPTH = Gauge("lm_queue_depth", "Pending work items", registry=REGISTRY)
LM_STEPS_TOTAL = Counter(
    "lm_steps_total", "Total LM inference steps completed", registry=REGISTRY
)
LM_ACTIVE_CONNECTIONS = Gauge(
    "lm_active_connections", "Active LM connections", registry=REGISTRY
)

# -- Codec (metrics.rs:248-288) ----------------------------------------------
_MIMI_STEP_BUCKETS = (0.001, 0.002, 0.005, 0.010, 0.020, 0.030, 0.050, 0.075, 0.100)
_MIMI_BATCH_BUCKETS = (0.005, 0.010, 0.020, 0.030, 0.050, 0.075, 0.100, 0.150)
MIMI_ENCODE_DURATION = _h(
    "mimi_encode_duration_seconds", "Mimi encode step duration (s)",
    _MIMI_STEP_BUCKETS,
)
MIMI_DECODE_DURATION = _h(
    "mimi_decode_duration_seconds", "Mimi decode step duration (s)",
    _MIMI_STEP_BUCKETS,
)
MIMI_FRAMES_ENCODED = Counter(
    "mimi_frames_encoded_total", "Total audio frames encoded", registry=REGISTRY
)
MIMI_FRAMES_DECODED = Counter(
    "mimi_frames_decoded_total", "Total audio frames decoded", registry=REGISTRY
)
MIMI_BATCH_ENCODE_DURATION = _h(
    "mimi_batch_encode_duration_seconds", "Batched Mimi encode duration (s)",
    _MIMI_BATCH_BUCKETS,
)
MIMI_BATCH_DECODE_DURATION = _h(
    "mimi_batch_decode_duration_seconds", "Batched Mimi decode duration (s)",
    _MIMI_BATCH_BUCKETS,
)

# -- TTS (metrics.rs:310-348) ------------------------------------------------
TTS_SYNTHESIS_DURATION = _h(
    "tts_synthesis_duration_seconds", "TTS synthesis wall time (s)",
    (0.05, 0.1, 0.2, 0.3, 0.5, 0.75, 1.0, 1.5, 2.0, 3.0, 5.0),
)
TTS_AUDIO_DURATION = Counter(
    "tts_audio_duration_seconds_total", "Total audio seconds synthesised",
    registry=REGISTRY,
)
TTS_RTF = Gauge("tts_realtime_factor", "TTS real-time factor", registry=REGISTRY)
TTS_ACTIVE_REQUESTS = Gauge(
    "tts_active_requests", "In-flight TTS requests", registry=REGISTRY
)
TTS_REQUESTS_TOTAL = Counter(
    "tts_requests_total", "Total TTS synthesis requests completed",
    registry=REGISTRY,
)
TTS_VOCODER_DURATION = _h(
    "tts_vocoder_duration_seconds", "Vocoder (Mimi decode) duration (s)",
    (0.01, 0.02, 0.05, 0.1, 0.2, 0.3, 0.5, 0.75, 1.0),
)

# -- Warmup (metrics.rs:100-115; main.rs:1082-1146 counters) -------------------
WARMUP_DURATION = _h(
    "warmup_duration_seconds", "Module warmup duration (s)",
    (0.05, 0.1, 0.25, 0.5, 1.0, 2.0, 5.0, 10.0),
)
WARMUP_SUCCESS = Counter(
    "warmup_success_total", "Module warmups ok", registry=REGISTRY
)
WARMUP_FAILURE = Counter(
    "warmup_failure_total", "Module warmups failed", registry=REGISTRY
)
WARMUP_SKIPPED = Counter(
    "warmup_skipped_total", "Module warmups skipped", registry=REGISTRY
)

# -- Errors (metrics.rs:144-166) ----------------------------------------------
WS_CLOSE_ERRORS = Counter(
    "ws_close", "WS closes by code", ["code", "reason"], registry=REGISTRY
)
CONNECTION_ERRORS = Counter(
    "connection_error", "Connection level errors",
    ["error_type", "module"], registry=REGISTRY,
)
AUTH_ERRORS = Counter(
    "auth_error", "Auth failures by type", ["error_type"], registry=REGISTRY
)

# -- System / device memory (metrics.rs:125-132; TPU analogue of NVML) --------
DEVICE_MEM_FREE = Gauge(
    "system_free_vram_bytes", "Accelerator memory free", registry=REGISTRY
)
DEVICE_MEM_USED = Gauge(
    "system_used_vram_bytes", "Accelerator memory in use", registry=REGISTRY
)
DEVICE_MEM_TOTAL = Gauge(
    "system_total_vram_bytes", "Accelerator memory total", registry=REGISTRY
)
DEVICE_UTILIZATION = Gauge(
    "system_gpu_utilization_percent", "Accelerator duty-cycle estimate",
    registry=REGISTRY,
)

# -- Memory (metrics.rs:369-397) ----------------------------------------------
MEMORY_TENSOR_ALLOCATIONS = Counter(
    "memory_tensor_allocations", "Total tensor allocations", registry=REGISTRY
)
MEMORY_PEAK_VRAM = Gauge(
    "memory_peak_vram_bytes", "Peak accelerator memory", registry=REGISTRY
)
MEMORY_CURRENT_VRAM = Gauge(
    "memory_current_vram_bytes", "Current accelerator memory", registry=REGISTRY
)
MEMORY_BYTES_ALLOCATED = Counter(
    "memory_gpu_bytes_allocated", "Cumulative bytes allocated", registry=REGISTRY
)
MEMORY_BYTES_DEALLOCATED = Counter(
    "memory_gpu_bytes_deallocated", "Cumulative bytes freed", registry=REGISTRY
)

# -- Pipeline (metrics.rs:418-458) --------------------------------------------
PIPELINE_STALLS = Counter(
    "pipeline_stalls", "Total pipeline stall events", registry=REGISTRY
)
PIPELINE_OVERLAP_EFFICIENCY = _h(
    "pipeline_overlap_efficiency", "Mimi/LM overlap efficiency ratio",
    (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0),
)
PIPELINE_PREPROCESS_DURATION = _h(
    "pipeline_preprocess_duration_seconds", "Pre-processing stage duration (s)",
    (0.001, 0.002, 0.005, 0.010, 0.020, 0.030, 0.050),
)
PIPELINE_POSTPROCESS_DURATION = _h(
    "pipeline_postprocess_duration_seconds", "Post-processing stage duration (s)",
    (0.001, 0.002, 0.005, 0.010, 0.020, 0.030, 0.050),
)
PIPELINE_BATCH_DURATION = _h(
    "pipeline_batch_duration_seconds", "Full pipeline batch duration (s)",
    (0.010, 0.020, 0.030, 0.040, 0.050, 0.060, 0.080, 0.100, 0.150),
)
PIPELINE_CHANNEL_QUEUE_DEPTH = Gauge(
    "pipeline_channel_queue_depth", "Inter-stage channel queue depth",
    registry=REGISTRY,
)


def record_ws_close(code, reason: str = "") -> None:
    """metrics.rs record_ws_close — labels (code, reason category)."""
    from . import protocol as proto

    try:
        reason = reason or proto.CloseCode(int(code)).name.lower()
    except (ValueError, AttributeError):
        reason = reason or "unknown"
    WS_CLOSE_ERRORS.labels(code=str(int(code)), reason=reason).inc()


def record_connection_error(error_type: str, module: str) -> None:
    """metrics.rs record_connection_error — error_type in
    (capacity, timeout, protocol, internal)."""
    CONNECTION_ERRORS.labels(error_type=error_type, module=module).inc()


def record_auth_error(error_type: str) -> None:
    AUTH_ERRORS.labels(error_type=error_type).inc()


def stream_metrics_enabled() -> bool:
    """Per-WS byte counters are opt-in (metrics.rs:42-95)."""
    return os.environ.get("MOSHI_STREAM_METRICS", "") not in ("", "0", "false")


def _stream_counters(module: str):
    mk = lambda d, doc: Counter(  # noqa: E731
        f"{module}_ws_{d}", doc, registry=REGISTRY
    )
    return {
        "in_bytes": mk("in_bytes", f"Total {module} websocket bytes in"),
        "in_messages": mk("in_messages", f"Total {module} websocket messages in"),
        "out_bytes": mk("out_bytes", f"Total {module} websocket bytes out"),
        "out_messages": mk("out_messages", f"Total {module} websocket messages out"),
    }


# Exact per-module family names (asr_ws_in_bytes_total, ... metrics.rs:59-92).
_STREAM = {m: _stream_counters(m) for m in ("asr", "lm", "tts")}


def stream_in(module: str, nbytes: int) -> None:
    c = _STREAM.get(module)
    if c is not None:
        c["in_messages"].inc()
        c["in_bytes"].inc(nbytes)


def stream_out(module: str, nbytes: int) -> None:
    c = _STREAM.get(module)
    if c is not None:
        c["out_messages"].inc()
        c["out_bytes"].inc(nbytes)


def render() -> bytes:
    return generate_latest(REGISTRY)


def rendered_families() -> set:
    """Family names as they appear in the exposition text (counters get the
    `_total` suffix the python client appends)."""
    fams = set()
    for metric in REGISTRY.collect():
        if metric.type == "counter":
            fams.add(metric.name + "_total")
        else:
            fams.add(metric.name)
    return fams


def update_device_memory() -> None:
    """Background VRAM-gauge equivalent (main.rs:1311-1326) via jax."""
    try:
        import jax

        stats = jax.devices()[0].memory_stats() or {}
        used = stats.get("bytes_in_use")
        limit = stats.get("bytes_limit")
        if used is not None:
            DEVICE_MEM_USED.set(used)
            MEMORY_CURRENT_VRAM.set(used)
            if used > MEMORY_PEAK_VRAM._value.get():
                MEMORY_PEAK_VRAM.set(used)
        if limit is not None:
            DEVICE_MEM_TOTAL.set(limit)
            if used is not None:
                DEVICE_MEM_FREE.set(max(0, limit - used))
        peak = stats.get("peak_bytes_in_use")
        if peak is not None:
            MEMORY_PEAK_VRAM.set(max(peak, MEMORY_PEAK_VRAM._value.get()))
    except Exception:
        pass
