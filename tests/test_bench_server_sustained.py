"""bench_perf.bench_server_sustained drives a real engine and dumps the
engine-step timeline (the moshi-backend benchmark pattern,
moshi-backend/src/benchmark.rs:57-138) — covered here at tiny shapes via
the injectable-engine hook so no flagship compile is needed."""

import json
import sys

from dsm_tpu import bench_perf
from tests.test_batched_engine import small_engine


def test_server_sustained_events_timeline(tmp_path):
    eng, cfg = small_engine(batch=2)
    out = tmp_path / "events.json"
    res = bench_perf.bench_server_sustained(
        2, 1.5, events_out=str(out), engine=eng, cfg=cfg
    )
    assert res["batch"] == 2
    assert res["engine_steps"] > 0
    assert res["markers_completed"] == 2
    events = json.loads(out.read_text())
    # One timeline entry per observed engine step, rebased on engine start.
    assert len(events) == res["engine_steps"]
    # Each step carries the host-phase split (queue/fetch/post) used for
    # sustained-tail attribution (VERDICT r4 #6).
    assert all(
        {"t", "step_ms", "util", "queue_ms", "fetch_ms", "post_ms"} <= set(e)
        for e in events
    )
    # ... and the per-step worst client-clock delivery lag (v2 events) so
    # tail_correlation can correlate delivery-late steps with stalls.
    dlv_rows = [e for e in events if "dlv_lag_max_ms" in e]
    assert dlv_rows, "no step carried a delivery lag"
    assert all(e["dlv_late"] >= 0 for e in dlv_rows)
    ts = [e["t"] for e in events]
    assert ts == sorted(ts)
    assert 0 <= ts[0] < 5.0  # rebased: starts near 0, not at warmup offset
    assert all(e["step_ms"] > 0 for e in events)
    assert all(e["fetch_ms"] >= 0 for e in events)
    # SLO gating components are reported separately from throughput.
    assert {"throughput_ok", "slo_ok", "realtime_ok", "delivery"} <= set(res)
    # realtime_ok gates on the client-clock delivery SLO (catch-up bursts
    # are on-time there even when step durations exceed the budget).
    assert res["realtime_ok"] == (
        res["throughput_ok"] and res["delivery"]["slo_ok"]
    )
    assert res["delivery"]["frames"] > 0
    assert res["delivery"]["lag_ms_p99"] >= res["delivery"]["lag_ms_p50"]


def test_server_sustained_rtt_probe_and_correlation(tmp_path, monkeypatch):
    """DSM_RTT_PROBE_HZ samples an independent null-dispatch RTT during
    the run; tools/tail_correlation.py consumes it with the events file
    (the VERDICT r4 #6 falsifiability artifact)."""
    monkeypatch.setenv("DSM_RTT_PROBE_HZ", "20")
    eng, cfg = small_engine(batch=2)
    out = tmp_path / "events.json"
    res = bench_perf.bench_server_sustained(
        2, 1.5, events_out=str(out), engine=eng, cfg=cfg
    )
    probe = res["rtt_probe"]
    assert probe["hz"] == 20.0
    assert probe["n"] == len(probe["samples"]) > 5
    # Samples are (t_rel, rtt_ms), rebased on engine start like events.
    # (ms rounds to 0.0 for sub-50 us CPU dispatches.)
    assert all(ms >= 0 for _, ms in probe["samples"])
    assert [t for t, _ in probe["samples"]] == sorted(
        t for t, _ in probe["samples"]
    )

    sys.path.insert(0, "tools")
    try:
        from tail_correlation import correlate
    finally:
        sys.path.pop(0)
    events = json.loads(out.read_text())
    corr = correlate({"server_sustained": res}, events,
                     budget_ms=80.0, spike_ms=40.0)
    assert corr["n_steps"] == len(events)
    assert corr["n_late_explained"] <= corr["n_late"]
    assert 0.0 <= corr["chance_frac"] <= 1.0
