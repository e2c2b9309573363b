"""bench_perf.bench_tts_sustained / _late_tick_attribution: the sustained
TTS bench drives a real engine (injectable, tiny shapes) and reports the
per-tick phase timeline + late-tick attribution used for tail analysis
(the moshi-backend benchmark pattern, moshi-backend/src/benchmark.rs:57-138,
extended to name the phase carrying any >budget tick)."""

import json

from dsm_tpu import bench_perf
from tests.test_tts_batched import make_engine


def test_late_tick_attribution_names_the_stalling_phase():
    PH = ("gather_ms", "fetch_ms")
    rows = [{"t": i * 0.08, "gather_ms": 1.0, "fetch_ms": 10.0}
            for i in range(20)]
    # Two late ticks, both stalled in fetch.
    rows[5]["fetch_ms"] = 300.0
    rows[11]["fetch_ms"] = 200.0
    att = bench_perf._late_tick_attribution(rows, PH, budget_ms=80.0)
    assert att["n_late"] == 2
    assert att["late_frac"] == 0.1
    assert att["late_excess_ms"]["fetch_ms"] > 100
    assert att["late_excess_ms"]["gather_ms"] == 0.0
    assert len(att["worst"]) == 2
    assert att["worst"][0]["fetch_ms"] == 300.0


def test_late_tick_attribution_no_late():
    att = bench_perf._late_tick_attribution(
        [{"gather_ms": 1.0}], ("gather_ms",), budget_ms=80.0
    )
    assert att["n_late"] == 0
    att = bench_perf._late_tick_attribution([], ("gather_ms",), 80.0)
    assert att is None


def test_tts_sustained_injectable_engine(tmp_path):
    eng, cfg = make_engine(batch=2)
    out = tmp_path / "tts_events.json"
    res = bench_perf.bench_tts_sustained(
        2, 2.0, engine=eng, n_words=3, drain_s=30.0, events_out=str(out)
    )
    assert res["sessions_completed"] >= 1
    assert res["tick_phase_ms_p50"] is not None
    assert res["late_tick_attribution"] is not None
    events = json.loads(out.read_text())
    assert len(events) > 0
    assert set(events[0]) == {"t", "gather_ms", "dispatch_ms", "fetch_ms",
                              "post_ms"}
    ts = [e["t"] for e in events]
    assert ts == sorted(ts)


def test_tts_sustained_rtt_probe(monkeypatch):
    """DSM_RTT_PROBE_HZ samples null-dispatch RTT throughout the TTS run
    (tick-stall attribution needs tunnel evidence: the B=64 gather-phase
    p99 stall reproduced unchanged under gc.freeze)."""
    monkeypatch.setenv("DSM_RTT_PROBE_HZ", "20")
    eng, cfg = make_engine(batch=2)
    res = bench_perf.bench_tts_sustained(
        2, 1.5, engine=eng, n_words=3, drain_s=30.0
    )
    pr = res.get("rtt_probe")
    assert pr is not None and pr["n"] > 0
    assert pr["hz"] == 20.0
    # Sample offsets share the tick-phase origin (correlatable).
    assert all(isinstance(s, list) and len(s) == 2 for s in pr["samples"])
