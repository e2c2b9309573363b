"""tools/tail_correlation.py: late-step ↔ RTT-spike correlation.

The falsifiable environmental-attribution tool (VERDICT r4 #6).  These
tests pin the verdict logic on synthetic data — a tail fully inside
probe-observed stall windows must come out environmental; a tail with a
quiet probe must come out engine — and the TTS phase-row adaptation
(rows without ``step_ms``)."""

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "tail_correlation", os.path.join(REPO, "tools", "tail_correlation.py")
)
tc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(tc)


def _summary(samples, key="server_sustained", hz=5.0):
    return {key: {"rtt_probe": {
        "hz": hz, "n": len(samples), "p50_ms": 30.0, "p95_ms": 40.0,
        "max_ms": max(m for _, m in samples), "samples": samples,
    }}}


def test_tunnel_correlated_tail_is_environmental():
    # 100 steps at 80 ms cadence; probe quiet except one big stall window
    # around t=4.0 where the late steps sit.
    events = [{"t": 0.08 * (i + 1), "step_ms": 70.0} for i in range(100)]
    for i in (49, 50):
        events[i]["step_ms"] = 400.0
    samples = [[0.2 * j, 30.0] for j in range(50)]
    samples[20] = [4.0, 500.0]  # spike covering [4.0, 4.5]
    out = tc.correlate(_summary(samples), events, budget_ms=80.0,
                       spike_ms=40.0)
    assert out["n_late"] == 2
    assert out["n_late_explained"] == 2
    assert out["verdict"] in ("environmental", "mixed")
    assert out["excluding_spikes"]["late_frac"] == 0.0


def test_quiet_probe_tail_is_engine():
    events = [{"t": 0.08 * (i + 1), "step_ms": 70.0} for i in range(100)]
    for i in (10, 30, 60):
        events[i]["step_ms"] = 200.0
    samples = [[0.2 * j, 30.0] for j in range(50)]  # no spikes at all
    out = tc.correlate(_summary(samples), events, budget_ms=80.0,
                       spike_ms=40.0)
    assert out["n_spikes"] == 0
    assert out["n_late"] == 3
    assert out["n_late_explained"] == 0
    assert out["verdict"] == "engine"


def test_tts_phase_rows_and_key(tmp_path):
    """CLI path: a tts_sustained summary + phase-column events (no
    step_ms) — the tool synthesizes tick wall time and finds the
    gather-stall tick inside the spike window."""
    samples = [[0.2 * j, 30.0] for j in range(60)]
    samples[25] = [5.0, 1500.0]
    summary = _summary(samples, key="tts_sustained")
    events = [{"t": 0.32 * (i + 1), "gather_ms": 1.0, "dispatch_ms": 5.0,
               "fetch_ms": 300.0, "post_ms": 1.0} for i in range(30)]
    events[17]["gather_ms"] = 1600.0  # tick ending ~5.76, window covers 5.0+
    sp = tmp_path / "s.json"
    ep = tmp_path / "e.json"
    sp.write_text(json.dumps(summary))
    ep.write_text(json.dumps(events))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "tail_correlation.py"),
         str(sp), str(ep), "--budget-ms", "320"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout)
    assert out["n_late"] == 1
    assert out["n_late_explained"] == 1
