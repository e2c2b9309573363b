"""Correlate late engine steps with tunnel-RTT spikes (VERDICT r4 #6).

The sustained-bench claim since round 3 is that the residual latency tail
at B=128 is environmental (paired dev-tunnel stalls), not an engine
defect.  This tool makes that claim falsifiable: given a sustained-run
summary that carried the concurrent RTT probe (``DSM_RTT_PROBE_HZ``,
``rtt_probe.samples`` = [[t_rel, rtt_ms], ...]) and the per-step events
timeline (``--events`` output: rows with ``t`` = completion time and
``step_ms``), it computes

  * spike windows: probe samples whose RTT exceeds ``p50 + thresh`` —
    each covers [t, t + rtt] of wall time, padded by one probe period on
    the left (a stall that began between samples is observed by the next
    sample);
  * explained_frac: the fraction of LATE steps (> budget) whose execution
    window [t - step_ms, t] overlaps a spike window;
  * chance_frac (the control): the same overlap fraction over ALL steps.

If explained_frac >> chance_frac the tail is tunnel-correlated; if the
two are comparable the "environmental" attribution is refuted and the
tail is the engine's.  Reference bar: the served-capacity claim at
/root/reference/README.md:62-63 and the 80 ms top latency bucket in
moshi-server/src/metrics.rs:21-26.

Usage:
  python tools/tail_correlation.py SUMMARY.json EVENTS.json \
      [--budget-ms 80] [--spike-ms 40] > OUT.json
"""

from __future__ import annotations

import argparse
import json
import sys


def correlate(summary: dict, events: list, budget_ms: float,
              spike_ms: float, pad_s: float = 0.05) -> dict:
    sus = summary.get("server_sustained", summary)
    probe = sus.get("rtt_probe")
    if not probe or not probe.get("samples"):
        raise SystemExit("summary has no rtt_probe.samples — run the leg "
                         "with DSM_RTT_PROBE_HZ set")
    samples = probe["samples"]
    p50 = probe["p50_ms"]
    thresh = p50 + spike_ms
    period = 1.0 / probe["hz"] if probe.get("hz") else 0.25
    # A spiking sample observed a stall somewhere in [t, t + rtt]; the
    # stall may have begun up to one probe period before t.
    spikes = [(t - period, t + ms / 1e3) for t, ms in samples if ms > thresh]

    def overlaps(w0: float, w1: float) -> bool:
        return any(s0 - pad_s <= w1 and s1 + pad_s >= w0 for s0, s1 in spikes)

    rows = [(r["t"] - r["step_ms"] / 1e3, r["t"], r["step_ms"])
            for r in events]
    late = [(w0, w1) for w0, w1, ms in rows if ms > budget_ms]
    n_expl = sum(overlaps(w0, w1) for w0, w1 in late)
    n_all_expl = sum(overlaps(w0, w1) for w0, w1, _ in rows)
    spike_time = sum(s1 - s0 for s0, s1 in spikes)
    wall = max((t for t, _ in samples), default=0.0) or 1.0
    # Environment-subtracted SLO view: the steps whose execution window
    # never overlaps a probe-observed stall — what the engine delivers
    # when the tunnel behaves (a production local-PJRT host).  Reported
    # alongside, never instead of, the raw numbers.
    clean = [ms for w0, w1, ms in rows if not overlaps(w0, w1)]
    clean_stats = None
    if clean:
        clean_arr = sorted(clean)

        def pct(p):
            return clean_arr[
                min(len(clean_arr) - 1, int(p / 100 * len(clean_arr)))
            ]

        clean_stats = {
            "n_steps": len(clean),
            "late_frac": round(
                sum(ms > budget_ms for ms in clean) / len(clean), 4
            ),
            "step_ms_p50": round(pct(50), 1),
            "step_ms_p95": round(pct(95), 1),
            "step_ms_p99": round(pct(99), 1),
        }
    return {
        "budget_ms": budget_ms,
        "probe_hz": probe.get("hz"),
        "probe_p50_ms": p50,
        "spike_thresh_ms": round(thresh, 1),
        "n_probe_samples": len(samples),
        "n_spikes": len(spikes),
        "spike_time_frac": round(spike_time / wall, 4),
        "n_steps": len(rows),
        "n_late": len(late),
        "late_frac": round(len(late) / max(1, len(rows)), 4),
        "n_late_explained": n_expl,
        "explained_frac": round(n_expl / len(late), 4) if late else None,
        # Control: overlap frequency over ALL steps.  explained_frac well
        # above this = the tail is tunnel-correlated.
        "chance_frac": round(n_all_expl / max(1, len(rows)), 4),
        "excluding_spikes": clean_stats,
        "verdict": (
            None if not late else
            "environmental" if n_expl / len(late) >= 0.8
            and n_expl / len(late) >= 2 * max(0.01, n_all_expl / len(rows))
            else "engine" if n_expl / len(late) < 0.5 else "mixed"
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("summary")
    ap.add_argument("events")
    ap.add_argument("--budget-ms", type=float, default=80.0)
    ap.add_argument("--spike-ms", type=float, default=40.0,
                    help="spike = probe RTT above p50 by this many ms")
    args = ap.parse_args()
    with open(args.summary) as f:
        summary = json.load(f)
    with open(args.events) as f:
        events = json.load(f)
    out = correlate(summary, events, args.budget_ms, args.spike_ms)
    json.dump(out, sys.stdout)
    print()


if __name__ == "__main__":
    main()
