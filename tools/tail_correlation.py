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
tail is the engine's.

Two caveats the fields encode:
  * the probe observes the tunnel only while its own dispatch is in
    flight (~rtt/period of wall time), so raw explained_frac UNDERCOUNTS
    stalls; ``env_frac_detection_adjusted`` divides by the per-stall
    detection probability and the top-level verdict uses it.
  * at batches whose natural cycle approaches the budget (B>=192: ~78 ms
    + 24 ms tunnel RTT), step-duration "lateness" is routine catch-up
    operation, not a defect — read the ``delivery`` section (client-clock
    late frames, v2 events) for the serving truth there.  Reference bar: the served-capacity claim at
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
    sus = summary
    for key in ("server_sustained", "tts_sustained", "duplex_sustained"):
        if key in summary:
            sus = summary[key]
            break
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
    late = [(w0, w1, ms) for w0, w1, ms in rows if ms > budget_ms]
    n_expl = sum(overlaps(w0, w1) for w0, w1, _ in late)
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
    # Detection probability: a probe samples the tunnel only while a
    # dispatch is in flight (~rtt per period), so a stall of length d
    # overlaps an in-flight probe with probability ~ (rtt + d) / period —
    # raw explained_frac systematically UNDERCOUNTS environmental stalls
    # (a 50 ms stall between two 5 Hz samples is invisible).  Under the
    # hypothesis "every late step is a stall of length (step - clean_p50)",
    # the expected number of *observed* overlaps is sum(p_i); the
    # environmental fraction estimate is observed/expected, with the
    # chance-overlap control subtracted from the observation.
    clean_p50 = clean_stats["step_ms_p50"] if clean_stats else budget_ms
    period_ms = period * 1e3
    det_ps = [
        min(1.0, (p50 + max(0.0, ms - clean_p50)) / period_ms)
        for _, _, ms in late
    ]
    chance = n_all_expl / max(1, len(rows))
    env_frac_est = None
    if late and sum(det_ps) > 0:
        env_frac_est = max(
            0.0, min(1.0, (n_expl - chance * len(late)) / sum(det_ps))
        )
    # Delivery-level correlation (the serving truth): rows that delivered
    # at least one client-clock-late frame (dlv_late, present when the
    # events were written by the v2 bench) vs the same stall windows.
    dlv = None
    d_rows = [(w0, w1, r.get("dlv_lag_max_ms", 0.0), r.get("dlv_late", 0))
              for (w0, w1, _), r in zip(rows, events) if "dlv_late" in r]
    if d_rows:
        d_late = [(w0, w1, lag) for w0, w1, lag, n in d_rows if n > 0]
        d_expl = sum(overlaps(w0, w1) for w0, w1, _ in d_late)
        d_ps = [min(1.0, (p50 + max(0.0, lag - 80.0)) / (period * 1e3))
                for _, _, lag in d_late]
        d_env = None
        if d_late and sum(d_ps) > 0:
            d_env = max(0.0, min(1.0, (
                d_expl - (n_all_expl / max(1, len(rows))) * len(d_late)
            ) / sum(d_ps)))
        dlv = {
            "n_steps_with_late_delivery": len(d_late),
            "n_explained": d_expl,
            "env_frac_detection_adjusted": (
                round(d_env, 4) if d_env is not None else None
            ),
            "verdict": (
                "clean" if not d_late else
                "environmental" if d_env is not None and d_env >= 0.8
                else "engine" if (d_env or 0.0) < 0.5 else "mixed"
            ),
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
        "chance_frac": round(chance, 4),
        # Mean probability a genuinely-environmental late step would have
        # been OBSERVED by the probe (in-flight overlap), and the
        # detection-adjusted environmental-fraction estimate.
        "detection_prob_mean": round(
            sum(det_ps) / len(det_ps), 4) if det_ps else None,
        "env_frac_detection_adjusted": (
            round(env_frac_est, 4) if env_frac_est is not None else None
        ),
        "delivery": dlv,
        "excluding_spikes": clean_stats,
        "verdict": (
            None if not late else
            "environmental" if env_frac_est is not None
            and env_frac_est >= 0.8
            and (n_expl / len(late)) >= 2 * max(0.01, chance)
            else "engine" if (env_frac_est or 0.0) < 0.5 else "mixed"
        ),
        "tool_version": 2,
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
    # Duplex --events files are a dict {"events": [...], "ticks": [...]};
    # the per-tick phase rows live under "ticks".
    if isinstance(events, dict):
        events = events.get("ticks") or events.get("events") or []
    # TTS/duplex event rows carry per-phase columns instead of step_ms;
    # synthesize the tick wall time so the same correlation applies
    # (budget for a fused TTS tick is fuse_ticks * 80 — pass --budget-ms).
    if events and "step_ms" not in events[0]:
        phase_keys = [k for k in ("gather_ms", "dispatch_ms", "fetch_ms",
                                  "post_ms") if k in events[0]]
        if phase_keys:
            for r in events:
                r["step_ms"] = sum(r.get(k, 0.0) for k in phase_keys)
    out = correlate(summary, events, args.budget_ms, args.spike_ms)
    json.dump(out, sys.stdout)
    print()


if __name__ == "__main__":
    main()
