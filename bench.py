"""Headline benchmark: real-time STT streams per chip (stt-1b batched ASR).

Runs the full production step — Mimi encode (SeaNet + codec transformer +
RVQ) -> delayed-streams LM (d=2048/16L, context 750, 32 codebooks) ->
semantic-VAD heads -> text sampling -> slot bookkeeping — as one jitted
program at the production batch size, and reports how many real-time streams
one chip sustains at the 80 ms frame cadence.

Baseline: the reference claims 400 real-time streams on an H100
(README.md:62-63) and 64 streams at 3x real-time on an L40S.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def bench_asr(batch: int, fused_steps: int = 25, reps: int = 4):
    """Measure the per-frame device time of the full production step.

    ``fused_steps`` consecutive frames run inside one jitted lax.scan so the
    measurement is pure device throughput — this dev environment reaches the
    chip through a network tunnel whose per-dispatch latency (~50-80 ms)
    would otherwise swamp the numbers; a production host dispatches locally
    and pipelines ahead of the 80 ms cadence.
    """
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__ as ge
    from dsm_tpu.sessions import asr

    # Serving profile: int8 KV rings (halves the dominant attention reads),
    # int8 LM weights consumed by W8A8 dynamic-activation MXU dots (no
    # bf16 dequant materialisation), bf16 codec.  DSM_W8A8=0 opts out.
    os.environ.setdefault("DSM_W8A8", "1")
    kv_bits = int(os.environ.get("DSM_KV_BITS", "8"))
    cfg, fn, (params, state, pcm, mask, reset, rng) = ge._asr_setup(
        batch, jnp.bfloat16, jnp.bfloat16, kv_quant=True,
        mimi_dtype="bfloat16", kv_bits=kv_bits,
    )
    from dsm_tpu.ops import transformer as T

    params = dict(params)
    params["lm"] = T.quantize_weights(params["lm"])
    # Real audio-like input (zeros would underutilise RVQ argmin paths).
    pcm = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((batch, 1, cfg.mimi.frame_size))
        .astype(np.float32)
        * 0.1
    )

    def multi(params, state, pcm, mask, reset, rng):
        def body(carry, _):
            st, r = carry
            r, r2 = jax.random.split(r)
            out, st = asr.step(cfg, params, st, pcm, mask, reset, r2)
            return (st, r), out["text_token"]

        (st, _), toks = jax.lax.scan(
            body, (state, rng), None, length=fused_steps
        )
        return toks, st

    step = jax.jit(multi, donate_argnums=(1,))
    toks, state = step(params, state, pcm, mask, reset, rng)
    np.asarray(toks)  # force

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        toks, state = step(params, state, pcm, mask, reset, rng)
        np.asarray(toks)
        times.append((time.perf_counter() - t0) / fused_steps)
    return np.asarray(times)


def _served_slo_summary():
    """Largest engine-sustained batch whose per-frame client-clock delivery
    passes the 80 ms-cadence SLO (bench_perf --server-sustained artifacts,
    docs/SUSTAINED_r05_*).  The headline above is device throughput; this is
    the honest *served* capacity — concurrent SLO-passing sessions per chip,
    bounded by the 16 GiB HBM state ceiling rather than compute."""
    import glob

    root = os.path.dirname(os.path.abspath(__file__))
    best, legs = None, []
    for path in sorted(glob.glob(os.path.join(root, "docs", "SUSTAINED_r05_b*.json"))):
        if path.endswith("_events.json"):
            continue
        try:
            with open(path) as f:
                d = json.load(f)["server_sustained"]
            dv = d["delivery"]
        except Exception:
            continue
        if dv.get("lag_def") == "v2":
            leg = {
                "batch": d["batch"],
                "lag_def": "v2",
                "delivery_slo_ok": bool(dv["slo_ok"]),
                "delivery_late_frac": dv["late_frac"],
                "delivery_lag_ms_p99": dv["lag_ms_p99"],
            }
        else:
            # v1 artifacts computed due as (idx+1)*80 with a post-increment
            # idx — exactly 80 ms optimistic per frame.  The constant shift
            # makes them exactly adjudicable: v2-pass <=> v1 p99 <= 0
            # (then <=1% of frames exceed the corrected budget and the
            # corrected p99 is <= 80 ms).
            leg = {
                "batch": d["batch"],
                "lag_def": "v1+80ms-corrected",
                "delivery_slo_ok": bool(dv["lag_ms_p99"] <= 0.0),
                "delivery_lag_ms_p99": round(dv["lag_ms_p99"] + 80.0, 1),
            }
        legs.append(leg)
    if not legs:
        return None
    # Majority rule per batch: the tunnel has multi-second stall windows,
    # so single runs swing either way — a batch counts as served when most
    # of its runs pass.
    by_batch = {}
    for leg in legs:
        by_batch.setdefault(leg["batch"], []).append(leg)
    best = None
    for b in sorted(by_batch, reverse=True):
        runs = by_batch[b]
        n_pass = sum(l["delivery_slo_ok"] for l in runs)
        if n_pass * 2 > len(runs):
            best = {"batch": b, "runs_pass": n_pass, "runs_total": len(runs)}
            break
    return {
        "served_streams": best["batch"] if best else 0,
        "best_leg": best,
        "legs": legs,
        "note": "45 s engine-sustained runs at the 80 ms client cadence; "
                "delivery = per-frame lateness vs the client clock "
                "(negative lag = delivered ahead of deadline)",
    }


def main():
    from dsm_tpu.utils.compile_cache import enable_if_tpu

    enable_if_tpu()
    # Donation note: earlier rounds measured this environment's compile
    # path ignoring buffer donation (KV rings double-buffered, capping the
    # batch at 128).  Re-probed in round 4: donation IS honoured now —
    # B=192/224 execute (single-buffered state ~12.6 GB + weights at 224),
    # B=256 OOMs as the single-buffer arithmetic predicts
    # (docs/PERFORMANCE.md).  224 is the measured single-chip ceiling.
    batch = int(os.environ.get("BENCH_BATCH", "224"))
    reps = int(os.environ.get("BENCH_REPS", "8"))
    times = bench_asr(batch, reps=reps)
    p50 = float(np.percentile(times, 50))
    p95 = float(np.percentile(times, 95))
    worst = float(times.max())
    frame_s = 0.080
    streams = batch * frame_s / p50
    result = {
        "metric": "realtime_stt_streams_per_chip",
        "value": round(streams, 1),
        "unit": "streams",
        "vs_baseline": round(streams / 400.0, 3),
        "detail": {
            "batch": batch,
            "step_ms_p50": round(p50 * 1e3, 2),
            "step_ms_p95": round(p95 * 1e3, 2),
            "step_ms_worst": round(worst * 1e3, 2),
            "reps": reps,
            "rtf": round(frame_s / p50, 2),
            "model": "stt-1b-en_fr shapes (d2048/16L, ctx 750, 32 cb, int8 KV+W8A8)",
            "method": "25 frames fused in one scan; device throughput per frame",
            "baseline": "400 realtime streams on H100 (reference README.md:62)",
        },
    }
    try:
        served = _served_slo_summary()
        if served is not None:
            result["detail"]["served_slo"] = served
    except Exception:
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
