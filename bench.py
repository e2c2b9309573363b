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


def bench_asr(batch: int, steps: int = 30, warmup: int = 5):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__ as ge
    from dsm_tpu.sessions import asr

    cfg, fn, (params, state, pcm, mask, reset, rng) = ge._asr_setup(
        batch, jnp.bfloat16, jnp.bfloat16
    )
    # Real audio-like input (zeros would underutilise RVQ argmin paths).
    pcm = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((batch, 1, cfg.mimi.frame_size))
        .astype(np.float32)
        * 0.1
    )

    step = jax.jit(fn, donate_argnums=(1,))
    out, state = step(params, state, pcm, mask, reset, rng)
    jax.block_until_ready(out)

    for _ in range(warmup):
        out, state = step(params, state, pcm, mask, reset, rng)
    jax.block_until_ready(out)

    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        out, state = step(params, state, pcm, mask, reset, rng)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return np.asarray(times)


def main():
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    times = bench_asr(batch)
    p50 = float(np.percentile(times, 50))
    p95 = float(np.percentile(times, 95))
    frame_s = 0.080
    streams = batch * frame_s / p50
    result = {
        "metric": "realtime_stt_streams_per_chip",
        "value": round(streams, 1),
        "unit": "streams",
        "vs_baseline": round(streams / 400.0, 3),
        "detail": {
            "batch": batch,
            "p50_step_ms": round(p50 * 1e3, 2),
            "p95_step_ms": round(p95 * 1e3, 2),
            "rtf": round(frame_s / p50, 2),
            "model": "stt-1b-en_fr shapes (d2048/16L, ctx 750, 32 cb, bf16)",
            "baseline": "400 realtime streams on H100 (reference README.md:62)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
