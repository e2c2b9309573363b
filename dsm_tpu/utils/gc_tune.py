"""Serving-loop GC tuning (round 5, VERDICT r4 #4).

CPython's generational GC walks every tracked container when a gen2
collection triggers.  After jax tracing and engine warmup the process
holds millions of long-lived objects, and a single gen2 sweep on the
serving host's one core measured as a **1.4 s gather-phase stall** in
the sustained TTS bench (docs/SUSTAINED_TTS_r05_b64_fuse4_pipe2.json:
one late tick at t=64.6 with gather_ms 1437 and no device, lock, or
phase activity to account for it — the tick p99 outlier that survived
rounds 3-5).

The standard serving mitigation, applied after each engine's warmup:

* ``gc.collect()`` once, to clear construction garbage;
* ``gc.freeze()`` — moves every currently-live object out of all future
  collections, so steady-state sweeps only walk the (small) set of
  objects allocated after serving began;
* raise the thresholds so the per-tick allocation churn (numpy frame
  views, msgpack buffers) is absorbed by gen0/gen1 without frequent
  full sweeps.

Opt out with ``DSM_GC_TUNE=0``.  The reference's Rust runtime has no
GC and never pays this cost (moshi-server/src/main.rs); this is the
TPU-host analogue of that property.
"""

from __future__ import annotations

import gc
import os


def freeze_after_warmup() -> bool:
    """Freeze the post-warmup heap and relax collection thresholds.

    Idempotent: repeated calls freeze newly-created long-lived objects
    and leave thresholds at the tuned values.  Returns True when tuning
    is active.
    """
    if os.environ.get("DSM_GC_TUNE", "1") in ("0", "false", ""):
        return False
    gc.collect()
    gc.freeze()
    g0, g1, g2 = gc.get_threshold()
    gc.set_threshold(max(g0, 50_000), max(g1, 50), max(g2, 50))
    return True
