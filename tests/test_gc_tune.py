"""Serving engines freeze the post-warmup heap (utils/gc_tune.py) so a
gen2 GC sweep never walks the jax-trace object graph mid-tick — the
measured 1.4 s TTS gather-phase stall
(docs/SUSTAINED_TTS_r05_b64_fuse4_pipe2.json, late tick t=64.6)."""

import gc

from dsm_tpu.utils.gc_tune import freeze_after_warmup


def test_freeze_and_thresholds():
    before = gc.get_threshold()
    try:
        assert freeze_after_warmup()
        g0, g1, g2 = gc.get_threshold()
        assert g0 >= 50_000 and g1 >= 50 and g2 >= 50
        assert gc.get_freeze_count() > 0
    finally:
        gc.unfreeze()
        gc.set_threshold(*before)


def test_opt_out(monkeypatch):
    monkeypatch.setenv("DSM_GC_TUNE", "0")
    before = gc.get_threshold()
    assert not freeze_after_warmup()
    assert gc.get_threshold() == before
