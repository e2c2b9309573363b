"""Continuous-batching engine: slot pool, masks/resets, markers, capacity."""

import numpy as np
import jax.numpy as jnp

from dsm_tpu.server import batched_asr as eng
from dsm_tpu.sessions import asr as ASR
from tests.test_asr import make_params, small_asr_cfg


def small_engine(batch=2):
    cfg0 = small_asr_cfg()
    # Engine FRAME_SIZE is the production 1920; the small test mimi uses 48.
    # Patch the module constant scope-locally via a subclassed engine frame.
    import jax

    cfg = cfg0
    params = make_params(cfg, jax.random.PRNGKey(0))
    e = eng.BatchedAsrEngine(cfg, params, batch_size=batch)
    # small config frame size
    e._frame = cfg.mimi.frame_size
    return e, cfg


def test_slot_pool_capacity():
    e, cfg = small_engine(batch=2)
    got = []
    c1 = e.open_channel(got.append)
    c2 = e.open_channel(got.append)
    assert c1 is not None and c2 is not None
    assert e.open_channel(got.append) is None  # ServerAtCapacity
    e.close_channel(c1)
    c3 = e.open_channel(got.append)
    assert c3 is not None and c3.slot == c1.slot
    # Reused slot got flagged for reset.
    assert e.pending_resets[c3.slot]


def test_channel_frame_assembly():
    eng.FRAME_SIZE, saved = 48, eng.FRAME_SIZE
    try:
        ch = eng.Channel(0, lambda ev: None)
        ch.push_pcm(np.ones(30, np.float32))
        assert ch.take_frame() is None
        ch.push_pcm(np.ones(30, np.float32) * 2)
        f = ch.take_frame()
        assert f is not None and len(f) == 48
        assert f[29] == 1 and f[30] == 2
        assert ch.buffered_samples() == 12
    finally:
        eng.FRAME_SIZE = saved


def test_engine_tick_and_markers():
    saved = eng.FRAME_SIZE
    try:
        e, cfg = small_engine(batch=2)
        eng.FRAME_SIZE = cfg.mimi.frame_size
        e._pcm_buf = np.zeros((2, 1, cfg.mimi.frame_size), np.float32)
        events = []
        ch = e.open_channel(events.append)
        rng = np.random.default_rng(0)
        # queue 3 frames + a marker
        ch.push_pcm(rng.standard_normal(cfg.mimi.frame_size * 3).astype(np.float32))
        e.add_marker(ch, marker_id=7)
        # marker due after 3 frames + asr_delay(2) = step 5
        assert ch.markers[0][0] == 3 + cfg.asr_delay_in_tokens

        n = 0
        while e.tick():
            n += 1
        # One tick per buffered frame + one idle tick draining the
        # dispatch-ahead pipeline (depth 1).
        assert n == 4
        assert len(events) == 3
        assert events[-1].step_idx == 3
        assert all(ev.markers == [] for ev in events)
        assert events[0].prs is not None and events[0].prs.shape == (2,)

        # feed more frames so the marker comes due
        ch.push_pcm(rng.standard_normal(cfg.mimi.frame_size * 2).astype(np.float32))
        while e.tick():
            pass
        assert events[-1].step_idx == 5
        assert events[-1].markers == [7]
    finally:
        eng.FRAME_SIZE = saved


def test_engine_reset_on_reuse_isolates_streams():
    saved = eng.FRAME_SIZE
    try:
        e, cfg = small_engine(batch=1)
        eng.FRAME_SIZE = cfg.mimi.frame_size
        e._pcm_buf = np.zeros((1, 1, cfg.mimi.frame_size), np.float32)
        rng = np.random.default_rng(1)
        pcm = rng.standard_normal(cfg.mimi.frame_size).astype(np.float32) * 0.1

        evs1 = []
        ch1 = e.open_channel(evs1.append)
        ch1.push_pcm(pcm)
        while e.tick():
            pass
        e.close_channel(ch1)

        # Second stream on the same slot with identical audio must see
        # identical step_idx/prs (fresh state).
        evs2 = []
        ch2 = e.open_channel(evs2.append)
        ch2.push_pcm(pcm)
        while e.tick():
            pass
        assert evs1[0].step_idx == evs2[0].step_idx == 1
        np.testing.assert_allclose(evs1[0].prs, evs2[0].prs, rtol=2e-4, atol=1e-5)
    finally:
        eng.FRAME_SIZE = saved


def test_session_token_logging(tmp_path):
    """Per-session text+audio token dumps (batched_asr.rs Logger parity)."""
    import jax

    from dsm_tpu.utils.session_log import SessionLogger, load_session

    saved = eng.FRAME_SIZE
    try:
        e, cfg = small_engine(batch=1)
        eng.FRAME_SIZE = cfg.mimi.frame_size
        e._pcm_buf = np.zeros((1, 1, cfg.mimi.frame_size), np.float32)
        e.session_logger = SessionLogger(str(tmp_path), "test")
        ch = e.open_channel(lambda ev: None)
        pcm = np.random.default_rng(0).standard_normal(
            cfg.mimi.frame_size * 3
        ).astype(np.float32)
        ch.push_pcm(pcm)
        while e.tick():
            pass
        e.close_channel(ch)
        path = str(tmp_path / f"test-asr-{ch.channel_id}.safetensors")
        text, audio, meta = load_session(path)
        assert len(text) == 3
        assert audio.shape == (3, cfg.lm.audio_codebooks)
        assert audio.min() >= 0
    finally:
        eng.FRAME_SIZE = saved


def test_per_request_seed_replay_determinism():
    """Stochastic ASR (temperature > 0): same seed -> identical token
    sequence regardless of which slot serves it or what else is co-resident
    (VERDICT r1 #10 seeding contract; sampling keyed by (seed, step))."""
    import dataclasses

    import jax

    cfg0 = small_asr_cfg()
    cfg = dataclasses.replace(cfg0, temperature=0.9)
    params = make_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    pcm = rng.standard_normal(cfg.mimi.frame_size * 6).astype(np.float32) * 0.2

    def run(seed, with_other_session):
        e = eng.BatchedAsrEngine(cfg, params, batch_size=2, pipeline_depth=0,
                                 use_native_packer=False)
        saved = eng.FRAME_SIZE
        eng.FRAME_SIZE = cfg.mimi.frame_size
        try:
            toks = []
            others = []
            if with_other_session:
                # Occupy slot 0 so the seeded session lands on slot 1.
                other = e.open_channel(others.append, seed=777)
                other.push_pcm(pcm)
            ch = e.open_channel(
                lambda ev: toks.extend(
                    t for w in ev.words for t in getattr(w, "tokens", [])
                ),
                seed=seed,
            )
            ch.push_pcm(pcm)
            for _ in range(8):
                e.tick()
            e.flush()
            return list(toks)
        finally:
            eng.FRAME_SIZE = saved

    a = run(42, with_other_session=False)
    b = run(42, with_other_session=True)
    c = run(43, with_other_session=False)
    assert a == b  # same seed, different slot + co-resident load
    assert a  # produced tokens at all
    assert a != c or len(a) < 3  # different seed diverges (stochastic)


def test_fill_gate_partial_batch():
    """Cadence-aware fill gating: a partial batch (some open slots with a
    frame ready, others without) is held for a straggler grace window from
    first observation, so a tick racing the clients' frame burst can't
    burn a full-cost device step at ~5% utilization.  Full batches and
    reset-only ticks dispatch immediately."""
    saved = eng.FRAME_SIZE
    try:
        e, cfg = small_engine(batch=2)
        eng.FRAME_SIZE = cfg.mimi.frame_size
        e._pcm_buf = np.zeros((2, 1, cfg.mimi.frame_size), np.float32)
        rng = np.random.default_rng(0)
        pcm = rng.standard_normal(cfg.mimi.frame_size).astype(np.float32)

        evs1, evs2 = [], []
        ch1 = e.open_channel(evs1.append)
        ch2 = e.open_channel(evs2.append)

        # Make the gate window observable on any host speed.
        e._frame_period_s = 60.0
        e._fill_gate_frac = 0.9

        # Initial full tick clears the open-channel resets (reset ticks are
        # never gated) and compiles the step.
        ch1.push_pcm(pcm)
        ch2.push_pcm(pcm)
        assert e.tick()
        e.flush()
        assert len(evs1) == 1 and len(evs2) == 1
        assert not e.pending_resets.any()

        # Partial fill: gated for the straggler grace window (no step).
        ch1.push_pcm(pcm)
        assert not e.tick()
        assert e._gate_t0 is not None
        assert len(evs1) == 1  # nothing new delivered

        # Grace window passed: the partial batch dispatches.
        e._gate_t0 -= 120.0
        assert e.tick()
        e.flush()
        assert len(evs1) == 2 and len(evs2) == 1

        # Full batch: dispatches immediately even inside the window.
        ch1.push_pcm(pcm)
        ch2.push_pcm(pcm)
        assert e.tick()
        e.flush()
        assert len(evs1) == 3 and len(evs2) == 2

        # Reset-only tick (slot reuse) is never gated even on partial fill.
        e.close_channel(ch2)
        evs3 = []
        ch3 = e.open_channel(evs3.append)
        ch3.push_pcm(pcm)  # ch1 idle now -> partial fill
        assert e.pending_resets[ch3.slot]
        assert e.tick()
        e.flush()
        assert len(evs3) == 1
    finally:
        eng.FRAME_SIZE = saved


def test_fill_gate_skips_catchup_backlog():
    """A slot with 2+ frames buffered is catching up (file upload) — the
    gate must not throttle it to one dispatch per frame period even when
    other open slots are idle."""
    saved = eng.FRAME_SIZE
    try:
        e, cfg = small_engine(batch=2)
        eng.FRAME_SIZE = cfg.mimi.frame_size
        e._pcm_buf = np.zeros((2, 1, cfg.mimi.frame_size), np.float32)
        rng = np.random.default_rng(0)
        pcm = rng.standard_normal(cfg.mimi.frame_size).astype(np.float32)

        evs1, evs2 = [], []
        ch1 = e.open_channel(evs1.append)
        ch2 = e.open_channel(evs2.append)
        # Clear open resets with a full tick.
        ch1.push_pcm(pcm)
        ch2.push_pcm(pcm)
        assert e.tick()
        e.flush()

        e._frame_period_s = 60.0  # gate window observable on any host
        e._fill_gate_frac = 0.9

        # ch1 dumps a 3-frame backlog while ch2 idles: ticks with 2+
        # frames buffered dispatch immediately (catch-up), no 60 s gate
        # holds.
        ch1.push_pcm(np.concatenate([pcm, pcm, pcm]))
        for _ in range(2):
            assert e.tick()
        # Down to exactly 1 buffered frame: back to cadence mode -> gated
        # for the grace window, dispatched once it passes.
        assert not e.tick()
        e._gate_t0 -= 120.0
        assert e.tick()
        e.flush()
        assert len(evs1) == 4  # 1 initial + 3 backlog
    finally:
        eng.FRAME_SIZE = saved


def test_int16_pcm_wire(monkeypatch):
    """Opt-in int16 upload wire (DSM_PCM_INT16): the engine quantises the
    frame on the host and dequantises on device; words still decode and
    the VAD probs stay within the int16 quantisation envelope of the f32
    wire."""
    monkeypatch.setenv("DSM_PCM_INT16", "1")
    saved = eng.FRAME_SIZE
    try:
        e, cfg = small_engine(batch=1)
        assert e._pcm_wire_int16
        eng.FRAME_SIZE = cfg.mimi.frame_size
        e._pcm_buf = np.zeros((1, 1, cfg.mimi.frame_size), np.float32)
        evs = []
        ch = e.open_channel(evs.append)
        pcm = np.random.default_rng(0).standard_normal(
            cfg.mimi.frame_size * 2
        ).astype(np.float32) * 0.1
        ch.push_pcm(pcm)
        while e.tick():
            pass
        assert len(evs) == 2
        assert evs[0].prs is not None and np.isfinite(evs[0].prs).all()
    finally:
        eng.FRAME_SIZE = saved


def test_fill_gate_ignores_stale_idle_channels():
    """A connection that stopped sending (muted mic, stalled peer) must not
    hold the gate: channels with no data for > 2 frame periods are excluded
    from the fill count, so live sessions dispatch immediately instead of
    paying the grace window on every tick forever."""
    import time as _t

    saved = eng.FRAME_SIZE
    try:
        e, cfg = small_engine(batch=2)
        eng.FRAME_SIZE = cfg.mimi.frame_size
        e._pcm_buf = np.zeros((2, 1, cfg.mimi.frame_size), np.float32)
        rng = np.random.default_rng(0)
        pcm = rng.standard_normal(cfg.mimi.frame_size).astype(np.float32)

        evs1, evs2 = [], []
        ch1 = e.open_channel(evs1.append)
        ch2 = e.open_channel(evs2.append)
        ch1.push_pcm(pcm)
        ch2.push_pcm(pcm)
        assert e.tick()
        e.flush()

        e._frame_period_s = 60.0
        e._fill_gate_frac = 0.9
        # ch2 went quiet long ago -> excluded from the fill count; ch1's
        # frame dispatches immediately (n_ready == n_open == 1).
        ch2.last_data = _t.time() - 1000.0
        ch1.push_pcm(pcm)
        assert e.tick()
        e.flush()
        assert len(evs1) == 2

        # ch2 active again (fresh last_data, no frame yet): gate holds.
        ch2.last_data = _t.time()
        ch1.push_pcm(pcm)
        assert not e.tick()
    finally:
        eng.FRAME_SIZE = saved


def test_marker_due_independent_of_inflight_frames():
    """The marker due step counts every frame PUSHED before the marker —
    not steps + buffered, which undercounts frames already gathered from
    the buffer but not yet drained into ch.steps (dispatch-ahead), firing
    the marker early and nondeterministically dropping trailing words."""
    saved = eng.FRAME_SIZE
    try:
        e, cfg = small_engine(batch=1)
        eng.FRAME_SIZE = fs = cfg.mimi.frame_size
        e._pcm_buf = np.zeros((1, 1, fs), np.float32)
        events = []
        ch = e.open_channel(events.append)
        # Force the python deque path so take_frame() below works with the
        # small frame size (the native packer is sized for FRAME_SIZE).
        ch.packer = None
        ch.frame_size = fs
        for _ in range(5):
            ch.push_pcm(np.zeros(fs, np.float32))

        # Marker added with NOTHING consumed yet.
        e.add_marker(ch, marker_id=1)
        due_idle = ch.markers[0][0]

        # Consume 3 frames but do NOT drain results (simulates in-flight
        # dispatch-ahead: buffer drained, ch.steps still stale).
        for _ in range(3):
            assert ch.take_frame() is not None
        assert ch.steps == 0  # stale, as during a real in-flight window
        e.add_marker(ch, marker_id=2)

        assert due_idle == 5 + cfg.asr_delay_in_tokens
        # Invariant under the consumption race: every queued marker has the
        # same due step regardless of in-flight frames.
        assert [d for d, _ in ch.markers] == [due_idle, due_idle]
    finally:
        eng.FRAME_SIZE = saved
