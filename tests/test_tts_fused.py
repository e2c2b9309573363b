"""Fused multi-tick TTS: device script machine ≡ host TtsSlot machine, and
fuse_ticks=K engine output is bit-identical to the unfused engine.

The device machine (sessions/tts_script.py) re-implements the reference's
host-side AllowedTokens walk (tts.rs:560-610) as batch arithmetic so K
frames run in one lax.scan dispatch; these tests pin the equivalence that
makes that redesign safe.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsm_tpu.sessions import tts as TTS
from dsm_tpu.sessions import tts_script as SCRIPT
from dsm_tpu.server.tts_batched import BatchedTtsEngine, DoneEvent, TtsSlot
from dsm_tpu.server.tts_module import AudioEvent, WordEvent
from dsm_tpu.models import lm as LM
from dsm_tpu.models import mimi as MIMI
from dsm_tpu.utils.tokenizer import FallbackTokenizer
from tests.test_mimi import small_cfg as small_mimi_cfg
from tests.test_tts import small_tts_cfg


# ---------------------------------------------------------------------------
# Machine unit equivalence: device transitions vs the host TtsSlot mirror
# ---------------------------------------------------------------------------


def _host_machine(cfg, words, eos_after_all):
    drv = TtsSlot(0, lambda ev: None)
    drv.feed_words(words)
    if eos_after_all:
        drv.end_input()
    return drv


def _upload_all(m, slot, words, eos, cap):
    up_toks = 0
    for wid, w in enumerate(words):
        if not w:
            m = SCRIPT.write_word_chunk(
                m, slot, jnp.zeros(SCRIPT.WORD_CHUNK, jnp.int32), 0, wid,
                up_toks,
            )
        for off in range(0, len(w), SCRIPT.WORD_CHUNK):
            chunk = w[off : off + SCRIPT.WORD_CHUNK]
            buf = np.zeros(SCRIPT.WORD_CHUNK, np.int32)
            buf[: len(chunk)] = chunk
            m = SCRIPT.write_word_chunk(
                m, slot, jnp.asarray(buf), len(chunk), wid, up_toks + off
            )
        up_toks += len(w)
    if eos:
        m = SCRIPT.set_eos_row(m, slot)
    return m


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("eos", [True, False])
def test_machine_matches_host_slot(seed, eos):
    """Random script + random pad/eop sampling: the device machine's
    (mode, token, done-step) trajectory equals TtsSlot's."""
    cfg = small_tts_cfg(max_steps=96)
    cc = SCRIPT.ScriptConsts.from_cfg(cfg)
    rng = np.random.default_rng(seed)
    words = [
        list(rng.integers(30, 60, size=int(rng.integers(0, 5))))
        for _ in range(int(rng.integers(1, 6)))
    ]
    host = _host_machine(cfg, words, eos)
    m = SCRIPT.init(1, cap=64)
    m = SCRIPT.reset_row(m, 0)
    m = _upload_all(m, 0, words, eos, 64)

    for step in range(200):
        c = host.next_constraint(cfg)
        mode_d, tok_d, mask_d, m = SCRIPT.constraint(cc, m)
        if c is None:
            assert not bool(mask_d[0]), f"device still active at step {step}"
            return
        assert bool(mask_d[0]), f"device done early at step {step}"
        mode_h, tok_h, _ = c
        assert int(mode_d[0]) == mode_h, f"mode mismatch at step {step}"
        if mode_h == TTS.ALLOW_TEXT:
            assert int(tok_d[0]) == tok_h, f"token mismatch at step {step}"
            sampled = tok_h
        elif mode_h == TTS.ALLOW_PAD:
            sampled = cfg.text_pad_token
        else:  # PadOrEpad: the model's choice — flip a coin
            sampled = (
                cfg.text_eop_token
                if rng.random() < 0.4
                else cfg.text_pad_token
            )
        host.on_text_token(cfg, sampled, FallbackTokenizer())
        m, _patch = SCRIPT.advance(
            cc, m, jnp.asarray([sampled], jnp.int32), jnp.asarray([True])
        )
    if eos:
        raise AssertionError("session never completed")


def test_machine_starvation_then_feed():
    """No eos + exhausted words -> PadOrEpad forever; a word uploaded later
    resumes forcing after the next eop (host 'starved' branch)."""
    cfg = small_tts_cfg(max_steps=96)
    cc = SCRIPT.ScriptConsts.from_cfg(cfg)
    m = SCRIPT.reset_row(SCRIPT.init(1, cap=64), 0)
    m = _upload_all(m, 0, [[41, 42]], eos=False, cap=64)

    # Initial empty-word state: an eop enters word 0 (tts.rs:578).
    mode, tok, mask, m = SCRIPT.constraint(cc, m)
    assert int(mode[0]) == TTS.ALLOW_PAD_OR_EPAD
    m, _ = SCRIPT.advance(
        cc, m, jnp.asarray([cfg.text_eop_token]), jnp.asarray([True])
    )
    # Consume word 0 (forced), then the eop.
    for expect_tok in (41, 42):
        mode, tok, mask, m = SCRIPT.constraint(cc, m)
        assert int(mode[0]) == TTS.ALLOW_TEXT and int(tok[0]) == expect_tok
        m, _ = SCRIPT.advance(cc, m, jnp.asarray([expect_tok]), jnp.asarray([True]))
    mode, tok, mask, m = SCRIPT.constraint(cc, m)
    assert int(mode[0]) == TTS.ALLOW_PAD_OR_EPAD
    m, _ = SCRIPT.advance(
        cc, m, jnp.asarray([cfg.text_eop_token]), jnp.asarray([True])
    )
    # Starved (no word, no eos): stays PadOrEpad even through another eop.
    for _ in range(3):
        mode, tok, mask, m = SCRIPT.constraint(cc, m)
        assert int(mode[0]) == TTS.ALLOW_PAD_OR_EPAD and bool(mask[0])
        m, _ = SCRIPT.advance(
            cc, m, jnp.asarray([cfg.text_eop_token]), jnp.asarray([True])
        )
    # Word 1 arrives; the PREVIOUS eop already advanced widx past word 0,
    # so the next eop enters word 1 and forcing resumes.
    m = _upload_word(m, 0, [55], wid=1, start=2)
    mode, tok, mask, m = SCRIPT.constraint(cc, m)
    assert int(mode[0]) == TTS.ALLOW_PAD_OR_EPAD
    m, _ = SCRIPT.advance(
        cc, m, jnp.asarray([cfg.text_eop_token]), jnp.asarray([True])
    )
    mode, tok, mask, m = SCRIPT.constraint(cc, m)
    assert int(mode[0]) == TTS.ALLOW_TEXT and int(tok[0]) == 55


def _upload_word(m, slot, w, wid, start):
    buf = np.zeros(SCRIPT.WORD_CHUNK, np.int32)
    buf[: len(w)] = w
    return SCRIPT.write_word_chunk(m, slot, jnp.asarray(buf), len(w), wid, start)


def test_ring_wraparound():
    """Uploads past the ring capacity overwrite consumed positions only."""
    cfg = small_tts_cfg(max_steps=96)
    cc = SCRIPT.ScriptConsts.from_cfg(cfg)
    cap = 16
    m = SCRIPT.reset_row(SCRIPT.init(1, cap=cap), 0)
    start = 0
    for wid in range(10):  # 10 words x 3 tokens = 30 through a cap-16 ring
        w = [100 + wid * 3, 101 + wid * 3, 102 + wid * 3]
        m = _upload_word(m, 0, w, wid, start)
        start += 3
        # Enter the word (first word needs an eop to move widx 0->...).
        mode, tok, mask, m = SCRIPT.constraint(cc, m)
        assert int(mode[0]) == TTS.ALLOW_PAD_OR_EPAD
        m, _ = SCRIPT.advance(
            cc, m, jnp.asarray([cfg.text_eop_token]), jnp.asarray([True])
        )
        for t in w:
            mode, tok, mask, m = SCRIPT.constraint(cc, m)
            assert int(mode[0]) == TTS.ALLOW_TEXT and int(tok[0]) == t
            m, _ = SCRIPT.advance(cc, m, jnp.asarray([t]), jnp.asarray([True]))


# ---------------------------------------------------------------------------
# Engine bit-identity: fuse_ticks=4 vs unfused
# ---------------------------------------------------------------------------


def make_engine(batch=2, fuse=1, **kw):
    cfg = small_tts_cfg(max_steps=96)
    mimi_cfg = small_mimi_cfg()
    params = {"lm": LM.init(cfg.lm, jax.random.PRNGKey(0))}
    mimi_params = MIMI.init(mimi_cfg, jax.random.PRNGKey(1))
    return BatchedTtsEngine(
        cfg, params, mimi_cfg, mimi_params, FallbackTokenizer(),
        batch_size=batch, ca_len=6, fuse_ticks=fuse, **kw,
    ), cfg


def _run(eng, scripts, seeds):
    events = [[] for _ in scripts]
    drvs = []
    for i, words in enumerate(scripts):
        drv = eng.open_session(events[i].append, seed=seeds[i])
        assert drv is not None
        drv.feed_words(words)
        drv.end_input()
        drvs.append(drv)
    n = 0
    while eng.tick() and n < 400:
        n += 1
    assert all(d.finished for d in drvs), "sessions did not complete"
    return events


def _timeline(evs):
    out = []
    for e in evs:
        if isinstance(e, WordEvent):
            out.append(("word", e.text, e.start_s, e.stop_s))
        elif isinstance(e, AudioEvent):
            out.append(("audio", np.asarray(e.pcm)))
        else:
            out.append(("done",))
    return out


def test_fused_engine_bit_identical_to_unfused():
    """Same scripts + per-slot seeds: the K=4 fused engine delivers the
    exact word/done timeline (token-identical — sampling is keyed
    (seed, step), so dispatch grouping cannot matter) and audio equal to
    f32-ulp level (XLA re-associates the decoder's fp ops inside lax.scan
    differently than the standalone jit)."""
    scripts = [[[31, 7], [8]], [[31, 9, 11]]]
    seeds = [11, 22]
    ev_a = _run(make_engine(batch=2, fuse=1)[0], scripts, seeds)
    ev_b = _run(make_engine(batch=2, fuse=4)[0], scripts, seeds)
    for a, b in zip(ev_a, ev_b):
        ta, tb = _timeline(a), _timeline(b)
        assert len(ta) == len(tb)
        for xa, xb in zip(ta, tb):
            assert xa[0] == xb[0]
            if xa[0] == "word":
                assert xa[1:] == xb[1:]
            elif xa[0] == "audio":
                np.testing.assert_allclose(xa[1], xb[1], atol=1e-6, rtol=0)


def test_fused_slot_reuse_and_incremental_feed():
    """Words fed across dispatch boundaries (visibility snapshots) still
    complete, and a reused slot starts fresh."""
    eng, cfg = make_engine(batch=1, fuse=3)
    ev = []
    drv = eng.open_session(ev.append, seed=5)
    drv.feed_words([[31, 7]])
    for _ in range(2):
        eng.tick()
    drv.feed_words([[9, 12]])
    drv.end_input()
    n = 0
    while eng.tick() and n < 200:
        n += 1
    assert any(isinstance(e, DoneEvent) for e in ev)
    words = [e for e in ev if isinstance(e, WordEvent)]
    assert len(words) == 2
    eng.close_session(drv)

    ev2 = []
    drv2 = eng.open_session(ev2.append, seed=5)
    assert drv2.slot == drv.slot
    drv2.feed_words([[31, 7], [9, 12]])
    drv2.end_input()
    n = 0
    while eng.tick() and n < 200:
        n += 1
    assert any(isinstance(e, DoneEvent) for e in ev2)
    assert len([e for e in ev2 if isinstance(e, WordEvent)]) == 2


def test_fused_warmup_and_capacity():
    eng, _ = make_engine(batch=1, fuse=2)
    eng.warmup()
    ev = []
    drv = eng.open_session(ev.append, seed=1)
    assert eng.open_session(lambda e: None) is None  # capacity
    drv.feed_words([[31]])
    drv.end_input()
    n = 0
    while eng.tick() and n < 200:
        n += 1
    assert any(isinstance(e, DoneEvent) for e in ev)
    assert any(isinstance(e, AudioEvent) for e in ev)


def test_fused_oversized_word_truncates_not_hangs():
    """A single word longer than script_cap is truncated at gather (it
    could never fit the ring; waiting for space would hang the session)."""
    eng, cfg = make_engine(batch=1, fuse=2)
    eng.script_cap = 16  # shrink below the word length (machine cap is 1024)
    ev = []
    drv = eng.open_session(ev.append, seed=2)
    drv.feed_words([[30 + i for i in range(24)]])  # 24 > 16
    drv.end_input()
    n = 0
    while eng.tick() and n < 200:
        n += 1
    assert any(isinstance(e, DoneEvent) for e in ev)
    words = [e for e in ev if isinstance(e, WordEvent)]
    assert len(words) == 1


def test_fused_cfg_engine_matches_unfused():
    """Classifier-free-guidance engines (doubled cond/uncond rows, voice
    CA, per-request alpha) deliver identical word timelines and ulp-level
    audio across fuse_ticks — the production TTS configuration."""
    from dsm_tpu.ops import transformer as T

    def mk(fuse):
        cfg = small_tts_cfg(max_steps=96)
        params = {"lm": LM.init(cfg.lm, jax.random.PRNGKey(0))}
        mimi_cfg = small_mimi_cfg()
        mimi_params = MIMI.init(mimi_cfg, jax.random.PRNGKey(1))
        eng = BatchedTtsEngine(
            cfg, params, mimi_cfg, mimi_params, FallbackTokenizer(),
            batch_size=2, ca_len=6, cfg_enabled=True, fuse_ticks=fuse,
        )
        return eng, cfg

    def voice(cfg, seed):
        lmp = LM.init(cfg.lm, jax.random.PRNGKey(0))
        ca_tokens = jax.random.normal(jax.random.PRNGKey(seed), (1, 6, 16))
        return T.precompute_ca_kv(
            cfg.lm.transformer, lmp["transformer"], ca_tokens
        )

    def run(fuse):
        eng, cfg = mk(fuse)
        ev = []
        drv = eng.open_session(
            ev.append, voice_ca=voice(cfg, 5), cfg_alpha=2.0, seed=9
        )
        drv.feed_words([[31, 7], [8]])
        drv.end_input()
        n = 0
        while eng.tick() and n < 300:
            n += 1
        assert drv.finished
        return ev

    ta = _timeline(run(1))
    tb = _timeline(run(3))
    assert len(ta) == len(tb)
    for xa, xb in zip(ta, tb):
        assert xa[0] == xb[0]
        if xa[0] == "word":
            assert xa[1:] == xb[1:]
        elif xa[0] == "audio":
            np.testing.assert_allclose(xa[1], xb[1], atol=1e-6, rtol=0)


def test_fused_engine_random_lifecycle_stress():
    """Randomized churn over a fused engine: sessions open/feed/eos/close
    at arbitrary tick boundaries (words drip in across dispatches, some
    sessions abandoned mid-stream).  Invariants: no engine exceptions,
    every eos'd surviving session finishes with a DoneEvent, word events
    never exceed fed words, and freed slots are reusable."""
    rng = np.random.default_rng(123)
    eng, cfg = make_engine(batch=3, fuse=2)
    sessions = []  # (drv, events, fed_words, eosd, abandoned)

    for tick in range(120):
        r = rng.random()
        if r < 0.15 and eng.used_slots() < 3:
            ev = []
            drv = eng.open_session(ev.append, seed=int(rng.integers(1e6)))
            if drv is not None:
                sessions.append({"drv": drv, "ev": ev, "fed": 0,
                                 "eos": False, "gone": False})
        alive = [s for s in sessions if not s["gone"] and not s["eos"]]
        if alive and rng.random() < 0.5:
            s = alive[int(rng.integers(len(alive)))]
            n = int(rng.integers(1, 3))
            s["drv"].feed_words(
                [[int(rng.integers(30, 60))] for _ in range(n)]
            )
            s["fed"] += n
        if alive and rng.random() < 0.15:
            s = alive[int(rng.integers(len(alive)))]
            s["drv"].end_input()
            s["eos"] = True
        live = [s for s in sessions if not s["gone"]]
        if live and rng.random() < 0.05:
            s = live[int(rng.integers(len(live)))]
            eng.close_session(s["drv"])  # abandoned mid-stream
            s["gone"] = True
        eng.tick()
        # Reap finished sessions so their slots recycle.
        for s in sessions:
            if not s["gone"] and s["drv"].finished:
                eng.close_session(s["drv"])
                s["gone"] = True

    # Drain: eos everything still open and run the engine dry.
    for s in sessions:
        if not s["gone"] and not s["eos"]:
            s["drv"].end_input()
            s["eos"] = True
    n = 0
    while n < 300:
        progressed = eng.tick()
        for s in sessions:
            if not s["gone"] and s["drv"].finished:
                eng.close_session(s["drv"])
                s["gone"] = True
        if not progressed and all(s["gone"] for s in sessions):
            break
        n += 1

    for s in sessions:
        words = [e for e in s["ev"] if isinstance(e, WordEvent)]
        assert len(words) <= s["fed"], "more word events than fed words"
        if s["eos"] and not s["drv"].closed:
            assert s["drv"].finished, "eos'd session never finished"
        if s["drv"].finished:
            assert any(isinstance(e, DoneEvent) for e in s["ev"])


def test_fused_with_int8_voice_ca():
    """fuse_ticks + the int8-native voice-CA store (the B=64 serving
    profile: DSM_TTS_CA_INT8=1 DSM_TTS_FUSE=4) trace and synthesize."""
    from tests.test_tts_batched import make_voice

    cfg = small_tts_cfg(max_steps=96)
    mimi_cfg = small_mimi_cfg()
    params = {"lm": LM.init(cfg.lm, jax.random.PRNGKey(0))}
    mimi_params = MIMI.init(mimi_cfg, jax.random.PRNGKey(1))
    eng = BatchedTtsEngine(
        cfg, params, mimi_cfg, mimi_params, FallbackTokenizer(),
        batch_size=2, ca_len=6, ca_quant=True, fuse_ticks=3,
    )
    ev = []
    drv = eng.open_session(ev.append, voice_ca=make_voice(cfg, 4), seed=3)
    drv.feed_words([[31, 7], [9]])
    drv.end_input()
    n = 0
    while eng.tick() and n < 200:
        n += 1
    assert drv.finished
    assert any(isinstance(e, AudioEvent) for e in ev)
    assert any(isinstance(e, DoneEvent) for e in ev)


# ---------------------------------------------------------------------------
# Batched op application (SCRIPT.apply_ops): one dispatch per queue flush
# must equal the sequential per-op path bit-for-bit, NOP padding included.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_apply_ops_matches_sequential(seed):
    rng = np.random.default_rng(seed)
    batch, cap = 4, 64
    m_seq = SCRIPT.init(batch, cap)
    n_ops = int(rng.integers(1, 24))
    kinds = np.zeros(n_ops, np.int32)
    slots = rng.integers(0, batch, n_ops).astype(np.int32)
    toks = np.zeros((n_ops, SCRIPT.WORD_CHUNK), np.int32)
    counts = np.zeros(n_ops, np.int32)
    wids = np.zeros(n_ops, np.int32)
    starts = np.zeros(n_ops, np.int32)
    per_slot = {s: {"toks": 0, "words": 0} for s in range(batch)}
    for i in range(n_ops):
        kind = int(rng.integers(1, 5))
        kinds[i] = kind
        s = int(slots[i])
        if kind == SCRIPT.OP_INIT:
            per_slot[s] = {"toks": 0, "words": 0}
            m_seq = SCRIPT.reset_row(m_seq, s)
        elif kind == SCRIPT.OP_DEACT:
            m_seq = SCRIPT.deactivate_row(m_seq, s)
        elif kind == SCRIPT.OP_EOS:
            m_seq = SCRIPT.set_eos_row(m_seq, s)
        else:
            c = int(rng.integers(1, SCRIPT.WORD_CHUNK + 1))
            toks[i, :c] = rng.integers(1, 100, c)
            counts[i] = c
            wids[i] = per_slot[s]["words"]
            starts[i] = per_slot[s]["toks"]
            m_seq = SCRIPT.write_word_chunk(
                m_seq, s, jnp.asarray(toks[i]), c, int(wids[i]),
                int(starts[i]),
            )
            per_slot[s]["toks"] += c
            per_slot[s]["words"] += 1

    # Pad with NOPs like the engine's bucketed flush does.
    pad = 32 - n_ops
    z = np.zeros
    m_bat = SCRIPT.apply_ops(
        SCRIPT.init(batch, cap),
        jnp.asarray(np.concatenate([kinds, z(pad, np.int32)])),
        jnp.asarray(np.concatenate([slots, z(pad, np.int32)])),
        jnp.asarray(np.concatenate([toks, z((pad, SCRIPT.WORD_CHUNK),
                                            np.int32)])),
        jnp.asarray(np.concatenate([counts, z(pad, np.int32)])),
        jnp.asarray(np.concatenate([wids, z(pad, np.int32)])),
        jnp.asarray(np.concatenate([starts, z(pad, np.int32)])),
    )
    for k in m_seq:
        np.testing.assert_array_equal(
            np.asarray(m_seq[k]), np.asarray(m_bat[k]), err_msg=k
        )


def test_fused_pipeline_depth_bit_identical():
    """Dispatch-ahead (pipeline_depth=2) delivers the exact same event
    timeline as depth 1: sampling is keyed (seed, step) and the device
    script machine owns the constraint walk, so dispatch lookahead can
    only delay HOST-side delivery, never change tokens or ordering.
    Done stays ordered after the session's final audio."""
    scripts = [[[31, 7], [8]], [[31, 9, 11]]]
    seeds = [11, 22]
    ev_a = _run(make_engine(batch=2, fuse=2)[0], scripts, seeds)
    ev_b = _run(make_engine(batch=2, fuse=2, pipeline_depth=2)[0],
                scripts, seeds)
    for a, b in zip(ev_a, ev_b):
        ta, tb = _timeline(a), _timeline(b)
        assert len(ta) == len(tb)
        assert ta[-1] == ("done",) and tb[-1] == ("done",)
        for xa, xb in zip(ta, tb):
            assert xa[0] == xb[0]
            if xa[0] == "word":
                assert xa[1:] == xb[1:]
            elif xa[0] == "audio":
                np.testing.assert_array_equal(xa[1], xb[1])


def test_int16_audio_wire_matches_f32(monkeypatch):
    """DSM_TTS_PCM_I16: the packed audio payload rides as int16 pairs
    (halving the tick's dominant fetch); decoded audio matches the f32
    wire within the int16 quantisation step, and text timing events are
    identical."""
    import numpy as np

    from dsm_tpu.server import tts_batched as btts
    from dsm_tpu.server.tts_module import AudioEvent, WordEvent

    def run(i16):
        monkeypatch.setenv("DSM_TTS_PCM_I16", "1" if i16 else "0")
        eng, cfg = make_engine(batch=2, fuse=2, script_cap=32)
        events = []
        drv = eng.open_session(events.append, seed=3)
        drv.feed_words([[5], [6]])
        drv.end_input()
        for _ in range(cfg.text_audio_delay_in_tokens + 14):
            eng.tick()
        audio = np.concatenate(
            [e.pcm for e in events if isinstance(e, AudioEvent)]
        ) if any(isinstance(e, AudioEvent) for e in events) else np.zeros(0)
        words = [
            (e.text, e.start_s, e.stop_s)
            for e in events if isinstance(e, WordEvent)
        ]
        return audio, words

    a32, w32 = run(False)
    a16, w16 = run(True)
    assert w16 == w32  # token stream identical (wire only touches audio)
    assert a16.shape == a32.shape and a32.size > 0
    np.testing.assert_allclose(a16, a32, atol=1.5 / 32767.0)
