"""Continuously-batched TTS engine: concurrent sessions, slot reuse."""

import jax
import jax.numpy as jnp
import numpy as np

from dsm_tpu.models import lm as LM
from dsm_tpu.models import mimi as MIMI
from dsm_tpu.ops import transformer as T
from dsm_tpu.server.tts_batched import BatchedTtsEngine, DoneEvent
from dsm_tpu.server.tts_module import AudioEvent, WordEvent
from dsm_tpu.utils.tokenizer import FallbackTokenizer
from tests.test_mimi import small_cfg as small_mimi_cfg
from tests.test_tts import small_tts_cfg


def make_engine(batch=2, **kw):
    cfg = small_tts_cfg(max_steps=96)
    mimi_cfg = small_mimi_cfg()  # n_q=4 matches generated codebooks
    params = {"lm": LM.init(cfg.lm, jax.random.PRNGKey(0))}
    mimi_params = MIMI.init(mimi_cfg, jax.random.PRNGKey(1))
    eng = BatchedTtsEngine(
        cfg, params, mimi_cfg, mimi_params, FallbackTokenizer(),
        batch_size=batch, ca_len=6, **kw,
    )
    return eng, cfg


def make_voice(cfg, seed):
    tcfg = cfg.lm.transformer
    lmp = LM.init(cfg.lm, jax.random.PRNGKey(0))
    ca_tokens = jax.random.normal(jax.random.PRNGKey(seed), (1, 6, 16))
    return T.precompute_ca_kv(tcfg, lmp["transformer"], ca_tokens)


def drain(eng, max_ticks=400):
    n = 0
    while eng.tick() and n < max_ticks:
        n += 1
    return n


def test_two_concurrent_sessions_complete():
    eng, cfg = make_engine(batch=2)
    ev1, ev2 = [], []
    s1 = eng.open_session(ev1.append, voice_ca=make_voice(cfg, 2))
    s2 = eng.open_session(ev2.append, voice_ca=make_voice(cfg, 3))
    assert s1 is not None and s2 is not None
    assert eng.open_session(lambda e: None) is None  # capacity

    s1.feed_words([[31, 7], [8]])
    s1.end_input()
    s2.feed_words([[31, 9]])
    s2.end_input()
    drain(eng)

    for evs in (ev1, ev2):
        kinds = [type(e).__name__ for e in evs]
        assert "DoneEvent" in kinds
        words = [e for e in evs if isinstance(e, WordEvent)]
        assert len(words) >= 1
        assert all(w.stop_s >= w.start_s for w in words)
        audio = [e for e in evs if isinstance(e, AudioEvent)]
        assert len(audio) >= 1
        assert all(len(a.pcm) == 48 for a in audio)
    # Session 1 had two words.
    assert len([e for e in ev1 if isinstance(e, WordEvent)]) == 2


def test_slot_reuse_fresh_state():
    eng, cfg = make_engine(batch=1)
    ev1 = []
    s1 = eng.open_session(ev1.append)
    s1.feed_words([[31, 5]])
    s1.end_input()
    drain(eng)
    assert any(isinstance(e, DoneEvent) for e in ev1)
    eng.close_session(s1)

    ev2 = []
    s2 = eng.open_session(ev2.append)
    assert s2.slot == s1.slot
    s2.feed_words([[31, 5]])
    s2.end_input()
    drain(eng)
    assert any(isinstance(e, DoneEvent) for e in ev2)
    # Same input on a reused slot -> same word timeline (fresh state).
    w1 = [e for e in ev1 if isinstance(e, WordEvent)]
    w2 = [e for e in ev2 if isinstance(e, WordEvent)]
    assert [w.stop_s for w in w1] == [w.stop_s for w in w2]


def test_engine_warmup_compiles_before_serving():
    """warmup() runs the full jitted step + decode with all slots inactive
    (main.rs module warmup contract) and leaves the engine serveable."""
    eng, cfg = make_engine(batch=2)
    eng.warmup()
    pcm, words = eng.synthesize("hi there")
    # Session ran to completion through the warm engine: audio came out
    # and the slot was reclaimed.
    assert pcm.ndim == 1 and pcm.size > 0
    assert eng.used_slots() == 0


def test_engine_warmup_cfg_enabled():
    from dsm_tpu.server.tts_batched import BatchedTtsEngine
    from dsm_tpu.utils.tokenizer import FallbackTokenizer
    from tests.test_mimi import small_cfg as small_mimi_cfg

    cfg = small_tts_cfg(max_steps=96)
    mimi_cfg = small_mimi_cfg()
    params = {"lm": LM.init(cfg.lm, jax.random.PRNGKey(0))}
    mimi_params = MIMI.init(mimi_cfg, jax.random.PRNGKey(1))
    eng = BatchedTtsEngine(
        cfg, params, mimi_cfg, mimi_params, FallbackTokenizer(),
        batch_size=2, ca_len=6, cfg_enabled=True,
    )
    eng.warmup()  # doubled-rows program compiles
    assert eng.rows == 4


def make_engine_q(batch=2, **kw):
    cfg = small_tts_cfg(max_steps=96)
    mimi_cfg = small_mimi_cfg()
    params = {"lm": LM.init(cfg.lm, jax.random.PRNGKey(0))}
    mimi_params = MIMI.init(mimi_cfg, jax.random.PRNGKey(1))
    eng = BatchedTtsEngine(
        cfg, params, mimi_cfg, mimi_params, FallbackTokenizer(),
        batch_size=batch, ca_len=6, ca_quant=True, **kw,
    )
    return eng, cfg


def test_ca_int8_store_is_native_and_write_exact():
    """ca_quant keeps ONLY the int8 form on device (no bf16 twin buffer —
    the halving is what gates B>=64), and a per-slot voice write lands
    bit-exactly as quantize_ca_kv of that slot's bf16 source."""
    eng, cfg = make_engine_q(batch=2)
    assert isinstance(eng._ca_raw, dict)
    assert eng._ca_raw["k"].dtype == jnp.int8
    # Padded to the 128-lane tile.
    assert eng._ca_raw["k"].shape[3] == 128

    voice = make_voice(cfg, 2)
    s1 = eng.open_session(lambda e: None, voice_ca=voice)
    eng._apply_voice_writes()
    bufs = eng._ca()
    exp = T.quantize_ca_kv(
        tuple(a.astype(eng.cache_dtype) for a in voice), s_len=eng.ca_len
    )
    np.testing.assert_array_equal(
        np.asarray(bufs["k"][:, s1.slot]), np.asarray(exp["k"][:, 0])
    )
    np.testing.assert_array_equal(
        np.asarray(bufs["v"][:, s1.slot]), np.asarray(exp["v"][:, 0])
    )
    np.testing.assert_allclose(
        np.asarray(bufs["ks"][:, s1.slot]), np.asarray(exp["ks"][:, 0])
    )
    # The other slot stays zero (scale 0 dequantises to 0).
    other = 1 - s1.slot
    assert not np.asarray(bufs["k"][:, other]).any()


def test_ca_int8_sessions_complete_end_to_end():
    eng, cfg = make_engine_q(batch=2)
    ev1, ev2 = [], []
    s1 = eng.open_session(ev1.append, voice_ca=make_voice(cfg, 2))
    s2 = eng.open_session(ev2.append, voice_ca=make_voice(cfg, 3))
    s1.feed_words([[31, 7], [8]])
    s1.end_input()
    s2.feed_words([[31, 9]])
    s2.end_input()
    drain(eng)
    for evs in (ev1, ev2):
        assert any(isinstance(e, DoneEvent) for e in evs)
        audio = [e for e in evs if isinstance(e, AudioEvent)]
        assert len(audio) >= 1
    # Slot churn: reopened slot requantises in place.
    eng.close_session(s1)
    ev3 = []
    s3 = eng.open_session(ev3.append, voice_ca=make_voice(cfg, 4))
    s3.feed_words([[31, 5]])
    s3.end_input()
    drain(eng)
    assert any(isinstance(e, DoneEvent) for e in ev3)


def test_ca_int8_cfg_enabled_warmup():
    eng, cfg = make_engine_q(batch=2, cfg_enabled=True)
    eng.warmup()
    assert eng.rows == 4
    pcm, words = eng.synthesize("hi there")
    assert pcm.ndim == 1 and pcm.size > 0
    assert eng.used_slots() == 0


def _voice_equal(a, b):
    import jax

    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _run_voice_batching_case(mk):
    """Batched zero-scatter voice writes vs the per-slot path: identical
    device buffers for mixed zero+data pendings, including same-slot
    coalescing (last write wins).  The batched path exists because a
    session-completion wave measured as one tunneled dispatch per
    reopened slot — a 1.4 s gather stall at B=64
    (docs/SUSTAINED_TTS_r05_b64_subphase_events.json)."""
    import os

    pendings = []
    for seed, slots in ((7, (0, 2)), (9, (1,))):
        pass
    eng_a, cfg = mk(batch=4)
    eng_b, _ = mk(batch=4)
    kv0 = make_voice(cfg, 11)
    kv1 = make_voice(cfg, 13)
    # slot2: data write then zero (coalesces to zero); slot3: zero then
    # data (coalesces to data).
    pending = [
        (0, None, None),
        (1, kv0[0], kv0[1]),
        (2, kv1[0], kv1[1]),
        (2, None, None),
        (3, None, None),
        (3, kv0[0], kv0[1]),
    ]
    eng_a._apply_voice_writes(list(pending))
    saved = os.environ.get("DSM_TTS_BATCH_VOICE")
    os.environ["DSM_TTS_BATCH_VOICE"] = "0"
    try:
        eng_b._apply_voice_writes(list(pending))
    finally:
        if saved is None:
            os.environ.pop("DSM_TTS_BATCH_VOICE", None)
        else:
            os.environ["DSM_TTS_BATCH_VOICE"] = saved
    _voice_equal(eng_a._ca_raw, eng_b._ca_raw)


def test_voice_write_batching_equivalent_bf16():
    _run_voice_batching_case(make_engine)


def test_voice_write_batching_equivalent_int8():
    _run_voice_batching_case(make_engine_q)
