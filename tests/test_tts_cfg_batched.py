"""Batched TTS: classifier-free guidance + per-request seeds.

The reference serves cfg_alpha/seed per request but only one session at a
time (moshi-server/src/tts.rs:31,374; main.rs:1045-1074).  The batched
engine doubles the model rows [cond..., uncond...] with a traced per-slot
alpha (alpha=1 slots are exactly unguided), and per-request seeds give
deterministic replay regardless of batch composition.
"""

import numpy as np
import pytest

import jax

from dsm_tpu.models import lm as LM
from dsm_tpu.models import mimi as MIMI
from dsm_tpu.server.tts_batched import BatchedTtsEngine, DoneEvent
from dsm_tpu.server.tts_module import AudioEvent, WordEvent
from dsm_tpu.utils.tokenizer import FallbackTokenizer
from tests.test_mimi import small_cfg as small_mimi_cfg
from tests.test_tts import small_tts_cfg


def _mk_engine(cfg_enabled, batch_size=2):
    cfg = small_tts_cfg(max_steps=96)
    params = {"lm": LM.init(cfg.lm, jax.random.PRNGKey(0))}
    mimi_cfg = small_mimi_cfg()
    mimi_params = MIMI.init(mimi_cfg, jax.random.PRNGKey(1))
    eng = BatchedTtsEngine(
        cfg, params, mimi_cfg, mimi_params, FallbackTokenizer(),
        batch_size=batch_size, ca_len=6, cfg_enabled=cfg_enabled,
    )
    return eng, cfg


def _voice(cfg, seed):
    from dsm_tpu.ops import transformer as T

    lmp = LM.init(cfg.lm, jax.random.PRNGKey(0))
    ca_tokens = jax.random.normal(jax.random.PRNGKey(seed), (1, 6, 16))
    return T.precompute_ca_kv(cfg.lm.transformer, lmp["transformer"], ca_tokens)


def _run_session(engine, text="hello world", **open_kw):
    events = []
    slot = engine.open_session(events.append, **open_kw)
    assert slot is not None
    words, _ = engine.encode_words(text, inserted_bos=False)
    slot.feed_words(words)
    slot.end_input()
    for _ in range(200):
        if any(isinstance(e, DoneEvent) for e in events):
            break
        engine.tick()
    assert any(isinstance(e, DoneEvent) for e in events)
    engine.close_session(slot)
    return events


def _tokens_of(events):
    return [
        (e.text, round(e.start_s, 3), round(e.stop_s, 3))
        for e in events
        if isinstance(e, WordEvent)
    ]


def test_cfg_engine_runs_and_doubles_rows():
    eng, cfg = _mk_engine(cfg_enabled=True)
    assert eng.rows == 2 * eng.batch_size
    ev = _run_session(eng, voice_ca=_voice(cfg, 2), cfg_alpha=2.0, seed=7)
    assert _tokens_of(ev)  # produced word timestamps
    assert any(isinstance(e, AudioEvent) for e in ev)


def test_cfg_alpha_one_matches_unguided_engine():
    """alpha=1 in the CFG engine == plain engine with the same seed."""
    eng_c, cfg = _mk_engine(cfg_enabled=True)
    eng_p, _ = _mk_engine(cfg_enabled=False)
    v = _voice(cfg, 2)
    ev_cfg = _run_session(eng_c, voice_ca=v, cfg_alpha=1.0, seed=11)
    ev_plain = _run_session(eng_p, voice_ca=v, seed=11)
    assert _tokens_of(ev_cfg) == _tokens_of(ev_plain)


def test_cfg_alpha_changes_sampling():
    """With a voice, guidance shifts the depformer logits: audio differs."""
    eng1, cfg = _mk_engine(cfg_enabled=True)
    eng5, _ = _mk_engine(cfg_enabled=True)
    v = _voice(cfg, 2)
    ev1 = _run_session(eng1, voice_ca=v, cfg_alpha=1.0, seed=3)
    ev5 = _run_session(eng5, voice_ca=v, cfg_alpha=5.0, seed=3)
    a1 = np.concatenate([e.pcm for e in ev1 if isinstance(e, AudioEvent)])
    a5 = np.concatenate([e.pcm for e in ev5 if isinstance(e, AudioEvent)])
    assert a1.shape != a5.shape or not np.allclose(a1, a5)


def test_per_request_seed_determinism_across_batch_composition():
    """Same seed -> same output, even with a different co-resident load."""
    eng1, _ = _mk_engine(cfg_enabled=False, batch_size=2)
    ev_a = _run_session(eng1, seed=42, audio_temperature=0.8)

    # Re-run with another session occupying the other slot concurrently.
    eng2, _ = _mk_engine(cfg_enabled=False, batch_size=2)
    other_events = []
    other = eng2.open_session(other_events.append, seed=999)
    w, _ = eng2.encode_words("other words here", inserted_bos=False)
    other.feed_words(w)
    other.end_input()
    ev_b = _run_session(eng2, seed=42, audio_temperature=0.8)
    eng2.close_session(other)

    assert _tokens_of(ev_a) == _tokens_of(ev_b)
    a = np.concatenate([e.pcm for e in ev_a if isinstance(e, AudioEvent)])
    b = np.concatenate([e.pcm for e in ev_b if isinstance(e, AudioEvent)])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_different_seeds_differ():
    eng1, _ = _mk_engine(cfg_enabled=False)
    eng2, _ = _mk_engine(cfg_enabled=False)
    ev1 = _run_session(eng1, seed=1, audio_temperature=0.8)
    ev2 = _run_session(eng2, seed=2, audio_temperature=0.8)
    a = np.concatenate([e.pcm for e in ev1 if isinstance(e, AudioEvent)])
    b = np.concatenate([e.pcm for e in ev2 if isinstance(e, AudioEvent)])
    assert a.shape != b.shape or not np.allclose(a, b)


def test_open_session_rejects_alpha_without_cfg():
    eng, _ = _mk_engine(cfg_enabled=False)
    with pytest.raises(ValueError):
        eng.open_session(lambda e: None, cfg_alpha=2.0)
