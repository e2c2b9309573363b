"""Batched ASR session: step mechanics, per-slot reset, word assembly."""

import jax
import jax.numpy as jnp
import numpy as np

from dsm_tpu.models import lm as LM
from dsm_tpu.ops import transformer as T
from dsm_tpu.sessions import asr
from tests.test_mimi import small_cfg as small_mimi_cfg


def small_asr_cfg():
    mimi_cfg = small_mimi_cfg()
    lm_cfg = LM.LmConfig(
        transformer=T.TransformerConfig(
            d_model=32, num_heads=4, num_layers=2, dim_feedforward=64, context=16
        ),
        depformer=None,
        text_in_vocab_size=11,
        text_out_vocab_size=10,
        audio_vocab_size=33,  # mimi bins 32 + pad
        audio_codebooks=mimi_cfg.n_q,
        extra_heads=(2, 6),
    )
    return asr.AsrConfig(lm=lm_cfg, mimi=mimi_cfg, asr_delay_in_tokens=2)


def make_params(cfg, key):
    from dsm_tpu.models import mimi as MIMI

    k1, k2 = jax.random.split(key)
    return {"mimi": MIMI.init(cfg.mimi, k1), "lm": LM.init(cfg.lm, k2)}


def test_asr_step_and_reset_isolation():
    cfg = small_asr_cfg()
    params = make_params(cfg, jax.random.PRNGKey(0))
    b = 2
    state = asr.init_state(cfg, b, cache_dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    frames = [
        jax.random.normal(jax.random.PRNGKey(10 + i), (b, 1, cfg.mimi.frame_size)) * 0.1
        for i in range(4)
    ]
    on = jnp.ones((b,), bool)
    off_reset = jnp.zeros((b,), bool)

    step = jax.jit(lambda p, s, x, m, r, k: asr.step(cfg, p, s, x, m, r, k))

    outs = []
    for f in frames[:3]:
        out, state = step(params, state, f, on, off_reset, rng)
        outs.append(out)
    assert outs[0]["text_token"].shape == (b,)
    assert outs[0]["prs"].shape == (b, 2)
    assert outs[-1]["step_idx"].tolist() == [3, 3]

    # Reset slot 1, feed frame 3: must equal a fresh stream's first frame.
    out4, _ = step(params, state, frames[3], on, jnp.array([False, True]), rng)
    fresh = asr.init_state(cfg, b, cache_dtype=jnp.float32)
    out_ref, _ = step(params, fresh, frames[3], on, off_reset, rng)
    assert int(out4["text_token"][1]) == int(out_ref["text_token"][1])
    assert out4["step_idx"].tolist() == [4, 1]
    np.testing.assert_allclose(
        np.asarray(out4["prs"][1]), np.asarray(out_ref["prs"][1]), rtol=2e-4, atol=2e-5
    )


def test_asr_inactive_slot_frozen():
    cfg = small_asr_cfg()
    params = make_params(cfg, jax.random.PRNGKey(0))
    b = 2
    state = asr.init_state(cfg, b, cache_dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    f = jnp.zeros((b, 1, cfg.mimi.frame_size))
    no_reset = jnp.zeros((b,), bool)
    out, state = asr.step(
        cfg, params, state, f, jnp.array([True, False]), no_reset, rng
    )
    # Slot 1 never stepped: counters frozen, token still the start token.
    assert out["step_idx"].tolist() == [1, 0]
    assert int(out["text_token"][1]) == cfg.lm.text_start_token


def test_word_state_machine():
    cfg = small_asr_cfg()  # delay = 2, sep = 0, pad = 3
    ws = asr.WordState(cfg, 1)
    events = []
    # token stream (post-delay): 5, 6, 0(sep), 3(pad), 7, 0
    seq = [(5, 3), (6, 4), (0, 5), (3, 6), (7, 7), (0, 8)]
    for tok, step_idx in seq:
        events += ws.process(np.array([tok]), np.array([step_idx]), np.array([True]))
    words = [e for e in events if isinstance(e, asr.WordEvent)]
    ends = [e for e in events if isinstance(e, asr.EndWordEvent)]
    assert [w.tokens for w in words] == [[5, 6], [7]]
    # First word ends at (5-2)/12.5, second starts after that.
    assert ends[0].stop_time == (5 - 2) / 12.5
    assert words[1].start_time == (5 - 2) / 12.5
    assert ends[1].stop_time == (8 - 2) / 12.5


def test_word_state_before_delay_suppressed():
    cfg = small_asr_cfg()
    ws = asr.WordState(cfg, 1)
    events = ws.process(np.array([5]), np.array([1]), np.array([True]))
    assert events == []
