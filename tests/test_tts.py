"""TTS streaming state machine: delayed token pattern, constraints, buffers."""

import jax
import jax.numpy as jnp
import numpy as np

from dsm_tpu.models import lm as LM
from dsm_tpu.ops import transformer as T
from dsm_tpu.sessions import tts


def small_tts_cfg(**kw):
    lm_cfg = LM.LmConfig(
        transformer=T.TransformerConfig(
            d_model=32, num_heads=4, num_layers=2, dim_feedforward=64,
            context=64, cross_attention=True, ca_dim=16,
        ),
        depformer=LM.DepFormerConfig(
            transformer=T.TransformerConfig(
                d_model=16, num_heads=2, num_layers=2, dim_feedforward=32,
                context=4, positional_embedding="none",
            ),
            num_slices=4,
        ),
        text_in_vocab_size=33, text_out_vocab_size=32,
        audio_vocab_size=9, audio_codebooks=4,
    )
    defaults = dict(
        lm=lm_cfg, acoustic_delay=2, text_audio_delay_in_tokens=5,
        max_steps=64, text_start_token=32, temperature=0.0,
        text_temperature=0.0,
    )
    defaults.update(kw)
    return tts.TtsConfig(**defaults)


def setup(cfg, b=1):
    params = {"lm": LM.init(cfg.lm, jax.random.PRNGKey(0))}
    state = tts.init_state(cfg, b, cache_dtype=jnp.float32)
    ca_tokens = jax.random.normal(jax.random.PRNGKey(1), (b, 6, 16))
    ca_kv = T.precompute_ca_kv(cfg.lm.transformer, params["lm"]["transformer"], ca_tokens)
    return params, state, ca_kv


def test_delayed_input_pattern():
    cfg = small_tts_cfg()
    params, state, ca_kv = setup(cfg)
    pad = cfg.lm.audio_pad_token

    # Step 0: cb0 pad (delay window), cb>0 pad (acoustic delay).
    toks = tts._delayed_input_tokens(cfg, state)
    assert toks.tolist() == [[pad] * 4]

    state = dict(state)
    # Step 3 (inside text-audio window): cb0 absent, cb>0 absent.
    state["step_idx"] = jnp.array([4], jnp.int32)
    toks = tts._delayed_input_tokens(cfg, state)
    assert toks.tolist() == [[tts.UNGENERATED] * 4]

    # Step 1-2: cb>0 still pad (acoustic delay), cb0 absent.
    state["step_idx"] = jnp.array([2], jnp.int32)
    toks = tts._delayed_input_tokens(cfg, state)
    assert toks.tolist() == [[tts.UNGENERATED, pad, pad, pad]]

    # Past the window: reads the delayed buffer.
    state["step_idx"] = jnp.array([10], jnp.int32)
    buf = state["audio_tokens"]
    buf = buf.at[0, 9, 0].set(5)  # cb0 reads s-1
    buf = buf.at[0, 7, 1].set(6)  # cb1 reads s-1-2
    state["audio_tokens"] = buf
    toks = tts._delayed_input_tokens(cfg, state)
    assert int(toks[0, 0]) == 5
    assert int(toks[0, 1]) == 6


def test_tts_generation_loop():
    cfg = small_tts_cfg()
    params, state, ca_kv = setup(cfg)
    rng = jax.random.PRNGKey(0)
    step = jax.jit(
        lambda p, s, m, t, k: tts.step(cfg, p, s, m, t, k, ca_kv=ca_kv)
    )

    # Feed one "word" (token 7) then let it pad.
    outs = []
    for i in range(16):
        if i == 0:
            mode, tok = tts.ALLOW_TEXT, 7
        else:
            mode, tok = tts.ALLOW_PAD_OR_EPAD, 0
        out, state = step(
            params, state,
            jnp.array([mode], jnp.int32), jnp.array([tok], jnp.int32),
            jax.random.fold_in(rng, i),
        )
        outs.append(out)

    assert int(outs[0]["text_token"][0]) == 7
    # PadOrEpad constrains every later token to {pad, eop}.
    for o in outs[1:]:
        assert int(o["text_token"][0]) in (cfg.text_pad_token, cfg.text_eop_token)
    # No audio frame valid until past acoustic + text-audio delay; afterwards
    # frames contain real (non-pad) codes once the depformer runs.
    assert not bool(outs[0]["frame_valid"][0])
    assert not bool(outs[4]["frame_valid"][0])
    valid_frames = [bool(o["frame_valid"][0]) for o in outs]
    assert any(valid_frames[8:]), valid_frames
    idx = valid_frames.index(True)
    frame = outs[idx]["frame"][0]
    assert int(frame.max()) < cfg.lm.audio_pad_token
    assert int(frame.min()) >= 0
    # step counter advanced.
    assert state["step_idx"].tolist() == [16]


def test_max_consecutive_pads_forces_eop():
    cfg = small_tts_cfg(max_consecutive_pads=3)
    params, state, ca_kv = setup(cfg)
    state = dict(state)
    state["consecutive_pads"] = jnp.array([5], jnp.int32)
    out, _ = tts.step(
        cfg, params, state,
        jnp.array([tts.ALLOW_PAD_OR_EPAD], jnp.int32),
        jnp.array([0], jnp.int32),
        jax.random.PRNGKey(0), ca_kv=ca_kv,
    )
    assert int(out["text_token"][0]) == cfg.text_eop_token


def test_tokenize_prompt():
    enc = {"hi": [11], "there": [12, 13], "yo": [14]}
    turns = ["hi there", "yo"]
    prompt = tts.tokenize_prompt(turns, bos=1, eos=2, encode=lambda w: enc[w])
    # Main speaker's first word gets bos prefix; other speaker plain.
    assert prompt == [([1, 11], True), ([12, 13], True), ([14], False)]
