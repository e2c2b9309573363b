"""Duplex (Moshi) session, conditioners, speaker encoder."""

import jax
import jax.numpy as jnp
import numpy as np

from dsm_tpu.models import conditioner as C
from dsm_tpu.models import lm as LM
from dsm_tpu.models import speaker as SPK
from dsm_tpu.ops import transformer as T
from dsm_tpu.sessions import lm_gen
from tests.test_mimi import small_cfg as small_mimi_cfg


def small_duplex_cfg():
    lm_cfg = LM.LmConfig(
        transformer=T.TransformerConfig(
            d_model=32, num_heads=4, num_layers=2, dim_feedforward=64, context=32
        ),
        depformer=LM.DepFormerConfig(
            transformer=T.TransformerConfig(
                d_model=16, num_heads=2, num_layers=2, dim_feedforward=32,
                context=3, positional_embedding="none",
            ),
            num_slices=3,
        ),
        text_in_vocab_size=41, text_out_vocab_size=40,
        audio_vocab_size=9, audio_codebooks=6,
    )
    return lm_gen.DuplexConfig(
        lm=lm_cfg, generated_audio_codebooks=3, input_audio_codebooks=3,
        acoustic_delay=2, text_start_token=40, max_steps=32,
        audio_temperature=0.0, text_temperature=0.0,
        repetition_penalty=(8, 1.5),
    )


def test_duplex_steps_produce_frames():
    cfg = small_duplex_cfg()
    params = {"lm": LM.init(cfg.lm, jax.random.PRNGKey(0))}
    state = lm_gen.init_state(cfg, 1, cache_dtype=jnp.float32)
    rng = jax.random.PRNGKey(1)
    step = jax.jit(lambda p, s, a, k: lm_gen.step(cfg, p, s, a, k))
    outs = []
    for i in range(6):
        user = jnp.full((1, 3), (i % 8), jnp.int32)
        out, state = step(params, state, user, jax.random.fold_in(rng, i))
        outs.append(out)
    assert not bool(outs[0]["frame_valid"][0])  # acoustic delay
    assert not bool(outs[1]["frame_valid"][0])
    assert bool(outs[3]["frame_valid"][0])
    frame = outs[3]["frame"][0]
    assert frame.shape == (3,)
    assert int(frame.max()) < cfg.lm.audio_vocab_size - 1
    assert int(state["step_idx"][0]) == 6  # per-slot counters
    # User audio recorded in the input codebook group.
    buf = np.asarray(state["audio_tokens"][0])
    assert buf[2, 3] == 2 % 8


def test_repetition_penalty_discourages_repeat():
    cfg = small_duplex_cfg()
    s = jnp.int32(5)
    text_buf = jnp.full((1, 40), -1, jnp.int32)
    # Token 7 was emitted recently.
    text_buf = text_buf.at[0, :5].set(jnp.array([7, 3, 7, 12, 3]))
    logits = jnp.zeros((1, 40)).at[0, 7].set(2.0).at[0, 12].set(-1.0).at[0, 9].set(1.9)
    out = lm_gen._rep_penalty(cfg, logits, text_buf, s)
    # Positive logit of a seen token shrinks; negative grows more negative.
    assert float(out[0, 7]) < 2.0
    assert float(out[0, 12]) < -1.0
    # Unseen token untouched.
    np.testing.assert_allclose(float(out[0, 9]), 1.9, rtol=1e-6)
    # Pad token (3) is special, never penalised even though present.
    assert float(out[0, 3]) == 0.0


def test_lut_and_continuous_conditioners():
    lut = C.LutConfig(n_bins=4, dim=8, possible_values=("a", "b"))
    cont = C.ContinuousAttributeConfig(dim=8, scale_factor=2.0, max_period=100.0)
    provider = C.ConditionProvider(16, {"style": lut, "delay": cont}, jax.random.PRNGKey(0))
    ca = provider.condition_lut("style", "a")
    cb = provider.condition_lut("style", "b")
    assert ca.shape == (1, 16) and not np.allclose(ca, cb)
    d1 = provider.condition_cont("delay", -2.0)
    d2 = provider.condition_cont("delay", -2.5)
    assert d1.shape == (1, 16) and not np.allclose(d1, d2)
    assert provider.learnt_padding("delay").shape == (1, 16)
    import pytest

    with pytest.raises(KeyError):
        provider.condition_lut("style", "zz")
    # TOML parsing path.
    cfgs = C.configs_from_toml(
        {
            "style": {"type": "Lut", "n_bins": 4, "dim": 8, "possible_values": ["a"]},
            "delay": {"type": "ContinuousAttribute", "dim": 8,
                      "scale_factor": 1.0, "max_period": 10.0},
        }
    )
    assert isinstance(cfgs["style"], C.LutConfig)


def test_speaker_encoder_shapes():
    from dsm_tpu.models import mimi as MIMI

    mimi_cfg = small_mimi_cfg()
    # 0.96 s -> exactly 12 codec frames (an odd sample count would make the
    # offline encoder pad an extra frame and misalign the padding check).
    cfg = SPK.SpeakerEncoderConfig(
        cond_dim=24, n_speakers=2, duration_s=0.96, mimi=mimi_cfg
    )
    params = SPK.init(cfg, jax.random.PRNGKey(0))
    mimi_params = MIMI.init(mimi_cfg, jax.random.PRNGKey(1))
    frames = cfg.frames_per_speaker
    assert frames == 12

    # One real speaker -> padded to 2 slots.
    n = int(cfg.duration_s * mimi_cfg.sample_rate)
    pcm = jax.random.normal(jax.random.PRNGKey(2), (n,))
    ca = SPK.encode(cfg, params, mimi_params, [pcm])
    assert ca.shape[0] == 1 and ca.shape[2] == 24
    # Second half is learnt padding (+ sin embedding).
    per = ca.shape[1] // 2
    emb = SPK.empty(cfg, params)
    assert emb.shape == (1, 2 * frames, 24)
    np.testing.assert_allclose(
        np.asarray(ca[0, per:]), np.asarray(emb[0, per : 2 * per]), atol=1e-5
    )


def test_lm_gen_simple_generate():
    """Generic per-codebook-delay generator (lm_generate.rs parity)."""
    from dsm_tpu.sessions import lm_gen_simple as G

    dup = small_duplex_cfg()
    lm_cfg = dup.lm
    cfg = G.GenConfig(
        lm=lm_cfg, audio_delays=(0, 2, 2), text_start_token=40, max_steps=32,
        audio_temperature=0.0, text_temperature=0.0,
    )
    params = {"lm": LM.init(lm_cfg, jax.random.PRNGKey(0))}
    texts, frames = G.generate(cfg, params, 12, seed=0, forced_text=[7, 8])
    assert len(texts) == 12
    assert texts[0] == 7 and texts[1] == 8  # teacher forcing
    assert frames.shape[1] == 3
    assert frames.shape[0] >= 6  # frames flow after max delay
    assert frames.max() < lm_cfg.audio_vocab_size - 1


def test_condition_provider_checkpoint_load():
    """ConditionProvider.load_params adopts reference-layout checkpoint keys
    (conditioner.rs:41-44,74-76)."""
    lut = C.LutConfig(n_bins=4, dim=8, possible_values=("a", "b"))
    provider = C.ConditionProvider(16, {"style": lut}, jax.random.PRNGKey(0))
    before = np.asarray(provider.condition_lut("style", "a"))

    rng = np.random.default_rng(0)
    tensors = {
        "condition_provider.conditioners.style.embed.weight":
            rng.standard_normal((5, 8)).astype(np.float32),
        "condition_provider.conditioners.style.output_proj.weight":
            rng.standard_normal((16, 8)).astype(np.float32),
        "condition_provider.conditioners.style.learnt_padding":
            rng.standard_normal((1, 1, 16)).astype(np.float32),
    }
    assert provider.load_params(tensors) == 3
    after = np.asarray(provider.condition_lut("style", "a"))
    assert not np.allclose(before, after)
    assert provider.learnt_padding("style").shape == (1, 16)
    # Deterministic from the loaded weights.
    want = tensors[
        "condition_provider.conditioners.style.embed.weight"
    ][0] @ tensors[
        "condition_provider.conditioners.style.output_proj.weight"
    ].T
    np.testing.assert_allclose(after[0], want, rtol=1e-5)


def test_lm_gen_simple_chunked_matches_per_step():
    """Chunked-scan generation (chunk=K) is bit-identical to the per-step
    loop (chunk=1): the PRNG subkeys are precomputed with the same split
    sequence, so dispatch grouping cannot change outputs."""
    import numpy as np

    from dsm_tpu.sessions import lm_gen_simple as G

    dup = small_duplex_cfg()
    cfg = G.GenConfig(
        lm=dup.lm, audio_delays=(0, 2, 2), text_start_token=40, max_steps=64,
    )
    params = {"lm": LM.init(dup.lm, jax.random.PRNGKey(0))}
    t1, f1 = G.generate(cfg, params, 30, seed=3, forced_text=[7, 8], chunk=1)
    t2, f2 = G.generate(cfg, params, 30, seed=3, forced_text=[7, 8], chunk=8)
    assert t1 == t2
    np.testing.assert_array_equal(f1, f2)
