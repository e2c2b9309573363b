"""Legacy T5-conditioned TTS (sessions/tts_legacy.py; reference
moshi-core/src/tts.rs): conditions building, delayed audio-only generation,
end-of-gen handling, CFG two-row path."""

import jax
import jax.numpy as jnp
import numpy as np

from dsm_tpu.models import lm as LM
from dsm_tpu.ops import transformer as T
from dsm_tpu.sessions import tts_legacy as LT
from tests.test_mimi import small_cfg as small_mimi_cfg


def tiny_cfg(vocab=10, k=4):
    lm_cfg = LM.LmConfig(
        transformer=T.TransformerConfig(
            d_model=32, num_heads=4, num_layers=2, dim_feedforward=64,
            context=64, cross_attention=True, ca_norm="layer_norm",
        ),
        depformer=LM.DepFormerConfig(
            transformer=T.TransformerConfig(
                d_model=16, num_heads=2, num_layers=1, dim_feedforward=32,
                context=k, positional_embedding="none",
            ),
            num_slices=k,
        ),
        text_in_vocab_size=11, text_out_vocab_size=11,
        audio_vocab_size=vocab, audio_codebooks=k,
    )
    return LT.LegacyTtsConfig(
        lm=lm_cfg, mimi=small_mimi_cfg(), max_duration_s=3.0,
        max_speakers=2, temperature=0.0,
    )


def test_legacy_sample_shapes_and_delays():
    cfg = tiny_cfg()
    params = {"lm": LM.init(cfg.lm, jax.random.PRNGKey(0))}
    ca_src = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 32))
    toks = LT.sample(cfg, params, ca_src, max_steps=12)
    assert toks.ndim == 2 and toks.shape[1] == 4
    # Greedy, random init: tokens may stop early but all kept frames valid.
    if toks.shape[0]:
        assert toks.max() < cfg.quantizer_bins
        assert toks.min() >= 0


def test_legacy_step_delayed_writes():
    cfg = tiny_cfg()
    params = {"lm": LM.init(cfg.lm, jax.random.PRNGKey(0))}
    ca_src = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 32))
    ca_kv = T.precompute_ca_kv(cfg.lm.transformer, params["lm"]["transformer"], ca_src)
    state = LT.init_state(cfg, 1, cache_dtype=jnp.float32)
    rng = jax.random.PRNGKey(2)
    fn = jax.jit(lambda p, st, r: LT.step(cfg, p, st, r, ca_kv))
    for i in range(5):
        rng, sub = jax.random.split(rng)
        out, state = fn(params, state, rng)
        assert out["tokens"].shape == (4,)
    buf = np.asarray(state["audio_tokens"])
    # After 5 steps: codebook 0 written for rows 0-4, acoustic rows 0-2.
    assert np.all(buf[:5, 0] >= 0)
    assert np.all(buf[:3, 1:] >= 0)
    assert np.all(buf[5:, 0] == LT.UNSET)
    # Row 0 acoustic was overwritten at s=2 with sampled (non-forced) tokens.
    assert np.all(buf[0, 1:] < cfg.lm.audio_vocab_size)


def test_legacy_conditions_and_cfg():
    from dsm_tpu.models import mimi as MIMI

    cfg = tiny_cfg()
    mimi_params = MIMI.init(cfg.mimi, jax.random.PRNGKey(3))
    params = {"lm": LM.init(cfg.lm, jax.random.PRNGKey(0)), "mimi": mimi_params}
    d_t5 = 12
    t5_proj = jax.random.normal(jax.random.PRNGKey(4), (d_t5, 32)) * 0.1
    spk_proj = jax.random.normal(
        jax.random.PRNGKey(5), (cfg.mimi.seanet.dimension, 32)
    ) * 0.1
    text_states = jax.random.normal(jax.random.PRNGKey(6), (1, 6, d_t5))

    plain = LT.conditions(cfg, params, text_states, t5_proj)
    assert plain.shape == (1, 6, 32)

    n = int(0.48 * cfg.mimi.sample_rate)  # a few codec frames
    pcm = jax.random.normal(jax.random.PRNGKey(7), (1, 1, n))
    both = LT.conditions(cfg, params, text_states, t5_proj, pcm, spk_proj)
    # Two CFG rows: [text|spk|zeros] and [text|zeros|zeros].
    assert both.shape[0] == 2
    assert both.shape[2] == 32
    per_spk = (both.shape[1] - 6) // cfg.max_speakers
    a = np.asarray(both)
    # Rows differ only in the speaker block (cond vs zeroed uncond)...
    assert not np.allclose(a[0, 6 : 6 + per_spk], a[1, 6 : 6 + per_spk])
    # ...and agree on the trailing zero-pad block (same positions → same sin).
    np.testing.assert_allclose(
        a[0, 6 + per_spk :], a[1, 6 + per_spk :], atol=1e-5
    )

    toks = LT.sample(cfg, params, both, cfg_alpha=2.0, max_steps=8)
    assert toks.ndim == 2 and toks.shape[1] == 4
