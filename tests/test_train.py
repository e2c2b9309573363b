"""Training step: delayed inputs correctness + loss decreases."""

import jax
import jax.numpy as jnp
import numpy as np

from dsm_tpu import train
from dsm_tpu.models import lm as LM
from tests.test_lm import small_lm


def test_build_delayed_inputs_pattern():
    cfg = train.TrainConfig(lm=small_lm(), acoustic_delay=2)
    b, t, k = 1, 6, 3
    text = jnp.arange(1, t + 1, dtype=jnp.int32)[None]
    audio = (jnp.arange(t)[None, :, None] * 10 + jnp.arange(k)).astype(jnp.int32)
    text_in, audio_in = train.build_delayed_inputs(cfg, text, audio)
    # Text shifted right with the start token first.
    assert text_in[0].tolist() == [cfg.lm.text_start_token, 1, 2, 3, 4, 5]
    pad = cfg.lm.audio_pad_token
    # cb0: delay 1 frame; cb>0: acoustic_delay + 1.
    assert audio_in[0, :, 0].tolist() == [pad, 0, 10, 20, 30, 40]
    assert audio_in[0, :, 1].tolist() == [pad, pad, pad, 1, 11, 21]
    assert audio_in[0, :, 2].tolist() == [pad, pad, pad, 2, 12, 22]


def test_loss_decreases():
    cfg = train.TrainConfig(lm=small_lm(), learning_rate=3e-3)
    params = LM.init(cfg.lm, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    # Audio columns must cover max(audio_codebooks=3, depformer slices=4).
    batch = {
        "text": jnp.asarray(rng.integers(0, 10, (2, 8)), jnp.int32),
        "audio": jnp.asarray(rng.integers(0, 7, (2, 8, 4)), jnp.int32),
    }
    opt = train.make_optimizer(cfg)
    opt_state = opt.init(params)
    step = train.make_train_step(cfg, opt)
    losses = []
    for _ in range(8):
        params, opt_state, loss, aux = step(params, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses
    assert "audio_loss" in aux
