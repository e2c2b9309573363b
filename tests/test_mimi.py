"""Mimi codec: shapes, streaming equivalence, roundtrip determinism.

A reduced-geometry config keeps CPU test time sane while exercising every
code path (multi-ratio SeaNet, codec transformer with 2 frames/step, learnt
resample, split RVQ).  The full-size config is shape-checked only.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsm_tpu.models import mimi
from dsm_tpu.ops import transformer as T


def small_cfg():
    seanet = mimi.SeaNetConfig(
        dimension=32, channels=1, n_filters=4, n_residual_layers=1,
        ratios=(4, 3, 2), kernel_size=7, residual_kernel_size=3,
        last_kernel_size=3,
    )
    tfm = T.TransformerConfig(
        d_model=32, num_heads=4, num_layers=2, dim_feedforward=64,
        context=16, gating=False, norm="layer_norm",
        positional_embedding="rope", layer_scale=0.01,
    )
    return mimi.MimiConfig(
        seanet=seanet, transformer=tfm, n_q=4, bins=32, q_dim=16,
        sample_rate=600.0, frame_rate=12.5,
    )


def test_small_cfg_geometry():
    cfg = small_cfg()
    assert cfg.encoder_stride == 24
    assert cfg.encoder_frame_rate == 25.0
    assert cfg.downsample_stride == 2
    assert cfg.frame_size == 48
    assert cfg.frames_per_step == 2


def test_encode_decode_step_shapes_and_equivalence():
    cfg = small_cfg()
    params = mimi.init(cfg, jax.random.PRNGKey(0))
    b, n_frames = 2, 5
    pcm = jax.random.normal(
        jax.random.PRNGKey(1), (b, 1, cfg.frame_size * n_frames)
    ) * 0.1

    codes_full = mimi.encode(cfg, params, pcm)
    assert codes_full.shape == (b, cfg.n_q, n_frames)

    state = mimi.init_encode_state(cfg, b)
    chunks = []
    for i in range(n_frames):
        frame = pcm[..., i * cfg.frame_size : (i + 1) * cfg.frame_size]
        codes, state = mimi.encode_step(cfg, params, state, frame)
        assert codes.shape == (b, cfg.n_q, 1)
        chunks.append(codes)
    codes_steps = jnp.concatenate(chunks, axis=-1)
    # Codes are argmins -> streaming equivalence must be exact.
    np.testing.assert_array_equal(np.asarray(codes_full), np.asarray(codes_steps))

    # Decode: streaming == offline.
    pcm_full = mimi.decode(cfg, params, codes_full)
    assert pcm_full.shape == (b, 1, cfg.frame_size * n_frames)
    dstate = mimi.init_decode_state(cfg, b)
    outs = []
    for i in range(n_frames):
        out, dstate = mimi.decode_step(cfg, params, dstate, codes_steps[..., i : i + 1])
        assert out.shape == (b, 1, cfg.frame_size)
        outs.append(out)
    np.testing.assert_allclose(
        np.asarray(pcm_full),
        np.asarray(jnp.concatenate(outs, axis=-1)),
        atol=1e-4, rtol=1e-3,
    )


def test_masked_slot_isolation():
    """A slot that skips a frame must behave like a fresh shorter stream."""
    cfg = small_cfg()
    params = mimi.init(cfg, jax.random.PRNGKey(0))
    b = 2
    f1 = jax.random.normal(jax.random.PRNGKey(2), (b, 1, cfg.frame_size)) * 0.1
    f2 = jax.random.normal(jax.random.PRNGKey(3), (b, 1, cfg.frame_size)) * 0.1

    state = mimi.init_encode_state(cfg, b)
    _, state = mimi.encode_step(cfg, params, state, f1, jnp.array([True, False]))
    c2, _ = mimi.encode_step(cfg, params, state, f2, jnp.array([True, True]))

    fresh = mimi.init_encode_state(cfg, b)
    c_ref, _ = mimi.encode_step(cfg, params, fresh, f2)
    np.testing.assert_array_equal(np.asarray(c2[1]), np.asarray(c_ref[1]))


@pytest.mark.slow
def test_full_size_config_shapes():
    cfg = mimi.v0_1(8)
    assert cfg.frame_size == 1920
    assert cfg.encoder_stride == 960
    params = mimi.init(cfg, jax.random.PRNGKey(0))
    state = mimi.init_encode_state(cfg, 1)
    pcm = jnp.zeros((1, 1, 1920))
    codes, state = jax.jit(
        lambda p, s, x: mimi.encode_step(cfg, p, s, x)
    )(params, state, pcm)
    assert codes.shape == (1, 8, 1)
    dstate = mimi.init_decode_state(cfg, 1)
    out, _ = jax.jit(
        lambda p, s, c: mimi.decode_step(cfg, p, s, c)
    )(params, dstate, codes)
    assert out.shape == (1, 1, 1920)
