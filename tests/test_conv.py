"""Streaming-equivalence tests for causal convs.

Replicates the reference's own equivalence grid (moshi-core/src/conv.rs:
608-724): chunked `step` must produce exactly the same output as one-shot
`forward`, across kernel/stride/dilation/step-size combinations, plus masked
per-slot state semantics that the reference only exercises in production.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsm_tpu.ops import conv


def _run_conv(k, stride, dilation, step_mult, n_steps, bias, pad_mode="constant"):
    cfg = conv.ConvConfig(
        in_c=2, out_c=3, k=k, stride=stride, dilation=dilation,
        bias=bias, pad_mode=pad_mode,
    )
    key = jax.random.PRNGKey(k * 100 + stride * 10 + dilation)
    params = conv.init(cfg, key)
    step_len = step_mult * stride
    total = step_len * n_steps
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, total))
    y_full = conv.forward(cfg, params, x)
    state = conv.init_state(cfg, 1)
    chunks = []
    for i in range(n_steps):
        xi = x[..., i * step_len : (i + 1) * step_len]
        yi, state = conv.step(cfg, params, state, xi)
        chunks.append(yi)
    y_steps = jnp.concatenate(chunks, axis=-1)
    assert y_full.shape == y_steps.shape, (y_full.shape, y_steps.shape)
    np.testing.assert_allclose(y_full, y_steps, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("step_mult", [1, 2, 3])
@pytest.mark.parametrize("bias", [False, True])
@pytest.mark.parametrize(
    "k,stride,dilation",
    [(1, 1, 1), (2, 1, 1), (2, 2, 1), (3, 2, 1), (3, 2, 2), (7, 1, 1), (16, 8, 1)],
)
def test_conv1d_step_equals_forward(k, stride, dilation, step_mult, bias):
    _run_conv(k, stride, dilation, step_mult, 5, bias)


@pytest.mark.parametrize("k,stride", [(4, 2), (8, 4)])
def test_conv1d_replicate_pad(k, stride):
    # The learnt downsample uses replicate padding (conv.rs:504-535).
    _run_conv(k, stride, 1, 2, 5, False, pad_mode="replicate")


@pytest.mark.parametrize("step_mult", [1, 2, 3])
@pytest.mark.parametrize("bias", [False, True])
@pytest.mark.parametrize("k,stride", [(1, 1), (2, 1), (3, 1), (3, 2), (8, 4)])
def test_conv_tr1d_step_equals_forward(k, stride, step_mult, bias):
    cfg = conv.ConvTrConfig(in_c=2, out_c=3, k=k, stride=stride, bias=bias)
    params = conv.tr_init(cfg, jax.random.PRNGKey(k * 10 + stride))
    n_steps = 5
    step_len = step_mult
    total = step_len * n_steps
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, total))
    y_full = conv.tr_forward(cfg, params, x)
    state = conv.tr_init_state(cfg, 1)
    chunks = []
    for i in range(n_steps):
        xi = x[..., i * step_len : (i + 1) * step_len]
        yi, state = conv.tr_step(cfg, params, state, xi)
        chunks.append(yi)
    y_steps = jnp.concatenate(chunks, axis=-1)
    assert y_full.shape == y_steps.shape
    np.testing.assert_allclose(y_full, y_steps, atol=1e-5, rtol=1e-5)


def test_conv_tr1d_depthwise():
    # The learnt upsample is depthwise (groups == dim; conv.rs:557-585).
    dim, stride = 4, 2
    cfg = conv.upsample_cfg(stride, dim)
    params = conv.tr_init(cfg, jax.random.PRNGKey(7))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, dim, 6))
    y_full = conv.tr_forward(cfg, params, x)
    assert y_full.shape == (2, dim, 12)
    state = conv.tr_init_state(cfg, 2)
    chunks = []
    for i in range(6):
        yi, state = conv.tr_step(cfg, params, state, x[..., i : i + 1])
        chunks.append(yi)
    np.testing.assert_allclose(
        y_full, jnp.concatenate(chunks, axis=-1), atol=1e-5, rtol=1e-5
    )


def test_conv_masked_slots_keep_state():
    """Inactive slots must not advance their carry (batched streaming)."""
    cfg = conv.ConvConfig(in_c=2, out_c=2, k=3, stride=1)
    params = conv.init(cfg, jax.random.PRNGKey(3))
    b = 2
    x1 = jax.random.normal(jax.random.PRNGKey(4), (b, 2, 4))
    x2 = jax.random.normal(jax.random.PRNGKey(5), (b, 2, 4))

    # Slot 0 active on both steps; slot 1 active only on step 2.
    state = conv.init_state(cfg, b)
    mask1 = jnp.array([True, False])
    _, state = conv.step(cfg, params, state, x1, mask1)
    y2, state = conv.step(cfg, params, state, x2, jnp.array([True, True]))

    # Slot 1's result must equal a fresh stream fed x2 only.
    ref_state = conv.init_state(cfg, b)
    y_ref, _ = conv.step(cfg, params, ref_state, x2)
    np.testing.assert_allclose(y2[1], y_ref[1], atol=1e-6)

    # Slot 0's result must equal an unmasked two-step stream.
    st = conv.init_state(cfg, b)
    _, st = conv.step(cfg, params, st, x1)
    y_ref0, _ = conv.step(cfg, params, st, x2)
    np.testing.assert_allclose(y2[0], y_ref0[0], atol=1e-6)
