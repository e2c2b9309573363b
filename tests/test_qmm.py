"""Fused dequant-matmul kernel (ops/qmm.py) equivalence, interpret mode.

qmm must be numerically identical to the XLA W8A16 path it replaces
(same bf16 dot, same f32 per-channel scale multiply).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsm_tpu.ops import qmm as Q
from dsm_tpu.ops import transformer as T


@pytest.mark.parametrize(
    "M,I,O",
    [
        (128, 2048, 6144),   # stt-1b in_proj
        (128, 2048, 2048),   # out_proj
        (8, 256, 512),       # small
        (16, 1024, 5632),    # gated-MLP hidden (odd multiple of 128)
    ],
)
def test_qmm_matches_xla(M, I, O):
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (M, I)) * 0.5).astype(jnp.bfloat16)
    wq = jax.random.randint(jax.random.PRNGKey(1), (O, I), -127, 128, jnp.int8)
    s = jax.random.uniform(jax.random.PRNGKey(2), (O,), jnp.float32, 0.001, 0.02)
    assert Q.supported(x, wq)
    ref = (x @ wq.astype(x.dtype).T) * s.astype(x.dtype)
    out = Q.qmm(x, wq, s, interpret=True)
    assert out.dtype == ref.dtype and out.shape == ref.shape
    # The kernel applies the f32 scale before the bf16 round; the XLA path
    # rounds the scale to bf16 first — differences are single-ulp bf16.
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=1e-1, rtol=2e-2,
    )
    exact = (
        np.asarray(x, np.float32) @ np.asarray(wq, np.float32).T
    ) * np.asarray(s, np.float32)[None, :]
    err_kernel = np.abs(np.asarray(out, np.float32) - exact).mean()
    err_xla = np.abs(np.asarray(ref, np.float32) - exact).mean()
    assert err_kernel <= err_xla * 1.01  # the kernel is never less accurate


def test_qmm_leading_dims():
    x = (jax.random.normal(jax.random.PRNGKey(0), (4, 2, 256)) * 0.5).astype(
        jnp.bfloat16
    )
    wq = jax.random.randint(jax.random.PRNGKey(1), (384, 256), -127, 128, jnp.int8)
    s = jnp.full((384,), 0.01, jnp.float32)
    assert Q.supported(x, wq)
    out = Q.qmm(x, wq, s, interpret=True)
    ref = (x @ wq.astype(x.dtype).T) * s.astype(x.dtype)
    assert out.shape == (4, 2, 384)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=1e-2, rtol=1e-2,
    )


def test_supported_gates():
    x = jnp.zeros((128, 2048), jnp.bfloat16)
    assert Q.supported(x, jnp.zeros((6144, 2048), jnp.int8))
    # O without a 128-multiple divisor <= 512 -> XLA (text head O=8000)
    assert not Q.supported(x, jnp.zeros((8000, 2048), jnp.int8))
    # tiny M (single-session CPU client) -> XLA
    assert not Q.supported(jnp.zeros((1, 2048), jnp.bfloat16),
                           jnp.zeros((6144, 2048), jnp.int8))
    # I not lane-aligned -> XLA
    assert not Q.supported(jnp.zeros((128, 200), jnp.bfloat16),
                           jnp.zeros((512, 200), jnp.int8))


def test_mm_routes_through_qmm(monkeypatch):
    """transformer.mm picks the kernel when forced on and matches the
    XLA path bitwise-closely."""
    monkeypatch.setenv("DSM_QMM", "1")
    x = (jax.random.normal(jax.random.PRNGKey(0), (16, 1, 256)) * 0.5).astype(
        jnp.bfloat16
    )
    w = {
        "q": jax.random.randint(jax.random.PRNGKey(1), (512, 256), -127, 128,
                                jnp.int8),
        "s": jnp.full((512,), 0.01, jnp.float32),
    }
    y_on = T.mm(x, w)
    monkeypatch.setenv("DSM_QMM", "0")
    y_off = T.mm(x, w)
    np.testing.assert_allclose(
        np.asarray(y_on, np.float32), np.asarray(y_off, np.float32),
        atol=1e-2, rtol=1e-2,
    )


def test_w8a8_default_and_env_precedence(monkeypatch):
    """set_w8a8_default supplies the default; DSM_W8A8 env overrides in
    BOTH directions (serving profile knob wiring)."""
    from dsm_tpu.ops import qmm

    monkeypatch.delenv("DSM_W8A8", raising=False)
    qmm.set_w8a8_default(False)
    assert not qmm.w8a8_enabled()
    qmm.set_w8a8_default(True)
    assert qmm.w8a8_enabled()
    monkeypatch.setenv("DSM_W8A8", "0")
    assert not qmm.w8a8_enabled()
    qmm.set_w8a8_default(False)
    monkeypatch.setenv("DSM_W8A8", "1")
    assert qmm.w8a8_enabled()
    monkeypatch.delenv("DSM_W8A8", raising=False)
    qmm.set_w8a8_default(False)
