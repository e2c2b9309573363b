"""Ring KV cache semantics (mirrors kv_cache.rs:333-406 test intent) and
streaming transformer equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsm_tpu.ops import attention as attn
from dsm_tpu.ops import transformer as tfm


def test_ring_plan_positions_and_validity():
    pos = jnp.array([0, 0], jnp.int32)
    ctx = 5

    # Step 1: slot 0 active, slot 1 inactive.
    plan = attn.ring_plan(pos, ctx, 1, jnp.array([True, False]))
    assert plan["w"].tolist() == [[0], [0]]
    # Slot 0: only ring index 0 valid (k_pos == 0), rest unwritten (< 0).
    k_pos0 = plan["k_pos"][0]
    assert int(k_pos0[0]) == 0 and bool(jnp.all(k_pos0[1:] < 0))
    assert plan["new_pos"].tolist() == [1, 0]

    # Advance slot 0 seven times -> wraps the size-5 ring.
    p = plan["new_pos"]
    for _ in range(7):
        plan = attn.ring_plan(p, ctx, 1, jnp.array([True, False]))
        p = plan["new_pos"]
    assert p.tolist() == [8, 0]
    # All 5 ring entries now valid with contiguous positions 3..7.
    k_pos = np.sort(np.asarray(plan["k_pos"][0]))
    np.testing.assert_array_equal(k_pos, [3, 4, 5, 6, 7])


def test_ring_write_masked_preserves_inactive():
    cache = attn.kv_init(2, 1, 4, 2, jnp.float32)
    k1 = jnp.ones((2, 1, 1, 2))
    cache, _ = attn.kv_append(cache, k1, k1, jnp.array([True, False]))
    assert cache["pos"].tolist() == [1, 0]
    np.testing.assert_allclose(cache["k"][0, 0, 0], [1, 1])
    np.testing.assert_allclose(cache["k"][1, 0, 0], [0, 0])  # untouched


@pytest.mark.parametrize("pe", ["rope", "none", "sin"])
@pytest.mark.parametrize("norm", ["rms_norm", "layer_norm"])
def test_transformer_step_equals_forward(pe, norm):
    cfg = tfm.TransformerConfig(
        d_model=32, num_heads=4, num_layers=2, dim_feedforward=64,
        context=16, gating=True, norm=norm, positional_embedding=pe,
        layer_scale=0.01 if norm == "layer_norm" else None,
    )
    params = tfm.init(cfg, jax.random.PRNGKey(0))
    t = 12
    x = jax.random.normal(jax.random.PRNGKey(1), (2, t, 32)) * 0.1
    y_full = tfm.forward(cfg, params, x)

    state = tfm.init_state(cfg, 2, cache_dtype=jnp.float32)
    outs = []
    for i in range(t):
        yi, state = tfm.step(cfg, params, state, x[:, i : i + 1])
        outs.append(yi)
    y_steps = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(y_full, y_steps, atol=2e-5, rtol=2e-4)


def test_transformer_step2_equals_forward():
    # The Mimi codec transformer consumes 2 frames per 80 ms step.
    cfg = tfm.TransformerConfig(
        d_model=32, num_heads=4, num_layers=2, dim_feedforward=64,
        context=8, positional_embedding="rope",
    )
    params = tfm.init(cfg, jax.random.PRNGKey(0))
    t = 12
    x = jax.random.normal(jax.random.PRNGKey(1), (1, t, 32)) * 0.1
    y_full = tfm.forward(cfg, params, x)
    state = tfm.init_state(cfg, 1, cache_dtype=jnp.float32, step_t=2)
    outs = []
    for i in range(0, t, 2):
        yi, state = tfm.step(cfg, params, state, x[:, i : i + 2])
        outs.append(yi)
    np.testing.assert_allclose(
        y_full, jnp.concatenate(outs, axis=1), atol=2e-5, rtol=2e-4
    )


def test_transformer_sliding_window():
    """Positions beyond `context` must be masked out in streaming mode."""
    cfg = tfm.TransformerConfig(
        d_model=16, num_heads=2, num_layers=1, dim_feedforward=32,
        context=4, positional_embedding="none",
    )
    params = tfm.init(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 10, 16)) * 0.1

    state = tfm.init_state(cfg, 1, cache_dtype=jnp.float32)
    outs = []
    for i in range(10):
        yi, state = tfm.step(cfg, params, state, x[:, i : i + 1])
        outs.append(yi)
    y_steps = jnp.concatenate(outs, axis=1)

    # Prefix beyond the window must not influence the last output: feed only
    # the last 4 frames to a fresh stream (positions differ, pe=none).
    state2 = tfm.init_state(cfg, 1, cache_dtype=jnp.float32)
    outs2 = []
    for i in range(6, 10):
        yi, state2 = tfm.step(cfg, params, state2, x[:, i : i + 1])
        outs2.append(yi)
    np.testing.assert_allclose(
        y_steps[:, -1], outs2[-1][:, 0], atol=1e-5, rtol=1e-4
    )


def test_per_slot_reset_via_pos():
    """Zeroing one slot's pos isolates it from its own stale cache."""
    cfg = tfm.TransformerConfig(
        d_model=16, num_heads=2, num_layers=1, dim_feedforward=32,
        context=8, positional_embedding="none",
    )
    params = tfm.init(cfg, jax.random.PRNGKey(0))
    b = 2
    state = tfm.init_state(cfg, b, cache_dtype=jnp.float32)
    xs = jax.random.normal(jax.random.PRNGKey(1), (5, b, 1, 16)) * 0.1
    for i in range(3):
        _, state = tfm.step(cfg, params, state, xs[i])
    # Reset slot 1 (the TPU-native reset_batch_idx: clear validity bitmap).
    state = tfm.reset_state(state, jnp.array([False, True]))
    y4, state = tfm.step(cfg, params, state, xs[3])

    fresh = tfm.init_state(cfg, b, cache_dtype=jnp.float32)
    y_ref, _ = tfm.step(cfg, params, fresh, xs[3])
    np.testing.assert_allclose(y4[1], y_ref[1], atol=1e-5, rtol=1e-4)


def test_cross_attention_shapes():
    cfg = tfm.TransformerConfig(
        d_model=32, num_heads=4, num_layers=2, dim_feedforward=64,
        context=8, cross_attention=True, ca_dim=24,
    )
    params = tfm.init(cfg, jax.random.PRNGKey(0))
    ca_tokens = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 24))
    ca_kv = tfm.precompute_ca_kv(cfg, params, ca_tokens)
    assert ca_kv[0].shape == (2, 2, 4, 7, 8)
    state = tfm.init_state(cfg, 2, cache_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 1, 32))
    y, state = tfm.step(cfg, params, state, x, ca_kv=ca_kv)
    assert y.shape == (2, 1, 32)
    assert jnp.all(jnp.isfinite(y))
