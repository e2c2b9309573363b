"""Mesh + sharding rules on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from dsm_tpu.models import lm as LM
from dsm_tpu.ops import transformer as T
from dsm_tpu.parallel import mesh as M


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    return M.make_mesh(dp=4, tp=2)


def small_tcfg():
    return T.TransformerConfig(
        d_model=32, num_heads=4, num_layers=2, dim_feedforward=96, context=16
    )


def test_param_sharding_specs(mesh):
    cfg = small_tcfg()
    params = T.init(cfg, jax.random.PRNGKey(0))
    sharded = M.shard_transformer_params(mesh, params)
    # Column-parallel in_proj over tp; row-parallel out_proj.
    assert sharded["in_proj_w"].sharding.spec == P(None, "tp", None)
    assert sharded["out_proj_w"].sharding.spec == P(None, None, "tp")
    assert sharded["mlp"]["linear_in"].sharding.spec == P(None, "tp", None)
    assert sharded["mlp"]["linear_out"].sharding.spec == P(None, None, "tp")
    # Norms replicated.
    assert sharded["norm1"]["alpha"].sharding.spec == P()


def test_state_sharding_and_sharded_step(mesh):
    cfg = small_tcfg()
    params = M.shard_transformer_params(mesh, T.init(cfg, jax.random.PRNGKey(0)))
    b = 8
    state = M.shard_batched_state(mesh, T.init_state(cfg, b, jnp.float32), b)
    assert state["layers"][0]["k"].sharding.spec == P("dp", "tp", None, None)
    assert state["valid"].sharding.spec == P("dp", None)

    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (b, 1, 32)),
        M.batch_sharding(mesh),
    )
    step = jax.jit(lambda p, s, x: T.step(cfg, p, s, x))
    y, state2 = step(params, state, x)
    assert y.shape == (b, 1, 32)
    # Batch stays dp-sharded through the step.
    assert "dp" in str(y.sharding)
    # Result matches the unsharded step.
    y_ref, _ = T.step(cfg, jax.device_get(params) and T.init(cfg, jax.random.PRNGKey(0)),
                      T.init_state(cfg, b, jnp.float32), jax.device_get(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5, rtol=1e-4)


def test_sharded_lm_step_runs(mesh):
    cfg = LM.LmConfig(
        transformer=small_tcfg(), depformer=None,
        text_in_vocab_size=17, text_out_vocab_size=16,
        audio_vocab_size=9, audio_codebooks=2,
    )
    params = LM.init(cfg, jax.random.PRNGKey(0))
    params = {
        k: (M.shard_transformer_params(mesh, v) if k == "transformer"
            else M.replicate(mesh, v))
        for k, v in params.items()
    }
    b = 8
    state = M.shard_batched_state(mesh, LM.init_state(cfg, b, jnp.float32), b)
    bs = M.batch_sharding(mesh)
    text = jax.device_put(jnp.zeros((b,), jnp.int32), bs)
    audio = jax.device_put(jnp.zeros((b, 2), jnp.int32), bs)
    logits, hidden, state = jax.jit(
        lambda p, s, t, a: LM.step(cfg, p, s, t, a)
    )(params, state, text, audio)
    assert logits.shape == (b, 16)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_mesh_validation():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    with pytest.raises(ValueError):
        M.make_mesh(dp=3, tp=2)


def test_batched_asr_engine_on_mesh(mesh):
    """Full continuous-batching engine sharded dp x tp on the virtual mesh."""
    import numpy as np

    from dsm_tpu.server import batched_asr as eng
    from tests.test_asr import make_params, small_asr_cfg

    cfg = small_asr_cfg()
    saved = eng.FRAME_SIZE
    eng.FRAME_SIZE = cfg.mimi.frame_size
    try:
        params = make_params(cfg, jax.random.PRNGKey(0))
        e = eng.BatchedAsrEngine(cfg, params, batch_size=8, mesh=mesh)
        # State landed sharded.
        assert "dp" in str(e.state["lm"]["t"]["layers"][0]["k"].sharding)
        events = []
        ch = e.open_channel(events.append)
        pcm = np.random.default_rng(0).standard_normal(
            cfg.mimi.frame_size * 2
        ).astype(np.float32) * 0.1
        ch.push_pcm(pcm)
        while e.tick():
            pass
        assert len(events) == 2
        assert events[-1].step_idx == 2
    finally:
        eng.FRAME_SIZE = saved
