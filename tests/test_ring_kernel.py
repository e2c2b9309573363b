"""Pallas ring-commit kernel equivalence (interpret mode on CPU).

The kernel path (ops/ring_kernels.py) must be bit-identical to the XLA
dynamic_update_slice path it replaces on the serving hot path — the same
invariant the reference asserts for its scatter append
(moshi-core/src/kv_cache.rs:333-406).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsm_tpu.ops import attention as attn
from dsm_tpu.ops import ring_kernels as rk
from dsm_tpu.ops import transformer as T


@pytest.mark.parametrize(
    "B,H,C,Dh,T_new,dtype",
    [
        (4, 2, 32, 128, 1, jnp.bfloat16),
        (8, 2, 32, 64, 2, jnp.bfloat16),
        (16, 4, 128, 128, 1, jnp.int8),
        (8, 3, 128, 64, 2, jnp.int8),
        # h>16 exercises the halved batch block (scoped-VMEM guard) with
        # b > bb so the grid actually splits.
        (16, 32, 128, 64, 1, jnp.int8),
        (4, 2, 32, 128, 1, jnp.float32),
    ],
)
def test_ring_commit_matches_dus(B, H, C, Dh, T_new, dtype):
    kc = (jax.random.normal(jax.random.PRNGKey(0), (B, H, C, Dh)) * 10).astype(dtype)
    vc = (jax.random.normal(jax.random.PRNGKey(9), (B, H, C, Dh)) * 10).astype(dtype)
    kn = (jax.random.normal(jax.random.PRNGKey(1), (B, H, T_new, Dh)) * 10).astype(dtype)
    vn = (jax.random.normal(jax.random.PRNGKey(2), (B, H, T_new, Dh)) * 10).astype(dtype)
    quant = dtype == jnp.int8
    assert rk.supported(kc, kn, quant)
    for pos in [0, T_new, C - T_new, C + 6 * T_new]:
        plan = attn.global_ring_plan(jnp.int32(pos), C, T_new)
        k_ref, v_ref = attn.ring_write_global(kc, vc, kn, vn, plan)
        if quant:
            ksc = jnp.arange(B * H * C, dtype=jnp.float32).reshape(B, H, C)
            vsc = ksc + 0.5
            ksn = jnp.full((B, H, T_new), 3.0)
            vsn = jnp.full((B, H, T_new), 4.0)
            ko, vo, kso, vso = rk.ring_commit(
                kc, vc, kn, vn, plan["w"][0], ksc, vsc, ksn, vsn, interpret=True
            )
            ks_ref = jax.lax.dynamic_update_slice_in_dim(
                ksc, ksn, plan["w"][0], axis=2
            )
            vs_ref = jax.lax.dynamic_update_slice_in_dim(
                vsc, vsn, plan["w"][0], axis=2
            )
            assert np.array_equal(np.asarray(kso), np.asarray(ks_ref))
            assert np.array_equal(np.asarray(vso), np.asarray(vs_ref))
        else:
            ko, vo = rk.ring_commit(kc, vc, kn, vn, plan["w"][0], interpret=True)
        assert np.array_equal(np.asarray(ko), np.asarray(k_ref)), pos
        assert np.array_equal(np.asarray(vo), np.asarray(v_ref)), pos


def test_ring_commit_rejects_misaligned():
    kc = jnp.zeros((4, 2, 33, 128), jnp.bfloat16)  # cap not block-aligned
    kn = jnp.zeros((4, 2, 1, 128), jnp.bfloat16)
    assert not rk.supported(kc, kn, False)
    with pytest.raises(ValueError):
        rk.ring_commit(kc, kc, kn, kn, 0)


@pytest.mark.parametrize("kv_quant", [False, True])
def test_transformer_step_kernel_path_identical(monkeypatch, kv_quant):
    """Full streaming transformer: kernel path ≡ XLA DUS path, bitwise."""
    cfg = T.TransformerConfig(
        d_model=64, num_heads=2, num_layers=2, dim_feedforward=128,
        context=24, positional_embedding="rope",
    )
    params = T.init(cfg, jax.random.PRNGKey(0))
    xs = jax.random.normal(jax.random.PRNGKey(1), (8, 40, 64), jnp.float32)

    def run(enabled):
        monkeypatch.setenv("DSM_RING_KERNEL", "1" if enabled else "0")
        st = T.init_state(cfg, 8, cache_dtype=jnp.bfloat16, kv_quant=kv_quant)
        if enabled:
            assert rk.supported(
                st["layers"][0]["k"], st["layers"][0]["k"][:, :, :1], kv_quant
            )
        outs = []
        for i in range(40):
            y, st = T.step(cfg, params, st, xs[:, i : i + 1, :])
            outs.append(y)
        return jnp.concatenate(outs, axis=1)

    y_ref = run(False)
    y_kern = run(True)
    assert np.array_equal(np.asarray(y_ref), np.asarray(y_kern))
