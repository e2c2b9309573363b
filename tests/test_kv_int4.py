"""Packed-int4 KV rings (opt-in serving profile, kv_bits=4).

int4 values ride nibble-packed in uint8 (attention.pack4, excess-8): plain
jnp.int4 arrays cannot cross jit boundaries on this environment's backend
and the ring state does so every serving step.  Covered here: pack/unpack
roundtrip, ring-commit + fused decode-attention equivalence in interpret
mode, whole-transformer stream quality vs the exact-dtype path.

int8 KV ships with a <2% mean-relative-error bound (tests/test_kv_quant.py);
int4 halves the ring read again at a looser bound, so it stays OPT-IN
(kv_bits=4, DSM_KV_BITS=4 for bench.py) until validated on real checkpoints.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsm_tpu.ops import attention as attn
from dsm_tpu.ops import decode_attn as da
from dsm_tpu.ops import ring_kernels as rk
from dsm_tpu.ops import transformer as T


def test_pack_unpack_roundtrip():
    q = jax.random.randint(jax.random.PRNGKey(0), (2, 3, 4, 64), -7, 8)
    p = attn.pack4(q)
    assert p.dtype == jnp.uint8 and p.shape == (2, 3, 4, 32)
    back = attn.unpack4(p, jnp.int32)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(q))


def test_init_state_packed4():
    cfg = T.TransformerConfig(
        d_model=64, num_heads=4, num_layers=2, dim_feedforward=128, context=100
    )
    st = T.init_state(cfg, 2, kv_quant=True, kv_bits=4)
    assert st["layers"][0]["k"].dtype == jnp.uint8
    assert st["layers"][0]["k"].shape[-1] == cfg.hd // 2  # nibble-packed
    assert st["layers"][0]["ks"].dtype == jnp.float32


def test_quantize_rows_packed4_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 1, 64)) * 0.5
    kq, vq, ks, vs = attn.quantize_kv_rows_packed4(x, x)
    assert kq.dtype == jnp.uint8 and kq.shape[-1] == 32
    deq = attn.unpack4(kq, jnp.float32) * ks[..., None]
    rel = np.abs(np.asarray(deq - x)).mean() / np.abs(np.asarray(x)).mean()
    # Element-level int4 error on gaussian rows is ~12% (absmax scaling is
    # outlier-driven); attention-output error is far smaller (softmax
    # smoothing; see test_packed4_stream_quality_vs_exact's <5% bound).
    assert rel < 0.15


def test_ring_commit_packed4_matches_dus():
    B, H, C, Dh2 = 4, 2, 128, 64  # packed bytes (Dh = 128)
    key = jax.random.PRNGKey(0)
    mk = lambda k, shape: jax.random.randint(k, shape, 0, 256).astype(jnp.uint8)
    kc = mk(jax.random.fold_in(key, 0), (B, H, C, Dh2))
    vc = mk(jax.random.fold_in(key, 1), (B, H, C, Dh2))
    kn = mk(jax.random.fold_in(key, 2), (B, H, 1, Dh2))
    vn = mk(jax.random.fold_in(key, 3), (B, H, 1, Dh2))
    ksc = jnp.ones((B, H, C), jnp.float32)
    vsc = jnp.ones((B, H, C), jnp.float32)
    ksn = jnp.full((B, H, 1), 2.0)
    vsn = jnp.full((B, H, 1), 3.0)
    assert rk.supported(kc, kn, True)
    for pos in [0, 1, 64, 127, 1000]:
        plan = attn.global_ring_plan(jnp.int32(pos), C, 1)
        ko, vo, kso, vso = rk.ring_commit(
            kc, vc, kn, vn, plan["w"][0], ksc, vsc, ksn, vsn, interpret=True
        )
        k_ref, v_ref = attn.ring_write_global(kc, vc, kn, vn, plan)
        assert np.array_equal(np.asarray(ko), np.asarray(k_ref)), pos
        assert np.array_equal(np.asarray(vo), np.asarray(v_ref)), pos


def test_decode_attend_packed4_matches_xla():
    B, H, C, Dh = 2, 8, 256, 128
    key = jax.random.PRNGKey(5)
    ks8 = jax.random.split(key, 8)
    q = (jax.random.normal(ks8[0], (B, H, 1, Dh)) * 0.5).astype(jnp.bfloat16)
    k_new = (jax.random.normal(ks8[1], (B, H, 1, Dh)) * 0.5).astype(jnp.bfloat16)
    v_new = (jax.random.normal(ks8[2], (B, H, 1, Dh)) * 0.5).astype(jnp.bfloat16)
    kc = attn.pack4(jax.random.randint(ks8[3], (B, H, C, Dh), -7, 8))
    vc = attn.pack4(jax.random.randint(ks8[4], (B, H, C, Dh), -7, 8))
    k_scale = jax.random.uniform(ks8[5], (B, H, C), jnp.float32, 0.01, 0.1)
    v_scale = jax.random.uniform(ks8[6], (B, H, C), jnp.float32, 0.01, 0.1)
    valid = jax.random.uniform(ks8[7], (B, C)) < 0.8
    plan = attn.global_ring_plan(jnp.int32(1000), C, 1)
    assert da.supported(q, kc, plan)

    y_ref = attn.attend_global_split_q4(
        q, kc, vc, k_scale, v_scale, k_new, v_new, plan, valid, window=250
    )
    kq, vq, ksn, vsn = attn.quantize_kv_rows_packed4(k_new, v_new)
    kc2, vc2, ks2, vs2 = rk.ring_commit(
        kc, vc, kq, vq, plan["w"][0], k_scale, v_scale, ksn, vsn,
        interpret=True,
    )
    y = da.decode_attend(
        q, kc2, vc2, ks2, vs2, k_new, v_new, plan, valid,
        window=250, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_packed4_stream_quality_vs_exact():
    """Streamed transformer output with packed-int4 KV vs the exact-dtype
    path: mean relative error bounded (the int8 analogue of
    tests/test_kv_quant.py, looser bound)."""
    cfg = T.TransformerConfig(
        d_model=128, num_heads=4, num_layers=2, dim_feedforward=256,
        context=64,
    )
    params = T.init(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    xs = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 128)) * 0.3

    def run(kv_quant, kv_bits=8):
        st = T.init_state(cfg, 2, jnp.float32, kv_quant=kv_quant,
                          kv_bits=kv_bits)
        outs = []
        for i in range(xs.shape[1]):
            y, st = T.step(cfg, params, st, xs[:, i : i + 1])
            outs.append(np.asarray(y, np.float32))
        return np.concatenate(outs, axis=1)

    exact = run(False)
    q4 = run(True, kv_bits=4)
    rel = np.abs(q4 - exact).mean() / np.abs(exact).mean()
    assert rel < 0.05, rel  # packed int4 KV: <5% mean rel error at test shapes
