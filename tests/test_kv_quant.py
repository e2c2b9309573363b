"""int8-quantised KV ring: close to the bf16 path, exact state mechanics."""

import jax
import jax.numpy as jnp
import numpy as np

from dsm_tpu.ops import attention as attn
from dsm_tpu.ops import transformer as tfm


def test_quantize_rows_accuracy():
    k = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 1, 64))
    v = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 1, 64)) * 3.0
    kq, vq, ks, vs = attn.quantize_kv_rows(k, v)
    assert kq.dtype == jnp.int8 and ks.shape == (2, 4, 1)
    k_back = kq.astype(jnp.float32) * ks[..., None]
    np.testing.assert_allclose(np.asarray(k_back), np.asarray(k), atol=0.02)
    v_back = vq.astype(jnp.float32) * vs[..., None]
    np.testing.assert_allclose(np.asarray(v_back), np.asarray(v), atol=0.06)


def test_quantized_stream_matches_forward_approximately():
    cfg = tfm.TransformerConfig(
        d_model=32, num_heads=4, num_layers=2, dim_feedforward=64,
        context=16, positional_embedding="rope",
    )
    params = tfm.init(cfg, jax.random.PRNGKey(0))
    t = 10
    x = jax.random.normal(jax.random.PRNGKey(1), (2, t, 32)) * 0.1
    y_full = tfm.forward(cfg, params, x)

    state = tfm.init_state(cfg, 2, kv_quant=True)
    assert state["layers"][0]["k"].dtype == jnp.int8
    outs = []
    for i in range(t):
        yi, state = tfm.step(cfg, params, state, x[:, i : i + 1])
        outs.append(yi)
    y_q = jnp.concatenate(outs, axis=1)
    # int8 KV: small quantisation error, not exact.
    err = float(jnp.abs(y_full - y_q).max())
    assert err < 0.05, err
    rel = float(jnp.abs(y_full - y_q).mean() / jnp.abs(y_full).mean())
    assert rel < 0.02, rel


def test_quantized_reset_isolation():
    cfg = tfm.TransformerConfig(
        d_model=16, num_heads=2, num_layers=1, dim_feedforward=32,
        context=8, positional_embedding="none",
    )
    params = tfm.init(cfg, jax.random.PRNGKey(0))
    state = tfm.init_state(cfg, 2, kv_quant=True)
    xs = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 1, 16)) * 0.1
    for i in range(3):
        _, state = tfm.step(cfg, params, state, xs[i])
    state = tfm.reset_state(state, jnp.array([False, True]))
    y, state = tfm.step(cfg, params, state, xs[3])
    fresh = tfm.init_state(cfg, 2, kv_quant=True)
    y_ref, _ = tfm.step(cfg, params, fresh, xs[3])
    np.testing.assert_allclose(
        np.asarray(y[1]), np.asarray(y_ref[1]), atol=1e-4, rtol=1e-3
    )


def test_weight_only_int8_quantization():
    from dsm_tpu.models import lm as LM
    from tests.test_lm import small_lm

    cfg = small_lm(extra_heads=(2, 6))
    params = LM.init(cfg.lm if hasattr(cfg, "lm") else cfg, jax.random.PRNGKey(0))
    qparams = tfm.quantize_weights(params, min_size=64)
    # Embedding tables stay dense; matmul weights become {"q","s"} dicts.
    assert not isinstance(qparams["text_emb"], dict)
    assert isinstance(qparams["transformer"]["in_proj_w"], dict)
    assert qparams["transformer"]["in_proj_w"]["q"].dtype == jnp.int8
    # Norm alphas untouched.
    assert not isinstance(qparams["transformer"]["norm1"]["alpha"], dict)

    # Step outputs close to dense.
    state = LM.init_state(cfg, 2, cache_dtype=jnp.float32)
    state_q = LM.init_state(cfg, 2, cache_dtype=jnp.float32)
    text = jnp.array([1, 2], jnp.int32)
    audio = jnp.full((2, 3), 5, jnp.int32)
    l1, h1, _ = LM.step(cfg, params, state, text, audio)
    l2, h2, _ = LM.step(cfg, qparams, state_q, text, audio)
    rel = float(jnp.abs(l1 - l2).mean() / (jnp.abs(l1).mean() + 1e-9))
    assert rel < 0.05, rel


def test_sample_dynamic_temperature_semantics():
    from dsm_tpu.ops import sampling as S

    key = jax.random.PRNGKey(0)
    logits = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 50)), jnp.float32
    )
    # temp 0 rows decode greedily; hot rows sample.
    temps = jnp.array([0.0, 0.0, 5.0, 5.0])
    toks = S.sample_dynamic(logits, key, temps)
    greedy = jnp.argmax(logits, axis=-1)
    assert toks[0] == greedy[0] and toks[1] == greedy[1]
    # A very hot temperature disagrees with greedy almost surely across keys.
    diffs = 0
    for i in range(16):
        t = S.sample_dynamic(logits, jax.random.fold_in(key, i), temps)
        diffs += int(t[2] != greedy[2]) + int(t[3] != greedy[3])
    assert diffs > 0
    # Scalar temperature broadcast + top_k masking keeps tokens in the top-k.
    toks = S.sample_dynamic(logits, key, 1.0, top_k=5)
    top5 = jax.lax.top_k(logits, 5)[1]
    for b in range(4):
        assert int(toks[b]) in np.asarray(top5[b])


def test_w8a8_site_filter(monkeypatch):
    """Mixed-profile site gating (ops/qmm.set_w8a8_sites / DSM_W8A8_SITES):
    sites outside the filter fall back to the weight-only dequant path
    while filtered sites keep the int8 MXU dots."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dsm_tpu.ops import qmm, transformer as T

    monkeypatch.setenv("DSM_W8A8", "1")
    monkeypatch.delenv("DSM_W8A8_SITES", raising=False)

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((512, 512)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, 512)), jnp.float32)
    wq = T.quantize_weights({"in_proj_w": w}, min_size=1)["in_proj_w"]
    assert isinstance(wq, dict) and "q" in wq

    y_w8a8 = qmm.mm_w8a8(x, wq["q"], wq["s"])
    y_dequant = (x @ wq["q"].astype(x.dtype).T) * wq["s"].astype(x.dtype)
    # The two paths are numerically different (activation quantisation) —
    # that's what makes the site filter observable.
    assert not np.allclose(np.asarray(y_w8a8), np.asarray(y_dequant))

    # No filter: every site uses W8A8.
    np.testing.assert_array_equal(
        np.asarray(T.mm(x, wq, site="in_proj")), np.asarray(y_w8a8)
    )
    # Filter excludes in_proj -> weight-only path there, W8A8 elsewhere.
    qmm.set_w8a8_sites({"mlp_in"})
    try:
        np.testing.assert_array_equal(
            np.asarray(T.mm(x, wq, site="in_proj")), np.asarray(y_dequant)
        )
        np.testing.assert_array_equal(
            np.asarray(T.mm(x, wq, site="mlp_in")), np.asarray(y_w8a8)
        )
        # Unsited calls follow the global gate regardless of the filter.
        np.testing.assert_array_equal(
            np.asarray(T.mm(x, wq)), np.asarray(y_w8a8)
        )
    finally:
        qmm.set_w8a8_sites(None)

    # Env override form.
    monkeypatch.setenv("DSM_W8A8_SITES", "out_proj")
    np.testing.assert_array_equal(
        np.asarray(T.mm(x, wq, site="in_proj")), np.asarray(y_dequant)
    )
