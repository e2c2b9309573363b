"""Checkpoint round-trip: our params -> reference-style keys -> loaded back."""

import jax
import jax.numpy as jnp
import numpy as np

from dsm_tpu.models import lm as LM
from dsm_tpu.ops import transformer as T
from dsm_tpu.utils import checkpoint as CK
from tests.test_lm import small_lm


def test_lm_roundtrip_via_reference_keys():
    cfg = small_lm(extra_heads=(2, 6), ca=False)
    params = LM.init(cfg, jax.random.PRNGKey(0))
    ref = CK.lm_params_to_reference(cfg, params)
    # Reference key conventions present.
    assert "text_emb.weight" in ref
    assert "transformer.layers.0.self_attn.in_proj_weight" in ref
    assert "transformer.layers.1.gating.linear_in.weight" in ref
    assert "depformer.slices.0.emb.weight" in ref
    assert "linears.0.weight" not in ref  # per-slice form used here

    loaded = CK.build_lm_params(cfg, ref, dtype=jnp.float32)
    flat1, _ = jax.tree_util.tree_flatten_with_path(params)
    flat2 = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    flat2 = {jax.tree_util.keystr(k): v for k, v in flat2.items()}
    for path, v1 in flat1:
        key = jax.tree_util.keystr(path)
        v2 = flat2[key]
        np.testing.assert_allclose(
            np.asarray(v1, np.float32), np.asarray(v2, np.float32),
            atol=1e-6, err_msg=key,
        )


def test_lm_roundtrip_with_cross_attention():
    cfg = small_lm(ca=True, depformer=False)
    params = LM.init(cfg, jax.random.PRNGKey(1))
    ref = CK.lm_params_to_reference(cfg, params)
    assert "transformer.layers.0.cross_attention.in_proj_weight_q" in ref
    loaded = CK.build_lm_params(cfg, ref, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(params["transformer"]["ca_kv_w"]),
        np.asarray(loaded["transformer"]["ca_kv_w"]),
        atol=1e-6,
    )


def test_root_level_depformer_fallbacks():
    """Checkpoints store depformer weights at the root (depformer_in.{j},
    linears.{k}, depformer_emb.{k}); the loader must follow the reference
    fallback chain (lm.rs:529-580)."""
    cfg = small_lm()
    params = LM.init(cfg, jax.random.PRNGKey(0))
    ref = CK.lm_params_to_reference(cfg, params)
    s = cfg.depformer.num_slices
    # Rewrite per-slice keys into root-level aliases.
    for i in range(s):
        ref[f"linears.{i}.weight"] = ref.pop(f"depformer.slices.{i}.linear_out.weight")
        if i == 0:
            ref["depformer_text_emb.weight"] = ref.pop("depformer.slices.0.emb.weight")
        else:
            ref[f"depformer_emb.{i - 1}.weight"] = ref.pop(
                f"depformer.slices.{i}.emb.weight"
            )
    loaded = CK.build_lm_params(cfg, ref, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(params["depformer"]["linear_out"]),
        np.asarray(loaded["depformer"]["linear_out"]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["depformer"]["text_emb"]),
        np.asarray(loaded["depformer"]["text_emb"]),
        atol=1e-6,
    )


def test_weight_norm_reconstruction():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((4, 3, 5)).astype(np.float32)
    g = rng.standard_normal((4, 1, 1)).astype(np.float32)
    w_expected = g * v / np.sqrt((v * v).sum(axis=(1, 2), keepdims=True))
    r = CK.KeyResolver({"c.weight_g": g, "c.weight_v": v})
    np.testing.assert_allclose(r.conv_weight("c"), w_expected, rtol=1e-6)


def test_missing_keys_reported():
    cfg = small_lm(depformer=False)
    import pytest

    with pytest.raises(KeyError) as e:
        CK.build_lm_params(cfg, {"text_emb.weight": np.zeros((11, 32), np.float32)})
    assert "missing" in str(e.value)


def test_native_checkpoint_roundtrip(tmp_path):
    cfg = small_lm()
    params = LM.init(cfg, jax.random.PRNGKey(3))
    p = str(tmp_path / "native.safetensors")
    CK.save_native(p, params)
    loaded = CK.load_native(p, params)
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(loaded)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
