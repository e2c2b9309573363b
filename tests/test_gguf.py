"""GGUF container parsing + quantized-checkpoint ingestion.

The reference loads released q8 GGUF checkpoints through candle's quantized
var-builder with the same tensor names as safetensors
(moshi-core/src/lm.rs:1113-1124, nn.rs:8-211); dsm_tpu must ingest the same
artifacts (utils/gguf.py -> checkpoint.load_tensors -> build_lm_params).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dsm_tpu.models import lm as LM
from dsm_tpu.utils import checkpoint as CK
from dsm_tpu.utils import gguf
from tests.test_lm import small_lm


def test_gguf_roundtrip_plain(tmp_path):
    tensors = {
        "a.weight": np.random.RandomState(0).randn(5, 7).astype(np.float32),
        "b.bias": np.random.RandomState(1).randn(11).astype(np.float32),
        "c.f16": np.random.RandomState(2).randn(3, 4).astype(np.float16),
        "d.ints": np.arange(6, dtype=np.int32).reshape(2, 3),
    }
    path = str(tmp_path / "t.gguf")
    gguf.write_gguf(path, tensors, {"general.name": "test", "x.count": 3})
    meta, got = gguf.read_gguf(path)
    assert meta["general.name"] == "test"
    assert meta["x.count"] == 3
    np.testing.assert_array_equal(got["a.weight"], tensors["a.weight"])
    np.testing.assert_array_equal(got["b.bias"], tensors["b.bias"])
    np.testing.assert_allclose(got["c.f16"], tensors["c.f16"].astype(np.float32))
    np.testing.assert_array_equal(got["d.ints"], tensors["d.ints"])


def test_gguf_q8_0_roundtrip(tmp_path):
    w = np.random.RandomState(0).randn(16, 64).astype(np.float32)
    path = str(tmp_path / "q.gguf")
    gguf.write_gguf(path, {"w": w}, quantize=True)
    _, got = gguf.read_gguf(path)
    assert got["w"].shape == w.shape
    # q8_0: per-32-block scales, <1% relative error on gaussian data
    err = np.abs(got["w"] - w).max() / np.abs(w).max()
    assert err < 0.02, err
    # raw view: int8 blocks + f16 scales, exact reconstruction of the stored value
    _, raw = gguf.read_gguf(path, raw_quant=True)
    q, s = raw["w"]["q"], raw["w"]["s"]
    recon = (q.astype(np.float32) * s.astype(np.float32)[:, None]).reshape(16, 64)
    np.testing.assert_array_equal(recon, got["w"])


def test_gguf_lm_checkpoint_ingestion(tmp_path):
    """Full loop: export reference-layout q8 GGUF -> load_tensors -> LM runs."""
    cfg = small_lm(extra_heads=(2, 6), ca=False)
    params = LM.init(cfg, jax.random.PRNGKey(0))
    ref = CK.lm_params_to_reference(cfg, params)
    path = str(tmp_path / "model.gguf")
    gguf.write_gguf(path, ref, {"general.architecture": "moshi"}, quantize=True)

    tensors = CK.load_tensors(path)  # extension dispatch
    assert set(tensors) == set(ref)
    loaded = CK.build_lm_params(cfg, tensors, dtype=jnp.float32)

    # Same structure, near-identical values (q8 quantisation error only).
    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_flatten_with_path(loaded)[0]
    }
    for pth, v1 in flat1:
        key = jax.tree_util.keystr(pth)
        v1 = np.asarray(v1, np.float32)
        v2 = np.asarray(flat2[key], np.float32)
        assert v2.shape == v1.shape, key
        denom = max(np.abs(v1).max(), 1e-6)
        assert np.abs(v1 - v2).max() / denom < 0.02, key

    # And the model actually steps with the ingested weights.
    st = LM.init_state(cfg, 2, cache_dtype=jnp.float32)
    text = jnp.array([10, 3], jnp.int32)
    audio = jnp.full((2, cfg.audio_codebooks), 8, jnp.int32)
    logits, hidden, st = LM.step(cfg, loaded, st, text, audio)
    assert logits.shape == (2, cfg.text_out_vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
