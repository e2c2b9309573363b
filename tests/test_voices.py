"""Voice resolution: specs, path traversal, embeddings, wav encoding."""

import numpy as np
import pytest

from dsm_tpu.server import voices as V


def test_parse_voice_spec():
    assert V.parse_voice_spec("expresso/ex01.wav+12.5") == ("expresso/ex01.wav", 12.5)
    assert V.parse_voice_spec("plain") == ("plain", 0.0)
    # Non-numeric suffix: treated as part of the name, no offset.
    assert V.parse_voice_spec("weird+name+x") == ("weird+name+x", 0.0)


def test_safe_voice_path_traversal(tmp_path):
    vd = tmp_path / "voices"
    (vd / "sub").mkdir(parents=True)
    f = vd / "sub" / "a.safetensors"
    f.write_bytes(b"")
    secret = tmp_path / "secret.txt"
    secret.write_text("x")
    assert V.safe_voice_path(str(vd), "sub/a.safetensors") == str(f)
    assert V.safe_voice_path(str(vd), "sub/a") == str(f)  # extension probe
    assert V.safe_voice_path(str(vd), "../secret.txt") is None
    assert V.safe_voice_path(str(vd), "/etc/passwd") is None


def test_resolver_embedding_and_cache(tmp_path):
    from safetensors.numpy import save_file

    vd = tmp_path / "voices"
    vd.mkdir()
    emb = np.random.randn(1, 10, 16).astype(np.float32)
    save_file({"speaker_wavs": emb}, str(vd / "v1.safetensors"))
    r = V.VoiceResolver(voice_dir=str(vd))
    ca = r.resolve("v1")
    np.testing.assert_allclose(ca, emb)
    assert r.resolve("v1") is ca  # cached
    assert r.resolve(None) is None
    with pytest.raises(FileNotFoundError):
        r.resolve("missing")


def test_resolver_wav_voice(tmp_path):
    import jax

    from dsm_tpu.models import mimi as MIMI, speaker as SPK
    from dsm_tpu.utils.audio import write_wav
    from tests.test_mimi import small_cfg as small_mimi_cfg

    mimi_cfg = small_mimi_cfg()
    cfg = SPK.SpeakerEncoderConfig(
        cond_dim=24, n_speakers=2, duration_s=0.96, mimi=mimi_cfg
    )
    sp = SPK.init(cfg, jax.random.PRNGKey(0))
    mp = MIMI.init(mimi_cfg, jax.random.PRNGKey(1))
    vd = tmp_path / "voices"
    vd.mkdir()
    sr = int(mimi_cfg.sample_rate)
    write_wav(str(vd / "w.wav"), np.random.randn(sr * 2).astype(np.float32) * 0.1, sr)
    r = V.VoiceResolver(
        voice_dir=str(vd), speaker_cfg=cfg, speaker_params=sp, mimi_params=mp
    )
    ca = r.resolve("w.wav+0.5")
    assert ca.shape[0] == 1 and ca.shape[2] == 24


def test_builder_wires_conditioners(tmp_path):
    """[modules.tts.model.conditioners] produces a ConditionProvider and a
    default attribute embedding on the engine (config-tts-realtime's
    description Lut; reference conditioner.rs + tts.rs wiring)."""
    cfg_text = """
instance_name = "cond-test"
authorized_ids = []

[modules.tts]
type = "Tts"
path = "/api/tts"
batch_size = 1

[modules.tts.model]
text_in_vocab_size = 33
text_out_vocab_size = 32
audio_vocab_size = 9
audio_codebooks = 4

[modules.tts.model.transformer]
d_model = 32
num_heads = 4
num_layers = 2
dim_feedforward = 64
causal = true
context = 64
gating = "silu"
norm = "RmsNorm"
positional_embedding = "Rope"

[modules.tts.model.depformer]
num_slices = 4

[modules.tts.model.depformer.transformer]
d_model = 16
num_heads = 2
num_layers = 2
dim_feedforward = 32
causal = true
context = 4
gating = "silu"
norm = "RmsNorm"
positional_embedding = "None"

[modules.tts.model.conditioners.description]
type = "Lut"
n_bins = 31
dim = 16
possible_values = ["very_bad", "bad", "neutral", "good", "very_good"]

[modules.tts.generation]
speaker_cond_dim = 32
speaker_cond_n_speakers = 2
speaker_cond_duration_s = 0.96
"""
    p = tmp_path / "cond.toml"
    p.write_text(cfg_text)

    from dsm_tpu.server import builder
    from dsm_tpu.server.config import Config

    cfg = Config.load(str(p))
    engine = builder.build_tts(cfg.modules["tts"])
    assert engine.condition_provider is not None
    assert engine.default_condition is not None
    assert engine.default_condition.shape == (1, 32)
    # "very_good" is the default; a different value embeds differently.
    other = engine.condition_provider.condition_lut("description", "bad")
    assert not np.allclose(
        np.asarray(other), np.asarray(engine.default_condition)
    )


def test_builder_ca_int8_knob(tmp_path):
    """TOML `ca_int8 = true` on a batched TTS module builds the engine with
    the int8-native voice-CA store (server/builder.py wiring)."""
    cfg_text = """
instance_name = "ca-int8-test"
authorized_ids = []

[modules.tts]
type = "Tts"
path = "/api/tts"
batch_size = 2
ca_int8 = true

[modules.tts.model]
text_in_vocab_size = 33
text_out_vocab_size = 32
audio_vocab_size = 9
audio_codebooks = 4

[modules.tts.model.transformer]
d_model = 32
num_heads = 4
num_layers = 2
dim_feedforward = 64
causal = true
context = 64
gating = "silu"
norm = "RmsNorm"
positional_embedding = "Rope"

[modules.tts.model.depformer]
num_slices = 4

[modules.tts.model.depformer.transformer]
d_model = 16
num_heads = 2
num_layers = 2
dim_feedforward = 32
causal = true
context = 4
gating = "silu"
norm = "RmsNorm"
positional_embedding = "None"

[modules.tts.generation]
speaker_cond_dim = 32
speaker_cond_n_speakers = 2
speaker_cond_duration_s = 0.96
"""
    p = tmp_path / "ca_int8.toml"
    p.write_text(cfg_text)

    import jax.numpy as jnp

    from dsm_tpu.server import builder
    from dsm_tpu.server.config import Config
    from dsm_tpu.server.tts_batched import BatchedTtsEngine

    cfg = Config.load(str(p))
    engine = builder.build_tts(cfg.modules["tts"])
    assert isinstance(engine, BatchedTtsEngine)
    assert engine.ca_quant
    assert isinstance(engine._ca_raw, dict)
    assert engine._ca_raw["k"].dtype == jnp.int8
