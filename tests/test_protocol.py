"""Protocol golden bytes + auth + config parsing.

The msgpack golden test replicates the reference client's byte-level test
(kyutai-client/src/stt/protocol.rs:64-110): tagged maps with exact keys.
"""

import os

import msgpack
import pytest

from dsm_tpu.server import auth, config, protocol as proto


def test_close_codes_and_retryable():
    assert int(proto.CloseCode.SERVER_AT_CAPACITY) == 4000
    assert int(proto.CloseCode.CLIENT_TIMEOUT) == 4006
    assert proto.CloseCode.SERVER_AT_CAPACITY.is_retryable
    assert proto.CloseCode.RATE_LIMITED.is_retryable
    assert not proto.CloseCode.AUTHENTICATION_FAILED.is_retryable
    assert not proto.CloseCode.SESSION_TIMEOUT.is_retryable
    assert proto.CloseCode.SERVER_AT_CAPACITY.reason == "Server at capacity"


def test_msg_type_tags():
    assert proto.MsgType.HANDSHAKE == 0
    assert proto.MsgType.AUDIO == 1
    assert proto.MsgType.CODES == 9


def test_asr_msgpack_golden():
    data = proto.asr_word("hello", 1.5)
    m = msgpack.unpackb(data, raw=False)
    assert m == {"type": "Word", "text": "hello", "start_time": 1.5}

    data = proto.asr_step(42, [0.5, 0.25], 1920)
    m = msgpack.unpackb(data)
    assert m["type"] == "Step" and m["step_idx"] == 42
    assert m["buffered_pcm"] == 1920

    # Client -> server messages round-trip.
    payload = msgpack.packb({"type": "Audio", "pcm": [0.0, 0.5, -0.5]})
    m = proto.asr_in_msg(payload)
    assert m["type"] == "Audio" and m["pcm"][1] == 0.5

    payload = msgpack.packb({"type": "Marker", "id": -3})
    assert proto.asr_in_msg(payload)["id"] == -3

    with pytest.raises(ValueError):
        proto.asr_in_msg(msgpack.packb([1, 2, 3]))


def test_tts_msgpack():
    m = msgpack.unpackb(proto.tts_text("hi", 0.0, 0.4))
    assert m == {"type": "Text", "text": "hi", "start_s": 0.0, "stop_s": 0.4}
    m = msgpack.unpackb(proto.tts_audio([0.1, 0.2]))
    assert m["type"] == "Audio" and len(m["pcm"]) == 2


def test_jwt_roundtrip_and_approval_matrix():
    secret = "test-secret-123"
    tok = auth.generate_token("u1", "u@x.com", secret=secret)
    claims = auth.validate_token(tok, secret=secret)
    assert claims["user"]["id"] == "u1"

    # Wrong secret refused.
    with pytest.raises(auth.AuthError) as e:
        auth.validate_token(tok, secret="other")
    assert e.value.code == "jwt_validation_failed"

    # Expired refused.
    tok = auth.generate_token("u1", secret=secret, ttl_s=-10)
    with pytest.raises(auth.AuthError) as e:
        auth.validate_token(tok, secret=secret)
    assert e.value.code == "expired_token"

    # Approval matrix (auth.rs:209-252): approved/absent ok; pending,
    # rejected and unknown statuses refused.
    for status, ok, code in [
        ("approved", True, None),
        (None, True, None),
        ("pending", False, "pending_approval"),
        ("rejected", False, "account_rejected"),
        ("weird", False, "account_rejected"),
    ]:
        claims = {"user": {"email": "e@x", "status": status}}
        if ok:
            auth.check_approval_status(claims)
        else:
            with pytest.raises(auth.AuthError) as e:
                auth.check_approval_status(claims)
            assert e.value.code == code


def test_auth_context_sources():
    secret = "s3"
    ctx = auth.AuthContext(enabled=True, secret=secret)
    tok = auth.generate_token("u2", secret=secret)
    # header
    ctx.check({"authorization": f"Bearer {tok}"}, {}, {})
    # query
    ctx.check({}, {"token": tok}, {})
    # cookie
    ctx.check({}, {}, {auth.SESSION_COOKIE: tok})
    with pytest.raises(auth.AuthError):
        ctx.check({}, {}, {})
    # disabled -> passthrough
    assert auth.AuthContext(enabled=False).check({}, {}, {}) is None


REF_STT = "/root/reference/configs/stt/config-stt-en_fr-hf.toml"
REF_TTS = "/root/reference/configs/tts/config-tts.toml"


@pytest.mark.skipif(not os.path.exists(REF_STT), reason="reference not mounted")
def test_load_reference_stt_config():
    cfg = config.Config.load(REF_STT)
    m = cfg.modules["asr"]
    assert m.type == "BatchedAsr"
    assert m.path == "/api/asr-streaming"
    assert m.asr_delay_in_tokens == 6
    assert m.batch_size == 64
    assert m.lm.transformer.d_model == 2048
    assert m.lm.transformer.num_layers == 16
    assert m.lm.transformer.context == 750
    assert m.lm.transformer.norm == "rms_norm"
    assert m.lm.transformer.positional_embedding == "rope"
    assert m.lm.audio_codebooks == 32
    assert m.lm.extra_heads == (4, 6)
    assert m.lm.depformer is None


@pytest.mark.skipif(not os.path.exists(REF_TTS), reason="reference not mounted")
def test_load_reference_tts_config():
    cfg = config.Config.load(REF_TTS)
    m = cfg.modules["tts"]
    assert m.type == "Tts"
    assert m.lm.depformer is not None
    assert m.lm.depformer.num_slices == 32
    assert m.lm.depformer.low_rank_embeddings == 128
    assert m.lm.transformer.cross_attention
    assert m.generation["acoustic_delay"] == 2
    assert m.generation["text_audio_delay_in_tokens"] == 25


def test_env_expansion_and_hf_paths(tmp_path, monkeypatch):
    monkeypatch.setenv("MY_DIR", str(tmp_path))
    p = tmp_path / "w.safetensors"
    p.write_bytes(b"x")
    assert config.resolve_path("$MY_DIR/w.safetensors") == str(p)
    # hf:// resolves through the local cache only.
    monkeypatch.setenv("DSM_HF_CACHE", str(tmp_path))
    (tmp_path / "org" / "repo").mkdir(parents=True)
    f = tmp_path / "org" / "repo" / "model.safetensors"
    f.write_bytes(b"y")
    assert config.resolve_path("hf://org/repo/model.safetensors") == str(f)
    assert config.resolve_path("hf://org/repo/missing.safetensors") is None


def test_model_preset_json_loading():
    """configs/models/*.json descriptors resolve to LmConfigs
    (reference configs/models/{stt_1b_enfr,moshi_7b_202409}.json)."""
    import os

    from dsm_tpu.server.model_presets import load_preset

    root = os.path.join(os.path.dirname(__file__), "..", "configs", "models")
    stt = load_preset(os.path.join(root, "stt_1b_en_fr.json"))
    assert stt.model_type == "stt"
    assert stt.lm.transformer.d_model == 2048
    assert stt.audio_delay_seconds == 0.5
    assert stt.delays == (0,) * 33
    assert stt.gen.top_k_text == 50

    en = load_preset(os.path.join(root, "stt_2.6b_en.json"))
    assert en.lm.transformer.num_layers == 48
    assert en.audio_silence_prefix_seconds == 1.0

    moshi = load_preset(os.path.join(root, "moshi_7b.json"))
    assert moshi.model_type == "moshi"
    assert moshi.lm.transformer.d_model == 4096  # raw-field path
    assert moshi.lm.depformer.num_slices == 8
    assert moshi.lm.audio_codebooks == 16
    assert moshi.lm.transformer.dim_feedforward == int(4096 * 4.125)  # 16896


def test_new_config_variants_validate():
    """config-stt-en / config-stt-lowmem / config-tts-streaming parse and
    pass validation."""
    import os

    from dsm_tpu.server.config import Config

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    for name in ("config-stt-en.toml", "config-stt-lowmem.toml",
                 "config-tts-streaming.toml"):
        cfg = Config.load(os.path.join(root, name))
        # hf:// checkpoints are absent in CI; only availability warnings OK.
        schema_problems = [p for p in cfg.validate()
                           if "not available locally" not in p]
        assert not schema_problems, (name, schema_problems)
    en = Config.load(os.path.join(root, "config-stt-en.toml"))
    m = en.modules["asr"]
    assert m.asr_delay_in_tokens == 32
    assert m.lm is not None and m.lm.transformer.num_layers == 48
    lo = Config.load(os.path.join(root, "config-stt-lowmem.toml"))
    assert lo.modules["asr"].dtype_override == "f32"
    ts = Config.load(os.path.join(root, "config-tts-streaming.toml"))
    t = ts.modules["tts"]
    assert t.path == "/api/tts_streaming"
    conds = t.raw.get("model", {}).get("conditioners", {})
    assert conds.get("description", {}).get("type") == "Lut"


def test_bare_model_toml_loading():
    """s2st-1b.toml bare-model schema (reference server/rust/moshi/
    s2st-1b.toml) loads into an LmConfig + conditioner configs."""
    import os

    from dsm_tpu.server.model_presets import load_model_toml

    p = os.path.join(os.path.dirname(__file__), "..", "configs", "models",
                     "s2st-1b.toml")
    lm, conds = load_model_toml(p)
    assert lm.text_in_vocab_size == 48001
    assert lm.audio_codebooks == 16
    assert lm.depformer.num_slices == 8
    assert lm.depformer.transformer.dim_feedforward == 4096
    assert conds["description"]["type"] == "Lut"
    assert len(conds["description"]["possible_values"]) == 5


def test_hf_cache_resolution(tmp_path, monkeypatch):
    """hf:// / hf-snapshot:// cache-hit paths (utils.rs:53-186 analogue):
    flat DSM cache, standard huggingface_hub snapshot layout, and miss ->
    None (zero-egress: no download attempted)."""
    from dsm_tpu.server import config as CFG

    flat = tmp_path / "flat"
    (flat / "org" / "repo").mkdir(parents=True)
    (flat / "org" / "repo" / "model.safetensors").write_bytes(b"x")
    monkeypatch.setenv("DSM_HF_CACHE", str(flat))

    hub = tmp_path / "hub"
    snap = hub / "models--kyutai--stt-1b-en_fr-candle" / "snapshots" / "abc123"
    snap.mkdir(parents=True)
    (snap / "tokenizer.model").write_bytes(b"t")
    (snap / "voice.safetensors").write_bytes(b"v")
    monkeypatch.setenv("HF_HUB_CACHE", str(hub))

    # flat cache hit
    p = CFG.resolve_path("hf://org/repo/model.safetensors")
    assert p == str(flat / "org" / "repo" / "model.safetensors")
    # hub snapshot layout hit
    p = CFG.resolve_path("hf://kyutai/stt-1b-en_fr-candle/tokenizer.model")
    assert p == str(snap / "tokenizer.model")
    # hf-snapshot glob over the hub layout
    p = CFG.resolve_path("hf-snapshot://kyutai/stt-1b-en_fr-candle/*.safetensors")
    assert p == str(snap / "voice.safetensors")
    # miss -> None, no exception
    assert CFG.resolve_path("hf://missing/repo/file.bin") is None


def test_seed_param_parsing_never_raises():
    """Malformed ?seed= values fall back to auto-seeding instead of raising
    inside a WS handler (review finding: '--5' passed the old lstrip check
    then blew up in int())."""
    from dsm_tpu.server.app import _parse_seed

    assert _parse_seed("42") == 42
    assert _parse_seed("-7") == -7
    assert _parse_seed("--5") is None
    assert _parse_seed("") is None
    assert _parse_seed(None) is None
    assert _parse_seed("1e3") is None
    assert _parse_seed("0x10") is None


def test_metric_family_parity():
    """Every metric family the reference exports (metrics.rs, committed as
    metrics.REFERENCE_FAMILIES) is rendered by our registry — the PARITY.md
    'same families' claim, verified by name diff."""
    from dsm_tpu.server import metrics

    rendered = metrics.rendered_families()
    missing = [f for f in metrics.REFERENCE_FAMILIES if f not in rendered]
    assert not missing, f"reference metric families not exported: {missing}"


def test_metric_recorders_smoke():
    """The record_* helpers and engine-wired families accept observations."""
    from dsm_tpu.server import metrics
    from dsm_tpu.server import protocol as proto

    metrics.record_ws_close(proto.CloseCode.SERVER_AT_CAPACITY)
    metrics.record_connection_error("timeout", "asr")
    metrics.record_auth_error("invalid_key")
    metrics.stream_in("asr", 100)
    metrics.stream_out("tts", 50)
    metrics.MIMI_FRAMES_ENCODED.inc(4)
    metrics.PIPELINE_OVERLAP_EFFICIENCY.observe(0.9)
    text = metrics.render().decode()
    assert 'ws_close_total{code="4000",reason="server_at_capacity"}' in text
    assert 'connection_error_total{error_type="timeout",module="asr"}' in text
    assert "asr_ws_in_bytes_total" in text

