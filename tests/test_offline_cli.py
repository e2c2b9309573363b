"""Offline drivers + CLI subcommands + audio utils + tokenizer."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from dsm_tpu.utils import audio as AU
from dsm_tpu.utils.tokenizer import FallbackTokenizer


def test_wav_roundtrip(tmp_path):
    pcm = np.sin(np.linspace(0, 100, 2400)).astype(np.float32) * 0.5
    p = str(tmp_path / "x.wav")
    AU.write_wav(p, pcm, 24_000)
    back, sr = AU.read_wav(p)
    assert sr == 24_000
    np.testing.assert_allclose(back, pcm, atol=1e-3)
    # in-memory variant matches the file
    data = AU.wav_bytes(pcm, 24_000)
    assert data[:4] == b"RIFF" and len(data) == os.path.getsize(p)


def test_resample_and_level():
    pcm = np.sin(2 * np.pi * 440 * np.arange(48_000) / 48_000).astype(np.float32)
    out = AU.resample(pcm, 48_000, 24_000)
    assert abs(len(out) - 24_000) <= 1
    db = AU.audio_level_db(pcm)
    assert -4.0 < db < -2.0  # sine RMS = -3.01 dBFS


def test_fallback_tokenizer_roundtrip():
    tok = FallbackTokenizer()
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"


def test_offline_transcribe_with_small_engine(tmp_path):
    import jax

    from dsm_tpu import offline
    from dsm_tpu.server import batched_asr as eng
    from dsm_tpu.utils.tokenizer import FallbackTokenizer
    from tests.test_asr import make_params, small_asr_cfg

    cfg = small_asr_cfg()
    saved = eng.FRAME_SIZE
    eng.FRAME_SIZE = cfg.mimi.frame_size
    try:
        params = make_params(cfg, jax.random.PRNGKey(0))
        engine = eng.BatchedAsrEngine(cfg, params, batch_size=1)
        engine.tokenizer = FallbackTokenizer()
        # 1 s of noise at the tiny config's sample rate.
        pcm = np.random.default_rng(0).standard_normal(
            int(cfg.mimi.sample_rate)
        ).astype(np.float32) * 0.1
        wav = str(tmp_path / "in.wav")
        AU.write_wav(wav, pcm, int(cfg.mimi.sample_rate))
        result = offline.transcribe_file(wav, vad=True, engine=engine)
        assert "text" in result and "words" in result
        assert len(result["vad"]) > 10
        assert all(len(v["prs"]) == 2 for v in result["vad"])
    finally:
        eng.FRAME_SIZE = saved


def test_cli_validate_reference_config():
    ref = "/root/reference/configs/stt/config-stt-en_fr-hf.toml"
    if not os.path.exists(ref):
        pytest.skip("reference not mounted")
    r = subprocess.run(
        [sys.executable, "-m", "dsm_tpu.cli", "validate", ref],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    # Valid structure; artifacts missing locally -> exit 1 with a report.
    assert "module asr: type=BatchedAsr" in r.stdout
    assert "not available locally" in r.stdout


def test_cli_token_gen():
    r = subprocess.run(
        [sys.executable, "-m", "dsm_tpu.cli", "token-gen", "--user", "u9"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "BETTER_AUTH_SECRET": "s", "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0
    from dsm_tpu.server.auth import validate_token

    claims = validate_token(r.stdout.strip(), secret="s")
    assert claims["user"]["id"] == "u9"


def _varint(n):
    out = b""
    while True:
        b_ = n & 0x7F
        n >>= 7
        out += bytes([b_ | (0x80 if n else 0)])
        if not n:
            return out


def _piece(text, score, typ=1):
    body = b"\x0a" + _varint(len(text.encode())) + text.encode()
    import struct
    body += b"\x15" + struct.pack("<f", score)
    if typ != 1:
        body += b"\x18" + _varint(typ)
    return b"\x0a" + _varint(len(body)) + body


def test_sentencepiece_parser_and_viterbi():
    """Hand-built ModelProto bytes -> unigram Viterbi segmentation."""
    from dsm_tpu.utils.tokenizer import SentencePieceModel

    pieces = (
        _piece("<unk>", 0.0, typ=2)
        + _piece("▁", -3.0)
        + _piece("▁he", -1.0)
        + _piece("llo", -1.2)
        + _piece("▁hello", -1.5)
        + _piece("l", -4.0)
        + _piece("o", -4.0)
        + _piece("he", -2.0)
    )
    model = SentencePieceModel.from_bytes(pieces)
    assert model.vocab_size() == 8

    # "hello" -> best split is the single piece "▁hello" (-1.5) over
    # "▁he"+"llo" (-2.2).
    ids = model.encode("hello")
    assert [model.id_to_piece(i) for i in ids] == ["▁hello"]

    # "hellollo": "▁hello"+"llo" (-2.7) beats "▁he"+"llo"+"llo" (-3.4).
    ids = model.encode("hellollo")
    assert [model.id_to_piece(i) for i in ids] == ["▁hello", "llo"]

    # decode round trip restores spaces.
    ids = model.encode("hello hello")
    assert model.decode(ids) == "hello hello"

    # Unknown characters fall back without crashing.
    ids = model.encode("hz")
    assert isinstance(ids, list) and ids


def test_synthesize_jsonl(tmp_path):
    """Batch TTS from the reference audio/tts.jsonl input format."""
    import json

    import jax

    from dsm_tpu.models import lm as LM
    from dsm_tpu.models import mimi as MIMI
    from dsm_tpu.offline import synthesize_jsonl
    from dsm_tpu.server.tts_module import TtsEngine
    from dsm_tpu.utils.tokenizer import FallbackTokenizer
    from tests.test_mimi import small_cfg as small_mimi_cfg
    from tests.test_tts import small_tts_cfg

    import dataclasses

    cfg = small_tts_cfg(max_steps=64)
    lm = dataclasses.replace(
        cfg.lm, transformer=dataclasses.replace(
            cfg.lm.transformer, cross_attention=False, ca_dim=None
        )
    )
    cfg = dataclasses.replace(cfg, lm=lm)
    mimi_cfg = small_mimi_cfg()
    engine = TtsEngine(
        cfg, {"lm": LM.init(cfg.lm, jax.random.PRNGKey(0))},
        mimi_cfg, MIMI.init(mimi_cfg, jax.random.PRNGKey(1)),
        FallbackTokenizer(),
    )

    src = tmp_path / "in.jsonl"
    src.write_text(
        json.dumps({"id": "a", "turns": ["hello there"], "voices": []}) + "\n"
        + json.dumps({"id": "b", "turns": ["again", "twice"], "voices": []}) + "\n"
    )
    manifest = synthesize_jsonl(str(src), str(tmp_path / "out"), engine=engine)
    assert [m["id"] for m in manifest] == ["a", "b"]
    for m in manifest:
        assert (tmp_path / "out" / f"{m['id']}.wav").exists()
        assert m["duration_s"] >= 0.0


def test_offline_transcribe_mp3_fixture(tmp_path):
    """`cli stt audio/*.mp3` path: compressed-file decode reaches the
    engine (reference utils.rs:263-305 pcm_decode; the stand-in for the
    bria.mp3 run queued on real weights)."""
    import jax

    from dsm_tpu import offline
    from dsm_tpu.server import batched_asr as eng
    from dsm_tpu.utils import codecs
    from tests.test_asr import make_params, small_asr_cfg

    if not codecs.mp3_available():
        pytest.skip("libmpg123 unavailable")
    cfg = small_asr_cfg()
    saved = eng.FRAME_SIZE
    eng.FRAME_SIZE = cfg.mimi.frame_size
    try:
        params = make_params(cfg, jax.random.PRNGKey(0))
        engine = eng.BatchedAsrEngine(cfg, params, batch_size=1)
        engine.tokenizer = FallbackTokenizer()
        result = offline.transcribe_file(
            "audio/speech-synthetic.mp3", engine=engine
        )
        assert "text" in result and "words" in result
    finally:
        eng.FRAME_SIZE = saved


def test_dotenv_loading(tmp_path, monkeypatch):
    """cli loads .env KEY=VALUE into the env at startup (existing env
    wins) — moshi-server's dotenvy behavior."""
    import os

    from dsm_tpu import cli

    monkeypatch.chdir(tmp_path)
    (tmp_path / ".env").write_text(
        "# comment\nBETTER_AUTH_SECRET='s3cret'\nDSM_TEST_DOTENV=abc\n"
        "ALREADY=from_file\nbroken line\n"
    )
    monkeypatch.setenv("ALREADY", "from_env")
    monkeypatch.delenv("DSM_TEST_DOTENV", raising=False)
    monkeypatch.delenv("BETTER_AUTH_SECRET", raising=False)
    cli._load_dotenv()
    assert os.environ["DSM_TEST_DOTENV"] == "abc"
    assert os.environ["BETTER_AUTH_SECRET"] == "s3cret"
    assert os.environ["ALREADY"] == "from_env"


def test_synthesize_jsonl_concurrent_batched(tmp_path):
    """A continuous-batching engine runs the jsonl lines concurrently (the
    engine loop steps all live sessions lock-step) and the manifest stays
    in input order."""
    import json

    from dsm_tpu.offline import synthesize_jsonl
    from tests.test_tts_batched import make_engine

    engine, _cfg = make_engine(batch=3)
    src = tmp_path / "in.jsonl"
    src.write_text("".join(
        json.dumps({"id": f"s{i}", "turns": [f"line {i}"], "voices": []}) + "\n"
        for i in range(4)  # more lines than slots: queues on capacity
    ))
    manifest = synthesize_jsonl(str(src), str(tmp_path / "out"), engine=engine)
    assert [m["id"] for m in manifest] == ["s0", "s1", "s2", "s3"]
    for m in manifest:
        assert (tmp_path / "out" / f"{m['id']}.wav").exists()
        assert m["duration_s"] > 0.0


def test_transcribe_files_batched_matches_solo(tmp_path):
    """Two files of different lengths batch through one scan; per-file
    transcripts are identical to solo runs (sampling keyed (seed, step) is
    batch-independent, and masks freeze the shorter file)."""
    import jax

    from dsm_tpu import offline
    from dsm_tpu.server import batched_asr as eng
    from dsm_tpu.utils import audio as AUD
    from dsm_tpu.utils.tokenizer import FallbackTokenizer
    from tests.test_asr import make_params, small_asr_cfg

    cfg = small_asr_cfg()
    saved = eng.FRAME_SIZE
    eng.FRAME_SIZE = cfg.mimi.frame_size
    try:
        params = make_params(cfg, jax.random.PRNGKey(0))
        engine = eng.BatchedAsrEngine(cfg, params, batch_size=1)
        engine.tokenizer = FallbackTokenizer()
        rng = np.random.default_rng(1)
        paths = []
        for i, secs in enumerate((1.0, 0.4)):
            pcm = rng.standard_normal(
                int(cfg.mimi.sample_rate * secs)
            ).astype(np.float32) * 0.1
            p = str(tmp_path / f"f{i}.wav")
            AUD.write_wav(p, pcm, int(cfg.mimi.sample_rate))
            paths.append(p)

        batched = offline.transcribe_files(paths, engine=engine)
        solo = [offline.transcribe_file(p, engine=engine) for p in paths]
        assert [r["text"] for r in batched] == [r["text"] for r in solo]
        assert [len(r["words"]) for r in batched] == [
            len(r["words"]) for r in solo
        ]
        for rb, rs in zip(batched, solo):
            for wb, ws in zip(rb["words"], rs["words"]):
                assert wb["start_s"] == ws["start_s"]
    finally:
        eng.FRAME_SIZE = saved
