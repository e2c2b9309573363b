"""End-to-end server tests: real websocket round-trips against the app.

The closest reference analogue is tools/smoke-test + the WS auth scripts;
here we go further and assert the actual streaming message flow.
(No pytest-asyncio in this image: tests run their coroutine with
asyncio.run.)
"""

import asyncio

import msgpack
import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from dsm_tpu.server import auth as auth_mod
from dsm_tpu.server import batched_asr as eng
from dsm_tpu.server.app import App
from tests.test_asr import make_params, small_asr_cfg


@pytest.fixture()
def asr_app():
    import jax

    cfg = small_asr_cfg()
    saved = eng.FRAME_SIZE
    eng.FRAME_SIZE = cfg.mimi.frame_size
    params = make_params(cfg, jax.random.PRNGKey(0))
    engine = eng.BatchedAsrEngine(cfg, params, batch_size=2)
    engine._pcm_buf = np.zeros((2, 1, cfg.mimi.frame_size), np.float32)
    engine.start()
    app = App(asr_engine=engine, instance_name="test")
    yield app, engine, cfg
    engine.stop()
    eng.FRAME_SIZE = saved


def test_asr_ws_stream_and_marker(asr_app):
    app, engine, cfg = asr_app

    async def main():
        async with TestClient(TestServer(app.web_app)) as client:
            ws = await client.ws_connect("/api/asr-streaming")
            ready = msgpack.unpackb((await ws.receive()).data)
            assert ready == {"type": "Ready"}

            pcm = np.random.default_rng(0).standard_normal(
                cfg.mimi.frame_size * 3
            ).astype(np.float32) * 0.1
            await ws.send_bytes(
                msgpack.packb({"type": "Audio", "pcm": pcm.tolist()})
            )
            await ws.send_bytes(msgpack.packb({"type": "Marker", "id": 42}))
            await ws.send_bytes(
                msgpack.packb(
                    {"type": "Audio", "pcm": pcm[: cfg.mimi.frame_size * 2].tolist()}
                )
            )

            msgs = []
            async with asyncio.timeout(60):
                while True:
                    m = msgpack.unpackb((await ws.receive()).data, raw=False)
                    msgs.append(m)
                    if m["type"] == "Marker":
                        break
            steps = [m for m in msgs if m["type"] == "Step"]
            assert len(steps) >= 3
            assert steps[0]["step_idx"] >= 1
            assert len(steps[0]["prs"]) == 2  # extra_heads (2, 6) in test cfg
            assert msgs[-1] == {"type": "Marker", "id": 42}
            await ws.close()

    asyncio.run(main())


def test_asr_capacity_close_code(asr_app):
    app, engine, cfg = asr_app

    async def main():
        async with TestClient(TestServer(app.web_app)) as client:
            w1 = await client.ws_connect("/api/asr-streaming")
            w2 = await client.ws_connect("/api/asr-streaming")
            await w1.receive()  # Ready
            await w2.receive()
            w3 = await client.ws_connect("/api/asr-streaming")
            msg = await w3.receive()
            assert msg.type.name in ("CLOSE", "CLOSED")
            assert w3.close_code == 4000  # ServerAtCapacity
            await w1.close()
            await w2.close()

    asyncio.run(main())


def test_status_health_metrics(asr_app):
    app, engine, cfg = asr_app

    async def main():
        async with TestClient(TestServer(app.web_app)) as client:
            r = await client.get("/api/health")
            assert (await r.json())["status"] == "ok"
            r = await client.get("/api/status")
            body = await r.json()
            assert body["capacity"]["total"] == 2
            r = await client.get("/metrics")
            text = await r.text()
            assert "asr_open_channels" in text
            r = await client.get("/api/build_info")
            assert "jax_version" in await r.json()

    asyncio.run(main())


def test_auth_rejects_without_token(asr_app):
    app, engine, cfg = asr_app
    app_auth = App(
        asr_engine=engine,
        auth_ctx=auth_mod.AuthContext(enabled=True, secret="sek"),
    )

    async def main():
        async with TestClient(TestServer(app_auth.web_app)) as client:
            r = await client.get("/api/asr-streaming")
            assert r.status == 401
            tok = auth_mod.generate_token("u", secret="sek")
            ws = await client.ws_connect(f"/api/asr-streaming?token={tok}")
            ready = msgpack.unpackb((await ws.receive()).data)
            assert ready == {"type": "Ready"}
            await ws.close()

    asyncio.run(main())


def test_client_timeout_close_code(asr_app, monkeypatch):
    """No data within the receive window -> 4006 ClientTimeout
    (batched_asr.rs:899-917)."""
    import dsm_tpu.server.app as app_mod

    app, engine, cfg = asr_app
    monkeypatch.setattr(app_mod, "RECV_TIMEOUT_S", 0.5)

    async def main():
        async with TestClient(TestServer(app.web_app)) as client:
            ws = await client.ws_connect("/api/asr-streaming", autoping=True)
            await ws.receive()  # Ready
            async with asyncio.timeout(30):
                while True:
                    m = await ws.receive()
                    if m.type.name in ("CLOSE", "CLOSED"):
                        break
            assert ws.close_code == 4006

    asyncio.run(main())


def test_session_timeout_close_code(asr_app, monkeypatch):
    """Session hard cap -> 4002 SessionTimeout (asr.rs:334-345)."""
    import dsm_tpu.server.app as app_mod

    app, engine, cfg = asr_app
    monkeypatch.setattr(app_mod, "SESSION_TIMEOUT_S", 0.5)

    async def main():
        async with TestClient(TestServer(app.web_app)) as client:
            ws = await client.ws_connect("/api/asr-streaming")
            await ws.receive()  # Ready
            async with asyncio.timeout(30):
                while True:
                    m = await ws.receive()
                    if m.type.name in ("CLOSE", "CLOSED"):
                        break
            assert ws.close_code == 4002

    asyncio.run(main())


def test_invalid_message_close_code(asr_app):
    app, engine, cfg = asr_app

    async def main():
        async with TestClient(TestServer(app.web_app)) as client:
            ws = await client.ws_connect("/api/asr-streaming")
            await ws.receive()  # Ready
            await ws.send_bytes(b"\xff\xfe not msgpack at all \x00")
            async with asyncio.timeout(30):
                while True:
                    m = await ws.receive()
                    if m.type.name in ("CLOSE", "CLOSED"):
                        break
            assert ws.close_code == 4003

    asyncio.run(main())


def test_rate_limit_close_code(asr_app):
    """Token bucket exhaustion -> 4004 RateLimited (protocol.rs)."""
    app, engine, cfg = asr_app
    limited = App(asr_engine=engine, rate_limit_per_minute=2)

    async def main():
        async with TestClient(TestServer(limited.web_app)) as client:
            w1 = await client.ws_connect("/api/asr-streaming")
            await w1.receive()
            await w1.close()
            w2 = await client.ws_connect("/api/asr-streaming")
            await w2.receive()
            await w2.close()
            w3 = await client.ws_connect("/api/asr-streaming")
            m = await w3.receive()
            assert m.type.name in ("CLOSE", "CLOSED")
            assert w3.close_code == 4004

    asyncio.run(main())


def test_http_one_shot_transcription(asr_app):
    """POST /api/asr with JSON pcm -> transcript (batched_asr.rs:810-854)."""
    app, engine, cfg = asr_app

    async def main():
        async with TestClient(TestServer(app.web_app)) as client:
            pcm = (np.random.default_rng(0)
                   .standard_normal(cfg.mimi.frame_size * 4)
                   .astype(np.float32) * 0.1)
            r = await client.post("/api/asr", json={"pcm": pcm.tolist()})
            assert r.status == 200
            body = await r.json()
            assert "text" in body and "words" in body

            # WAV body path.
            from dsm_tpu.utils.audio import wav_bytes

            # 24 kHz wav resamples down to the tiny test rate internally?
            # The endpoint targets 24 kHz pcm; the test engine frames are
            # tiny, so just check the parse path with a small valid wav.
            r = await client.post(
                "/api/asr", data=wav_bytes(pcm, 24_000),
                headers={"content-type": "audio/wav"},
            )
            assert r.status == 200

            # FLAC body (pcm_decode upload parity): magic-sniffed.
            from tests.test_flac import (
                W, crc16, frame_header, streaminfo, subframe_verbatim,
            )

            samples = np.clip(pcm[:240] * 32767, -32768, 32767).astype(int)
            wf = W()
            frame_header(wf, len(samples), ch_code=0)
            subframe_verbatim(wf, samples.tolist())
            crc16(wf)
            flac_body = (
                b"fLaC" + streaminfo(24_000, 1, 16, len(samples)) + wf.bytes()
            )
            r = await client.post(
                "/api/asr", data=flac_body,
                headers={"content-type": "audio/flac"},
            )
            assert r.status == 200

            # Garbage body -> clean 400, not a 500.
            r = await client.post(
                "/api/asr", data=b"\x00\x01garbage",
                headers={"content-type": "application/octet-stream"},
            )
            assert r.status == 400

    asyncio.run(main())


def test_tls_self_signed_serving(tmp_path):
    """Standalone TLS mode (moshi-backend standalone.rs parity): generate a
    self-signed cert, serve over HTTPS, hit /api/health."""
    import ssl

    import aiohttp
    from aiohttp import web

    from dsm_tpu.server.app import make_self_signed_cert

    cert, key = str(tmp_path / "c.pem"), str(tmp_path / "k.pem")
    make_self_signed_cert(cert, key)

    app = App(instance_name="tls-test")
    srv_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    srv_ctx.load_cert_chain(cert, key)

    async def main():
        runner = web.AppRunner(app.web_app)
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", 0, ssl_context=srv_ctx)
        await site.start()
        port = site._server.sockets[0].getsockname()[1]
        cli_ctx = ssl.create_default_context(cafile=cert)
        cli_ctx.check_hostname = False
        async with aiohttp.ClientSession() as s:
            async with s.get(
                f"https://127.0.0.1:{port}/api/health", ssl=cli_ctx
            ) as r:
                assert r.status == 200
                body = await r.json()
                assert body.get("status") == "ok"
        await runner.cleanup()

    asyncio.run(main())


def test_static_file_fallback(tmp_path):
    """Static file serving (main.rs:989-1009): index.html at '/', files by
    path, traversal blocked, /api routes unaffected."""
    (tmp_path / "index.html").write_text("<h1>dsm-tpu</h1>")
    sub = tmp_path / "assets"
    sub.mkdir()
    (sub / "app.js").write_text("console.log(1)")
    (tmp_path.parent / "secret.txt").write_text("nope")

    app = App(instance_name="static-test", static_dir=str(tmp_path))

    async def main():
        async with TestClient(TestServer(app.web_app)) as client:
            r = await client.get("/")
            assert r.status == 200 and "dsm-tpu" in await r.text()
            r = await client.get("/assets/app.js")
            assert r.status == 200
            r = await client.get("/missing.png")
            assert r.status == 404
            r = await client.get("/../secret.txt")
            assert r.status in (403, 404)
            r = await client.get("/api/health")
            assert r.status == 200  # api routes take precedence

    asyncio.run(main())


def test_asr_ws_on_dp_mesh():
    """Multi-chip serving as CONFIG: the same WS client flow against an
    engine sharded dp=8 over the virtual CPU mesh — the server path runs
    SPMD (batch over ICI), not just the bare step fn (VERDICT r2 item 7)."""
    import jax

    from dsm_tpu.parallel import mesh as M

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    cfg = small_asr_cfg()
    saved = eng.FRAME_SIZE
    eng.FRAME_SIZE = cfg.mimi.frame_size
    try:
        params = make_params(cfg, jax.random.PRNGKey(0))
        mesh = M.make_mesh(dp=8, tp=1)
        engine = eng.BatchedAsrEngine(
            cfg, params, batch_size=8, mesh=mesh
        )
        engine._pcm_buf = np.zeros((8, 1, cfg.mimi.frame_size), np.float32)
        # Compile the SPMD step OUTSIDE the receive windows (8 virtual
        # devices on one host core make the first tick minutes-slow).
        engine.warmup()
        engine.start()
        app = App(asr_engine=engine, instance_name="meshed")

        async def main():
            async with TestClient(TestServer(app.web_app)) as client:
                # Two concurrent sessions land on different dp shards.
                ws1 = await client.ws_connect("/api/asr-streaming")
                ws2 = await client.ws_connect("/api/asr-streaming")
                for ws in (ws1, ws2):
                    ready = msgpack.unpackb((await ws.receive()).data)
                    assert ready == {"type": "Ready"}
                pcm = np.random.default_rng(1).standard_normal(
                    cfg.mimi.frame_size * 3
                ).astype(np.float32) * 0.1
                # Silence after the marker flushes it through the ASR
                # delay, like the real client's shutdown flush
                # (stt/ws.rs:17-20): due step = frames + delay.
                tail = np.zeros(
                    cfg.mimi.frame_size * (cfg.asr_delay_in_tokens + 1),
                    np.float32,
                )
                for ws in (ws1, ws2):
                    await ws.send_bytes(
                        msgpack.packb({"type": "Audio", "pcm": pcm.tolist()})
                    )
                    await ws.send_bytes(
                        msgpack.packb({"type": "Marker", "id": 7})
                    )
                    await ws.send_bytes(
                        msgpack.packb({"type": "Audio", "pcm": tail.tolist()})
                    )
                for ws in (ws1, ws2):
                    msgs = []
                    async with asyncio.timeout(120):
                        while True:
                            m = msgpack.unpackb(
                                (await ws.receive()).data, raw=False
                            )
                            msgs.append(m)
                            if m["type"] == "Marker":
                                break
                    assert any(m["type"] == "Step" for m in msgs)
                    assert msgs[-1] == {"type": "Marker", "id": 7}
                    await ws.close()

        asyncio.run(main())
        engine.stop()
    finally:
        eng.FRAME_SIZE = saved


def test_builder_mesh_from_toml(tmp_path, monkeypatch):
    """[modules.X.mesh] dp=N in the TOML builds a meshed engine."""
    import jax

    from dsm_tpu.server import builder
    from dsm_tpu.server.config import Config

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    base = open("configs/config-smoke.toml").read()
    cfg_path = tmp_path / "meshed.toml"
    cfg_path.write_text(base + "\n[modules.asr.mesh]\ndp = 8\n")
    cfg = Config.load(str(cfg_path))
    mod = cfg.modules["asr"]
    mod.raw["batch_size"] = 8
    mod.batch_size = 8
    engine = builder.build_batched_asr(mod)
    assert engine.mesh is not None and engine.mesh.shape["dp"] == 8
    # One warmup tick compiles + executes the SPMD step.
    engine.warmup()

    # Over-subscription must fail loudly, not silently fall back.
    cfg_path.write_text(base + "\n[modules.asr.mesh]\ndp = 64\n")
    mod2 = Config.load(str(cfg_path)).modules["asr"]
    with pytest.raises(ValueError):
        builder.build_mesh_from_config(mod2)


def test_builder_serving_profile_from_toml(tmp_path):
    """The TPU serving preset keys (pipeline_depth, pcm_wire) flow from
    the TOML through the builder into the engine — serving profile as
    configuration, not env knobs (configs/config-stt-tpu-serving.toml)."""
    import os

    from dsm_tpu.server import builder
    from dsm_tpu.server.config import Config

    # The shipped production preset must parse and carry the profile.
    prod = Config.load("configs/config-stt-tpu-serving.toml")
    pmod = prod.modules["asr"]
    assert pmod.raw["pipeline_depth"] == 2
    assert pmod.raw["pcm_wire"] == "int16"
    assert pmod.batch_size == 192

    # TTS preset: same keys plus the batching/fusion profile.
    tts = Config.load("configs/config-tts-tpu-serving.toml")
    tmod = tts.modules["tts"]
    assert tmod.raw["batch_size"] == 64
    assert tmod.raw["fuse_ticks"] == 4
    assert tmod.raw["pipeline_depth"] == 2
    assert tmod.raw["ca_int8"] is True
    assert tmod.raw["pcm_wire"] == "int16"

    # Smoke-sized build: both knobs land on the constructed engine.
    base = open("configs/config-smoke.toml").read()
    cfg_path = tmp_path / "serving.toml"
    # Keys must land in the [modules.asr] table, not after the last
    # subtable header — splice them next to batch_size.
    cfg_path.write_text(base.replace(
        "batch_size = 2",
        'batch_size = 2\npipeline_depth = 2\npcm_wire = "int16"',
    ))
    mod = Config.load(str(cfg_path)).modules["asr"]
    had_env = os.environ.get("DSM_PCM_INT16")
    try:
        engine = builder.build_batched_asr(mod)
        assert engine.pipeline_depth == 2
        assert engine._pcm_wire_int16
    finally:
        if had_env is None:
            os.environ.pop("DSM_PCM_INT16", None)
        else:
            os.environ["DSM_PCM_INT16"] = had_env


def test_builder_duplex_serving_profile(tmp_path):
    """The duplex preset parses (s2s-2b shapes, B=24, pipe2, int8 rings)
    and a smoke-sized Lm module build honors pipeline_depth/kv_bits."""
    from dsm_tpu.server import builder
    from dsm_tpu.server.config import Config

    prod = Config.load("configs/config-duplex-tpu-serving.toml")
    dmod = prod.modules["duplex"]
    assert dmod.raw["batch_size"] == 24
    assert dmod.raw["pipeline_depth"] == 2
    assert dmod.raw["kv_bits"] == 8
    assert dmod.lm.transformer.d_model == 2560
    assert dmod.lm.depformer.num_slices == 16
    gen = dmod.raw["generation"]
    assert gen["generated_audio_codebooks"] == 16
    assert gen["input_audio_codebooks"] == 16

    cfg_text = """
instance_name = "duplex-serving-test"
authorized_ids = []

[modules.duplex]
path = "/api/chat"
type = "Lm"
batch_size = 2
pipeline_depth = 2
kv_quant = true
kv_bits = 8

[modules.duplex.generation]
generated_audio_codebooks = 2
input_audio_codebooks = 2
acoustic_delay = 1

[modules.duplex.model]
audio_vocab_size = 17
text_in_vocab_size = 33
text_out_vocab_size = 32
audio_codebooks = 4

[modules.duplex.model.transformer]
d_model = 32
num_heads = 4
num_layers = 2
dim_feedforward = 64
context = 32
positional_embedding = "Rope"

[modules.duplex.model.depformer]
num_slices = 2

[modules.duplex.model.depformer.transformer]
d_model = 16
num_heads = 2
num_layers = 2
dim_feedforward = 48
context = 2
positional_embedding = "None"
"""
    p = tmp_path / "duplex-serving.toml"
    p.write_text(cfg_text)
    engine = builder.build_duplex(Config.load(str(p)).modules["duplex"])
    assert engine.pipeline_depth == 2
    assert engine.kv_bits == 8
    assert engine.kv_quant


def test_builder_tts_serving_profile(tmp_path):
    """The TTS preset keys (fuse_ticks, pipeline_depth, ca_int8,
    pcm_wire) flow through build_tts into the batched engine."""
    import os

    cfg_text = """
instance_name = "tts-serving-test"
authorized_ids = []

[modules.tts]
type = "Tts"
path = "/api/tts"
batch_size = 2
fuse_ticks = 2
pipeline_depth = 2
ca_int8 = true
pcm_wire = "int16"

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
    p = tmp_path / "tts-serving.toml"
    p.write_text(cfg_text)

    from dsm_tpu.server import builder
    from dsm_tpu.server.config import Config

    had_env = os.environ.get("DSM_TTS_PCM_I16")
    try:
        engine = builder.build_tts(Config.load(str(p)).modules["tts"])
        assert engine.fuse == 2
        assert engine.pipeline_depth == 2
        assert engine.ca_quant
        assert engine._pcm_wire_i16
    finally:
        if had_env is None:
            os.environ.pop("DSM_TTS_PCM_I16", None)
        else:
            os.environ["DSM_TTS_PCM_I16"] = had_env


def test_event_pump_fifo_and_coalescing():
    """_EventPump preserves per-queue FIFO order across threads and
    coalesces a burst of posts into few loop wakeups."""
    import asyncio
    import threading

    from dsm_tpu.server.app import _EventPump

    async def main():
        loop = asyncio.get_running_loop()
        pump = _EventPump(loop)
        q1: asyncio.Queue = asyncio.Queue()
        q2: asyncio.Queue = asyncio.Queue()

        wakeups = 0
        orig_flush = pump._flush

        def counting_flush():
            nonlocal wakeups
            wakeups += 1
            orig_flush()

        pump._flush = counting_flush

        N = 500

        def producer():
            for i in range(N):
                pump.post(q1, ("a", i))
                pump.post(q2, ("b", i))

        t = threading.Thread(target=producer)
        t.start()
        got1, got2 = [], []
        while len(got1) < N:
            got1.append(await q1.get())
        while len(got2) < N:
            got2.append(await q2.get())
        t.join()
        assert got1 == [("a", i) for i in range(N)]
        assert got2 == [("b", i) for i in range(N)]
        # Coalescing: far fewer wakeups than the 2N posts (exact count is
        # scheduling-dependent; the pre-pump design would be exactly 2N).
        assert wakeups < 2 * N

    asyncio.run(main())
