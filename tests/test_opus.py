"""OggOpus codec bindings (utils/opus.py) + compressed server paths
(asr.rs InMsg::OggOpus, tts.rs Encoder::OggOpus*)."""

import asyncio

import msgpack
import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from dsm_tpu.utils import opus

pytestmark = pytest.mark.skipif(
    not opus.available(), reason="libopus/libogg not present"
)


def _sine(n, f=440.0):
    t = np.arange(n) / opus.SAMPLE_RATE
    return (0.3 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_roundtrip_quality_and_framing():
    enc = opus.OggOpusEncoder()
    dec = opus.OggOpusDecoder()
    pcm = _sine(1920 * 10)
    chunks = [
        dec.decode(enc.encode(pcm[i * 1920 : (i + 1) * 1920], eos=(i == 9)))
        for i in range(10)
    ]
    out = np.concatenate(chunks)
    assert out.shape == pcm.shape  # 1:1 sample accounting
    # Align for codec delay (pre-skip + decoder lag) and check fidelity.
    best = max(
        float(np.corrcoef(pcm[: len(pcm) - 600], out[s : s + len(pcm) - 600])[0, 1])
        for s in range(0, 600, 4)
    )
    assert best > 0.95, best


def test_header_pages_format():
    enc = opus.OggOpusEncoder()
    data = enc.encode(_sine(1920))
    assert data.startswith(b"OggS")
    assert b"OpusHead" in data and b"OpusTags" in data


def test_decoder_handles_partial_feeds():
    enc = opus.OggOpusEncoder()
    dec = opus.OggOpusDecoder()
    data = enc.encode(_sine(1920))
    # Byte-dribble the stream: output must still total one frame.
    total = 0
    for i in range(0, len(data), 97):
        total += dec.decode(data[i : i + 97]).size
    assert total == 1920


def test_asr_ws_oggopus_input():
    import jax

    from dsm_tpu.server import batched_asr as eng
    from dsm_tpu.server.app import App
    from tests.test_asr import make_params, small_asr_cfg

    cfg = small_asr_cfg()
    saved = eng.FRAME_SIZE
    eng.FRAME_SIZE = cfg.mimi.frame_size
    try:
        params = make_params(cfg, jax.random.PRNGKey(0))
        engine = eng.BatchedAsrEngine(cfg, params, batch_size=2)
        engine._pcm_buf = np.zeros((2, 1, cfg.mimi.frame_size), np.float32)
        engine.start()
        app = App(asr_engine=engine, instance_name="opus-test")

        async def main():
            async with TestClient(TestServer(app.web_app)) as client:
                ws = await client.ws_connect("/api/asr-streaming")
                ready = msgpack.unpackb((await ws.receive()).data)
                assert ready["type"] == "Ready"
                enc = opus.OggOpusEncoder()
                data = enc.encode(_sine(1920))
                await ws.send_bytes(
                    msgpack.packb({"type": "OggOpus", "data": data})
                )
                await ws.send_bytes(msgpack.packb({"type": "Marker", "id": 7}))
                # Trailing compressed silence pushes the marker through
                # (frame_size is tiny here, so a little pcm is many frames).
                silence = np.zeros(1920 * 8, np.float32)
                for i in range(8):
                    await ws.send_bytes(msgpack.packb({
                        "type": "OggOpus",
                        "data": enc.encode(silence[i * 1920 : (i + 1) * 1920]),
                    }))
                async with asyncio.timeout(240):
                    while True:
                        msg = await ws.receive()
                        if msg.type.name in ("CLOSE", "CLOSED", "ERROR"):
                            raise AssertionError("closed before marker")
                        m = msgpack.unpackb(msg.data)
                        if m["type"] == "Marker":
                            assert m["id"] == 7
                            break
                await ws.close()

        asyncio.run(main())
    finally:
        engine.stop()
        eng.FRAME_SIZE = saved


def test_tts_ws_oggopus_format():
    import jax

    from dsm_tpu.models import lm as LM
    from dsm_tpu.models import mimi as MIMI
    from dsm_tpu.server.app import App
    from dsm_tpu.server.tts_module import TtsEngine
    from dsm_tpu.utils.tokenizer import FallbackTokenizer
    from tests.test_mimi import small_cfg as small_mimi_cfg
    from tests.test_tts import small_tts_cfg

    import dataclasses

    cfg = small_tts_cfg(max_steps=96)
    # No voice resolver in this mini engine: drop cross-attention so the
    # session runs without a ca_kv source.
    lm = dataclasses.replace(
        cfg.lm, transformer=dataclasses.replace(
            cfg.lm.transformer, cross_attention=False, ca_dim=None
        )
    )
    cfg = dataclasses.replace(cfg, lm=lm)
    mimi_cfg = small_mimi_cfg()
    params = {"lm": LM.init(cfg.lm, jax.random.PRNGKey(0))}
    engine = TtsEngine(
        cfg, params, mimi_cfg, MIMI.init(mimi_cfg, jax.random.PRNGKey(1)),
        FallbackTokenizer(),
    )
    app = App(tts_engine=engine, instance_name="opus-tts")

    async def main():
        async with TestClient(TestServer(app.web_app)) as client:
            ws = await client.ws_connect("/api/tts_streaming?format=OggOpus")
            ready = msgpack.unpackb((await ws.receive()).data)
            assert ready["type"] == "Ready"
            await ws.send_str("hello world")
            await ws.send_bytes(b"\0")
            ogg = b""
            words = 0
            async with asyncio.timeout(300):
                while True:
                    msg = await ws.receive()
                    if msg.type.name in ("CLOSE", "CLOSED", "ERROR"):
                        break
                    if msg.data[:4] == b"OggS":
                        ogg += msg.data
                    else:
                        m = msgpack.unpackb(msg.data)
                        if m["type"] == "Text":
                            words += 1
            assert ogg.startswith(b"OggS") and b"OpusHead" in ogg
            dec = opus.OggOpusDecoder()
            pcm = dec.decode(ogg)
            assert pcm.size > 0
            assert words >= 1

    asyncio.run(main())


def test_stt_client_compressed_upload():
    """SttClient(compress=True) streams OggOpus (asr.rs InMsg::OggOpus) and
    still completes the marker-flush shutdown flow."""
    import jax

    from dsm_tpu.client.stt import SHUTDOWN_MARKER, SttClient
    from dsm_tpu.server import batched_asr as eng
    from dsm_tpu.server.app import App
    from tests.test_asr import make_params, small_asr_cfg

    cfg = small_asr_cfg()
    saved_fs = eng.FRAME_SIZE
    eng.FRAME_SIZE = cfg.mimi.frame_size
    try:
        params = make_params(cfg, jax.random.PRNGKey(0))
        engine = eng.BatchedAsrEngine(cfg, params, batch_size=2)
        engine._pcm_buf = np.zeros((2, 1, cfg.mimi.frame_size), np.float32)
        engine.start()
        app = App(asr_engine=engine, instance_name="opus-client")

        async def main():
            server = TestServer(app.web_app)
            await server.start_server()
            try:
                url = str(server.make_url("/api/asr-streaming"))
                client = SttClient(url, compress=True)
                pcm = _sine(1920)
                import dsm_tpu.client.stt as stt_mod

                saved = stt_mod.FRAME
                stt_mod.FRAME = 1920  # opus needs 480-multiples
                try:
                    events = []
                    await client.transcribe_pcm(pcm, on_event=events.append)
                finally:
                    stt_mod.FRAME = saved
                kinds = {e.type for e in events}
                assert "ready" in kinds and "step" in kinds
                assert any(
                    e.type == "marker" and e.marker_id == SHUTDOWN_MARKER
                    for e in events
                )
            finally:
                await server.close()

        asyncio.run(main())
    finally:
        engine.stop()
        eng.FRAME_SIZE = saved_fs


def test_mimi_room_opus_receiver():
    """?format=OggOpus mimi-room receiver gets opus pages with its own
    header (late-join safe), pcm receivers unaffected."""
    from dsm_tpu.server.app import App
    from dsm_tpu.server.mimi_rooms import MimiRoomsEngine
    from dsm_tpu.server.protocol import MsgType
    from tests.test_mimi import small_cfg as small_mimi_cfg

    engine = MimiRoomsEngine(cfg=small_mimi_cfg())
    app = App(mimi_rooms_engine=engine)

    async def main():
        async with TestClient(TestServer(app.web_app)) as client:
            rx_pcm = await client.ws_connect("/api/mimi/recv/r9")
            rx_opus = await client.ws_connect("/api/mimi/recv/r9?format=OggOpus")
            tx = await client.ws_connect("/api/mimi/send/r9")
            codes = np.arange(engine.cfg.n_q, dtype="<u4")
            await tx.send_bytes(bytes([MsgType.CODES]) + codes.tobytes())
            async with asyncio.timeout(150):
                m1 = await rx_pcm.receive()
                m2 = await rx_opus.receive()
            assert m1.data[0] == MsgType.AUDIO
            np.frombuffer(m1.data[1:], "<f4")  # raw pcm payload
            assert m2.data[0] == MsgType.AUDIO
            assert m2.data[1:5] == b"OggS"  # opus pages with headers
            dec = opus.OggOpusDecoder()
            dec.decode(m2.data[1:])  # parses cleanly

    asyncio.run(main())
