"""Duplex /api/chat and mimi broadcast rooms over real websockets."""

import asyncio

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from dsm_tpu.server.app import App
from dsm_tpu.server.protocol import MsgType
from dsm_tpu.utils.tokenizer import FallbackTokenizer


def make_duplex_engine():
    import jax

    from dsm_tpu.models import lm as LM
    from dsm_tpu.models import mimi as MIMI
    from dsm_tpu.server.duplex import DuplexEngine
    from dsm_tpu.sessions import lm_gen
    from tests.test_mimi import small_cfg as small_mimi_cfg

    mimi_cfg = small_mimi_cfg()  # n_q = 4
    lm_cfg = LM.LmConfig(
        transformer=__import__("dsm_tpu.ops.transformer", fromlist=["T"]).TransformerConfig(
            d_model=32, num_heads=4, num_layers=2, dim_feedforward=64, context=32
        ),
        depformer=LM.DepFormerConfig(
            transformer=__import__("dsm_tpu.ops.transformer", fromlist=["T"]).TransformerConfig(
                d_model=16, num_heads=2, num_layers=2, dim_feedforward=32,
                context=2, positional_embedding="none",
            ),
            num_slices=2,
        ),
        text_in_vocab_size=41, text_out_vocab_size=40,
        audio_vocab_size=33, audio_codebooks=4,
    )
    cfg = lm_gen.DuplexConfig(
        lm=lm_cfg, generated_audio_codebooks=2, input_audio_codebooks=2,
        acoustic_delay=1, text_start_token=40, max_steps=64,
        audio_temperature=0.0, text_temperature=0.0,
    )
    key = jax.random.PRNGKey(0)
    params = {
        "lm": LM.init(lm_cfg, key),
        "mimi": MIMI.init(mimi_cfg, jax.random.fold_in(key, 1)),
    }
    return DuplexEngine(cfg, params, mimi_cfg, params["mimi"], FallbackTokenizer()), mimi_cfg


def test_duplex_chat_roundtrip():
    engine, mimi_cfg = make_duplex_engine()
    # Warm up exactly like `cli worker` does: compiles happen at startup,
    # so the receive timeouts below cover serving only (this was the
    # load-sensitive flake — first-frame XLA compile inside the window).
    engine.warmup()
    app = App(duplex_engine=engine)

    async def main():
        async with TestClient(TestServer(app.web_app)) as client:
            ws = await client.ws_connect("/api/chat?format=pcm")
            hello = await ws.receive()
            assert hello.data[0] == MsgType.HANDSHAKE
            # protocol version u32 + model version u32 (stream_both.rs
            # send_ready :259-269)
            assert len(hello.data) == 9
            pcm = np.random.default_rng(0).standard_normal(
                mimi_cfg.frame_size * 6
            ).astype("<f4") * 0.1
            await ws.send_bytes(bytes([MsgType.AUDIO]) + pcm.tobytes())
            got_audio = got_any = 0
            async with asyncio.timeout(60):
                while got_audio < 2:
                    msg = await ws.receive()
                    if msg.type.name in ("CLOSE", "CLOSED", "ERROR"):
                        break
                    tag = msg.data[0]
                    got_any += 1
                    if tag == MsgType.AUDIO:
                        got_audio += 1
                        out = np.frombuffer(msg.data[1:], "<f4")
                        assert len(out) == mimi_cfg.frame_size
            assert got_audio >= 2
            await ws.close()

    asyncio.run(main())


def test_mimi_rooms_broadcast():
    from dsm_tpu.server.mimi_rooms import MimiRoomsEngine
    from tests.test_mimi import small_cfg as small_mimi_cfg

    engine = MimiRoomsEngine(cfg=small_mimi_cfg())
    engine.warmup()  # compile at startup, like `cli worker`
    app = App(mimi_rooms_engine=engine)

    async def main():
        async with TestClient(TestServer(app.web_app)) as client:
            recv1 = await client.ws_connect("/api/mimi/recv/r1")
            recv2 = await client.ws_connect("/api/mimi/recv/r1")
            other = await client.ws_connect("/api/mimi/recv/r2")
            send = await client.ws_connect("/api/mimi/send/r1")

            codes = np.arange(engine.cfg.n_q, dtype="<u4")
            await send.send_bytes(bytes([MsgType.CODES]) + codes.tobytes())
            await send.send_bytes(bytes([MsgType.TEXT]) + b"hello room")

            async with asyncio.timeout(60):
                m1 = await recv1.receive()
                m2 = await recv2.receive()
            assert m1.data[0] == MsgType.AUDIO and m2.data[0] == MsgType.AUDIO
            pcm = np.frombuffer(m1.data[1:], "<f4")
            assert len(pcm) == engine.cfg.frame_size
            async with asyncio.timeout(30):
                t1 = await recv1.receive()
            assert t1.data[0] == MsgType.TEXT and t1.data[1:] == b"hello room"
            # Room isolation: r2 receiver saw nothing.
            with pytest.raises(asyncio.TimeoutError):
                async with asyncio.timeout(0.5):
                    await other.receive()
            for w in (recv1, recv2, other, send):
                await w.close()

    asyncio.run(main())


def test_duplex_engine_serving_profile_kv_quant():
    """DuplexEngine with the accelerator serving profile forced on CPU:
    int8 KV rings + weight-only int8 LM run the full warmup + a session
    step (the moshi-7B duplex path is weight-read-bound; this is the
    profile a TPU worker builds)."""
    import jax
    import numpy as np

    from dsm_tpu.models import lm as LM
    from dsm_tpu.models import mimi as MIMI
    from dsm_tpu.server.duplex import DuplexEngine, DuplexSession
    from dsm_tpu.sessions import lm_gen
    from tests.test_mimi import small_cfg as small_mimi_cfg

    engine, mimi_cfg = make_duplex_engine()
    # Rebuild with kv_quant forced (make_duplex_engine uses auto=CPU-off).
    eng = DuplexEngine(
        engine.cfg, engine.params, engine.mimi_cfg, engine.mimi_params,
        engine.tokenizer, kv_quant=True,
    )
    assert eng.kv_quant
    # (Weight-only int8 skips these tiny test matrices — quantize_weights
    # has a min_size gate; at moshi-7B shapes every matmul leaf converts.)
    eng.warmup()
    sess = DuplexSession(eng)
    assert "ks" in sess.state["lm"]["t"]["layers"][0]  # int8 KV rings


def test_duplex_chat_opus_wire():
    """Reference duplex wire parity: AUDIO frames carry OggOpus both ways
    (lm.rs:77-318, stream_both.rs:221-319).  The server's first AUDIO frame
    is the codec header (OpusHead+OpusTags pages); model speech arrives as
    ogg pages that a standard OggOpus decoder accepts."""
    from dsm_tpu.utils import opus as opus_mod

    if not opus_mod.available():
        import pytest

        pytest.skip("libopus/libogg unavailable")
    engine, mimi_cfg = make_duplex_engine()
    engine.warmup()
    app = App(duplex_engine=engine)

    async def main():
        async with TestClient(TestServer(app.web_app)) as client:
            ws = await client.ws_connect("/api/chat")
            hello = await ws.receive()
            assert hello.data[0] == MsgType.HANDSHAKE and len(hello.data) == 9
            header = await ws.receive()
            assert header.data[0] == MsgType.AUDIO
            assert header.data[1:5] == b"OggS"  # codec header pages
            dec = opus_mod.OggOpusDecoder()
            dec.decode(header.data[1:])

            enc = opus_mod.OggOpusEncoder()
            pcm = np.random.default_rng(0).standard_normal(
                480 * 50
            ).astype("<f4") * 0.1
            data = enc.encode(pcm)
            await ws.send_bytes(bytes([MsgType.AUDIO]) + data)
            got_audio = np.zeros(0, np.float32)
            async with asyncio.timeout(60):
                while len(got_audio) < mimi_cfg.frame_size * 2:
                    msg = await ws.receive()
                    if msg.type.name in ("CLOSE", "CLOSED", "ERROR"):
                        break
                    if msg.data[0] == MsgType.AUDIO:
                        out = dec.decode(msg.data[1:])
                        got_audio = np.concatenate([got_audio, out])
            assert len(got_audio) >= mimi_cfg.frame_size * 2
            await ws.close()

    asyncio.run(main())


def test_duplex_asr_delay_mode():
    """run_with_state_asr (stream_both.rs:329-383): with
    ?asr_delay_in_tokens=N the session transcribes only — TEXT frames may
    arrive, AUDIO frames never do."""
    engine, mimi_cfg = make_duplex_engine()
    engine.warmup()
    app = App(duplex_engine=engine)

    async def main():
        async with TestClient(TestServer(app.web_app)) as client:
            ws = await client.ws_connect(
                "/api/chat?format=pcm&asr_delay_in_tokens=4"
            )
            await ws.receive()  # handshake
            pcm = np.random.default_rng(1).standard_normal(
                mimi_cfg.frame_size * 10
            ).astype("<f4") * 0.1
            await ws.send_bytes(bytes([MsgType.AUDIO]) + pcm.tobytes())
            await asyncio.sleep(1.0)
            await ws.close()
            saw_audio = False
            while True:
                msg = await ws.receive(timeout=1)
                if msg.type.name in ("CLOSE", "CLOSED", "ERROR"):
                    break
                if msg.type.name == "BINARY" and msg.data and msg.data[0] == MsgType.AUDIO:
                    saw_audio = True
            assert not saw_audio

    asyncio.run(main())
