"""Batched TTS over websockets: two clients stream words concurrently."""

import asyncio

import msgpack
import numpy as np
from aiohttp.test_utils import TestClient, TestServer

from dsm_tpu.server.app import App
from tests.test_tts_batched import make_engine


def test_two_ws_clients_share_the_batched_engine():
    eng, cfg = make_engine(batch=2)
    eng.start()
    try:
        app = App(tts_engine=eng)

        async def run_client(client, text):
            ws = await client.ws_connect("/api/tts_streaming")
            ready = msgpack.unpackb((await ws.receive()).data)
            assert ready == {"type": "Ready"}
            await ws.send_str(text)
            await ws.send_bytes(b"\0")
            words, audio = [], 0
            async with asyncio.timeout(120):
                while True:
                    msg = await ws.receive()
                    if msg.type.name in ("CLOSE", "CLOSED", "ERROR"):
                        break
                    m = msgpack.unpackb(msg.data, raw=False)
                    if m["type"] == "Text":
                        words.append(m)
                    elif m["type"] == "Audio":
                        audio += 1
                        assert len(m["pcm"]) == 48
            return words, audio

        async def main():
            async with TestClient(TestServer(app.web_app)) as client:
                r1, r2 = await asyncio.gather(
                    run_client(client, "hi"), run_client(client, "yo ho")
                )
            w1, a1 = r1
            w2, a2 = r2
            assert a1 >= 1 and a2 >= 1
            assert len(w1) >= 1 and len(w2) >= 2
            for w in w1 + w2:
                assert w["stop_s"] >= w["start_s"]

        asyncio.run(main())
    finally:
        eng.stop()
