"""Client library against the real server (full loop over websockets) +
TTS text preprocessing."""

import asyncio

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from dsm_tpu.client.stt import SHUTDOWN_MARKER, SttClient, _to_event
from dsm_tpu.server import tts_preprocess as prep
from dsm_tpu.utils.tokenizer import FallbackTokenizer
from tests.test_server_e2e import asr_app  # fixture


def test_break_segment_parser():
    segs = prep.parse_segments('Hello <break time="0.5s"/> world <break time="1.0s"/>!')
    assert segs[0] == "Hello "
    assert isinstance(segs[1], prep.BreakTime) and segs[1].seconds == 0.5
    assert segs[2] == " world "
    assert segs[4] == "!"
    # trailing whitespace dropped
    segs = prep.parse_segments('<break time="0.5s"/>yay!<break time="1.0s"/>  ')
    assert isinstance(segs[0], prep.BreakTime)
    assert segs[1] == "yay!"
    assert isinstance(segs[2], prep.BreakTime)


def test_preprocessor_pads_and_bos():
    p = prep.Preprocessor(FallbackTokenizer(), text_bos_token=1, text_pad_token=3)
    out = p.preprocess('hi <break time="1.0s"/> there')
    assert out[0].word == "hi" and out[0].tokens[0] == 1  # bos once
    assert out[1].tokens == [3] * 12  # 1 s at 12.5 Hz -> 12 pads
    assert out[2].word == "there" and out[2].tokens[0] != 1
    # normalization
    out = p.preprocess("a:b (c)")
    assert [w.word for w in out] == ["a", "b", "c"]
    # break capped at 10 s
    out = prep.Preprocessor(FallbackTokenizer(), 1).preprocess('<break time="60s"/>')
    assert len(out[0].tokens) == 125


def test_stt_event_mapping():
    ev = _to_event({"type": "Word", "text": "x", "start_time": 0.2})
    assert ev.type == "word" and ev.text == "x"
    assert _to_event({"type": "Nope"}) is None


def test_stt_client_end_to_end(asr_app):
    app, engine, cfg = asr_app

    async def main():
        server = TestServer(app.web_app)
        await server.start_server()
        try:
            url = str(server.make_url("/api/asr-streaming"))
            client = SttClient(url)
            pcm = np.random.default_rng(0).standard_normal(
                cfg.mimi.frame_size * 4
            ).astype(np.float32) * 0.1
            # Patch the client's frame size down to the tiny test config.
            import dsm_tpu.client.stt as stt_mod

            saved = stt_mod.FRAME
            stt_mod.FRAME = cfg.mimi.frame_size
            try:
                events = []
                transcript = await client.transcribe_pcm(pcm, on_event=events.append)
            finally:
                stt_mod.FRAME = saved
            kinds = {e.type for e in events}
            assert "ready" in kinds and "step" in kinds and "marker" in kinds
            # The shutdown marker round-tripped.
            assert any(
                e.type == "marker" and e.marker_id == SHUTDOWN_MARKER for e in events
            )
            assert isinstance(transcript.text, str)
        finally:
            await server.close()

    asyncio.run(main())
