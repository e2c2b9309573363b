"""TUI duplex client (client/tui.py; reference moshi-cli tui/multistream.rs):
pure render-state tests plus a live websocket round-trip."""

import asyncio

import numpy as np
from aiohttp.test_utils import TestServer

from dsm_tpu.client.tui import (
    FRAME_SIZE,
    DuplexTuiClient,
    TuiState,
    level_db,
    pcm_frames,
)
from dsm_tpu.server.app import App
from tests.test_duplex_server import make_duplex_engine


def test_pcm_frames_padding_and_silence():
    pcm = np.ones(FRAME_SIZE + 100, np.float32)
    frames = list(pcm_frames(pcm, 3))
    assert [f.shape for f in frames] == [(FRAME_SIZE,)] * 3
    assert frames[0].sum() == FRAME_SIZE
    assert frames[1][:100].sum() == 100 and frames[1][100:].sum() == 0
    assert frames[2].sum() == 0  # past EOF -> silence
    assert all(f.sum() == 0 for f in pcm_frames(None, 2))


def test_level_db_and_meter():
    assert level_db(np.zeros(10, np.float32)) <= -100
    loud = level_db(np.ones(10, np.float32))
    assert abs(loud) < 1e-3  # full-scale ~ 0 dBFS
    st = TuiState()
    assert st.meter(0.0) == "#" * 20
    assert st.meter(-60.0) == "-" * 20
    assert st.meter(-30.0).count("#") == 10


def test_render_lines_wraps_and_clips():
    st = TuiState()
    st.on_text("hello world " * 30)
    st.on_audio(np.zeros(FRAME_SIZE, np.float32))
    st.frames_sent = 7
    lines = st.render_lines(width=40, height=12)
    assert len(lines) <= 12
    assert all(len(ln) <= 40 for ln in lines)
    assert any("rx     1 frames" in ln for ln in lines)
    assert any("hello world" in ln for ln in lines)
    assert st.rx_seconds == FRAME_SIZE / 24_000


def test_tui_client_roundtrip():
    engine, _ = make_duplex_engine()
    app = App(duplex_engine=engine)

    async def main():
        server = TestServer(app.web_app)
        await server.start_server()
        url = str(server.make_url("/api/chat")).replace("http", "ws")
        updates = []
        client = DuplexTuiClient(url, seconds=0.4, drain_s=120)  # 5 frames;
        # generous drain: first duplex step compiles on CPU
        st = await client.run(on_update=updates.append)
        await server.close()
        return st, updates

    st, updates = asyncio.run(main())
    assert st.frames_sent == 5
    assert st.status == "done"
    assert updates  # UI got redraw callbacks
    # The duplex engine echoes decoded audio + text back.
    assert st.frames_recv >= 1
