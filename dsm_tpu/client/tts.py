"""Streaming TTS client (reference: kyutai-client tts/*, kyutai-cli tts.rs).

Sends words as WS text frames, b"\\0" as end-of-stream, collects msgpack
Audio/Text events; reports TTFB and RTF like the reference benchmark output
(kyutai-cli tts.rs:81-94).
"""

from __future__ import annotations

import asyncio
import dataclasses
import time
from typing import List, Optional

import msgpack
import numpy as np


@dataclasses.dataclass
class TtsResult:
    pcm: np.ndarray
    words: List[dict]
    ttfb_s: Optional[float]
    rtf: Optional[float]
    wall_s: float


class TtsClient:
    def __init__(self, url: str, token: Optional[str] = None):
        self.url = url
        self.token = token

    async def synthesize(self, text: str, on_audio=None) -> TtsResult:
        """``on_audio``: optional callback invoked with each decoded pcm
        chunk as it streams (live playback, kyutai-cli tts.rs)."""
        import aiohttp

        headers = {"Authorization": f"Bearer {self.token}"} if self.token else {}
        chunks: List[np.ndarray] = []

        def _emit(pcm):
            chunks.append(pcm)
            if on_audio is not None:
                on_audio(pcm)
        words: List[dict] = []
        t0 = time.monotonic()
        ttfb = None
        async with aiohttp.ClientSession() as session:
            async with session.ws_connect(
                self.url, headers=headers, max_msg_size=64 * 2**20
            ) as ws:
                await ws.send_str(text)
                await ws.send_bytes(b"\0")
                opus_dec = None
                async for msg in ws:
                    if msg.type != aiohttp.WSMsgType.BINARY:
                        continue
                    if msg.data[:4] == b"OggS":
                        # ?format=OggOpus raw pages (tts.rs Encoder::OggOpus).
                        from ..utils import opus as opus_mod

                        if opus_dec is None:
                            opus_dec = opus_mod.OggOpusDecoder()
                        pcm = opus_dec.decode(msg.data)
                        if pcm.size:
                            if ttfb is None:
                                ttfb = time.monotonic() - t0
                            _emit(pcm)
                        continue
                    m = msgpack.unpackb(msg.data, raw=False)
                    t = m.get("type")
                    if t in ("Audio", "OggOpus"):
                        if ttfb is None:
                            ttfb = time.monotonic() - t0
                        if t == "OggOpus" or "data" in m:
                            # OggOpusMessagePack envelope (tts.rs OutMsg::
                            # OggOpus :174; "Audio"+data accepted for
                            # backward compat with older emitters).
                            from ..utils import opus as opus_mod

                            if opus_dec is None:
                                opus_dec = opus_mod.OggOpusDecoder()
                            pcm = opus_dec.decode(bytes(m["data"]))
                            if pcm.size:
                                _emit(pcm)
                        else:
                            _emit(np.asarray(m["pcm"], np.float32))
                    elif t == "Text":
                        words.append(m)
                    elif t == "Error":
                        raise RuntimeError(m.get("message"))
        wall = time.monotonic() - t0
        pcm = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
        rtf = (len(pcm) / 24_000.0) / wall if wall > 0 else None
        return TtsResult(pcm=pcm, words=words, ttfb_s=ttfb, rtf=rtf, wall_s=wall)
