"""Streaming STT client (reference: client/rust/kyutai-client stt/ws.rs).

Speaks the msgpack WS protocol of /api/asr-streaming: Audio{pcm} frames in,
Word/EndWord/Step/Marker events out.  Feature parity with SttClientBuilder:
  * bearer-token auth (header or ?token=)
  * auto-reconnect on retryable close codes (4000/4004 + 1012/1013; the
    reference also retries 4005/4006 — stt/ws.rs:296-336)
  * graceful shutdown flush: trailing silence + marker, wait for the marker
    to come back (stt/ws.rs:17-20)
  * word/transcript assembly with timestamps, VAD step events
"""

from __future__ import annotations

import asyncio
import dataclasses
import time
from typing import AsyncIterator, List, Optional

import msgpack
import numpy as np

RETRYABLE_CLOSE_CODES = {1012, 1013, 4000, 4004, 4005, 4006}
FRAME = 1920
SHUTDOWN_MARKER = -989_898  # sentinel marker id for the final flush


@dataclasses.dataclass
class SttEvent:
    type: str  # word | end_word | step | marker | ready
    text: Optional[str] = None
    start_time: Optional[float] = None
    stop_time: Optional[float] = None
    step_idx: Optional[int] = None
    prs: Optional[List[float]] = None
    marker_id: Optional[int] = None


@dataclasses.dataclass
class Word:
    text: str
    start_s: float
    stop_s: Optional[float]


class Transcript:
    """Word-timing assembly (client transcript.rs)."""

    def __init__(self):
        self.words: List[Word] = []

    def on_event(self, ev: SttEvent) -> None:
        if ev.type == "word":
            self.words.append(Word(ev.text, ev.start_time, None))
        elif ev.type == "end_word" and self.words and self.words[-1].stop_s is None:
            self.words[-1].stop_s = ev.stop_time

    @property
    def text(self) -> str:
        return " ".join(w.text for w in self.words)


class SttClient:
    def __init__(
        self,
        url: str,
        token: Optional[str] = None,
        max_retries: int = 3,
        retry_delay_s: float = 1.0,
        compress: bool = False,
    ):
        self.url = url
        self.token = token
        self.max_retries = max_retries
        self.retry_delay_s = retry_delay_s
        # Upload as OggOpus instead of raw pcm (asr.rs InMsg::OggOpus);
        # needs libopus/libogg on the client side.
        self.compress = compress

    def _headers(self):
        return {"Authorization": f"Bearer {self.token}"} if self.token else {}

    async def transcribe_pcm(
        self,
        pcm: np.ndarray,
        rtf: Optional[float] = None,
        on_event=None,
    ) -> Transcript:
        """Stream pcm (24 kHz mono float32) and return the final transcript.

        ``rtf`` paces the upload (1.0 = real time); None = as fast as
        possible.  Retries the whole session on retryable close codes.
        """
        import aiohttp

        attempt = 0
        while True:
            try:
                return await self._run_once(pcm, rtf, on_event)
            except ConnectionResetError as e:
                attempt += 1
                if attempt > self.max_retries:
                    raise
                await asyncio.sleep(self.retry_delay_s)

    async def transcribe_frames(self, frames, on_event=None) -> Transcript:
        """Stream frames from a (sync or async) iterator of float32 chunks —
        e.g. live mic capture (mic.rs capture loop) — then flush.  The
        iterator paces the session (a mic yields one frame per 80 ms)."""

        async def gen():
            if hasattr(frames, "__aiter__"):
                async for f in frames:
                    yield np.asarray(f, np.float32)
            else:
                loop = asyncio.get_running_loop()
                it = iter(frames)

                def _next():
                    try:
                        return next(it)
                    except StopIteration:
                        return None

                while True:
                    f = await loop.run_in_executor(None, _next)
                    if f is None:
                        break
                    yield np.asarray(f, np.float32)

        return await self._run_once(None, None, on_event, frame_iter=gen())

    async def _run_once(self, pcm, rtf, on_event, frame_iter=None) -> Transcript:
        import aiohttp

        transcript = Transcript()
        async with aiohttp.ClientSession() as session:
            async with session.ws_connect(
                self.url, headers=self._headers(), max_msg_size=64 * 2**20
            ) as ws:
                recv_done = asyncio.Event()

                opus_enc = None
                if self.compress:
                    from ..utils import opus as opus_mod

                    opus_enc = opus_mod.OggOpusEncoder()

                def _audio_msg(chunk: np.ndarray) -> bytes:
                    if opus_enc is not None:
                        if len(chunk) % opus_mod.PACKET_SAMPLES:
                            pad = opus_mod.PACKET_SAMPLES - (
                                len(chunk) % opus_mod.PACKET_SAMPLES
                            )
                            chunk = np.pad(chunk, (0, pad))
                        return msgpack.packb(
                            {"type": "OggOpus", "data": opus_enc.encode(chunk)}
                        )
                    return msgpack.packb(
                        {"type": "Audio", "pcm": chunk.tolist()},
                        use_single_float=True,
                    )

                async def sender():
                    if frame_iter is not None:
                        async for chunk in frame_iter:
                            await ws.send_bytes(_audio_msg(chunk))
                    else:
                        n = len(pcm)
                        t_start = time.monotonic()
                        sent = 0
                        for i in range(0, n, FRAME):
                            chunk = np.asarray(pcm[i : i + FRAME], np.float32)
                            await ws.send_bytes(_audio_msg(chunk))
                            sent += len(chunk)
                            if rtf:
                                target = t_start + sent / 24_000.0 / rtf
                                delay = target - time.monotonic()
                                if delay > 0:
                                    await asyncio.sleep(delay)
                    # Graceful flush: marker, then trailing silence until the
                    # marker comes back (stt/ws.rs:419-442 sends silence in a
                    # loop, not a fixed count — a fixed 16 frames can never
                    # drain stt-2.6b's 32-token delay).  The receive loop
                    # cancels this task on marker receipt; the cap bounds a
                    # lost-marker pathology.
                    await ws.send_bytes(
                        msgpack.packb({"type": "Marker", "id": SHUTDOWN_MARKER})
                    )
                    silence = np.zeros(FRAME, np.float32)
                    for _ in range(150):
                        await ws.send_bytes(_audio_msg(silence))
                        await asyncio.sleep(0.04)

                send_task = asyncio.create_task(sender())
                try:
                    async for msg in ws:
                        if msg.type != aiohttp.WSMsgType.BINARY:
                            continue
                        m = msgpack.unpackb(msg.data, raw=False)
                        ev = _to_event(m)
                        if ev is None:
                            continue
                        if on_event:
                            on_event(ev)
                        transcript.on_event(ev)
                        if ev.type == "marker" and ev.marker_id == SHUTDOWN_MARKER:
                            break
                finally:
                    send_task.cancel()
                close_code = ws.close_code
                if close_code in RETRYABLE_CLOSE_CODES:
                    raise ConnectionResetError(f"retryable close {close_code}")
        return transcript


def _to_event(m: dict) -> Optional[SttEvent]:
    t = m.get("type")
    if t == "Word":
        return SttEvent("word", text=m["text"], start_time=m["start_time"])
    if t == "EndWord":
        return SttEvent("end_word", stop_time=m["stop_time"])
    if t == "Step":
        return SttEvent("step", step_idx=m["step_idx"], prs=m.get("prs"))
    if t == "Marker":
        return SttEvent("marker", marker_id=m["id"])
    if t == "Ready":
        return SttEvent("ready")
    return None
