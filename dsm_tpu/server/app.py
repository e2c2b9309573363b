"""HTTP/WebSocket server (aiohttp) — the moshi-server equivalent.

Routes (moshi-server/src/main.rs:989-1009, 1148-1686):
  GET  /api/asr-streaming   msgpack WS, continuous-batched STT
  GET  /api/tts_streaming   words in (text frames), msgpack audio out
  POST /api/tts             offline synthesis -> WAV or JSON
  GET  /api/status          capacity/uptime JSON
  GET  /api/health          200 ok
  GET  /metrics             prometheus text
  GET  /api/build_info      build metadata
  GET  /api/modules_info    configured modules

Close codes, auth sources and message schemas are wire-compatible with the
reference so its Rust clients (kyutai-cli stt/tts) connect unmodified over
the PCM paths.  Timeouts mirror the reference: 120 s receive timeout
(ClientTimeout), 360 s session hard cap (SessionTimeout)
(batched_asr.rs:899-917, asr.rs:334-345).
"""

from __future__ import annotations

import asyncio
import base64
import json
import time
from typing import Optional

import numpy as np
from aiohttp import WSMsgType, web

from . import auth as auth_mod
from . import metrics
from . import protocol as proto
from .batched_asr import BatchedAsrEngine, Events

RECV_TIMEOUT_S = 120.0
SESSION_TIMEOUT_S = 360.0
PING_INTERVAL_S = 10.0

START_TIME = time.time()


def build_info() -> dict:
    import jax

    from .. import __version__

    return {
        "version": __version__,
        "framework": "dsm-tpu (jax/xla/pallas)",
        "jax_version": jax.__version__,
        "backend": jax.default_backend(),
    }



def _parse_seed(value):
    """?seed= query param -> int or None (malformed input never raises
    inside a WS handler; it falls back to auto-seeding)."""
    if not value:
        return None
    try:
        return int(value)
    except ValueError:
        return None


class _EventPump:
    """Coalesce cross-thread event deliveries into one loop wakeup.

    Engine drain threads deliver one event per active slot per tick — at
    batch 128 that is ~1600 ``call_soon_threadsafe`` self-pipe wakeups per
    second, each taking the event-loop lock (a measurable slice of the p99
    host tail).  The pump buffers ``(queue, event)`` pairs under its own
    lock and schedules a single flush per burst, so one wakeup drains a
    whole tick's deliveries.  Per-queue FIFO order is preserved: the buffer
    is drained in post order on the loop thread.
    """

    def __init__(self, loop):
        import threading

        self.loop = loop
        self._lock = threading.Lock()
        self._buf: list = []
        self._armed = False

    def post(self, q, ev) -> None:
        with self._lock:
            self._buf.append((q, ev))
            if self._armed:
                return
            self._armed = True
        try:
            self.loop.call_soon_threadsafe(self._flush)
        except RuntimeError:
            # Loop closed mid-shutdown: drop the burst (receivers are gone).
            with self._lock:
                self._buf.clear()
                self._armed = False

    def _flush(self) -> None:
        with self._lock:
            buf, self._buf = self._buf, []
            self._armed = False
        for q, ev in buf:
            q.put_nowait(ev)

class App:
    def __init__(
        self,
        asr_engine: Optional[BatchedAsrEngine] = None,
        tts_engine=None,
        duplex_engine=None,
        mimi_rooms_engine=None,
        auth_ctx: Optional[auth_mod.AuthContext] = None,
        instance_name: str = "dsm-tpu",
        asr_path: str = "/api/asr-streaming",
        tts_path: str = "/api/tts",
        tts_streaming_path: str = "/api/tts_streaming",
        rate_limit_per_minute: Optional[int] = None,
        static_dir: Optional[str] = None,
    ):
        self.asr_engine = asr_engine
        self.tts_engine = tts_engine
        self.duplex_engine = duplex_engine
        self.mimi_rooms_engine = mimi_rooms_engine
        self.auth = auth_ctx or auth_mod.AuthContext(enabled=False)
        self.instance_name = instance_name
        # Per-peer token bucket (close code 4004 RateLimited).
        self.rate_limit = rate_limit_per_minute
        self._buckets: dict = {}
        self.web_app = web.Application()
        r = self.web_app.router
        if asr_engine is not None:
            r.add_get(asr_path, self.handle_asr_ws)
            r.add_post("/api/asr", self.handle_asr_post)
        if tts_engine is not None:
            r.add_post(tts_path, self.handle_tts_post)
            r.add_get(tts_streaming_path, self.handle_tts_ws)
        if duplex_engine is not None:
            # moshi-backend /api/chat + moshi-server /api/lm-streaming.
            r.add_get("/api/chat", self.handle_duplex_ws)
            r.add_get("/api/lm-streaming", self.handle_duplex_ws)
        if mimi_rooms_engine is not None:
            r.add_get("/api/mimi/send/{room}", self.handle_mimi_send)
            r.add_get("/api/mimi/recv/{room}", self.handle_mimi_recv)
        r.add_get("/api/status", self.handle_status)
        r.add_get("/api/health", self.handle_health)
        self.static_dir = static_dir
        if static_dir:
            # Static file fallback (main.rs:989-1009): files under
            # static_dir at '/', with index.html for the root.
            r.add_get("/", self.handle_static)
            r.add_get("/{tail:(?!api/|metrics).*}", self.handle_static)
        r.add_get("/metrics", self.handle_metrics)
        r.add_get("/api/build_info", self.handle_build_info)
        r.add_get("/api/modules_info", self.handle_modules_info)

    # -- helpers --

    def _pump(self, loop) -> _EventPump:
        """Per-loop delivery pump (one loop per App in practice; keyed so
        test harnesses that bind several loops stay correct)."""
        pumps = getattr(self, "_pumps", None)
        if pumps is None:
            pumps = self._pumps = {}
        p = pumps.get(id(loop))
        if p is None or p.loop is not loop:
            p = pumps[id(loop)] = _EventPump(loop)
        return p

    def _check_auth(self, request) -> Optional[web.Response]:
        try:
            self.auth.check(request.headers, dict(request.query), request.cookies)
            return None
        except auth_mod.AuthError as e:
            metrics.record_auth_error(e.code)
            return web.json_response(e.to_json(), status=e.status)

    def _rate_limited(self, request) -> bool:
        """Token bucket per peer: ``rate_limit_per_minute`` new connections,
        burst = one bucket's worth (protocol.rs CloseCode::RateLimited)."""
        if self.rate_limit is None:
            return False
        peer = request.remote or "?"
        now = time.time()
        tokens, last = self._buckets.get(peer, (float(self.rate_limit), now))
        tokens = min(
            float(self.rate_limit), tokens + (now - last) * self.rate_limit / 60.0
        )
        if tokens < 1.0:
            self._buckets[peer] = (tokens, now)
            return True
        self._buckets[peer] = (tokens - 1.0, now)
        return False

    async def _reject_rate_limited(self, request):
        metrics.record_ws_close(proto.CloseCode.RATE_LIMITED)
        ws = web.WebSocketResponse()
        await ws.prepare(request)
        await ws.close(
            code=int(proto.CloseCode.RATE_LIMITED),
            message=proto.CloseCode.RATE_LIMITED.reason.encode(),
        )
        return ws

    # -- plain endpoints --

    async def handle_health(self, request):
        return web.json_response({"status": "ok"})

    async def handle_status(self, request):
        used = self.asr_engine.used_slots() if self.asr_engine else 0
        cap = self.asr_engine.batch_size if self.asr_engine else 0
        body = {
            "instance_name": self.instance_name,
            "uptime_s": round(time.time() - START_TIME, 1),
            "capacity": {"total": cap, "used": used, "available": cap - used},
            "modules": self._modules(),
        }
        if self.tts_engine is not None and hasattr(self.tts_engine, "used_slots"):
            t_cap = self.tts_engine.batch_size
            t_used = self.tts_engine.used_slots()
            body["tts_capacity"] = {
                "total": t_cap, "used": t_used, "available": t_cap - t_used,
            }
        return web.json_response(body)

    async def handle_metrics(self, request):
        metrics.update_device_memory()
        return web.Response(
            body=metrics.render(), content_type="text/plain", charset="utf-8"
        )

    async def handle_build_info(self, request):
        return web.json_response(build_info())

    def _modules(self):
        mods = []
        if self.asr_engine is not None:
            mods.append({"type": "BatchedAsr", "batch_size": self.asr_engine.batch_size})
        if self.tts_engine is not None:
            mods.append({"type": "Tts"})
        return mods

    async def handle_modules_info(self, request):
        return web.json_response({"modules": self._modules()})

    # -- ASR websocket --

    async def handle_asr_ws(self, request):
        err = self._check_auth(request)
        if err is not None:
            return err
        if self._rate_limited(request):
            return await self._reject_rate_limited(request)
        ws = web.WebSocketResponse(heartbeat=PING_INTERVAL_S)
        await ws.prepare(request)
        metrics.ASR_CONNECT.inc()

        loop = asyncio.get_running_loop()
        out_q: asyncio.Queue = asyncio.Queue()
        pump = self._pump(loop)

        def deliver(ev: Events):
            pump.post(out_q, ev)

        seed = _parse_seed(request.query.get("seed"))
        try:
            ch = self.asr_engine.open_channel(deliver, seed=seed)
        except TypeError:  # engines without per-request seeding
            ch = self.asr_engine.open_channel(deliver)
        if ch is None:
            metrics.record_ws_close(proto.CloseCode.SERVER_AT_CAPACITY)
            await ws.close(
                code=int(proto.CloseCode.SERVER_AT_CAPACITY),
                message=proto.CloseCode.SERVER_AT_CAPACITY.reason.encode(),
            )
            return ws

        await ws.send_bytes(proto.asr_ready())
        session_deadline = time.time() + SESSION_TIMEOUT_S
        close_code = proto.CloseCode.NORMAL
        opus_dec = None  # lazy per-connection OggOpus decoder

        from ..sessions.asr import EndWordEvent, WordEvent

        def _frames_for(ev: Events):
            frames = []
            for w in ev.words:
                if isinstance(w, WordEvent):
                    text = self.asr_engine_tokenizer_decode(w.tokens)
                    frames.append(proto.asr_word(text, w.start_time))
                elif isinstance(w, EndWordEvent):
                    frames.append(proto.asr_end_word(w.stop_time))
            if ev.prs is not None:
                frames.append(proto.asr_step(
                    ev.step_idx,
                    [float(p) for p in ev.prs],
                    ch.buffered_samples(),
                ))
            frames.extend(proto.asr_marker(mid) for mid in ev.markers)
            return frames

        async def sender():
            # Batched drain: when the event loop falls behind the 80 ms
            # cadence (p99 host tail at B=128), several ticks' events are
            # queued — pack them ALL before yielding to the socket, so one
            # wakeup flushes the backlog instead of re-entering the
            # scheduler per message.
            while True:
                ev = await out_q.get()
                frames = []
                while True:
                    if ev is None:
                        for f in frames:
                            await ws.send_bytes(f)
                        return
                    frames.extend(_frames_for(ev))
                    try:
                        ev = out_q.get_nowait()
                    except asyncio.QueueEmpty:
                        break
                for f in frames:
                    await ws.send_bytes(f)

        send_task = asyncio.create_task(sender())
        try:
            while True:
                timeout = min(RECV_TIMEOUT_S, session_deadline - time.time())
                if timeout <= 0:
                    close_code = proto.CloseCode.SESSION_TIMEOUT
                    break
                try:
                    msg = await ws.receive(timeout=timeout)
                except asyncio.TimeoutError:
                    # Distinguish the session hard cap from a stalled client.
                    close_code = (
                        proto.CloseCode.SESSION_TIMEOUT
                        if time.time() >= session_deadline
                        else proto.CloseCode.CLIENT_TIMEOUT
                    )
                    break
                if msg.type in (WSMsgType.CLOSE, WSMsgType.CLOSING, WSMsgType.CLOSED, WSMsgType.ERROR):
                    break
                if msg.type != WSMsgType.BINARY:
                    continue
                if metrics.stream_metrics_enabled():
                    metrics.stream_in("asr", len(msg.data))
                try:
                    m = proto.asr_in_msg(msg.data)
                except Exception:
                    close_code = proto.CloseCode.INVALID_MESSAGE
                    break
                t = m["type"]
                if t == "Audio":
                    ch.push_pcm(np.asarray(m["pcm"], np.float32))
                elif t == "Marker":
                    self.asr_engine.add_marker(ch, int(m["id"]))
                elif t == "OggOpus":
                    # Compressed input (asr.rs InMsg::OggOpus): stream-decode
                    # ogg pages into the slot's pcm mailbox.
                    from ..utils import opus as opus_mod

                    if not opus_mod.available():
                        await ws.send_bytes(
                            proto.asr_error("opus decode not available; send pcm")
                        )
                        continue
                    if opus_dec is None:
                        opus_dec = opus_mod.OggOpusDecoder()
                    pcm = opus_dec.decode(bytes(m["data"]))
                    if pcm.size:
                        ch.push_pcm(pcm)
                elif t in ("Init", "Ping"):
                    pass
        finally:
            self.asr_engine.close_channel(ch)
            send_task.cancel()
            if close_code != proto.CloseCode.NORMAL:
                metrics.record_ws_close(close_code)
            if not ws.closed:
                await ws.close(
                    code=int(close_code), message=close_code.reason.encode()
                )
        return ws

    async def handle_asr_post(self, request):
        """One-shot HTTP transcription (batched_asr.rs:810-854): body is a
        WAV file (audio/wav) or JSON {pcm: [f32...]}; retries for a free
        slot, appends trailing silence + a marker, returns the transcript
        once the marker lands."""
        err = self._check_auth(request)
        if err is not None:
            return err
        ctype = request.headers.get("content-type", "")
        if "json" in ctype:
            body = await request.json()
            pcm = np.asarray(body.get("pcm", []), np.float32)
        else:
            # Container sniffed by magic bytes: wav/mp3/ogg/flac, the
            # reference's pcm_decode upload surface (utils.rs:263-305).
            from ..utils.audio import decode_audio_bytes

            raw = await request.read()
            try:
                pcm = decode_audio_bytes(raw, 24_000)
            except Exception as e:
                return web.json_response(
                    {"error": f"bad audio payload: {e}"}, status=400
                )

        loop = asyncio.get_running_loop()
        events_q: asyncio.Queue = asyncio.Queue()
        pump = self._pump(loop)

        def deliver(ev):
            pump.post(events_q, ev)

        # Retry for a slot (the reference polls with backoff).
        ch = None
        deadline = time.time() + 30.0
        while ch is None and time.time() < deadline:
            ch = self.asr_engine.open_channel(deliver)
            if ch is None:
                await asyncio.sleep(0.1)
        if ch is None:
            return web.json_response({"error": "server at capacity"}, status=503)

        try:
            frame = self.asr_engine.frame_size
            ch.push_pcm(pcm)
            marker_id = -1
            self.asr_engine.add_marker(ch, marker_id)
            # Trailing silence flushes the decode delay (10 s in the
            # reference; delay + slack frames here).
            tail = (self.asr_engine.cfg.asr_delay_in_tokens + 8) * frame
            ch.push_pcm(np.zeros(tail, np.float32))

            from ..sessions.asr import EndWordEvent, WordEvent

            words = []
            done = False
            t_end = time.time() + 300.0
            while not done and time.time() < t_end:
                # 60 s covers a warm engine with margin; a cold engine
                # (embedded App whose runner skipped warmup()) may still be
                # XLA-compiling its first step in-request — give the first
                # event the compile window instead of 500ing.
                first_ev_timeout = (
                    300.0 if getattr(self.asr_engine, "step_count", 1) == 0
                    else 60.0
                )
                ev = await asyncio.wait_for(
                    events_q.get(), timeout=first_ev_timeout
                )
                for w in ev.words:
                    if isinstance(w, WordEvent):
                        words.append({
                            "text": self.asr_engine_tokenizer_decode(w.tokens),
                            "start_s": w.start_time, "stop_s": None,
                        })
                    elif isinstance(w, EndWordEvent) and words:
                        words[-1]["stop_s"] = w.stop_time
                if marker_id in ev.markers:
                    done = True
            return web.json_response({
                "text": " ".join(w["text"] for w in words),
                "words": words,
            })
        except asyncio.TimeoutError:
            return web.json_response({"error": "transcription timed out"},
                                     status=504)
        finally:
            self.asr_engine.close_channel(ch)

    def asr_engine_tokenizer_decode(self, tokens):
        tok = getattr(self.asr_engine, "tokenizer", None)
        if tok is None:
            return " ".join(str(t) for t in tokens)
        return tok.decode(list(tokens))

    # -- TTS --

    async def handle_tts_post(self, request):
        err = self._check_auth(request)
        if err is not None:
            return err
        body = await request.json()
        text = body.get("text", "")
        seed = int(body.get("seed", 0))
        try:
            ca_kv = self.tts_engine.voice_kv(body.get("voice"))
        except FileNotFoundError as e:
            return web.json_response({"error": str(e)}, status=404)
        loop = asyncio.get_running_loop()
        import inspect

        sig = inspect.signature(self.tts_engine.synthesize)
        kw = {"seed": seed} if "seed" in sig.parameters else {}
        if (
            "cfg_alpha" in sig.parameters
            and body.get("cfg_alpha") is not None
            and getattr(self.tts_engine, "cfg_enabled", False)
        ):
            kw["cfg_alpha"] = float(body["cfg_alpha"])
        if "ca_kv" in sig.parameters:
            kw["ca_kv"] = ca_kv
        elif "voice_ca" in sig.parameters:
            kw["voice_ca"] = ca_kv
        pcm, transcript = await loop.run_in_executor(
            None, lambda: self.tts_engine.synthesize(text, **kw)
        )
        from ..utils.audio import wav_bytes

        accept = request.headers.get("accept", "")
        wav = wav_bytes(pcm, 24_000)
        if "application/json" in accept:
            return web.json_response(
                {
                    "audio_base64": base64.b64encode(wav).decode(),
                    "transcript": [
                        {"text": w.text, "start_s": w.start_s, "stop_s": w.stop_s}
                        for w in transcript
                    ],
                }
            )
        return web.Response(body=wav, content_type="audio/wav")

    async def handle_tts_ws(self, request):
        err = self._check_auth(request)
        if err is not None:
            return err
        from .tts_batched import BatchedTtsEngine

        if isinstance(self.tts_engine, BatchedTtsEngine):
            return await self._handle_tts_ws_batched(request)
        ws = web.WebSocketResponse(heartbeat=PING_INTERVAL_S)
        await ws.prepare(request)
        await ws.send_bytes(proto.tts_ready())

        from .tts_module import AudioEvent, TtsSession, WordEvent

        loop = asyncio.get_running_loop()
        out_q: asyncio.Queue = asyncio.Queue()
        try:
            ca_kv = self.tts_engine.voice_kv(request.query.get("voice"))
        except FileNotFoundError as e:
            await ws.send_bytes(proto.tts_error(str(e)))
            await ws.close(code=int(proto.CloseCode.RESOURCE_UNAVAILABLE))
            return ws
        session = TtsSession(
            self.tts_engine,
            ca_kv=ca_kv,
            condition=getattr(self.tts_engine, "default_condition", None),
        )
        inserted_bos = False
        # Output encoding (tts.rs Encoder::{Pcm,PcmMessagePack,OggOpus,
        # OggOpusMessagePack}); pcm-msgpack is the default wire format.
        fmt = request.query.get("format", "PcmMessagePack")
        opus_enc = None
        if fmt in ("OggOpus", "OggOpusMessagePack"):
            from ..utils import opus as opus_mod

            if not opus_mod.available():
                await ws.send_bytes(proto.tts_error("opus not available"))
                fmt = "PcmMessagePack"
            else:
                opus_enc = opus_mod.OggOpusEncoder()

        def _pad_to_packets(pcm):
            import numpy as _np

            n = len(pcm)
            rem = n % opus_mod.PACKET_SAMPLES if opus_enc is not None else 0
            if rem:
                pcm = _np.pad(_np.asarray(pcm, _np.float32), (0, opus_mod.PACKET_SAMPLES - rem))
            return pcm

        async def send_audio(pcm):
            if opus_enc is not None:
                data = opus_enc.encode(_pad_to_packets(pcm))
                if fmt == "OggOpus":
                    await ws.send_bytes(data)
                else:
                    await ws.send_bytes(proto.tts_audio_opus(data))
            else:
                await ws.send_bytes(proto.tts_audio([float(x) for x in pcm]))

        pump = self._pump(loop)

        def on_event(ev):
            pump.post(out_q, ev)

        def run_session():
            try:
                # Single-inference mutex like the reference (tts.rs:31,374).
                with self.tts_engine.lock:
                    session.run(on_event, word_timeout=RECV_TIMEOUT_S)
            finally:
                pump.post(out_q, None)

        run_task = loop.run_in_executor(None, run_session)

        async def sender():
            while True:
                ev = await out_q.get()
                if ev is None:
                    return
                if isinstance(ev, AudioEvent):
                    await send_audio(ev.pcm)
                elif isinstance(ev, WordEvent):
                    await ws.send_bytes(proto.tts_text(ev.text, ev.start_s, ev.stop_s))

        send_task = asyncio.create_task(sender())
        deadline = time.time() + RECV_TIMEOUT_S
        try:
            # Poll with a short timeout so a finished (or crashed) session
            # thread releases the socket promptly.
            while not session.done and not run_task.done():
                if time.time() > deadline:
                    break
                try:
                    msg = await ws.receive(timeout=0.5)
                except asyncio.TimeoutError:
                    continue
                deadline = time.time() + RECV_TIMEOUT_S
                if msg.type == WSMsgType.TEXT:
                    words, inserted_bos = self.tts_engine.encode_words(
                        msg.data, inserted_bos
                    )
                    session.feed_words(words)
                elif msg.type == WSMsgType.BINARY:
                    if msg.data == proto.TTS_EOS:
                        session.end_input()
                elif msg.type in (WSMsgType.CLOSE, WSMsgType.CLOSING, WSMsgType.CLOSED, WSMsgType.ERROR):
                    break
        finally:
            session.end_input()
            await run_task
            await send_task
            if not ws.closed:
                await ws.close()
        return ws

    async def _handle_tts_ws_batched(self, request):
        """Continuously-batched TTS session (server/tts_batched.py)."""
        from .tts_batched import DoneEvent
        from .tts_module import AudioEvent, WordEvent

        ws = web.WebSocketResponse(heartbeat=PING_INTERVAL_S)
        await ws.prepare(request)

        loop = asyncio.get_running_loop()
        out_q: asyncio.Queue = asyncio.Queue()
        pump = self._pump(loop)

        def deliver(ev):
            pump.post(out_q, ev)

        try:
            voice_ca = self.tts_engine.voice_kv(request.query.get("voice"))
        except FileNotFoundError as e:
            await ws.send_bytes(proto.tts_error(str(e)))
            await ws.close(code=int(proto.CloseCode.RESOURCE_UNAVAILABLE))
            return ws
        def _qf(name):
            v = request.query.get(name)
            try:
                return float(v) if v is not None else None
            except ValueError:
                return None

        open_kw = {}
        import inspect as _inspect

        _osig = _inspect.signature(self.tts_engine.open_session)
        if "cfg_alpha" in _osig.parameters and getattr(
            self.tts_engine, "cfg_enabled", False
        ):
            open_kw["cfg_alpha"] = _qf("cfg_alpha")
        if "seed" in _osig.parameters:
            sv = request.query.get("seed")
            open_kw["seed"] = _parse_seed(sv)
        slot = self.tts_engine.open_session(
            deliver, voice_ca=voice_ca,
            text_temperature=_qf("text_temperature") or _qf("temperature"),
            audio_temperature=_qf("audio_temperature") or _qf("temperature"),
            **open_kw,
        )
        if slot is None:
            metrics.record_ws_close(proto.CloseCode.SERVER_AT_CAPACITY)
            await ws.close(
                code=int(proto.CloseCode.SERVER_AT_CAPACITY),
                message=proto.CloseCode.SERVER_AT_CAPACITY.reason.encode(),
            )
            return ws
        await ws.send_bytes(proto.tts_ready())
        inserted_bos = False
        done = asyncio.Event()

        async def sender():
            while True:
                ev = await out_q.get()
                if isinstance(ev, DoneEvent):
                    done.set()
                    return
                if isinstance(ev, AudioEvent):
                    await ws.send_bytes(proto.tts_audio([float(x) for x in ev.pcm]))
                elif isinstance(ev, WordEvent):
                    await ws.send_bytes(proto.tts_text(ev.text, ev.start_s, ev.stop_s))

        send_task = asyncio.create_task(sender())
        try:
            while not done.is_set():
                try:
                    msg = await ws.receive(timeout=1.0)
                except asyncio.TimeoutError:
                    continue
                if msg.type == WSMsgType.TEXT:
                    words, inserted_bos = self.tts_engine.encode_words(
                        msg.data, inserted_bos
                    ) if hasattr(self.tts_engine, "encode_words") else ([], inserted_bos)
                    slot.feed_words(words)
                elif msg.type == WSMsgType.BINARY and msg.data == proto.TTS_EOS:
                    slot.end_input()
                elif msg.type in (WSMsgType.CLOSE, WSMsgType.CLOSING,
                                  WSMsgType.CLOSED, WSMsgType.ERROR):
                    break
            await asyncio.wait_for(send_task, timeout=5)
        except (asyncio.TimeoutError, asyncio.CancelledError):
            send_task.cancel()
        finally:
            self.tts_engine.close_session(slot)
            if not ws.closed:
                await ws.close()
        return ws

    # -- duplex dialogue (byte-tag protocol) --

    async def handle_duplex_ws(self, request):
        err = self._check_auth(request)
        if err is not None:
            return err
        from ..utils import opus as opus_mod
        from .duplex import DuplexSession, audio_frame, parse_frame, text_frame
        from .protocol import MsgType

        # Wire format: OggOpus AUDIO frames by default — compatible with
        # reference duplex clients (lm.rs:77-318, multistream.rs:5-113) —
        # or raw float32 pcm with ?format=pcm (our codec-less extension).
        fmt = request.query.get("format", "")
        use_opus = fmt != "pcm" and opus_mod.available()
        if fmt == "opus" and not opus_mod.available():
            return web.json_response(
                {"error": "opus codec unavailable"}, status=501
            )
        asr_delay = _parse_seed(request.query.get("asr_delay_in_tokens")) or 0

        batched = hasattr(self.duplex_engine, "open_session")

        ws = web.WebSocketResponse(heartbeat=PING_INTERVAL_S)
        await ws.prepare(request)
        # Handshake payload: protocol version u32 (0) + model version u32
        # (stream_both.rs send_ready :259-269, lm.rs :243-246).
        await ws.send_bytes(bytes([MsgType.HANDSHAKE]) + b"\x00" * 8)

        loop = asyncio.get_running_loop()
        out_q: asyncio.Queue = asyncio.Queue()
        pump = self._pump(loop)
        if batched:
            session = None
        else:
            session = DuplexSession(
                self.duplex_engine, asr_delay_in_tokens=asr_delay
            )

        enc = dec = None
        if use_opus:
            enc = opus_mod.OggOpusEncoder()
            dec = opus_mod.OggOpusDecoder()
            # Header pages (OpusHead + OpusTags) go out first as one AUDIO
            # frame, before any encoded packet (lm.rs:251-262 header_data).
            await ws.send_bytes(bytes([MsgType.AUDIO]) + enc.header_pages())

        def on_audio(pcm):
            if enc is not None:
                # One 80 ms frame = 4 x 480-sample opus packets, flushed
                # onto one ogg page per frame (MsgSender:284-316 pattern).
                data = enc.encode(pcm)
                if data:
                    pump.post(out_q, bytes([MsgType.AUDIO]) + data)
            else:
                pump.post(out_q, audio_frame(pcm))

        def on_text(text):
            pump.post(out_q, text_frame(text))

        run_task = None
        slot = None
        if batched:
            # Continuous batching: the shared engine loop steps all
            # dialogues; this handler only feeds the slot mailbox and
            # relays its events (same split as the ASR/TTS modules).
            from .duplex_batched import (
                DuplexAudioEvent, DuplexDoneEvent, DuplexTextEvent,
            )

            def deliver(ev):
                if isinstance(ev, DuplexAudioEvent):
                    on_audio(ev.pcm)
                elif isinstance(ev, DuplexTextEvent):
                    pump.post(out_q, text_frame(ev.text))
                elif isinstance(ev, DuplexDoneEvent):
                    pump.post(out_q, None)

            slot = self.duplex_engine.open_session(
                deliver, asr_delay_in_tokens=asr_delay
            )
            if slot is None:
                metrics.record_ws_close(proto.CloseCode.SERVER_AT_CAPACITY)
                await ws.close(
                    code=int(proto.CloseCode.SERVER_AT_CAPACITY),
                    message=proto.CloseCode.SERVER_AT_CAPACITY.reason.encode(),
                )
                return ws
            push_pcm = slot.push_pcm
        else:
            def run_session():
                try:
                    session.run(on_audio, on_text)
                finally:
                    pump.post(out_q, None)

            run_task = loop.run_in_executor(None, run_session)
            push_pcm = session.push_pcm

        async def sender():
            while True:
                frame = await out_q.get()
                if frame is None:
                    return
                if metrics.stream_metrics_enabled():
                    metrics.stream_out("lm", len(frame))
                await ws.send_bytes(frame)

        send_task = asyncio.create_task(sender())
        metrics.LM_ACTIVE_CONNECTIONS.inc()
        try:
            async for msg in ws:
                if msg.type != WSMsgType.BINARY:
                    continue
                if metrics.stream_metrics_enabled():
                    metrics.stream_in("lm", len(msg.data))
                tag, payload = parse_frame(msg.data)
                if tag == MsgType.AUDIO:
                    if dec is not None:
                        pcm = dec.decode(payload)
                        if len(pcm):
                            push_pcm(pcm)
                    else:
                        push_pcm(np.frombuffer(payload, "<f4"))
                elif tag == MsgType.PING:
                    await ws.send_bytes(bytes([MsgType.PING]))
        finally:
            metrics.LM_ACTIVE_CONNECTIONS.dec()
            if batched:
                self.duplex_engine.close_session(slot)
                out_q.put_nowait(None)
            else:
                session.close()
                await run_task
            await send_task
            if not ws.closed:
                await ws.close()
        return ws

    # -- mimi broadcast rooms --

    async def handle_mimi_send(self, request):
        err = self._check_auth(request)
        if err is not None:
            return err
        from .mimi_rooms import audio_message, parse_codes, text_message
        from .protocol import MsgType

        room = self.mimi_rooms_engine.room(request.match_info["room"])
        ws = web.WebSocketResponse(heartbeat=5.0)
        await ws.prepare(request)
        loop = asyncio.get_running_loop()
        n_q = self.mimi_rooms_engine.cfg.n_q
        async for msg in ws:
            if msg.type != WSMsgType.BINARY or not msg.data:
                continue
            tag, payload = msg.data[0], msg.data[1:]
            if tag == MsgType.CODES:
                codes = parse_codes(payload, n_q)
                if codes is None:
                    continue
                pcm = await loop.run_in_executor(
                    None, self.mimi_rooms_engine.decode_frame, room, codes
                )
                room.broadcast(audio_message(pcm), loop)
            elif tag == MsgType.TEXT:
                room.broadcast(
                    text_message(payload.decode(errors="replace")), loop
                )
        return ws

    async def handle_mimi_recv(self, request):
        err = self._check_auth(request)
        if err is not None:
            return err
        room = self.mimi_rooms_engine.room(request.match_info["room"])
        ws = web.WebSocketResponse(heartbeat=5.0)
        await ws.prepare(request)
        # Per-receiver opus re-encode so late joiners get their own header
        # pages (reference broadcasts opus pages, mimi.rs:12-215).
        opus_enc = None
        if request.query.get("format") == "OggOpus":
            from ..utils import opus as opus_mod

            if opus_mod.available():
                opus_enc = opus_mod.OggOpusEncoder()
        q = room.subscribe()
        try:
            sender = asyncio.create_task(self._room_sender(ws, q, opus_enc))
            async for msg in ws:
                if msg.type in (WSMsgType.CLOSE, WSMsgType.ERROR):
                    break
            sender.cancel()
        finally:
            room.unsubscribe(q)
            if not ws.closed:
                await ws.close()
        return ws

    async def _room_sender(self, ws, q, opus_enc=None):
        from .protocol import MsgType

        while True:
            payload = await q.get()
            if opus_enc is not None and payload and payload[0] == MsgType.AUDIO:
                pcm = np.frombuffer(payload[1:], "<f4")
                from ..utils import opus as opus_mod

                rem = len(pcm) % opus_mod.PACKET_SAMPLES
                if rem:
                    pcm = np.pad(pcm, (0, opus_mod.PACKET_SAMPLES - rem))
                data = opus_enc.encode(pcm)
                if data:
                    await ws.send_bytes(bytes([MsgType.AUDIO]) + data)
                continue
            await ws.send_bytes(payload)

    async def handle_static(self, request):
        """Serve files from static_dir, path-traversal guarded; '/' maps to
        index.html (reference static fallback, main.rs:989-1009)."""
        import os

        tail = request.match_info.get("tail", "") or "index.html"
        root = os.path.realpath(self.static_dir)
        path = os.path.realpath(os.path.join(root, tail))
        if not path.startswith(root + os.sep) and path != root:
            return web.Response(status=403, text="forbidden")
        if os.path.isdir(path):
            path = os.path.join(path, "index.html")
        if not os.path.isfile(path):
            return web.Response(status=404, text="not found")
        return web.FileResponse(path)

    def run(
        self,
        host: str = "0.0.0.0",
        port: int = 8080,
        ssl_cert: str | None = None,
        ssl_key: str | None = None,
    ):
        """Serve, optionally over TLS (moshi-backend standalone.rs:57-172
        standalone mode; pass both cert and key PEM paths).  Use
        ``make_self_signed_cert`` for the rcgen-style dev certificate."""
        ctx = None
        if ssl_cert and ssl_key:
            import ssl

            ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
            ctx.load_cert_chain(ssl_cert, ssl_key)
        # uvloop (when installed) cuts per-wakeup event-loop overhead on the
        # B=128 send path; absent from this image, so strictly opt-in.
        try:
            import uvloop  # type: ignore

            uvloop.install()
        except ImportError:
            pass
        web.run_app(self.web_app, host=host, port=port, ssl_context=ctx)


def make_self_signed_cert(cert_path: str, key_path: str, cn: str = "localhost"):
    """Generate a self-signed TLS certificate for standalone dev serving
    (reference uses rcgen in moshi-backend/src/main.rs; we shell out to
    openssl, which is universally present)."""
    import subprocess

    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
            "-keyout", key_path, "-out", cert_path, "-days", "365",
            "-subj", f"/CN={cn}",
            "-addext", f"subjectAltName=DNS:{cn},IP:127.0.0.1",
        ],
        check=True,
        capture_output=True,
    )
