"""Mimi codec-as-a-service broadcast rooms.

Reference: moshi-server/src/mimi.rs — a sender websocket posts codebook
frames; the server decodes them once and broadcasts the audio to every
receiver websocket in the room; text frames pass through.

Wire format (byte-tag protocol, protocol.rs MsgType):
  sender  -> CODES (9) + little-endian u32 codes, one frame = n_q values
  server  -> AUDIO (1) + little-endian f32 pcm to all receivers
             TEXT  (2) passthrough
The reference broadcasts ogg/opus pages; with no opus backend in this
environment the stream is raw pcm (the tag layout is unchanged).
"""

from __future__ import annotations

import asyncio
import threading
from typing import Dict, Optional, Set

import numpy as np

from ..models import mimi as MIMI
from .protocol import MsgType


class Room:
    def __init__(self, name: str, engine: "MimiRoomsEngine"):
        self.name = name
        self.engine = engine
        self.receivers: Set[asyncio.Queue] = set()
        self.dec_state = None
        self.lock = threading.Lock()

    def subscribe(self) -> asyncio.Queue:
        q: asyncio.Queue = asyncio.Queue(maxsize=256)
        self.receivers.add(q)
        return q

    def unsubscribe(self, q: asyncio.Queue) -> None:
        self.receivers.discard(q)

    def broadcast(self, payload: bytes, loop) -> None:
        # One loop wakeup per broadcast, not per receiver: fan-out happens
        # on the loop thread (receivers is only mutated there).
        targets = list(self.receivers)

        def fan_out():
            for qq in targets:
                if qq.full():
                    try:
                        qq.get_nowait()
                    except asyncio.QueueEmpty:
                        pass
                qq.put_nowait(payload)

        loop.call_soon_threadsafe(fan_out)


class MimiRoomsEngine:
    def __init__(self, cfg: Optional[MIMI.MimiConfig] = None, params=None):
        import jax

        self.cfg = cfg or MIMI.v0_1(16)
        if params is None:
            params = MIMI.init(self.cfg, jax.random.PRNGKey(0))
        self.params = params
        self.rooms: Dict[str, Room] = {}
        self.lock = threading.Lock()
        self._decode = jax.jit(
            lambda p, s, c: MIMI.decode_step(self.cfg, p, s, c), donate_argnums=(1,)
        )

    def warmup(self) -> None:
        """Compile the decode step before serving (main.rs module warmup):
        the first room frame must not pay XLA compile inside a request."""
        state = MIMI.init_decode_state(self.cfg, 1)
        codes = np.zeros((1, self.cfg.n_q, 1), np.int32)
        pcm, _ = self._decode(self.params, state, codes)
        np.asarray(pcm)

    def room(self, name: str) -> Room:
        with self.lock:
            if name not in self.rooms:
                self.rooms[name] = Room(name, self)
            return self.rooms[name]

    def decode_frame(self, room: Room, codes: np.ndarray) -> np.ndarray:
        """codes (n_q,) -> pcm (frame_size,) keeping per-room decoder state."""
        with room.lock:
            if room.dec_state is None:
                room.dec_state = MIMI.init_decode_state(self.cfg, 1)
            pcm, room.dec_state = self._decode(
                self.params, room.dec_state, codes[None, :, None].astype(np.int32)
            )
        return np.asarray(pcm[0, 0], np.float32)


def parse_codes(payload: bytes, n_q: int) -> Optional[np.ndarray]:
    codes = np.frombuffer(payload, "<u4")
    if len(codes) != n_q:
        return None
    return codes.astype(np.int32)


def audio_message(pcm: np.ndarray) -> bytes:
    return bytes([MsgType.AUDIO]) + np.asarray(pcm, "<f4").tobytes()


def text_message(text: str) -> bytes:
    return bytes([MsgType.TEXT]) + text.encode()
