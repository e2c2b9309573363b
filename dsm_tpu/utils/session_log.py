"""Per-session token logging for offline replay/debug.

Reference: the servers dump text+audio token streams as safetensors
(moshi-server/src/asr.rs:126-175 token logging, batched_asr.rs Logger
:133-214 periodic flush, tts.rs:116-167, moshi-backend
stream_both.rs:612-672 which also writes a JSON transcript sidecar).
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Dict, List, Optional

import numpy as np


class SessionLogger:
    """Accumulates per-slot token steps; flushes safetensors periodically
    and on close."""

    def __init__(
        self,
        log_dir: str,
        instance_name: str = "dsm-tpu",
        flush_every_steps: int = 500,
    ):
        self.log_dir = log_dir
        self.instance = instance_name
        self.flush_every = flush_every_steps
        self._lock = threading.Lock()
        self._sessions: Dict[str, dict] = {}
        os.makedirs(log_dir, exist_ok=True)

    def open_session(self, session_id: str, meta: Optional[dict] = None) -> None:
        with self._lock:
            self._sessions[session_id] = {
                "text": [],
                "audio": [],
                "meta": meta or {},
                "started": time.time(),
                "steps_since_flush": 0,
                "transcript": [],
            }

    def log_step(self, session_id: str, text_token: int, audio_tokens) -> None:
        with self._lock:
            s = self._sessions.get(session_id)
            if s is None:
                return
            s["text"].append(int(text_token))
            s["audio"].append(np.asarray(audio_tokens, np.int32))
            s["steps_since_flush"] += 1
            flush = s["steps_since_flush"] >= self.flush_every
        if flush:
            self.flush(session_id)

    def log_word(self, session_id: str, text: str, start_s: float,
                 stop_s: Optional[float]) -> None:
        with self._lock:
            s = self._sessions.get(session_id)
            if s is not None:
                s["transcript"].append(
                    {"text": text, "start_s": start_s, "stop_s": stop_s}
                )

    def flush(self, session_id: str) -> Optional[str]:
        from safetensors.numpy import save_file

        with self._lock:
            s = self._sessions.get(session_id)
            if s is None or not s["text"]:
                return None
            text = np.asarray(s["text"], np.int32)
            audio = (
                np.stack(s["audio"]) if s["audio"] else np.zeros((0, 0), np.int32)
            )
            transcript = list(s["transcript"])
            meta = dict(s["meta"])
            s["steps_since_flush"] = 0
        path = os.path.join(self.log_dir, f"{self.instance}-{session_id}")
        save_file(
            {"text_tokens": text, "audio_tokens": audio}, path + ".safetensors"
        )
        with open(path + ".json", "w") as f:
            json.dump({"meta": meta, "transcript": transcript}, f)
        return path + ".safetensors"

    def close_session(self, session_id: str) -> Optional[str]:
        path = self.flush(session_id)
        with self._lock:
            self._sessions.pop(session_id, None)
        return path


def load_session(path: str):
    """Load a dumped session for replay (text (T,), audio (T, K))."""
    from safetensors.numpy import load_file

    t = load_file(path)
    meta = {}
    sidecar = path.replace(".safetensors", ".json")
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            meta = json.load(f)
    return t["text_tokens"], t["audio_tokens"], meta
