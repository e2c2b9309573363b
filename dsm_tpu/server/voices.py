"""TTS voice resolution (reference: moshi-server/src/tts.rs:692-779).

Voices come from three sources, in the reference's order:
  1. preloaded safetensors voice embeddings ([modules.tts.voices] table)
  2. a voice directory of .safetensors embeddings or .wav samples, looked up
     by (path-traversal-checked) relative name, with the ``voice+start_s``
     suffix syntax for picking an offset into a longer sample
  3. on-the-fly speaker encoding of a wav through Mimi's pre-quantize
     encoder (models/speaker.py), cached in an LRU keyed by the request.

The resolved conditioning is the cross-attention token sequence; the
per-layer K/V projection is cached per voice (models/speaker.VoiceCache).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..models import speaker as SPK


def parse_voice_spec(spec: str) -> Tuple[str, float]:
    """``name+12.5`` -> (name, 12.5 s start offset) (tts.rs voice+start_s)."""
    if "+" in spec:
        name, _, off = spec.rpartition("+")
        try:
            return name, float(off)
        except ValueError:
            return spec, 0.0
    return spec, 0.0


def safe_voice_path(voice_dir: str, name: str) -> Optional[str]:
    """Resolve a voice name inside voice_dir, refusing path traversal
    (tts.rs checks the canonical path stays under the voice dir)."""
    base = os.path.realpath(voice_dir)
    cand = os.path.realpath(os.path.join(base, name))
    if not cand.startswith(base + os.sep) and cand != base:
        return None
    if os.path.exists(cand):
        return cand
    for ext in (".safetensors", ".wav"):
        if os.path.exists(cand + ext):
            return cand + ext
    return None


def load_voice_embedding(path: str) -> np.ndarray:
    """A precomputed voice file: safetensors with the ca_src tensor
    (1, S, cond_dim); accepts common key spellings."""
    from safetensors.numpy import load_file

    t = load_file(path)
    for key in ("speaker_wavs", "ca_src", "condition", "embedding"):
        if key in t:
            arr = np.asarray(t[key], np.float32)
            break
    else:
        # Single-tensor file.
        if len(t) != 1:
            raise ValueError(f"ambiguous voice file {path}: keys {list(t)}")
        arr = np.asarray(next(iter(t.values())), np.float32)
    if arr.ndim == 2:
        arr = arr[None]
    return arr


class VoiceResolver:
    def __init__(
        self,
        voice_dir: Optional[str] = None,
        preloaded: Optional[dict] = None,  # name -> file path
        speaker_cfg: Optional[SPK.SpeakerEncoderConfig] = None,
        speaker_params=None,
        mimi_params=None,
        cache_size: int = 32,
    ):
        from collections import OrderedDict

        self.voice_dir = voice_dir
        self.preloaded = dict(preloaded or {})
        self.speaker_cfg = speaker_cfg
        self.speaker_params = speaker_params
        self.mimi_params = mimi_params
        self._cache = OrderedDict()
        self.cache_size = cache_size

    def resolve(self, spec: Optional[str]) -> Optional[np.ndarray]:
        """voice spec -> ca_src tokens (1, S, cond_dim), or None (no voice)."""
        if not spec:
            return None
        if spec in self._cache:
            self._cache.move_to_end(spec)
            return self._cache[spec]
        name, start_s = parse_voice_spec(spec)
        path = self.preloaded.get(name)
        if path is None and self.voice_dir:
            path = safe_voice_path(self.voice_dir, name)
        if path is None:
            raise FileNotFoundError(f"unknown voice {spec!r}")
        if path.endswith(".safetensors"):
            ca = load_voice_embedding(path)
        elif path.endswith(".wav"):
            ca = self._encode_wav(path, start_s)
        else:
            raise ValueError(f"unsupported voice file {path}")
        self._cache[spec] = ca
        if len(self._cache) > self.cache_size:
            self._cache.popitem(last=False)
        return ca

    def _encode_wav(self, path: str, start_s: float) -> np.ndarray:
        if self.speaker_cfg is None or self.speaker_params is None:
            raise RuntimeError("no speaker encoder configured for wav voices")
        import jax.numpy as jnp

        from ..utils.audio import decode_audio

        sr = int(self.speaker_cfg.mimi.sample_rate)
        pcm = decode_audio(path, sr)
        start = int(start_s * sr)
        dur = int(self.speaker_cfg.duration_s * sr)
        pcm = pcm[start : start + dur]
        if len(pcm) < dur:
            pcm = np.pad(pcm, (0, dur - len(pcm)))
        ca = SPK.encode(
            self.speaker_cfg, self.speaker_params, self.mimi_params,
            [jnp.asarray(pcm)],
        )
        return np.asarray(ca, np.float32)
