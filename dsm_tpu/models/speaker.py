"""Speaker (voice) encoder for TTS cross-attention conditioning.

Reference: moshi-core/src/tts_streaming.rs:334-417 SpeakerEncoder and
tts.rs:94-109 add_sin_embeddings.  A ~10 s voice sample per speaker is
normalised to a fixed level, run through Mimi's pre-quantisation encoder
(12.5 Hz latents, d=512), projected to the conditioning dim, padded to
``n_speakers`` slots with a learnt padding vector, flattened over speakers,
and given absolute sinusoidal position embeddings.  The result is the
cross-attention source whose per-layer K/V the transformer precomputes once
per session (CaSrc::KeysValues).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp

from ..ops import transformer as T
from . import mimi as MIMI


@dataclasses.dataclass(frozen=True)
class SpeakerEncoderConfig:
    cond_dim: int = 2048
    n_speakers: int = 5
    duration_s: float = 10.0
    mimi: MIMI.MimiConfig = dataclasses.field(default_factory=MIMI.v0_1)

    @property
    def frames_per_speaker(self) -> int:
        # 10 s at 12.5 Hz = 125 frames (tts_streaming.rs:411-413 uses
        # n_speakers * 125 for the empty condition).
        return int(self.duration_s * self.mimi.frame_rate)


def init(cfg: SpeakerEncoderConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    d = cfg.mimi.seanet.dimension
    return {
        "proj": jax.random.normal(k1, (cfg.cond_dim, d), dtype) / jnp.sqrt(d),
        "learnt_padding": jax.random.normal(k2, (1, 1, cfg.cond_dim), dtype) * 0.02,
    }


def add_sin_embeddings(xs: jax.Array, max_period: float = 10_000.0) -> jax.Array:
    """Absolute concat(cos, sin) position embedding (tts.rs:94-109)."""
    _b, t, d = xs.shape
    half = d // 2
    pos = jnp.arange(t, dtype=jnp.float32)[:, None]
    idx = jnp.arange(half, dtype=jnp.float32)
    inv_freq = 1.0 / (max_period ** (idx / (half - 1)))
    freqs = pos * inv_freq
    emb = jnp.concatenate([jnp.cos(freqs), jnp.sin(freqs)], axis=-1)
    return (xs.astype(jnp.float32) + emb[None]).astype(xs.dtype)


def normalize_speaker_pcm(pcm: jax.Array) -> jax.Array:
    """Fixed-level normalisation: 0.08 * pcm / std (tts_streaming.rs:387-390)."""
    pcm = pcm - jnp.mean(pcm)
    std = jnp.sqrt(jnp.mean(jnp.square(pcm)) + 1e-9)
    return pcm * (0.08 / std)


def encode(
    cfg: SpeakerEncoderConfig,
    params: dict,
    mimi_params: dict,
    speaker_pcms: List[jax.Array],
) -> jax.Array:
    """speaker pcms (each (T,) mono 24 kHz) -> ca_src tokens
    (1, n_speakers*frames, cond_dim)."""
    if not speaker_pcms:
        return empty(cfg, params)
    pcms = [normalize_speaker_pcm(p)[None, None, :] for p in speaker_pcms[: cfg.n_speakers]]
    pcm = jnp.concatenate(pcms, axis=0)
    lat = MIMI.encode_pre_quantize(cfg.mimi, mimi_params, pcm)  # (S, d, T)
    emb = jnp.einsum("sdt,cd->stc", lat, params["proj"])  # (S, T, cond)
    n = emb.shape[0]
    if n < cfg.n_speakers:
        padding = jnp.broadcast_to(
            params["learnt_padding"], (cfg.n_speakers - n, emb.shape[1], cfg.cond_dim)
        )
        emb = jnp.concatenate([emb, padding], axis=0)
    emb = emb.reshape(1, -1, cfg.cond_dim)
    return add_sin_embeddings(emb)


def empty(cfg: SpeakerEncoderConfig, params: dict) -> jax.Array:
    """No-voice condition: learnt padding for every slot
    (tts_streaming.rs:411-416)."""
    emb = jnp.broadcast_to(
        params["learnt_padding"],
        (1, cfg.n_speakers * cfg.frames_per_speaker, cfg.cond_dim),
    )
    return add_sin_embeddings(emb)


class VoiceCache:
    """LRU cache of precomputed per-layer cross-attention K/V per voice
    (moshi-server/src/tts.rs DynamicVoiceCache :34-72)."""

    def __init__(self, lm_tcfg: T.TransformerConfig, lm_tparams, capacity: int = 16):
        from collections import OrderedDict

        self.tcfg = lm_tcfg
        self.tparams = lm_tparams
        self.capacity = capacity
        self._cache = __import__("collections").OrderedDict()

    def get(self, key: str, ca_tokens_fn):
        if key in self._cache:
            self._cache.move_to_end(key)
            return self._cache[key]
        ca_tokens = ca_tokens_fn()
        kv = T.precompute_ca_kv(self.tcfg, self.tparams, ca_tokens)
        self._cache[key] = kv
        if len(self._cache) > self.capacity:
            self._cache.popitem(last=False)
        return kv
