"""Generic single-stream delayed generation.

Reference: moshi-core/src/lm_generate.rs — the general-purpose generator:
arbitrary per-codebook ``audio_delays``, teacher forcing of text/audio
tokens, and "literal zero" (absent) inputs.  Superseded in production by
the specialised ASR/TTS/duplex sessions but kept for parity and for offline
experimentation with new delay patterns.

Forced tokens use sentinels: ``>= 0`` teacher-force that id, ``FREE`` (-1)
sample, ``ZERO`` (-2) force an absent (no-embedding) input at that position.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models import lm as LM
from ..ops import sampling as S

FREE = -1
ZERO = -2
UNGENERATED = -1


@dataclasses.dataclass(frozen=True)
class GenConfig:
    lm: LM.LmConfig
    audio_delays: Tuple[int, ...]  # per generated codebook
    text_pad_token: int = 3
    text_eop_token: int = 0
    text_start_token: int = 32000
    max_steps: int = 4096
    audio_temperature: float = 0.8
    audio_top_k: int = 250
    text_temperature: float = 0.7
    text_top_k: int = 25

    @property
    def max_delay(self) -> int:
        return max(self.audio_delays) if self.audio_delays else 0


def init_state(cfg: GenConfig, cache_dtype=jnp.bfloat16) -> dict:
    k = len(cfg.audio_delays)
    cap = cfg.max_steps + cfg.max_delay
    return {
        "lm": LM.init_state(cfg.lm, 1, cache_dtype),
        "audio_tokens": jnp.full((1, cap, k), UNGENERATED, jnp.int32),
        "text_tokens": jnp.full((1, cap), UNGENERATED, jnp.int32),
        "prev_text": jnp.full((1,), cfg.text_start_token, jnp.int32),
        "step_idx": jnp.zeros((), jnp.int32),
    }


def step(
    cfg: GenConfig,
    params: dict,
    state: dict,
    rng: jax.Array,
    forced_text: jax.Array,  # scalar: >=0 force, FREE sample, ZERO absent
    forced_audio: jax.Array,  # (K,): same semantics per codebook
):
    """One generation step with arbitrary per-codebook delays
    (lm_generate.rs State::step semantics)."""
    s = state["step_idx"]
    lm_cfg = cfg.lm
    buf = state["audio_tokens"]
    k = len(cfg.audio_delays)
    delays = jnp.asarray(cfg.audio_delays, jnp.int32)
    pad = jnp.int32(lm_cfg.audio_pad_token)

    # Inputs: delayed reads; pad during each codebook's delay window.
    read_pos = jnp.maximum(s - 1 - delays, 0)
    read = jnp.take_along_axis(
        buf, jnp.broadcast_to(read_pos[None, :, None], (1, k, 1)).transpose(0, 2, 1),
        axis=1,
    )[:, 0, :]
    audio_in = jnp.where((s <= delays)[None, :], pad, read)
    audio_in = jnp.where(forced_audio[None, :] == ZERO, UNGENERATED, audio_in)
    # Codebooks beyond the configured streams are absent inputs.
    if k < lm_cfg.audio_codebooks:
        fill = jnp.full((1, lm_cfg.audio_codebooks - k), UNGENERATED, jnp.int32)
        audio_in = jnp.concatenate([audio_in, fill], axis=1)

    text_in = jnp.where(
        forced_text == ZERO, jnp.int32(-1), state["prev_text"][0]
    )[None]

    text_logits, hidden, lm_state = LM.step(
        lm_cfg, params["lm"], state["lm"], text_in, audio_in
    )
    rng, k_text, k_dep = jax.random.split(rng, 3)
    sampled = S.sample(
        S.SamplingConfig(cfg.text_temperature, cfg.text_top_k),
        text_logits.astype(jnp.float32), k_text,
    )
    text_token = jnp.where(forced_text >= 0, forced_text, sampled[0])[None]

    forced_next = jnp.where(
        jnp.logical_and(s < cfg.max_delay, jnp.arange(k) > 0), pad, -1
    )
    audio_tokens = LM.depformer_sample(
        lm_cfg, params["lm"], hidden, text_token, forced_next, k_dep,
        S.SamplingConfig(cfg.audio_temperature, cfg.audio_top_k),
    )
    audio_tokens = jnp.where(
        forced_audio[None, :] >= 0, forced_audio[None, :], audio_tokens
    )

    write_pos = jnp.maximum(s - delays, 0)
    b_idx = jnp.zeros((1, 1), jnp.int32)
    k_idx = jnp.arange(k)[None, :]
    buf = buf.at[b_idx, write_pos[None, :], k_idx].set(audio_tokens)

    text_buf = jax.lax.dynamic_update_slice_in_dim(
        state["text_tokens"], text_token[:, None], s, axis=1
    )

    frame_pos = jnp.maximum(s - cfg.max_delay, 0)
    frame = jax.lax.dynamic_slice_in_dim(buf, frame_pos, 1, axis=1)[:, 0, :]
    frame_valid = jnp.logical_and(
        s >= cfg.max_delay,
        jnp.all((frame >= 0) & (frame < lm_cfg.audio_vocab_size - 1), axis=1),
    )

    out = {"text_token": text_token, "frame": frame, "frame_valid": frame_valid}
    new_state = {
        "lm": lm_state,
        "audio_tokens": buf,
        "text_tokens": text_buf,
        "prev_text": text_token,
        "step_idx": s + 1,
    }
    return out, new_state


def generate(
    cfg: GenConfig,
    params: dict,
    n_steps: int,
    seed: int = 0,
    forced_text: Optional[Sequence[int]] = None,
    chunk: int = 64,
):
    """Offline generation loop (moshi-cli gen.rs equivalent): returns
    (text_tokens (T,), audio frames (T', K)).

    Generation is fully device-autoregressive, so ``chunk`` steps run per
    dispatch inside one lax.scan with a single packed fetch (the per-step
    loop paid a dispatch + fetch per 80 ms frame — a full round-trip each
    over a remote tunnel).  The per-step PRNG subkeys are precomputed
    host-side with the exact split sequence of the unfused loop, so
    outputs are bit-identical for any ``chunk``."""
    import numpy as np

    state = init_state(cfg)
    rng = jax.random.PRNGKey(seed)
    k = len(cfg.audio_delays)
    free_audio = jnp.full((k,), FREE, jnp.int32)

    subs = []
    for _ in range(n_steps):
        rng, sub = jax.random.split(rng)
        subs.append(sub)
    fts = np.full(n_steps, FREE, np.int32)
    if forced_text is not None:
        n_f = min(len(forced_text), n_steps)
        fts[:n_f] = np.asarray(forced_text[:n_f], np.int32)

    def run(p, s, keys, ft_arr):
        def body(st, x):
            key, ft = x
            out, st = step(cfg, p, st, key, ft, free_audio)
            return st, (
                out["text_token"][0],
                out["frame_valid"][0],
                out["frame"][0],
            )

        return jax.lax.scan(body, s, (keys, ft_arr))

    run_j = jax.jit(run)  # shape-specialised: full chunks share one compile

    texts: list = []
    frames: list = []
    i = 0
    while i < n_steps:
        n = min(chunk, n_steps - i)
        keys = jnp.stack(subs[i : i + n])
        state, (t_k, v_k, f_k) = run_j(
            params, state, keys, jnp.asarray(fts[i : i + n])
        )
        t_k = np.asarray(t_k)
        v_k = np.asarray(v_k)
        f_k = np.asarray(f_k)
        for j in range(n):
            texts.append(int(t_k[j]))
            if v_k[j]:
                frames.append(f_k[j])
        i += n
    return texts, (np.stack(frames) if frames else np.zeros((0, k), np.int32))
