"""Streaming ASR session state machine (reference: moshi-core/src/asr.rs).

One 80 ms frame = one device step, batched over every live stream:

  pcm (B, 1, 1920) -> Mimi encode -> audio-delay shift -> LM step
                   -> semantic-VAD probs + text token sample
                   -> per-slot counters advance

Everything numeric lives on device in a single jitted ``step``; only the
word-boundary bookkeeping (accumulating sentencepiece ids into words,
emitting Word/EndWord messages with 12.5 Hz timestamps) stays on the host,
exactly the split the reference uses (asr.rs:208-252 does its token loop on
CPU after the forward).

Per-slot lifecycle (continuous batching) is mask/reset arithmetic:
``mask (B,)`` = slot has a frame this step, ``reset (B,)`` = slot was
re-assigned to a new stream before this step.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import lm as LM
from ..models import mimi as MIMI
from ..ops import sampling as S


@dataclasses.dataclass(frozen=True)
class AsrConfig:
    lm: LM.LmConfig
    mimi: MIMI.MimiConfig
    asr_delay_in_tokens: int = 6
    temperature: float = 0.0
    # Token conventions (asr.rs:228-252): 0 = word separator, 3 = pad.
    text_sep_token: int = 0
    text_pad_token: int = 3
    frame_rate: float = 12.5
    # Codec compute dtype: the reference keeps Mimi in f32 even under bf16
    # LMs (mimi.rs load), but bf16 is the MXU-native type; RVQ distances
    # stay f32 either way (ops/rvq.py upcasts).
    mimi_dtype: str = "float32"
    # int8 KV rings with per-row scales: halves attention HBM traffic,
    # the serving hot path's dominant cost.
    kv_quant: bool = False
    kv_bits: int = 8


def init_state(cfg: AsrConfig, batch: int, cache_dtype=jnp.bfloat16) -> dict:
    mimi_dt = jnp.dtype(cfg.mimi_dtype)
    return {
        "mimi_enc": MIMI.init_encode_state(cfg.mimi, batch, mimi_dt),
        "lm": LM.init_state(cfg.lm, batch, cache_dtype, kv_quant=cfg.kv_quant,
                            kv_bits=cfg.kv_bits),
        # Audio tokens from the previous frame (the 1-frame audio delay the
        # LM was trained with; asr.rs next_codebooks :168-190).
        "next_codebooks": jnp.full(
            (batch, cfg.lm.audio_codebooks), cfg.lm.audio_pad_token, jnp.int32
        ),
        "text_token": jnp.full((batch,), cfg.lm.text_start_token, jnp.int32),
        "step_idx": jnp.zeros((batch,), jnp.int32),
    }


def step(
    cfg: AsrConfig,
    params: dict,
    state: dict,
    pcm: jax.Array,
    mask: jax.Array,
    reset: jax.Array,
    rng: jax.Array,
    condition: Optional[jax.Array] = None,
    seeds: Optional[jax.Array] = None,
):
    """One batched ASR frame step; fully jittable.

    Returns ``(out, state')`` with ``out = {text_token (B,), prs (B, n_vad),
    step_idx (B,)}`` — step_idx is the post-increment per-slot step counter.

    ``seeds`` (per-slot uint32) switches text sampling to per-request PRNG
    streams keyed by (seed, step) — deterministic replay independent of the
    batch composition (the seeding contract shared with TTS; with the
    default ``temperature=0`` greedy decode, seeds are a no-op exactly like
    the reference's LogitsProcessor at temp 0, asr.rs:208-216).
    """
    state = reset_slots(cfg, state, reset)

    audio_tokens, mimi_state = MIMI.encode_step(
        cfg.mimi, params["mimi"], state["mimi_enc"],
        pcm.astype(jnp.dtype(cfg.mimi_dtype)), mask,
    )
    audio_tokens = audio_tokens[..., 0].astype(jnp.int32)  # (B, K)

    is_first = state["step_idx"] == 0
    pad = jnp.int32(cfg.lm.audio_pad_token)
    lm_audio_in = jnp.where(is_first[:, None], pad, state["next_codebooks"])
    next_codebooks = jnp.where(mask[:, None], audio_tokens, state["next_codebooks"])

    text_in = jnp.where(
        is_first, jnp.int32(cfg.lm.text_start_token), state["text_token"]
    )

    text_logits, hidden, lm_state = LM.step(
        cfg.lm, params["lm"], state["lm"], text_in, lm_audio_in, mask, condition
    )

    if cfg.lm.extra_heads is not None:
        prs = LM.extra_heads_probs(cfg.lm, params["lm"], hidden)
    else:
        prs = jnp.zeros((pcm.shape[0], 0), jnp.float32)

    samp = S.SamplingConfig(temperature=cfg.temperature)
    if seeds is not None and cfg.temperature > 0:
        keys = S.fold_keys(S.slot_keys(seeds, state["step_idx"]), 1)
        text_token = S.sample_per_slot(
            text_logits.astype(jnp.float32), keys,
            jnp.full((pcm.shape[0],), cfg.temperature, jnp.float32),
        )
    else:
        text_token = S.sample(samp, text_logits.astype(jnp.float32), rng)

    new_text = jnp.where(mask, text_token, state["text_token"])
    new_step = state["step_idx"] + jnp.where(mask, 1, 0)

    out = {
        "text_token": new_text,
        "prs": prs,
        "step_idx": new_step,
        # This frame's Mimi codes — exposed for session token logging
        # (the reference dumps text+audio tokens per session for replay;
        # batched_asr.rs Logger :133-214).
        "codes": audio_tokens,
    }
    new_state = {
        "mimi_enc": mimi_state,
        "lm": lm_state,
        "next_codebooks": next_codebooks,
        "text_token": new_text,
        "step_idx": new_step,
    }
    return out, new_state


def reset_slots(cfg: AsrConfig, state: dict, reset: jax.Array) -> dict:
    """Per-slot reset for slot reuse (asr.rs:257-266), KV buffers untouched."""
    return {
        "mimi_enc": MIMI.reset_encode_state(state["mimi_enc"], reset),
        "lm": LM.reset_state(state["lm"], reset),
        "next_codebooks": jnp.where(
            reset[:, None],
            jnp.int32(cfg.lm.audio_pad_token),
            state["next_codebooks"],
        ),
        "text_token": jnp.where(
            reset, jnp.int32(cfg.lm.text_start_token), state["text_token"]
        ),
        "step_idx": jnp.where(reset, 0, state["step_idx"]),
    }


# ---------------------------------------------------------------------------
# Host-side word assembly (asr.rs ItemState + step_tokens tail :208-252)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class WordEvent:
    tokens: List[int]
    start_time: float
    batch_idx: int


@dataclasses.dataclass
class EndWordEvent:
    stop_time: float
    batch_idx: int


@dataclasses.dataclass
class StepEvent:
    step_idx: int
    prs: List[List[float]]


class WordState:
    """Per-slot word accumulation with 12.5 Hz timestamps."""

    def __init__(self, cfg: AsrConfig, batch: int):
        self.cfg = cfg
        self.batch = batch
        self.word_tokens: List[List[int]] = [[] for _ in range(batch)]
        self.unended_word = [False] * batch
        self.last_stop_time = [0.0] * batch

    def reset_slot(self, idx: int) -> None:
        self.word_tokens[idx] = []
        self.unended_word[idx] = False
        self.last_stop_time[idx] = 0.0

    def process(
        self,
        text_tokens,  # (B,) np array post-step
        step_idx,  # (B,) np array post-step
        mask,  # (B,) active slots
    ) -> List[object]:
        cfg = self.cfg
        events: List[object] = []
        for b in range(self.batch):
            if not mask[b]:
                continue
            tok = int(text_tokens[b])
            steps = int(step_idx[b])
            if steps < cfg.asr_delay_in_tokens:
                continue
            if tok in (cfg.text_pad_token, cfg.text_sep_token):
                if self.word_tokens[b]:
                    events.append(
                        WordEvent(self.word_tokens[b], self.last_stop_time[b], b)
                    )
                    self.word_tokens[b] = []
                    self.unended_word[b] = True
            else:
                self.word_tokens[b].append(tok)
            if tok == cfg.text_sep_token:
                stop_time = (steps - cfg.asr_delay_in_tokens) / cfg.frame_rate
                if self.unended_word[b]:
                    self.unended_word[b] = False
                    events.append(EndWordEvent(stop_time, b))
                self.last_stop_time[b] = stop_time
        return events
