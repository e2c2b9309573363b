"""Streaming TTS session state machine.

Reference: moshi-core/src/tts_streaming.rs.  Per 80 ms frame:

  * build the delayed audio-token inputs (semantic codebook delay 0,
    acoustic codebooks delay ``acoustic_delay``; during the initial
    ``text_audio_delay_in_tokens`` window the non-pad tokens are *absent*,
    i.e. contribute no embedding — tts_streaming.rs:126-149),
  * run the LM (voice conditioning through cross-attention, optional
    classifier-free guidance as a doubled batch),
  * pick the text token under the host's constraint (the model never
    free-runs text in TTS: words are teacher-forced, the model only chooses
    pad vs end-of-word — tts_streaming.rs:179-199),
  * sample the audio codebooks with the DepFormer and write them at their
    delayed buffer positions.

TPU-native design: the whole step — including the delayed-buffer reads and
writes, which the reference does with host Vec<Vec<u32>> bookkeeping — is
one jitted program over static buffers with **per-slot step counters**, so
independent sessions run continuously batched in lock-step (the reference
serialises TTS behind a batch=1 mutex; tts.rs:31,374).  The host only
decides which word-feed constraint applies per slot and reads back
completed audio frames.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import lm as LM
from ..models import mimi as MIMI
from ..ops import sampling as S

UNGENERATED = -1  # buffer slots not yet written (reference uses u32::MAX)

# Constraint modes for the text token (AllowedTokens; tts_streaming.rs:61-66).
ALLOW_TEXT = 0  # force a given token id (the next word-piece)
ALLOW_PAD = 1  # force pad
ALLOW_PAD_OR_EPAD = 2  # model chooses pad, anything else becomes eop


@dataclasses.dataclass(frozen=True)
class TtsConfig:
    """Generation constants (tts_streaming.rs:12-45, Config::v202501)."""

    lm: LM.LmConfig
    acoustic_delay: int = 2
    text_pad_token: int = 3
    text_bos_token: int = 1
    text_eos_token: int = 2
    text_eop_token: int = 0
    text_start_token: int = 8000
    text_audio_delay_in_tokens: int = 25  # 2 s at 12.5 Hz
    max_consecutive_pads: int = 10
    extra_steps: int = 5
    max_steps: int = 4096
    speaker_cond_duration_s: float = 10.0
    speaker_cond_dim: int = 2048
    speaker_cond_n_speakers: int = 5
    temperature: float = 0.8
    top_k: int = 250
    text_temperature: float = 0.6
    text_top_k: int = 25
    cfg_alpha: Optional[float] = None
    kv_quant: bool = False

    @property
    def n_codebooks(self) -> int:
        return self.lm.generated_codebooks


def init_state(cfg: TtsConfig, batch: int, cache_dtype=jnp.bfloat16) -> dict:
    k = cfg.n_codebooks
    cap = cfg.max_steps + cfg.acoustic_delay
    return {
        "lm": LM.init_state(cfg.lm, batch, cache_dtype, kv_quant=cfg.kv_quant),
        # Generated audio tokens per step (B, cap, K); UNGENERATED until the
        # delayed write lands (tts_streaming.rs audio_tokens buffer).
        "audio_tokens": jnp.full((batch, cap, k), UNGENERATED, jnp.int32),
        "text_tokens": jnp.full((batch, cap), UNGENERATED, jnp.int32),
        "consecutive_pads": jnp.zeros((batch,), jnp.int32),
        "prev_text": jnp.full((batch,), cfg.text_start_token, jnp.int32),
        "step_idx": jnp.zeros((batch,), jnp.int32),
    }


def reset_slots(cfg: TtsConfig, state: dict, reset: jax.Array) -> dict:
    """Per-slot reset for continuous TTS batching (slot reuse)."""
    r = reset[:, None]
    return {
        "lm": LM.reset_state(state["lm"], reset),
        "audio_tokens": jnp.where(
            reset[:, None, None], UNGENERATED, state["audio_tokens"]
        ),
        "text_tokens": jnp.where(r, UNGENERATED, state["text_tokens"]),
        "consecutive_pads": jnp.where(reset, 0, state["consecutive_pads"]),
        "prev_text": jnp.where(
            reset, jnp.int32(cfg.text_start_token), state["prev_text"]
        ),
        "step_idx": jnp.where(reset, 0, state["step_idx"]),
    }


def _delayed_input_tokens(cfg: TtsConfig, state: dict) -> jax.Array:
    """Audio-token inputs for this step, (B, K) with -1 = absent.

    Implements tts_streaming.rs:126-149 as pure arithmetic over *per-slot*
    step indices: pad during the per-codebook delay, absent ("literal
    zeros") during the text-audio window, otherwise the delayed buffer read.
    """
    s = state["step_idx"][:, None]  # (B, 1)
    buf = state["audio_tokens"]
    b, _, k = buf.shape
    pad = jnp.int32(cfg.lm.audio_pad_token)

    delays = jnp.where(jnp.arange(k) == 0, 0, cfg.acoustic_delay)[None, :]  # (1,K)
    read_pos = jnp.maximum(s - 1 - delays, 0)  # (B, K)
    read = jnp.take_along_axis(buf, read_pos[:, :, None].transpose(0, 2, 1), axis=1)[
        :, 0, :
    ]  # buf[b, s_b-1-delay_k, k]

    in_delay = s <= delays
    in_zero = (~in_delay) & (s <= cfg.text_audio_delay_in_tokens + delays)
    tok = jnp.where(in_delay, pad, read)
    tok = jnp.where(in_zero, UNGENERATED, tok)
    return tok


def step(
    cfg: TtsConfig,
    params: dict,
    state: dict,
    allowed_mode: jax.Array,  # (B,) in {ALLOW_TEXT, ALLOW_PAD, ALLOW_PAD_OR_EPAD}
    allowed_token: jax.Array,  # (B,) token id when mode == ALLOW_TEXT
    rng: jax.Array,
    ca_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
    condition: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    reset: Optional[jax.Array] = None,
    temps: Optional[dict] = None,
    seeds: Optional[jax.Array] = None,
    cfg_alpha=None,
):
    """One TTS frame step, continuously batched.

    Returns ``(out, state')`` where out carries the chosen text token and
    the completed (delay-resolved) audio frame, with ``frame_valid`` false
    while the acoustic delay hasn't elapsed.  ``mask`` freezes inactive
    slots; ``reset`` re-initialises reused slots before stepping.

    With classifier-free guidance (static ``cfg.cfg_alpha`` or the traced
    per-slot ``cfg_alpha`` argument), the batch is layout [cond rows...,
    uncond rows...]; the uncond half runs without the voice ca_kv and both
    halves receive identical tokens (tts_streaming.rs:161-173).  ``seeds``
    (per-slot uint32) switches sampling to per-request PRNG streams keyed by
    (seed, step, draw) — deterministic replay independent of the batch.
    """
    lm_cfg = cfg.lm
    b = allowed_mode.shape[0]
    if mask is None:
        mask = jnp.ones((b,), bool)
    if reset is not None:
        state = reset_slots(cfg, state, reset)
    s = state["step_idx"]  # (B,)

    audio_in = _delayed_input_tokens(cfg, state)
    text_in = state["prev_text"]

    text_logits, hidden, lm_state = LM.step(
        lm_cfg, params["lm"], state["lm"], text_in, audio_in,
        mask=mask, ca_kv=ca_kv, condition=condition,
    )

    alpha = cfg_alpha if cfg_alpha is not None else cfg.cfg_alpha
    n_draw = b // 2 if alpha is not None else b

    rng, k_text, k_dep = jax.random.split(rng, 3)
    key_rows = dep_keys = None
    if seeds is not None:
        key_rows = S.slot_keys(seeds[:n_draw], s[:n_draw])
        dep_keys = S.fold_keys(key_rows, 2)

    if alpha is not None:
        a = jnp.asarray(alpha, jnp.float32)
        if a.ndim == 1:
            a = a[:, None]
        lc = text_logits[:n_draw].astype(jnp.float32)
        lu = text_logits[n_draw:].astype(jnp.float32)
        mixed = a * lc - (a - 1.0) * lu
        text_logits_eff = jnp.concatenate([mixed, mixed], axis=0)
    else:
        text_logits_eff = text_logits.astype(jnp.float32)

    if seeds is not None:
        t = (
            temps["text"][:n_draw]
            if temps is not None
            else jnp.full((n_draw,), cfg.text_temperature, jnp.float32)
        )
        sampled = S.sample_per_slot(
            text_logits_eff[:n_draw], S.fold_keys(key_rows, 1), t,
            cfg.text_top_k,
        )
        sampled = jnp.concatenate([sampled] * (b // n_draw), axis=0)
    elif temps is not None:
        # Per-slot traced temperatures (reference TtsQuery temp/seed params)
        # — no recompilation across requests.  With CFG, sample the cond
        # half only and mirror onto the uncond twins: per-row noise over
        # the duplicated mixed logits would draw different pad/eop tokens
        # for twin rows and desync the halves' histories.
        sampled = S.sample_dynamic(
            text_logits_eff[:n_draw], k_text,
            jnp.broadcast_to(temps["text"], (b,))[:n_draw], cfg.text_top_k,
        )
        sampled = jnp.concatenate([sampled] * (b // n_draw), axis=0)
    else:
        sampled = S.sample(
            S.SamplingConfig(cfg.text_temperature, cfg.text_top_k),
            text_logits_eff[:n_draw], k_text,
        )
        sampled = jnp.concatenate([sampled] * (b // n_draw), axis=0)
    # PadOrEpad: model output collapses to {pad, eop}; too many pads force
    # eop (tts_streaming.rs:179-199).
    pad_or_epad = jnp.where(
        state["consecutive_pads"] > cfg.max_consecutive_pads,
        jnp.int32(cfg.text_eop_token),
        jnp.where(
            sampled == cfg.text_pad_token,
            jnp.int32(cfg.text_pad_token),
            jnp.int32(cfg.text_eop_token),
        ),
    )
    text_token = jnp.where(
        allowed_mode == ALLOW_TEXT,
        allowed_token,
        jnp.where(
            allowed_mode == ALLOW_PAD, jnp.int32(cfg.text_pad_token), pad_or_epad
        ),
    )
    consecutive_pads = jnp.where(
        text_token == cfg.text_pad_token, state["consecutive_pads"] + 1, 0
    )

    # DepFormer runs for the whole batch; slots still inside the text-audio
    # delay window get pads instead (tts_streaming.rs:201-219).  Forced pads
    # during the acoustic delay are per slot.
    k_arr = jnp.arange(cfg.n_codebooks)
    forced = jnp.where(
        (s[:, None] < cfg.acoustic_delay) & (k_arr[None, :] > 0),
        jnp.int32(lm_cfg.audio_pad_token),
        -1,
    )  # (B, K)
    dep_tokens = LM.depformer_sample(
        lm_cfg, params["lm"], hidden, text_token, forced, k_dep,
        S.SamplingConfig(cfg.temperature, cfg.top_k),
        cfg_alpha=alpha,
        temperature=None if temps is None else temps["audio"],
        slot_keys=dep_keys,
    )
    audio_tokens = jnp.where(
        (s < cfg.text_audio_delay_in_tokens)[:, None],
        jnp.int32(lm_cfg.audio_pad_token),
        dep_tokens,
    )

    # Write tokens at their delayed positions: codebook 0 at step s, others
    # at s - acoustic_delay (only if still UNGENERATED;
    # tts_streaming.rs:220-236).  Frozen slots write nothing.
    buf = state["audio_tokens"]
    delays = jnp.where(k_arr == 0, 0, cfg.acoustic_delay)[None, :]
    write_pos = jnp.maximum(s[:, None] - delays, 0)  # (B, K)
    cur = jnp.take_along_axis(buf, write_pos[:, :, None].transpose(0, 2, 1), axis=1)[
        :, 0, :
    ]
    newval = jnp.where(cur == UNGENERATED, audio_tokens, cur)
    newval = jnp.where(mask[:, None], newval, cur)
    b_idx = jnp.arange(b)[:, None]
    k_idx = k_arr[None, :]
    buf = buf.at[b_idx, write_pos, k_idx].set(newval)

    text_written = jnp.where(mask, text_token, state["prev_text"])
    text_buf = state["text_tokens"].at[jnp.arange(b), s].set(
        jnp.where(
            mask, text_token, state["text_tokens"][jnp.arange(b), s]
        )
    )

    # Completed frame at s - acoustic_delay (post-increment convention:
    # valid once step_idx+1 > acoustic_delay; tts_streaming.rs:275-287).
    frame_pos = jnp.maximum(s - cfg.acoustic_delay, 0)  # (B,)
    frame = jnp.take_along_axis(buf, frame_pos[:, None, None], axis=1)[:, 0, :]
    frame_complete = jnp.logical_and(
        s >= cfg.acoustic_delay, jnp.all(frame != UNGENERATED, axis=1)
    )
    frame_audio_valid = (
        frame_complete
        & jnp.all(frame < lm_cfg.audio_pad_token, axis=1)
        & mask
    )

    new_step = s + jnp.where(mask, 1, 0)
    out = {
        "text_token": text_written,
        "frame": frame,
        "frame_valid": frame_audio_valid,
        "step_idx": new_step,
    }
    new_state = {
        "lm": lm_state,
        "audio_tokens": buf,
        "text_tokens": text_buf,
        "consecutive_pads": jnp.where(mask, consecutive_pads, state["consecutive_pads"]),
        "prev_text": text_written,
        "step_idx": new_step,
    }
    return out, new_state


def overwrite_last_text_token(state: dict, token: int, slots=None) -> dict:
    """Host-side fixup used when the word queue catches up
    (tts_streaming.rs:244-253).  ``slots`` is a (B,) bool mask of sessions
    to patch (default: all)."""
    b = state["prev_text"].shape[0]
    sel = jnp.ones((b,), bool) if slots is None else jnp.asarray(slots)
    s_prev = jnp.maximum(state["step_idx"] - 1, 0)
    cur = state["text_tokens"][jnp.arange(b), s_prev]
    text_buf = state["text_tokens"].at[jnp.arange(b), s_prev].set(
        jnp.where(sel, jnp.int32(token), cur)
    )
    out = dict(state)
    out["text_tokens"] = text_buf
    out["prev_text"] = jnp.where(sel, jnp.int32(token), state["prev_text"])
    return out


# ---------------------------------------------------------------------------
# Prompt tokenization (tts_streaming.rs:308-332)
# ---------------------------------------------------------------------------


def tokenize_prompt(turns, bos: int, eos: int, encode) -> list:
    """Multi-speaker turn tokenization: returns [(word_tokens, is_main)].

    Even turns are the main speaker (bos inserted before their first word),
    odd turns the other speaker.
    """
    prompt = []
    for turn_idx, turn in enumerate(turns):
        main = turn_idx % 2 == 0
        token = bos if main else eos
        for word_idx, word in enumerate(turn.split(" ")):
            ids = list(encode(word))
            if word_idx == 0 and main:
                ids.insert(0, token)
            if ids:
                prompt.append((ids, main))
    return prompt
