"""Full-duplex Moshi dialogue session (user audio in, model audio+text out).

Reference: moshi-core/src/lm_generate_multistream.rs.  Per 80 ms frame the
LM consumes the *generated* codebook group (model's own voice, with the
1-frame semantic / acoustic-delay pattern) plus the *input* codebook group
(user audio tokens from Mimi), samples a text token (with optional pad-mult
bias and repetition penalty on the text logits) and the generated audio
codebooks via the DepFormer.

TPU-native: the delayed buffers live on device and the step jits once; the
repetition penalty is a vectorised scatter over the recent text-token window
instead of the reference's host HashSet loop (:142-190).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import lm as LM
from ..ops import sampling as S

UNGENERATED = -1


@dataclasses.dataclass(frozen=True)
class DuplexConfig:
    """lm_generate_multistream.rs Config (:13-67)."""

    lm: LM.LmConfig
    generated_audio_codebooks: int = 8
    input_audio_codebooks: int = 8
    acoustic_delay: int = 2
    text_pad_token: int = 3
    text_eop_token: int = 0
    text_start_token: int = 32000
    max_steps: int = 4096
    audio_temperature: float = 0.8
    audio_top_k: int = 250
    text_temperature: float = 0.7
    text_top_k: int = 25
    pad_mult: Optional[float] = None
    repetition_penalty: Optional[Tuple[int, float]] = None  # (context, penalty)

    @property
    def total_codebooks(self) -> int:
        return self.generated_audio_codebooks + self.input_audio_codebooks


def init_state(cfg: DuplexConfig, batch: int = 1, cache_dtype=jnp.bfloat16,
               kv_quant: bool = False, kv_bits: int = 8) -> dict:
    cap = cfg.max_steps + cfg.acoustic_delay
    return {
        "lm": LM.init_state(cfg.lm, batch, cache_dtype, kv_quant=kv_quant,
                            kv_bits=kv_bits),
        "audio_tokens": jnp.full((batch, cap, cfg.total_codebooks), UNGENERATED, jnp.int32),
        "text_tokens": jnp.full((batch, cap), UNGENERATED, jnp.int32),
        "prev_text": jnp.full((batch,), cfg.text_start_token, jnp.int32),
        # Per-slot step counters: continuous batching admits sessions at
        # different times (cf. sessions/tts.py; the reference is batch-1
        # so lm_generate_multistream.rs keeps one host usize).
        "step_idx": jnp.zeros((batch,), jnp.int32),
    }


def reset_slots(cfg: DuplexConfig, state: dict, reset: jax.Array) -> dict:
    """Zero the given slots' dialogue state (per-slot reset, the
    kv_cache.rs:111-117 pattern): ring-KV bitmap clear + buffer wipe."""
    r1 = reset[:, None]
    return {
        "lm": LM.reset_state(state["lm"], reset),
        "audio_tokens": jnp.where(
            r1[:, :, None], jnp.int32(UNGENERATED), state["audio_tokens"]
        ),
        "text_tokens": jnp.where(r1, jnp.int32(UNGENERATED), state["text_tokens"]),
        "prev_text": jnp.where(
            reset, jnp.int32(cfg.text_start_token), state["prev_text"]
        ),
        "step_idx": jnp.where(reset, 0, state["step_idx"]),
    }


def _rep_penalty(cfg: DuplexConfig, logits: jax.Array, text_buf: jax.Array, s) -> jax.Array:
    """Repetition penalty over the last `context` non-pad text tokens
    (lm_generate_multistream.rs:142-190), vectorised: build a penalty mask
    via scatter of the recent window then scale pos/neg logits."""
    if cfg.repetition_penalty is None:
        return logits
    context, penalty = cfg.repetition_penalty
    if penalty == 1.0:
        return logits
    b, v = logits.shape
    cap = text_buf.shape[1]
    window = 4 * context  # enough to find `context` non-pad tokens
    idx = jnp.arange(window)
    s = jnp.atleast_1d(jnp.asarray(s))  # scalar (legacy) or per-slot (B,)
    pos = s[:, None] - 1 - idx[None, :]  # (B, window), most recent first
    valid = pos >= 0
    toks = jnp.take_along_axis(text_buf, jnp.maximum(pos, 0), axis=1)
    special = (
        (toks == cfg.text_pad_token)
        | (toks == cfg.text_eop_token)
        | (toks == cfg.text_start_token)
        | (toks == UNGENERATED)
    )
    eligible = valid & ~special
    # Rank of each eligible position; keep only the first `context`.
    rank = jnp.cumsum(eligible.astype(jnp.int32), axis=1)
    keep = eligible & (rank <= context)
    safe = jnp.where(keep, toks, 0)
    seen = jnp.zeros((b, v), bool)
    seen = seen.at[jnp.arange(b)[:, None], safe].max(keep)
    scale = jnp.where(logits >= 0, 1.0 / penalty, penalty)
    return jnp.where(seen, logits * scale, logits)


def step(
    cfg: DuplexConfig,
    params: dict,
    state: dict,
    input_audio_tokens: jax.Array,  # (B, input_codebooks) from Mimi encode
    rng: jax.Array,
    force_text_token: Optional[jax.Array] = None,  # (B,) or None
    ca_kv=None,
    condition=None,
    cfg_alpha: Optional[float] = None,
    asr_delay: Optional[jax.Array] = None,  # traced scalar; 0 = disabled
    mask: Optional[jax.Array] = None,  # (B,) active slots
    reset: Optional[jax.Array] = None,  # (B,) reset-before-step
):
    """One duplex frame step -> (out, state').

    out: text_token (B,), frame (B, gen_codebooks) with validity flag for
    the model's speech output (last_audio_tokens semantics :343-355).

    ``asr_delay`` enables the ASR-only delay mode of the duplex runner
    (stream_both.rs:329-383 run_with_state_asr): for steps 0 < s < delay
    the text *input* is absent (reference passes ``None``; here the -1
    sentinel masks the embedding) while sampling proceeds normally.  It is
    traced, so delay-mode and full-duplex share one compiled program.

    ``mask``/``reset`` support continuous batching (duplex_batched.py):
    inactive slots neither write buffers nor advance their counter, reset
    slots restart from step 0 — data, not control flow, so the batched and
    single-session paths share one compiled program.
    """
    if reset is not None:
        state = reset_slots(cfg, state, reset)
    s = state["step_idx"]  # (B,) per-slot counters
    lm_cfg = cfg.lm
    gen = cfg.generated_audio_codebooks
    buf0 = buf = state["audio_tokens"]
    b = buf.shape[0]
    b_col = jnp.arange(b)[:, None]

    # Record the user's audio tokens for this step (input group).
    if cfg.input_audio_codebooks:
        in_cols = gen + jnp.arange(cfg.input_audio_codebooks)
        buf = buf.at[b_col, s[:, None], in_cols[None, :]].set(input_audio_tokens)

    # Build model inputs with the delay pattern (:208-229): semantic
    # codebooks (first of each group) have delay 0/1-frame; acoustic have
    # acoustic_delay.
    k = cfg.total_codebooks
    k_arr = jnp.arange(k)
    is_semantic = (k_arr == 0) | (k_arr == gen)
    delays = jnp.where(is_semantic, 1, cfg.acoustic_delay + 1)
    read_pos = jnp.maximum(s[:, None] - delays[None, :], 0)  # (B, K)
    read = jnp.take_along_axis(buf, read_pos[:, None, :], axis=1)[:, 0, :]
    pad = jnp.int32(lm_cfg.audio_pad_token)
    first = jnp.where(
        is_semantic[None, :], s[:, None] == 0, s[:, None] <= cfg.acoustic_delay
    )
    audio_in = jnp.where(first, pad, read)

    text_in = state["prev_text"]
    if asr_delay is not None:
        d = jnp.asarray(asr_delay, jnp.int32)
        hide = jnp.logical_and(s > 0, s < d)
        text_in = jnp.where(hide, jnp.int32(-1), text_in)
    text_logits, hidden, lm_state = LM.step(
        lm_cfg, params["lm"], state["lm"], text_in, audio_in,
        mask=mask, ca_kv=ca_kv, condition=condition,
    )
    logits = text_logits.astype(jnp.float32)
    if cfg_alpha is not None:
        half = b // 2
        logits = cfg_alpha * logits[:half] - (cfg_alpha - 1.0) * logits[half:]
        logits = jnp.concatenate([logits, logits], axis=0)
    logits = _rep_penalty(cfg, logits, state["text_tokens"], s)
    if cfg.pad_mult is not None:
        # Bias towards/away from text pad (:263-267 applies exp(pad_mult)
        # on probabilities == adding pad_mult to the pad logit).
        logits = logits.at[:, cfg.text_pad_token].add(cfg.pad_mult)

    rng, k_text, k_dep = jax.random.split(rng, 3)
    sampled = S.sample(
        S.SamplingConfig(cfg.text_temperature, cfg.text_top_k), logits, k_text
    )
    if force_text_token is not None:
        text_token = jnp.where(force_text_token >= 0, force_text_token, sampled)
    else:
        text_token = sampled

    forced = jnp.where(
        jnp.logical_and(s[:, None] < cfg.acoustic_delay, jnp.arange(gen)[None, :] > 0),
        pad, -1,
    )
    audio_tokens = LM.depformer_sample(
        lm_cfg, params["lm"], hidden, text_token, forced, k_dep,
        S.SamplingConfig(cfg.audio_temperature, cfg.audio_top_k),
        cfg_alpha=cfg_alpha,
    )

    # Write generated tokens at delayed positions (overwrites allowed for
    # the saturating first frames; :286-296).
    g_arr = jnp.arange(gen)
    wdel = jnp.where(g_arr == 0, 0, cfg.acoustic_delay)
    write_pos = jnp.maximum(s[:, None] - wdel[None, :], 0)  # (B, gen)
    buf = buf.at[b_col, write_pos, g_arr[None, :]].set(audio_tokens)

    text_buf = state["text_tokens"].at[jnp.arange(b), s].set(text_token)

    if mask is not None:
        # Inactive slots: no buffer writes, counter frozen, prev_text kept.
        m1 = mask[:, None]
        buf = jnp.where(m1[:, :, None], buf, buf0)
        text_buf = jnp.where(m1, text_buf, state["text_tokens"])
        prev_text = jnp.where(mask, text_token, state["prev_text"])
        next_s = jnp.where(mask, s + 1, s)
    else:
        prev_text = text_token
        next_s = s + 1

    frame_pos = jnp.maximum(s - cfg.acoustic_delay, 0)  # (B,)
    frame = jnp.take_along_axis(
        buf[:, :, :gen], frame_pos[:, None, None], axis=1
    )[:, 0, :]
    frame_valid = jnp.logical_and(
        s >= cfg.acoustic_delay,
        jnp.all((frame >= 0) & (frame < lm_cfg.audio_vocab_size - 1), axis=1),
    )
    if mask is not None:
        frame_valid = jnp.logical_and(frame_valid, mask)

    out = {"text_token": text_token, "frame": frame, "frame_valid": frame_valid,
           # Raw step-i depformer samples (pre-delay-buffer): the duplex
           # quant study teacher-forces feedback with these so each step's
           # match is independent (tools/quant_divergence.py).
           "audio_tokens": audio_tokens}
    new_state = {
        "lm": lm_state,
        "audio_tokens": buf,
        "text_tokens": text_buf,
        "prev_text": prev_text,
        "step_idx": next_s,
    }
    return out, new_state
