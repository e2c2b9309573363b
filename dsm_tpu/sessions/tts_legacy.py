"""Legacy T5-encoder-conditioned TTS (audio-only generation).

Reference: moshi-core/src/tts.rs — the pre-delayed-streams TTS: a text
encoder's hidden states (T5) are projected into the LM width and fed as the
cross-attention source; the LM then generates *audio tokens only* (no text
stream), codebook 0 at delay 0 and acoustic codebooks at delay 2, stopping
when the model emits an end-of-gen id (>= quantizer_bins) plus two extra
steps to flush the delayed acoustic tokens (tts.rs:154-224 ``sample_lp``).

TPU design: the per-step compute (LM step + depformer sample + delayed
buffer writes) is one jitted function over static shapes; the host loop only
checks the end-of-gen condition, mirroring our other offline paths.  Voice
conditioning (tts.rs:113-148 ``conditions``) builds the two-row CFG batch
[text+speaker, text+zeros] with sin position embeddings.

The T5 encoder itself is not re-implemented: any ``(B, T, d_t5)`` encoder
output works (``encode_text_t5`` wraps ``transformers`` when available).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import lm as LM
from ..models import mimi as MIMI
from ..models.speaker import add_sin_embeddings
from ..ops import sampling as S
from ..ops import transformer as T

ACOUSTIC_DELAY = 2
UNSET = -1


@dataclasses.dataclass(frozen=True)
class LegacyTtsConfig:
    lm: LM.LmConfig
    mimi: Optional[MIMI.MimiConfig] = None
    max_duration_s: float = 60.0
    speaker_cond_duration_s: float = 10.0
    max_speakers: int = 2
    frame_rate: float = 12.5
    temperature: float = 0.8
    top_k: int = 100

    @property
    def max_steps(self) -> int:
        return int(self.max_duration_s * self.frame_rate) + 3

    @property
    def quantizer_bins(self) -> int:
        # audio_vocab_size = bins + end-of-gen + pad (tts.rs:170).
        return self.lm.audio_vocab_size - 2


def conditions(
    cfg: LegacyTtsConfig,
    params: dict,
    text_states: jax.Array,  # (1, T, d_t5) T5 encoder output
    t5_proj: jax.Array,  # (d_t5, d_model)
    speaker_pcm: Optional[jax.Array] = None,
    speaker_proj: Optional[jax.Array] = None,
) -> jax.Array:
    """Build the cross-attention source (tts.rs:113-148).

    Without a speaker sample: projected text states, one row.  With one:
    two CFG rows [text|speaker|zeros...] and [text|zeros|zeros...], sin
    position embeddings added.
    """
    txt = text_states.astype(jnp.float32) @ t5_proj.astype(jnp.float32)
    if speaker_pcm is None:
        return txt
    assert cfg.mimi is not None and speaker_proj is not None
    emb = MIMI.encode_pre_quantize(cfg.mimi, params["mimi"], speaker_pcm)
    sc = emb.transpose(0, 2, 1).astype(jnp.float32) @ speaker_proj.astype(
        jnp.float32
    )
    z = jnp.zeros_like(sc)
    pads = [z] * (cfg.max_speakers - 1)
    c1 = jnp.concatenate([txt, sc] + pads, axis=1)
    c2 = jnp.concatenate([txt, z] + pads, axis=1)
    return add_sin_embeddings(jnp.concatenate([c1, c2], axis=0))


def init_state(cfg: LegacyTtsConfig, cfg_rows: int, cache_dtype=jnp.bfloat16):
    """cfg_rows = 2 when classifier-free guidance is active, else 1."""
    k = cfg.lm.audio_codebooks
    return {
        "lm": LM.init_state(cfg.lm, cfg_rows, cache_dtype),
        "audio_tokens": jnp.full((cfg.max_steps, k), UNSET, jnp.int32),
        "step_idx": jnp.zeros((), jnp.int32),
    }


def step(
    cfg: LegacyTtsConfig,
    params: dict,
    state: dict,
    rng: jax.Array,
    ca_kv: Tuple[jax.Array, jax.Array],
    cfg_alpha: Optional[float] = None,
):
    """One audio-only generation step (tts.rs:172-221 loop body).

    Inputs are read from the delayed token buffer: codebook 0 reads its own
    previous token, acoustic codebooks read position ``step-3`` (delay 2 plus
    the one-frame shift), pad token during the warm-up window.
    """
    lm_cfg = cfg.lm
    s = state["step_idx"]
    buf = state["audio_tokens"]
    k = lm_cfg.audio_codebooks
    pad = jnp.int32(lm_cfg.audio_pad_token)

    prev0 = buf[jnp.maximum(s - 1, 0), 0]
    cb0 = jnp.where(s == 0, pad, prev0)
    prev_ac = buf[jnp.maximum(s - 3, 0), :]
    acoustic = jnp.where(s <= ACOUSTIC_DELAY, pad, prev_ac)
    audio_in_1 = jnp.concatenate([cb0[None], acoustic[1:]], axis=0)[None, :]

    n_rows = 2 if cfg_alpha is not None else 1
    audio_in = jnp.broadcast_to(audio_in_1, (n_rows, k))
    text_in = jnp.full((n_rows,), UNSET, jnp.int32)  # no text stream

    _, hidden, lm_state = LM.step(
        lm_cfg, params["lm"], state["lm"], text_in, audio_in, ca_kv=ca_kv
    )
    # Teacher-force pads on acoustic codebooks during the delay window
    # (lm.rs ForcedAudioTokens, tts.rs:166-171).
    forced_next = jnp.where(
        jnp.logical_and(s < ACOUSTIC_DELAY, jnp.arange(k) > 0), pad, UNSET
    )
    tokens = LM.depformer_sample(
        lm_cfg, params["lm"], hidden, text_in, forced_next,
        rng, S.SamplingConfig(cfg.temperature, cfg.top_k), cfg_alpha=cfg_alpha,
    )[0]  # (K,)

    # Delayed writes: codebook 0 at step s, acoustic at s - 2 (tts.rs:215-218).
    w0 = buf.at[s, 0].set(tokens[0])
    wa = jnp.maximum(s - ACOUSTIC_DELAY, 0)
    row = jnp.where(jnp.arange(k) > 0, tokens, w0[wa])
    buf = jax.lax.dynamic_update_slice(w0, row[None, :], (wa, 0))

    # End-of-gen: any sampled id >= quantizer_bins after the first step.
    eog = jnp.logical_and(s > 0, jnp.any(tokens >= cfg.quantizer_bins))
    new_state = {"lm": lm_state, "audio_tokens": buf, "step_idx": s + 1}
    return {"tokens": tokens, "end_of_gen": eog}, new_state


def sample(
    cfg: LegacyTtsConfig,
    params: dict,
    ca_src: jax.Array,
    seed: int = 299792458,
    cfg_alpha: Optional[float] = None,
    max_steps: Optional[int] = None,
):
    """Full offline generation (tts.rs:154-224): returns (T, K) int32 audio
    tokens, truncated to valid (fully written, in-vocab) frames."""
    import numpy as np

    n_rows = 2 if cfg_alpha is not None else 1
    assert ca_src.shape[0] == n_rows, (ca_src.shape, n_rows)
    ca_kv = T.precompute_ca_kv(
        cfg.lm.transformer, params["lm"]["transformer"], ca_src
    )
    state = init_state(cfg, n_rows)
    rng = jax.random.PRNGKey(seed)
    fn = jax.jit(
        lambda p, st, r, ck: step(cfg, p, st, r, ck, cfg_alpha=cfg_alpha)
    )
    end_at = None
    n = max_steps or cfg.max_steps
    for i in range(min(n, cfg.max_steps - 1)):
        rng, sub = jax.random.split(rng)
        out, state = fn(params, state, sub, ca_kv)
        if end_at is None and bool(out["end_of_gen"]):
            end_at = i + ACOUSTIC_DELAY  # flush delayed acoustic tokens
        if end_at is not None and i >= end_at:
            break
    buf = np.asarray(state["audio_tokens"])
    valid = (buf >= 0).all(axis=1) & (buf < cfg.quantizer_bins).all(axis=1)
    # Keep the leading run of valid frames.
    t = int(np.argmin(valid)) if not valid.all() else buf.shape[0]
    return buf[:t]


def encode_text_t5(text: str, model_name: str = "t5-base"):
    """Optional helper: run a HuggingFace T5 encoder (CPU torch) and return
    (1, T, d_t5) float32 states.  Gated on transformers availability."""
    try:
        import torch
        from transformers import AutoTokenizer, T5EncoderModel
    except Exception as e:  # pragma: no cover - optional dependency
        raise RuntimeError(f"transformers/torch unavailable: {e}")
    tok = AutoTokenizer.from_pretrained(model_name)
    model = T5EncoderModel.from_pretrained(model_name)
    with torch.no_grad():
        ids = tok(text, return_tensors="pt").input_ids
        states = model(input_ids=ids).last_hidden_state
    return jnp.asarray(states.numpy())
