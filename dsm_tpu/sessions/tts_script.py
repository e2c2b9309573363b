"""Device-side TTS word-feed constraint machine.

The reference walks the script on the HOST: each frame, ``process_loop``
(tts.rs:560-610) decides the AllowedTokens constraint from the word queue
and the previously sampled text token, so one device step per frame is
forced — the sampled token must round-trip to the host before the next
constraint exists (tts_streaming.rs:179-199).

TPU-native redesign: the script is uploaded to the device as a flat ring of
word-piece tokens tagged with their word index, and the AllowedTokens
decision becomes pure arithmetic over per-slot pointers — so K frames run
inside ONE ``lax.scan`` dispatch (server/tts_batched.py ``fuse_ticks``),
amortising the host round-trip and dispatch overhead across K frames.  The
host keeps its word queue as a deterministic *mirror* (TtsSlot replays the
fetched text tokens through the same transition rules) for word-event
emission and flow control; the two machines see identical inputs — the
uploaded script prefix and the sampled tokens — so they cannot diverge.

Machine state (per slot, batch-leading arrays):
  * ``toks``/``word_of`` — (B, CAP) flat script ring: token id + index of
    the word each token belongs to (-1 where unwritten)
  * ``ptr`` — absolute index of the next unconsumed token (host guarantees
    ``n_toks - ptr <= CAP`` by deferring uploads, so the ring never
    overwrites unconsumed tokens)
  * ``widx`` — current word index (-1 = before the first word: the host
    machine's initial "empty word" state, tts.rs:578)
  * ``n_toks``/``n_words`` — total uploaded tokens/words (host-written)
  * ``eos`` — end_input() received (host-written)
  * ``drained`` — final eop consumed; trailing ALLOW_PAD steps follow
  * ``past_last`` — steps since drained (session completes when it exceeds
    extra_steps + text_audio_delay_in_tokens)
  * ``active`` — slot occupied and not complete

Transition rules mirror server/tts_batched.TtsSlot.next_constraint /
on_text_token exactly; equivalence is property-tested in
tests/test_tts_fused.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import tts as TTS


@dataclasses.dataclass(frozen=True)
class ScriptConsts:
    """Static token ids + completion bound lifted from TtsConfig."""

    pad: int
    eop: int
    done_bound: int  # extra_steps + text_audio_delay_in_tokens

    @classmethod
    def from_cfg(cls, cfg: TTS.TtsConfig) -> "ScriptConsts":
        return cls(
            pad=cfg.text_pad_token,
            eop=cfg.text_eop_token,
            done_bound=cfg.extra_steps + cfg.text_audio_delay_in_tokens,
        )


def init(batch: int, cap: int) -> dict:
    # 16 consecutive ring indices must be unique mod cap, or the padded
    # scatter in write_word_chunk could clobber a valid lane's token with
    # an invalid lane's old value (duplicate-index scatter order).
    if cap < WORD_CHUNK:
        raise ValueError(f"script cap {cap} < WORD_CHUNK {WORD_CHUNK}")
    return {
        "toks": jnp.zeros((batch, cap), jnp.int32),
        "word_of": jnp.full((batch, cap), -1, jnp.int32),
        "ptr": jnp.zeros((batch,), jnp.int32),
        "widx": jnp.full((batch,), -1, jnp.int32),
        "n_toks": jnp.zeros((batch,), jnp.int32),
        "n_words": jnp.zeros((batch,), jnp.int32),
        "eos": jnp.zeros((batch,), bool),
        "drained": jnp.zeros((batch,), bool),
        "past_last": jnp.zeros((batch,), jnp.int32),
        "active": jnp.zeros((batch,), bool),
    }


def reset_row(m: dict, slot) -> dict:
    """Re-initialise one slot for a new session (engine open_session);
    jit with donate_argnums=(0,) for an in-place device update."""
    cap = m["toks"].shape[1]
    z = jnp.int32(0)
    return {
        "toks": m["toks"].at[slot].set(jnp.zeros((cap,), jnp.int32)),
        "word_of": m["word_of"].at[slot].set(jnp.full((cap,), -1, jnp.int32)),
        "ptr": m["ptr"].at[slot].set(z),
        "widx": m["widx"].at[slot].set(jnp.int32(-1)),
        "n_toks": m["n_toks"].at[slot].set(z),
        "n_words": m["n_words"].at[slot].set(z),
        "eos": m["eos"].at[slot].set(False),
        "drained": m["drained"].at[slot].set(False),
        "past_last": m["past_last"].at[slot].set(z),
        "active": m["active"].at[slot].set(True),
    }


def deactivate_row(m: dict, slot) -> dict:
    out = dict(m)
    out["active"] = m["active"].at[slot].set(False)
    return out


def set_eos_row(m: dict, slot) -> dict:
    out = dict(m)
    out["eos"] = m["eos"].at[slot].set(True)
    return out


WORD_CHUNK = 16  # static upload width; longer words go in chunks


def write_word_chunk(m: dict, slot, toks, count, word_id, start) -> dict:
    """Append ``count`` tokens of word ``word_id`` at absolute position
    ``start`` (ring-wrapped).  ``toks`` is a (WORD_CHUNK,) int32 padded
    buffer.  Host passes ``start``/``word_id`` from its own accounting
    (authoritative), and sets the counters to the post-write values."""
    cap = m["toks"].shape[1]
    idx = (start + jnp.arange(WORD_CHUNK, dtype=jnp.int32)) % cap
    valid = jnp.arange(WORD_CHUNK) < count
    cur_t = m["toks"][slot, idx]
    cur_w = m["word_of"][slot, idx]
    out = dict(m)
    out["toks"] = m["toks"].at[slot, idx].set(jnp.where(valid, toks, cur_t))
    out["word_of"] = m["word_of"].at[slot, idx].set(
        jnp.where(valid, jnp.int32(word_id), cur_w)
    )
    out["n_toks"] = m["n_toks"].at[slot].set(start + count)
    out["n_words"] = m["n_words"].at[slot].set(word_id + 1)
    return out


# Batched op application: one device dispatch for a whole queue of script
# updates.  The per-op jits above cost one tunnel/PJRT dispatch EACH; a
# fresh session enqueues init + one chunk per word + eos (~52 ops for a
# 50-word request), so opening a session used to stall the engine tick for
# seconds of pure dispatch overhead (measured: tick p99 2.1-3.9 s at
# B=32/64, docs/SUSTAINED_TTS_r03_b{32,64}_fuse4.json).  apply_ops folds
# the queue into ONE lax.scan program; the engine pads to bucketed sizes so
# only a handful of shapes ever compile.
OP_NOP, OP_INIT, OP_DEACT, OP_EOS, OP_WORD = 0, 1, 2, 3, 4


def apply_ops(m: dict, kinds, slots, toks, counts, wids, starts) -> dict:
    """Apply a padded batch of queued script ops in program order.

    ``kinds (N,)`` selects the op (OP_* above; OP_NOP pads), ``slots (N,)``
    the target row, ``toks (N, WORD_CHUNK)``/``counts``/``wids``/``starts``
    the write_word_chunk payload (ignored by other kinds).  jit with
    donate_argnums=(0,); order within the batch is preserved (lax.scan),
    matching the sequential per-op path bit-for-bit."""

    def body(m, op):
        kind, slot, tk, cnt, wid, st = op
        branches = [
            lambda m: m,
            lambda m: reset_row(m, slot),
            lambda m: deactivate_row(m, slot),
            lambda m: set_eos_row(m, slot),
            lambda m: write_word_chunk(m, slot, tk, cnt, wid, st),
        ]
        return jax.lax.switch(kind, branches, m), None

    m, _ = jax.lax.scan(body, m, (kinds, slots, toks, counts, wids, starts))
    return m


def constraint(cc: ScriptConsts, m: dict):
    """-> (mode, token, step_mask, m').  The device analogue of
    TtsSlot.next_constraint over the whole batch: drained slots force pad
    (and count toward completion), in-word slots force the next word piece,
    everything else is the model's pad-vs-eop choice."""
    cap = m["toks"].shape[1]
    drained = m["drained"]
    past = m["past_last"] + jnp.where(drained, 1, 0)
    done = drained & (past > cc.done_bound)
    active = m["active"] & ~done

    phys = (m["ptr"] % cap)[:, None]
    cur_word = jnp.take_along_axis(m["word_of"], phys, axis=1)[:, 0]
    cur_tok = jnp.take_along_axis(m["toks"], phys, axis=1)[:, 0]
    in_word = (
        (~drained)
        & (m["widx"] >= 0)
        & (m["ptr"] < m["n_toks"])
        & (cur_word == m["widx"])
    )
    mode = jnp.where(
        drained,
        jnp.int32(TTS.ALLOW_PAD),
        jnp.where(
            in_word, jnp.int32(TTS.ALLOW_TEXT), jnp.int32(TTS.ALLOW_PAD_OR_EPAD)
        ),
    )
    tok = jnp.where(in_word, cur_tok, 0)
    m2 = dict(m)
    m2["past_last"] = past
    m2["active"] = active
    return mode, tok, active, m2


def advance(cc: ScriptConsts, m: dict, text_token, stepped) -> tuple:
    """Consume the sampled/forced ``text_token`` (TtsSlot.on_text_token):
    eop advances to the next word, drains on eos, or stays starved; a
    non-pad text token consumes one script position.  Returns
    ``(m', patch)`` where ``patch`` marks slots whose final eop must be
    overwritten with a pad in the text history (tts.rs:607-610)."""
    is_eop = (text_token == cc.eop) & stepped & ~m["drained"]
    is_txt = (
        (text_token != cc.eop) & (text_token != cc.pad) & stepped
    )
    words_remain = (m["widx"] + 1) < m["n_words"]
    adv_word = is_eop & words_remain
    drain_now = is_eop & ~words_remain & m["eos"]
    m2 = dict(m)
    m2["widx"] = jnp.where(adv_word, m["widx"] + 1, m["widx"])
    m2["ptr"] = jnp.where(is_txt, m["ptr"] + 1, m["ptr"])
    m2["drained"] = m["drained"] | drain_now
    return m2, drain_now
