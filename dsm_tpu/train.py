"""Training / finetuning for delayed-streams LMs.

The reference stack is inference-only (SURVEY.md: no training code); this
module adds the TPU-native training step the serving stack implies:
next-frame prediction over the delayed token streams.

  inputs at frame t  : text[t-1]; audio[t-1, cb0]; audio[t-1-ad, cb>0]
                       (the exact pattern the streaming sessions feed)
  temporal loss      : CE(text_logits[t], text[t])
  depformer loss     : teacher-forced CE over the K codebook slices, with
                       time folded into the batch axis (each frame's slice
                       chain is independent — the same property the
                       inference scan exploits).

Shardable out of the box: batch/dp, heads+mlp/tp (parallel/mesh rules);
`make_train_step` returns a jitted (params, opt_state, batch) -> ... update.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .models import lm as LM
from .ops import norm as norm_mod
from .ops import transformer as T


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lm: LM.LmConfig
    acoustic_delay: int = 2
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    text_loss_weight: float = 1.0
    audio_loss_weight: float = 1.0
    grad_clip: float = 1.0


def build_delayed_inputs(cfg: TrainConfig, text: jax.Array, audio: jax.Array):
    """(text (B,T), audio (B,T,K)) -> delayed-model inputs, same shapes."""
    lm_cfg = cfg.lm
    b, t = text.shape
    k = audio.shape[-1]
    ad = cfg.acoustic_delay

    text_in = jnp.concatenate(
        [jnp.full((b, 1), lm_cfg.text_start_token, text.dtype), text[:, :-1]],
        axis=1,
    )
    pad = jnp.int32(lm_cfg.audio_pad_token)
    k_arr = jnp.arange(k)
    delays = jnp.where(k_arr == 0, 1, ad + 1)  # (K,)
    t_idx = jnp.arange(t)[:, None]
    src = t_idx - delays[None, :]  # (T, K)
    gathered = audio[:, jnp.maximum(src, 0), k_arr[None, :]]  # (B,T,K)
    audio_in = jnp.where((src < 0)[None], pad, gathered)
    return text_in, audio_in


def temporal_loss(
    cfg: TrainConfig, params: dict, text: jax.Array, audio: jax.Array
):
    """Returns (text_loss, hidden (B,T,D))."""
    lm_cfg = cfg.lm
    text_in, audio_in = build_delayed_inputs(cfg, text, audio)
    emb = params["text_emb"][text_in]
    k = lm_cfg.audio_codebooks
    for i in range(k):
        emb = emb + params["audio_embs"][i][audio_in[:, :, i]]
    ys = T.forward(lm_cfg.transformer, params["transformer"], emb)
    ys = norm_mod.apply_norm(lm_cfg.transformer.norm, params["out_norm"], ys)
    logits = ys @ params["text_linear"].astype(ys.dtype).T
    text_loss = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), text
    ).mean()
    return text_loss, ys


def depformer_loss(cfg: TrainConfig, params: dict, hidden: jax.Array,
                   text: jax.Array, audio: jax.Array) -> jax.Array:
    """Teacher-forced CE over codebook slices; time folded into batch."""
    lm_cfg = cfg.lm
    dep = lm_cfg.depformer
    dcfg = dep.transformer
    s = dep.num_slices
    b, t, d = hidden.shape
    h = hidden.reshape(b * t, d)
    targets = audio[:, :, :s].reshape(b * t, s)
    prev_text = text.reshape(b * t)

    dp = params["depformer"]
    kv = T.init_state(dcfg, b * t, cache_dtype=h.dtype)

    def dep_embed(table, tok, lr):
        e = table[tok]
        if lr is not None:
            e = e @ lr.astype(e.dtype).T
        return e

    def slice_logits(i, kv, last_tok):
        lp = jax.tree_util.tree_map(lambda a: a[i], dp["transformer"])
        lr = dp["low_rank"][i] if "low_rank" in dp else None
        table = dp["text_emb"] if i == 0 else dp["audio_embs"][i - 1]
        x = h @ dp["linear_in"][i].astype(h.dtype).T + dep_embed(
            table, last_tok, lr
        ).astype(h.dtype)
        y, kv = T.step(dcfg, lp, kv, x[:, None, :])
        return y[:, 0] @ dp["linear_out"][i].astype(h.dtype).T, kv

    losses = []
    last_tok = prev_text
    for i in range(s):  # static unroll over codebook slices
        logits, kv = slice_logits(i, kv, last_tok)
        losses.append(
            optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32),
                jnp.minimum(targets[:, i], lm_cfg.audio_vocab_size - 2),
            ).mean()
        )
        last_tok = targets[:, i]
    return jnp.stack(losses).mean()


def loss_fn(cfg: TrainConfig, params: dict, batch: dict):
    text, audio = batch["text"], batch["audio"]
    text_loss, hidden = temporal_loss(cfg, params, text, audio)
    loss = cfg.text_loss_weight * text_loss
    aux = {"text_loss": text_loss}
    if cfg.lm.depformer is not None:
        a_loss = depformer_loss(cfg, params, hidden, text, audio)
        loss = loss + cfg.audio_loss_weight * a_loss
        aux["audio_loss"] = a_loss
    return loss, aux


def make_optimizer(cfg: TrainConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay),
    )


def make_train_step(cfg: TrainConfig, opt):
    def train_step(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: loss_fn(cfg, p, batch), has_aux=True
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return jax.jit(train_step, donate_argnums=(0, 1))
