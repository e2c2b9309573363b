"""Token sampling, batched and jit-friendly.

Parity with the reference's LogitsProcessor usage (argmax when temperature
<= 0, otherwise temperature softmax sampling with optional top-k;
moshi-core/src/asr.rs:208-216, tts.rs sampling setup) — but fully batched and
on-device: sampling is a Gumbel-argmax over the (masked) logits so the whole
batch samples in one fused kernel with no host round-trip.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    temperature: float = 0.0
    top_k: Optional[int] = None


def sample(
    cfg: SamplingConfig, logits: jax.Array, key: Optional[jax.Array]
) -> jax.Array:
    """Sample token ids from ``logits (..., V)`` -> ``(...,) int32``."""
    if cfg.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / cfg.temperature
    if cfg.top_k is not None and cfg.top_k > 0 and cfg.top_k < logits.shape[-1]:
        kth = jax.lax.top_k(logits, cfg.top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    gumbel = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    return jnp.argmax(logits + gumbel, axis=-1).astype(jnp.int32)


def slot_keys(seeds: jax.Array, steps: jax.Array) -> jax.Array:
    """Per-slot PRNG keys from per-request seeds + per-slot step counters.

    Sampling then depends only on (seed, step, draw index) — per-request
    determinism independent of batch composition, the TPU analogue of the
    reference's per-connection LogitsProcessor seeded from TtsQuery.seed
    (moshi-server/src/main.rs:1045-1074).
    """
    def one(seed, step):
        return jax.random.fold_in(jax.random.PRNGKey(seed), step)

    return jax.vmap(one)(seeds.astype(jnp.uint32), steps.astype(jnp.uint32))


def fold_keys(keys: jax.Array, idx) -> jax.Array:
    """Fold a draw index into a batch of keys ((B, 2) -> (B, 2))."""
    return jax.vmap(lambda k: jax.random.fold_in(k, idx))(keys)


def sample_per_slot(
    logits: jax.Array,
    keys: jax.Array,
    temperature: jax.Array,
    top_k: Optional[int] = None,
) -> jax.Array:
    """``sample_dynamic`` with an independent PRNG key per row.

    ``logits (B, V)``, ``keys (B, 2)`` (from :func:`slot_keys`),
    ``temperature (B,)``; <= 0 rows decode greedily.
    """
    logits = logits.astype(jnp.float32)
    if top_k is not None and 0 < top_k < logits.shape[-1]:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    t = jnp.asarray(temperature, jnp.float32)
    gumbel = jax.vmap(
        lambda k, lg: jax.random.gumbel(k, lg.shape, dtype=jnp.float32)
    )(keys, logits)
    stoch = jnp.argmax(logits + gumbel * jnp.maximum(t[:, None], 1e-6), axis=-1)
    greedy = jnp.argmax(logits, axis=-1)
    return jnp.where(t > 0, stoch, greedy).astype(jnp.int32)


def sample_dynamic(
    logits: jax.Array,
    key: jax.Array,
    temperature: jax.Array,
    top_k: Optional[int] = None,
) -> jax.Array:
    """Sampling with a *traced* (per-request / per-slot) temperature.

    ``temperature`` is a scalar or per-row array broadcast against the
    leading axes of ``logits``; <= 0 rows decode greedily.  top_k stays
    static (it shapes the top_k op).  Serving uses this so per-request
    sampling params never trigger a recompile.
    """
    logits = logits.astype(jnp.float32)
    if top_k is not None and 0 < top_k < logits.shape[-1]:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    t = jnp.asarray(temperature, jnp.float32)
    t_b = jnp.broadcast_to(t, logits.shape[:-1])[..., None]
    gumbel = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    stoch = jnp.argmax(logits + gumbel * jnp.maximum(t_b, 1e-6), axis=-1)
    greedy = jnp.argmax(logits, axis=-1)
    return jnp.where(
        jnp.broadcast_to(t, logits.shape[:-1]) > 0, stoch, greedy
    ).astype(jnp.int32)
