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
