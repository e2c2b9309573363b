"""Device autoconfig: HBM-budget batch sizing + dtype selection.

TPU analogue of the reference's NVML-based GPU autoconfig
(moshi-server/src/utils.rs:430-755 + main.rs:769-934): estimate the per-slot
memory cost from the KV-cache geometry, clamp the configured batch size to
the available HBM with a safety reserve, and pick the compute dtype from the
backend (bf16 on TPU — the MXU-native type — f32 on CPU).

Env overrides mirror the reference knobs:
  DSM_HBM_RESERVED_MB   (MOSHI_VRAM_RESERVED_MB)
  DSM_PER_SLOT_MB       (MOSHI_PER_BATCH_ITEM_MB)
"""

from __future__ import annotations

import logging
import os
from typing import Optional

log = logging.getLogger("dsm.autoconfig")

DEFAULT_RESERVED_MB = 1024.0
SAFETY_MULT = 1.25  # activations + fragmentation headroom


def device_memory_bytes() -> Optional[int]:
    try:
        import jax

        stats = jax.devices()[0].memory_stats() or {}
        return stats.get("bytes_limit")
    except Exception:
        return None


def per_slot_bytes(lm_cfg, cache_bytes_per_el: int = 2) -> int:
    """KV-cache cost per batch slot: 2 (K+V) * L * H * (context+?) * Dh
    plus the Mimi codec caches (utils.rs:430-509 estimates the same way)."""
    t = lm_cfg.transformer
    lm_kv = 2 * t.num_layers * t.num_heads * t.context * t.hd * cache_bytes_per_el
    # Mimi codec transformer: 8 layers, 8 heads, ctx 250(+1), dh 64, f32.
    mimi_kv = 2 * 8 * 8 * 251 * 64 * 4 * 2  # enc+dec
    return int((lm_kv + mimi_kv) * SAFETY_MULT)


def model_bytes(lm_cfg, bytes_per_el: int = 2) -> int:
    """12*L*d^2-style estimate (utils.rs:762-881)."""
    t = lm_cfg.transformer
    core = t.num_layers * (4 * t.d_model * t.num_heads * t.hd
                           + 3 * t.d_model * t.dim_feedforward)
    embeddings = (
        lm_cfg.text_in_vocab_size + lm_cfg.text_out_vocab_size
        + lm_cfg.audio_codebooks * lm_cfg.audio_vocab_size
    ) * t.d_model
    return (core + embeddings) * bytes_per_el


def auto_batch_size(requested: int, lm_cfg) -> int:
    """Clamp the configured batch size to the HBM budget
    (utils.rs calculate_batch_size :594-656)."""
    total = device_memory_bytes()
    if total is None:
        return requested
    reserved = float(os.environ.get("DSM_HBM_RESERVED_MB", DEFAULT_RESERVED_MB)) * 2**20
    per_slot_env = os.environ.get("DSM_PER_SLOT_MB")
    slot = (
        float(per_slot_env) * 2**20 if per_slot_env else per_slot_bytes(lm_cfg)
    )
    budget = total - reserved - model_bytes(lm_cfg)
    if budget <= 0:
        log.warning("HBM budget exhausted by weights; batch clamped to 1")
        return 1
    fit = max(int(budget // slot), 1)
    if fit < requested:
        log.warning(
            "clamping batch_size %d -> %d (HBM %.1f GiB, %.0f MiB/slot)",
            requested, fit, total / 2**30, slot / 2**20,
        )
        return fit
    return requested


def compute_dtype():
    import jax
    import jax.numpy as jnp

    return jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
