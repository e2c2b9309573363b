"""Normalisation layers (reference: moshi-core/src/transformer.rs:623-704).

RmsNorm eps 1e-8, LayerNorm eps 1e-5, matching the reference's
``Norm::new_shortcut``.  Normalisation statistics are computed in f32
regardless of activation dtype (bf16-safe), then cast back.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm_init(d: int, dtype=jnp.float32) -> dict:
    return {"alpha": jnp.ones((d,), dtype)}


def rms_norm(params: dict, x: jax.Array, eps: float = 1e-8) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * params["alpha"].astype(jnp.float32)).astype(x.dtype)


def layer_norm_init(d: int, dtype=jnp.float32) -> dict:
    return {"alpha": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def layer_norm(params: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["alpha"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def norm_init(kind: str, d: int, dtype=jnp.float32) -> dict:
    if kind == "rms_norm":
        return rms_norm_init(d, dtype)
    if kind == "layer_norm":
        return layer_norm_init(d, dtype)
    raise ValueError(f"unknown norm kind {kind!r}")


def apply_norm(kind: str, params: dict, x: jax.Array) -> jax.Array:
    if kind == "rms_norm":
        return rms_norm(params, x)
    if kind == "layer_norm":
        return layer_norm(params, x)
    raise ValueError(f"unknown norm kind {kind!r}")
