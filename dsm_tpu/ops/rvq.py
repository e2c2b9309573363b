"""Residual vector quantization (reference: moshi-core/src/quantization.rs).

EuclideanCodebook / ResidualVectorQuantizer / SplitResidualVectorQuantizer
rebuilt TPU-first:

  * Nearest-neighbour encode is one matmul + argmin over the codebook
    (``argmin(|x|^2 - 2 x.e + |e|^2) == argmin(c2 - x.e^T)`` with
    ``c2 = |e|^2 / 2``) — the MXU formulation the reference only uses as its
    "slow" fallback (quantization.rs:122-131); its fast path is a rayon CPU op
    (quantization.rs:8-69) which would be the wrong design on TPU.
  * The n_q residual stages run as a ``lax.scan`` over stacked codebooks.

Codebook embeddings are derived at load time as embedding_sum / max(cluster_
usage, eps) exactly like the reference (quantization.rs:85-107).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RvqConfig:
    dim: int  # codebook dim (256 for Mimi)
    input_dim: int  # encoder dim (512)
    output_dim: int  # decoder dim (512)
    n_q: int
    bins: int

    @property
    def has_proj(self) -> bool:
        # Mimi always force-projects (quantization.rs:334-360 passes
        # force_projection=true).
        return True


def init(cfg: RvqConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        # Stacked codebooks (n_q, bins, dim).
        "embed": jax.random.normal(k1, (cfg.n_q, cfg.bins, cfg.dim), dtype),
        "input_proj": jax.random.normal(k2, (cfg.dim, cfg.input_dim), dtype)
        / jnp.sqrt(cfg.input_dim).astype(dtype),
        "output_proj": jax.random.normal(k3, (cfg.output_dim, cfg.dim), dtype)
        / jnp.sqrt(cfg.dim).astype(dtype),
    }
    return params


def encode(cfg: RvqConfig, params: dict, xs: jax.Array) -> jax.Array:
    """``xs (B, D_in, T)`` -> codes ``(B, n_q, T)`` int32."""
    x = jnp.einsum("bdt,cd->btc", xs, params["input_proj"])  # (B, T, dim)
    embed = params["embed"].astype(jnp.float32)
    c2 = 0.5 * jnp.sum(embed * embed, axis=-1)  # (n_q, bins)

    def stage(residual, stage_params):
        e, c2_q = stage_params
        dots = jnp.einsum(
            "btc,vc->btv", residual, e, preferred_element_type=jnp.float32
        )
        codes = jnp.argmin(c2_q[None, None, :] - dots, axis=-1)
        quantized = e[codes]
        return residual - quantized, codes

    _, codes = jax.lax.scan(stage, x.astype(jnp.float32), (embed, c2))
    return jnp.transpose(codes, (1, 0, 2)).astype(jnp.int32)  # (B, n_q, T)


def decode(cfg: RvqConfig, params: dict, codes: jax.Array) -> jax.Array:
    """codes ``(B, n_q, T)`` -> ``(B, D_out, T)``."""
    # Sum of per-stage codebook lookups; one gather over stacked tables.
    embed = params["embed"]  # (n_q, bins, dim)
    q_idx = jnp.arange(cfg.n_q)[None, :, None]
    quantized = embed[q_idx, codes]  # (B, n_q, T, dim)
    summed = jnp.sum(quantized, axis=1)  # (B, T, dim)
    return jnp.einsum("btc,oc->bot", summed, params["output_proj"])


@dataclasses.dataclass(frozen=True)
class SplitRvqConfig:
    dim: int
    input_dim: int
    output_dim: int
    n_q: int
    bins: int

    @property
    def first(self) -> RvqConfig:
        return RvqConfig(self.dim, self.input_dim, self.output_dim, 1, self.bins)

    @property
    def rest(self) -> RvqConfig:
        return RvqConfig(
            self.dim, self.input_dim, self.output_dim, self.n_q - 1, self.bins
        )


def split_init(cfg: SplitRvqConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    params = {"rvq_first": init(cfg.first, k1, dtype)}
    if cfg.n_q > 1:
        params["rvq_rest"] = init(cfg.rest, k2, dtype)
    return params


def split_encode(cfg: SplitRvqConfig, params: dict, xs: jax.Array) -> jax.Array:
    """Semantic codebook + acoustic codebooks, both encoding the *same* xs
    (not hierarchical; quantization.rs:366-378)."""
    codes = encode(cfg.first, params["rvq_first"], xs)
    if cfg.n_q > 1:
        rest = encode(cfg.rest, params["rvq_rest"], xs)
        codes = jnp.concatenate([codes, rest], axis=1)
    return codes


def split_decode(cfg: SplitRvqConfig, params: dict, codes: jax.Array) -> jax.Array:
    out = decode(cfg.first, params["rvq_first"], codes[:, :1])
    if cfg.n_q > 1:
        out = out + decode(cfg.rest, params["rvq_rest"], codes[:, 1:])
    return out
