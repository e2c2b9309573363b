"""Transformer feed-forward blocks (reference: transformer.rs:555-621).

Two variants, selected by config:
  * gated (SiLU GLU): ``linear_in: d -> 2*hidden``, split, ``act(a) * b``,
    ``linear_out: hidden -> d`` with hidden = 2*ff/3 (or 11*d/4 when
    ff == 4*d), matching ``Mlp::Gating``.
  * plain: linear1 -> gelu(erf) -> linear2, matching ``Mlp::NoGating``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def gating_hidden(d_model: int, dim_feedforward: int) -> int:
    if dim_feedforward == 4 * d_model:
        return 11 * d_model // 4
    return 2 * dim_feedforward // 3


def _linear_init(key, in_d, out_d, dtype):
    scale = 1.0 / math.sqrt(in_d)
    return jax.random.uniform(key, (out_d, in_d), dtype, -scale, scale)


def init(
    key: jax.Array,
    d_model: int,
    dim_feedforward: int,
    gating: bool,
    dtype=jnp.float32,
) -> dict:
    k1, k2 = jax.random.split(key)
    if gating:
        hidden = gating_hidden(d_model, dim_feedforward)
        return {
            "linear_in": _linear_init(k1, d_model, 2 * hidden, dtype),
            "linear_out": _linear_init(k2, hidden, d_model, dtype),
        }
    return {
        "linear1": _linear_init(k1, d_model, dim_feedforward, dtype),
        "linear2": _linear_init(k2, dim_feedforward, d_model, dtype),
    }


def _mm(x, w, site=None):
    # Delegates to ops/transformer.mm (lazy import — mlp is imported by
    # transformer) so the dense/int8/W8A8/qmm dispatch lives in exactly
    # one place.  ``site``: mixed-profile W8A8 filter identity.
    from . import transformer as tr

    return tr.mm(x, w, site=site)


def apply(params: dict, x: jax.Array) -> jax.Array:
    if "linear_in" in params:
        y = _mm(x, params["linear_in"], site="mlp_in")
        a, b = jnp.split(y, 2, axis=-1)
        y = jax.nn.silu(a) * b
        return _mm(y, params["linear_out"], site="mlp_out")
    y = _mm(x, params["linear1"], site="mlp_in")
    y = jax.nn.gelu(y, approximate=False)
    return _mm(y, params["linear2"], site="mlp_out")
