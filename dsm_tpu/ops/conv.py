"""Causal streaming 1-D convolutions with static-shape carry state.

TPU-native re-design of the reference's streaming convs
(moshi-core/src/conv.rs: StreamableConv1d :306-370, StreamableConvTranspose1d
:443-501, ConvDownsample1d :504-555, ConvTrUpsample1d :557-606).

Key insight: the reference supports variable step sizes and therefore keeps a
dynamically sized ``state_prev_xs`` buffer plus a ``left_pad_applied`` flag.
In a frame-synchronous pipeline every step consumes a fixed number of samples
divisible by the stride, so the carry collapses to a *fixed* ``K_eff - S``
sample buffer initialised to the causal left padding (zeros for constant pad).
That makes the step function fully static-shape → one compiled XLA program.

Streaming equivalence (step-by-step == full forward) is enforced by
tests/test_conv.py, replicating the reference's own equivalence grid
(conv.rs:608-724).

Layout: activations are ``(B, C, T)`` (channels-first like the reference so
weight layouts match candle checkpoints); weights ``(out_c, in_c/groups, k)``
for conv and ``(in_c, out_c/groups, k)`` for conv-transpose.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.tree import where_mask

_DN = ("NCH", "OIH", "NCH")


@dataclasses.dataclass(frozen=True)
class ConvConfig:
    in_c: int
    out_c: int
    k: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    bias: bool = True
    pad_mode: str = "constant"  # "constant" | "replicate"

    @property
    def k_eff(self) -> int:
        return (self.k - 1) * self.dilation + 1

    @property
    def padding_total(self) -> int:
        return self.k_eff - self.stride


def init(cfg: ConvConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    wkey, bkey = jax.random.split(key)
    fan_in = cfg.in_c // cfg.groups * cfg.k
    scale = 1.0 / math.sqrt(fan_in)
    params = {
        "w": jax.random.uniform(
            wkey, (cfg.out_c, cfg.in_c // cfg.groups, cfg.k), dtype, -scale, scale
        )
    }
    if cfg.bias:
        params["b"] = jax.random.uniform(bkey, (cfg.out_c,), dtype, -scale, scale)
    return params


def _conv(cfg: ConvConfig, params: dict, x: jax.Array) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x,
        params["w"].astype(x.dtype),
        window_strides=(cfg.stride,),
        padding="VALID",
        rhs_dilation=(cfg.dilation,),
        dimension_numbers=_DN,
        feature_group_count=cfg.groups,
    )
    if cfg.bias:
        y = y + params["b"].astype(x.dtype)[None, :, None]
    return y


def _pad1d(x: jax.Array, left: int, right: int, mode: str) -> jax.Array:
    if left == 0 and right == 0:
        return x
    if mode == "constant":
        return jnp.pad(x, ((0, 0), (0, 0), (left, right)))
    return jnp.pad(x, ((0, 0), (0, 0), (left, right)), mode="edge")


def forward(cfg: ConvConfig, params: dict, x: jax.Array) -> jax.Array:
    """Full-sequence causal conv, matching reference forward (conv.rs:285-303)."""
    t = x.shape[-1]
    pt = cfg.padding_total
    n_frames = max(math.ceil((t + pt - cfg.k_eff) / cfg.stride) + 1, 1)
    ideal_len = (n_frames - 1) * cfg.stride + cfg.k_eff - pt
    extra = max(ideal_len - t, 0)
    x = _pad1d(x, pt, extra, cfg.pad_mode)
    return _conv(cfg, params, x)


def reset_state(state: dict, reset_mask: jax.Array) -> dict:
    """Per-slot reset of the conv carry (zeros + replicate-pad flag)."""
    out = {"buf": where_mask(reset_mask, jnp.zeros_like(state["buf"]), state["buf"])}
    if "first" in state:
        out["first"] = jnp.logical_or(state["first"], reset_mask)
    return out


def init_state(cfg: ConvConfig, batch: int, dtype=jnp.float32) -> dict:
    state = {"buf": jnp.zeros((batch, cfg.in_c, cfg.padding_total), dtype)}
    if cfg.pad_mode == "replicate" and cfg.padding_total > 0:
        state["first"] = jnp.ones((batch,), jnp.bool_)
    return state


def step(
    cfg: ConvConfig,
    params: dict,
    state: dict,
    x: jax.Array,
    mask: Optional[jax.Array] = None,
):
    """One streaming step over ``x (B, C, L)`` with L a multiple of stride.

    Returns ``(y (B, out_c, L/stride), state')``.  Slots where ``mask`` is
    False emit garbage (callers discard) and keep their carry unchanged.
    """
    if x.shape[-1] % cfg.stride != 0:
        raise ValueError(
            f"step length {x.shape[-1]} not a multiple of stride {cfg.stride}"
        )
    pt = cfg.padding_total
    if pt == 0:
        return _conv(cfg, params, x), state
    buf = state["buf"]
    if "first" in state:
        # Replicate left-padding: on the very first step the causal padding is
        # copies of the first sample, not zeros (conv.rs:318-327 + pad1d).
        rep = jnp.broadcast_to(x[..., :1], buf.shape)
        buf = jnp.where(state["first"][:, None, None], rep, buf)
    xs = jnp.concatenate([buf, x], axis=-1)
    y = _conv(cfg, params, xs)
    new_buf = xs[..., x.shape[-1] :]
    new_state = dict(state)
    if mask is None:
        new_state["buf"] = new_buf
        if "first" in state:
            new_state["first"] = jnp.zeros_like(state["first"])
    else:
        new_state["buf"] = where_mask(mask, new_buf, state["buf"])
        if "first" in state:
            new_state["first"] = jnp.logical_and(state["first"], ~mask)
    return y, new_state


# ---------------------------------------------------------------------------
# Transposed conv
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ConvTrConfig:
    in_c: int
    out_c: int
    k: int
    stride: int = 1
    groups: int = 1
    bias: bool = True

    @property
    def padding_total(self) -> int:
        return self.k - self.stride


def tr_init(cfg: ConvTrConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    wkey, bkey = jax.random.split(key)
    fan_in = cfg.in_c // cfg.groups * cfg.k
    scale = 1.0 / math.sqrt(fan_in)
    params = {
        "w": jax.random.uniform(
            wkey, (cfg.in_c, cfg.out_c // cfg.groups, cfg.k), dtype, -scale, scale
        )
    }
    if cfg.bias:
        params["b"] = jax.random.uniform(bkey, (cfg.out_c,), dtype, -scale, scale)
    return params


def _convtr_raw(cfg: ConvTrConfig, params: dict, x: jax.Array) -> jax.Array:
    """Transposed conv without bias: output length (T-1)*stride + k.

    Expressed as an input-dilated regular conv so XLA lowers it onto the MXU:
    dilate input by stride, full-pad, convolve with the time-flipped kernel
    (with in/out axes swapped).
    """
    w = params["w"].astype(x.dtype)  # (I, O/g, K)
    i, og, k = w.shape
    g = cfg.groups
    # -> (O, I/g, K) flipped: split groups, transpose within each group.
    w = w.reshape(g, i // g, og, k)
    w = jnp.flip(w, axis=-1).transpose(0, 2, 1, 3).reshape(g * og, i // g, k)
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(cfg.stride,),
        dimension_numbers=_DN,
        feature_group_count=g,
    )


def tr_forward(cfg: ConvTrConfig, params: dict, x: jax.Array) -> jax.Array:
    """Full causal transposed conv (trim right padding_total; conv.rs:425-441)."""
    y = _convtr_raw(cfg, params, x)
    if cfg.bias:
        y = y + params["b"].astype(x.dtype)[None, :, None]
    pt = cfg.padding_total
    return y[..., : y.shape[-1] - pt] if pt > 0 else y


def tr_init_state(cfg: ConvTrConfig, batch: int, dtype=jnp.float32) -> dict:
    # Carry is the bias-free overlap tail (K - S samples); the reference keeps
    # the biased tail and subtracts the bias on the next step (conv.rs:459-475)
    # — carrying the raw tail is equivalent and cheaper.
    return {"buf": jnp.zeros((batch, cfg.out_c, cfg.padding_total), dtype)}


def tr_step(
    cfg: ConvTrConfig,
    params: dict,
    state: dict,
    x: jax.Array,
    mask: Optional[jax.Array] = None,
):
    """One streaming step: ``x (B, C, L)`` → ``(y (B, out_c, L*stride), state')``."""
    l = x.shape[-1]
    raw = _convtr_raw(cfg, params, x)  # (B, O, (L-1)*S + K)
    pt = cfg.padding_total
    if pt > 0:
        raw = raw.at[..., :pt].add(state["buf"])
    out = raw[..., : l * cfg.stride]
    if cfg.bias:
        out = out + params["b"].astype(out.dtype)[None, :, None]
    new_state = state
    if pt > 0:
        new_buf = raw[..., l * cfg.stride :]
        if mask is not None:
            new_buf = where_mask(mask, new_buf, state["buf"])
        new_state = {"buf": new_buf}
    return out, new_state


# ---------------------------------------------------------------------------
# Learnt resampling (mimi.rs frame-rate bridge, conv.rs:504-606)
# ---------------------------------------------------------------------------


def downsample_cfg(stride: int, dim: int) -> ConvConfig:
    return ConvConfig(
        in_c=dim,
        out_c=dim,
        k=2 * stride,
        stride=stride,
        bias=False,
        pad_mode="replicate",
    )


def upsample_cfg(stride: int, dim: int) -> ConvTrConfig:
    return ConvTrConfig(
        in_c=dim, out_c=dim, k=2 * stride, stride=stride, groups=dim, bias=False
    )
