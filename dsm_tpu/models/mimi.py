"""Mimi neural audio codec, TPU-native.

Reference: moshi-core/src/mimi.rs (+ seanet.rs for the conv stacks).
24 kHz mono -> 12.5 Hz frames of n_q codebook ids (2048 bins each):

  encode:  SeaNet encoder (ratios 8*6*5*4 = x960) -> 25 Hz latents (d=512)
           -> 8-layer codec transformer (context 250, RoPE, layer-scale 0.01)
           -> learnt ConvDownsample x2 -> 12.5 Hz -> SplitRVQ codes
  decode:  the exact mirror.

TPU-first design: one 80 ms step is a *fixed-shape* program — 1920 samples
in, (B, n_q, 1) codes out — with every intermediate conv carry a static
buffer (see ops/conv.py) and the codec transformer consuming exactly 2 frames
per step.  The reference threads Option<Tensor> StreamTensors through the
same pipeline on the host (mimi.rs:195-225); here the whole codec step jits
into a single XLA program that the server batches over hundreds of streams.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import conv as C
from ..ops import rvq as Q
from ..ops import transformer as T


@dataclasses.dataclass(frozen=True)
class SeaNetConfig:
    """seanet::Config v0_1 (mimi.rs:33-52)."""

    dimension: int = 512
    channels: int = 1
    n_filters: int = 64
    n_residual_layers: int = 1
    ratios: Tuple[int, ...] = (8, 6, 5, 4)
    kernel_size: int = 7
    residual_kernel_size: int = 3
    last_kernel_size: int = 3
    dilation_base: int = 2
    compress: int = 2
    true_skip: bool = True


def codec_transformer_config() -> T.TransformerConfig:
    """The encoder/decoder bottleneck transformer (mimi.rs:53-80)."""
    return T.TransformerConfig(
        d_model=512,
        num_heads=8,
        num_layers=8,
        dim_feedforward=2048,
        context=250,
        gating=False,  # gating: None -> plain GELU MLP
        norm="layer_norm",
        positional_embedding="rope",
        max_period=10_000.0,
        layer_scale=0.01,
        max_seq_len=8192,
    )


@dataclasses.dataclass(frozen=True)
class MimiConfig:
    seanet: SeaNetConfig = SeaNetConfig()
    transformer: T.TransformerConfig = dataclasses.field(
        default_factory=codec_transformer_config
    )
    n_q: int = 16
    bins: int = 2048
    q_dim: int = 256
    sample_rate: float = 24_000.0
    frame_rate: float = 12.5

    @property
    def encoder_stride(self) -> int:
        s = 1
        for r in self.seanet.ratios:
            s *= r
        return s  # 960

    @property
    def encoder_frame_rate(self) -> float:
        return self.sample_rate / self.encoder_stride  # 25 Hz

    @property
    def downsample_stride(self) -> int:
        return int(self.encoder_frame_rate / self.frame_rate)  # 2

    @property
    def frame_size(self) -> int:
        return int(self.sample_rate / self.frame_rate)  # 1920

    @property
    def frames_per_step(self) -> int:
        return self.downsample_stride  # codec transformer sees 2 per step

    @property
    def rvq(self) -> Q.SplitRvqConfig:
        d = self.seanet.dimension
        return Q.SplitRvqConfig(
            dim=self.q_dim, input_dim=d, output_dim=d, n_q=self.n_q, bins=self.bins
        )


def v0_1(n_q: Optional[int] = None) -> MimiConfig:
    return MimiConfig(n_q=n_q or 16)


# ---------------------------------------------------------------------------
# SeaNet blocks (seanet.rs:34-151)
# ---------------------------------------------------------------------------


def _resblock_cfgs(cfg: SeaNetConfig, dim: int, j: int):
    hidden = dim // cfg.compress
    dil = cfg.dilation_base**j
    c1 = C.ConvConfig(dim, hidden, cfg.residual_kernel_size, dilation=dil)
    c2 = C.ConvConfig(hidden, dim, 1)
    return c1, c2


def _enc_layer_dims(cfg: SeaNetConfig):
    """Per-stage (dim, ratio) for the encoder: ratios are consumed reversed."""
    mult = 1
    out = []
    for ratio in reversed(cfg.ratios):
        out.append((mult * cfg.n_filters, ratio))
        mult *= 2
    return out, mult


def _resblock_init(cfg, dim, j, key):
    c1, c2 = _resblock_cfgs(cfg, dim, j)
    k1, k2 = jax.random.split(key)
    return {"b1": C.init(c1, k1), "b2": C.init(c2, k2)}


def _resblock_state(cfg, dim, j, batch):
    c1, c2 = _resblock_cfgs(cfg, dim, j)
    return {"b1": C.init_state(c1, batch), "b2": C.init_state(c2, batch)}


def _resblock_forward(cfg, dim, j, params, x):
    c1, c2 = _resblock_cfgs(cfg, dim, j)
    y = C.forward(c1, params["b1"], jax.nn.elu(x))
    y = C.forward(c2, params["b2"], jax.nn.elu(y))
    return x + y  # true_skip


def _resblock_step(cfg, dim, j, params, state, x, mask):
    c1, c2 = _resblock_cfgs(cfg, dim, j)
    y, s1 = C.step(c1, params["b1"], state["b1"], jax.nn.elu(x), mask)
    y, s2 = C.step(c2, params["b2"], state["b2"], jax.nn.elu(y), mask)
    return x + y, {"b1": s1, "b2": s2}


# ---------------------------------------------------------------------------
# SeaNet encoder (seanet.rs:160-303)
# ---------------------------------------------------------------------------


def _enc_cfgs(cfg: SeaNetConfig):
    dims, final_mult = _enc_layer_dims(cfg)
    init_cfg = C.ConvConfig(cfg.channels, cfg.n_filters, cfg.kernel_size)
    downs = [
        C.ConvConfig(dim, dim * 2, k=ratio * 2, stride=ratio) for dim, ratio in dims
    ]
    final_cfg = C.ConvConfig(
        final_mult * cfg.n_filters, cfg.dimension, cfg.last_kernel_size
    )
    return init_cfg, dims, downs, final_cfg


def encoder_init(cfg: SeaNetConfig, key: jax.Array) -> dict:
    init_cfg, dims, downs, final_cfg = _enc_cfgs(cfg)
    keys = jax.random.split(key, 2 + 2 * len(dims))
    layers = []
    for i, (dim, _ratio) in enumerate(dims):
        res = [
            _resblock_init(cfg, dim, j, jax.random.fold_in(keys[2 + 2 * i], j))
            for j in range(cfg.n_residual_layers)
        ]
        layers.append({"res": res, "down": C.init(downs[i], keys[3 + 2 * i])})
    return {
        "init": C.init(init_cfg, keys[0]),
        "layers": layers,
        "final": C.init(final_cfg, keys[1]),
    }


def encoder_state(cfg: SeaNetConfig, batch: int) -> dict:
    init_cfg, dims, downs, final_cfg = _enc_cfgs(cfg)
    layers = []
    for i, (dim, _ratio) in enumerate(dims):
        res = [
            _resblock_state(cfg, dim, j, batch)
            for j in range(cfg.n_residual_layers)
        ]
        layers.append({"res": res, "down": C.init_state(downs[i], batch)})
    return {
        "init": C.init_state(init_cfg, batch),
        "layers": layers,
        "final": C.init_state(final_cfg, batch),
    }


def encoder_forward(cfg: SeaNetConfig, params: dict, x: jax.Array) -> jax.Array:
    init_cfg, dims, downs, final_cfg = _enc_cfgs(cfg)
    x = C.forward(init_cfg, params["init"], x)
    for i, (dim, _ratio) in enumerate(dims):
        for j in range(cfg.n_residual_layers):
            x = _resblock_forward(cfg, dim, j, params["layers"][i]["res"][j], x)
        x = C.forward(downs[i], params["layers"][i]["down"], jax.nn.elu(x))
    return C.forward(final_cfg, params["final"], jax.nn.elu(x))


def encoder_step(cfg: SeaNetConfig, params, state, x, mask=None):
    init_cfg, dims, downs, final_cfg = _enc_cfgs(cfg)
    x, s_init = C.step(init_cfg, params["init"], state["init"], x, mask)
    new_layers = []
    for i, (dim, _ratio) in enumerate(dims):
        lp, ls = params["layers"][i], state["layers"][i]
        new_res = []
        for j in range(cfg.n_residual_layers):
            x, sr = _resblock_step(cfg, dim, j, lp["res"][j], ls["res"][j], x, mask)
            new_res.append(sr)
        x, sd = C.step(downs[i], lp["down"], ls["down"], jax.nn.elu(x), mask)
        new_layers.append({"res": new_res, "down": sd})
    x, s_final = C.step(final_cfg, params["final"], state["final"], jax.nn.elu(x), mask)
    return x, {"init": s_init, "layers": new_layers, "final": s_final}


# ---------------------------------------------------------------------------
# SeaNet decoder (seanet.rs:312-468)
# ---------------------------------------------------------------------------


def _dec_cfgs(cfg: SeaNetConfig):
    mult = 1 << len(cfg.ratios)
    init_cfg = C.ConvConfig(cfg.dimension, mult * cfg.n_filters, cfg.kernel_size)
    ups, res_dims = [], []
    for ratio in cfg.ratios:
        ups.append(
            C.ConvTrConfig(
                mult * cfg.n_filters, mult * cfg.n_filters // 2, k=ratio * 2,
                stride=ratio,
            )
        )
        res_dims.append(mult * cfg.n_filters // 2)
        mult //= 2
    final_cfg = C.ConvConfig(cfg.n_filters, cfg.channels, cfg.last_kernel_size)
    return init_cfg, ups, res_dims, final_cfg


def decoder_init(cfg: SeaNetConfig, key: jax.Array) -> dict:
    init_cfg, ups, res_dims, final_cfg = _dec_cfgs(cfg)
    keys = jax.random.split(key, 2 + 2 * len(ups))
    layers = []
    for i in range(len(ups)):
        res = [
            _resblock_init(cfg, res_dims[i], j, jax.random.fold_in(keys[2 + 2 * i], j))
            for j in range(cfg.n_residual_layers)
        ]
        layers.append({"up": C.tr_init(ups[i], keys[3 + 2 * i]), "res": res})
    return {
        "init": C.init(init_cfg, keys[0]),
        "layers": layers,
        "final": C.init(final_cfg, keys[1]),
    }


def decoder_state(cfg: SeaNetConfig, batch: int) -> dict:
    init_cfg, ups, res_dims, final_cfg = _dec_cfgs(cfg)
    layers = []
    for i in range(len(ups)):
        res = [
            _resblock_state(cfg, res_dims[i], j, batch)
            for j in range(cfg.n_residual_layers)
        ]
        layers.append({"up": C.tr_init_state(ups[i], batch), "res": res})
    return {
        "init": C.init_state(init_cfg, batch),
        "layers": layers,
        "final": C.init_state(final_cfg, batch),
    }


def decoder_forward(cfg: SeaNetConfig, params: dict, x: jax.Array) -> jax.Array:
    init_cfg, ups, res_dims, final_cfg = _dec_cfgs(cfg)
    x = C.forward(init_cfg, params["init"], x)
    for i in range(len(ups)):
        x = C.tr_forward(ups[i], params["layers"][i]["up"], jax.nn.elu(x))
        for j in range(cfg.n_residual_layers):
            x = _resblock_forward(cfg, res_dims[i], j, params["layers"][i]["res"][j], x)
    return C.forward(final_cfg, params["final"], jax.nn.elu(x))


def decoder_step(cfg: SeaNetConfig, params, state, x, mask=None):
    init_cfg, ups, res_dims, final_cfg = _dec_cfgs(cfg)
    x, s_init = C.step(init_cfg, params["init"], state["init"], x, mask)
    new_layers = []
    for i in range(len(ups)):
        lp, ls = params["layers"][i], state["layers"][i]
        x, su = C.tr_step(ups[i], lp["up"], ls["up"], jax.nn.elu(x), mask)
        new_res = []
        for j in range(cfg.n_residual_layers):
            x, sr = _resblock_step(
                cfg, res_dims[i], j, lp["res"][j], ls["res"][j], x, mask
            )
            new_res.append(sr)
        new_layers.append({"up": su, "res": new_res})
    x, s_final = C.step(final_cfg, params["final"], state["final"], jax.nn.elu(x), mask)
    return x, {"init": s_init, "layers": new_layers, "final": s_final}


# ---------------------------------------------------------------------------
# Full codec (mimi.rs:96-245)
# ---------------------------------------------------------------------------


def init(cfg: MimiConfig, key: jax.Array) -> dict:
    keys = jax.random.split(key, 7)
    d = cfg.seanet.dimension
    s = cfg.downsample_stride
    return {
        "encoder": encoder_init(cfg.seanet, keys[0]),
        "decoder": decoder_init(cfg.seanet, keys[1]),
        "encoder_transformer": T.init(cfg.transformer, keys[2]),
        "decoder_transformer": T.init(cfg.transformer, keys[3]),
        "downsample": C.init(C.downsample_cfg(s, d), keys[4]),
        "upsample": C.tr_init(C.upsample_cfg(s, d), keys[5]),
        "quantizer": Q.split_init(cfg.rvq, keys[6]),
    }


def init_encode_state(cfg: MimiConfig, batch: int, dtype=jnp.float32) -> dict:
    """``dtype`` sets both the KV caches and the conv carry buffers — the
    conv compute dtype follows its inputs, so carries must match."""
    return {
        "enc": jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
            encoder_state(cfg.seanet, batch),
        ),
        "enc_t": T.init_state(
            cfg.transformer, batch, dtype, step_t=cfg.frames_per_step
        ),
        "down": C.init_state(
            C.downsample_cfg(cfg.downsample_stride, cfg.seanet.dimension),
            batch, dtype=dtype,
        ),
    }


def init_decode_state(cfg: MimiConfig, batch: int, dtype=jnp.float32) -> dict:
    return {
        "up": C.tr_init_state(
            C.upsample_cfg(cfg.downsample_stride, cfg.seanet.dimension),
            batch, dtype=dtype,
        ),
        "dec_t": T.init_state(
            cfg.transformer, batch, dtype, step_t=cfg.frames_per_step
        ),
        "dec": jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
            decoder_state(cfg.seanet, batch),
        ),
    }


def _tree_conv_reset(state, reset_mask):
    """Recursively reset every conv carry dict in a SeaNet state tree."""
    if isinstance(state, dict) and "buf" in state:
        return C.reset_state(state, reset_mask)
    if isinstance(state, dict):
        return {k: _tree_conv_reset(v, reset_mask) for k, v in state.items()}
    if isinstance(state, list):
        return [_tree_conv_reset(v, reset_mask) for v in state]
    return state


def reset_encode_state(state: dict, reset_mask) -> dict:
    """Per-slot reset (mimi.rs:236-244) without touching KV buffers."""
    return {
        "enc": _tree_conv_reset(state["enc"], reset_mask),
        "enc_t": T.reset_state(state["enc_t"], reset_mask),
        "down": C.reset_state(state["down"], reset_mask),
    }


def reset_decode_state(state: dict, reset_mask) -> dict:
    return {
        "up": C.reset_state(state["up"], reset_mask),
        "dec_t": T.reset_state(state["dec_t"], reset_mask),
        "dec": _tree_conv_reset(state["dec"], reset_mask),
    }


def encode_step(cfg: MimiConfig, params, state, pcm, mask=None):
    """One 80 ms codec step: ``pcm (B, 1, 1920)`` -> ``codes (B, n_q, 1)``."""
    x, s_enc = encoder_step(cfg.seanet, params["encoder"], state["enc"], pcm, mask)
    # (B, D, 2) -> transformer layout (B, 2, D)  [conv_layout=true]
    xt, s_t = T.step(
        cfg.transformer,
        params["encoder_transformer"],
        state["enc_t"],
        x.transpose(0, 2, 1),
        mask,
    )
    x = xt.transpose(0, 2, 1)
    x, s_down = C.step(
        C.downsample_cfg(cfg.downsample_stride, cfg.seanet.dimension),
        params["downsample"],
        state["down"],
        x,
        mask,
    )
    codes = Q.split_encode(cfg.rvq, params["quantizer"], x)
    return codes, {"enc": s_enc, "enc_t": s_t, "down": s_down}


def decode_step(cfg: MimiConfig, params, state, codes, mask=None):
    """codes ``(B, n_q, 1)`` -> ``pcm (B, 1, 1920)``."""
    emb = Q.split_decode(cfg.rvq, params["quantizer"], codes)
    x, s_up = C.tr_step(
        C.upsample_cfg(cfg.downsample_stride, cfg.seanet.dimension),
        params["upsample"],
        state["up"],
        emb,
        mask,
    )
    xt, s_t = T.step(
        cfg.transformer,
        params["decoder_transformer"],
        state["dec_t"],
        x.transpose(0, 2, 1),
        mask,
    )
    x = xt.transpose(0, 2, 1)
    pcm, s_dec = decoder_step(cfg.seanet, params["decoder"], state["dec"], x, mask)
    return pcm, {"up": s_up, "dec_t": s_t, "dec": s_dec}


def encode_pre_quantize(cfg: MimiConfig, params, pcm: jax.Array) -> jax.Array:
    """Offline encode without quantisation (speaker encoder; mimi.rs:177-183)."""
    x = encoder_forward(cfg.seanet, params["encoder"], pcm)
    x = T.forward(cfg.transformer, params["encoder_transformer"], x.transpose(0, 2, 1))
    x = x.transpose(0, 2, 1)
    return C.forward(
        C.downsample_cfg(cfg.downsample_stride, cfg.seanet.dimension),
        params["downsample"],
        x,
    )


def encode(cfg: MimiConfig, params, pcm: jax.Array) -> jax.Array:
    """Offline full-sequence encode (mimi.rs:185-193)."""
    x = encode_pre_quantize(cfg, params, pcm)
    return Q.split_encode(cfg.rvq, params["quantizer"], x)


def decode(cfg: MimiConfig, params, codes: jax.Array) -> jax.Array:
    """Offline full-sequence decode (mimi.rs:208-215)."""
    emb = Q.split_decode(cfg.rvq, params["quantizer"], codes)
    x = C.tr_forward(
        C.upsample_cfg(cfg.downsample_stride, cfg.seanet.dimension),
        params["upsample"],
        emb,
    )
    x = T.forward(cfg.transformer, params["decoder_transformer"], x.transpose(0, 2, 1))
    return decoder_forward(cfg.seanet, params["decoder"], x.transpose(0, 2, 1))
