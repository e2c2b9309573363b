"""Streaming decoder transformer, TPU-native.

Functional rebuild of the reference StreamingTransformer
(moshi-core/src/transformer.rs:816-1031) and its batched variant
(batched_transformer.rs): pre-norm blocks with RoPE/Sin/no positional
embedding, sliding-window self-attention over a fixed ring KV cache, optional
cross-attention with gating, gated (SiLU-GLU) or GELU MLP, optional layer
scale.

TPU-first choices:
  * Layers are homogeneous → per-layer params are stacked on a leading axis
    and the step scans over them with ``lax.scan`` (one compiled layer body,
    compile time O(1) in depth — the reference loops over layer objects).
  * The ring write/read plan (positions, scatter indices, validity window) is
    computed once per step and shared by all layers.
  * Per-slot stream masking and reset are ``jnp.where`` arithmetic on the
    position counters; nothing ever changes shape.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import attention as attn
from . import mlp as mlp_mod
from . import norm as norm_mod
from . import decode_attn as dattn
from . import qmm as qmm_mod
from . import ring_kernels as rkern


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    d_model: int
    num_heads: int
    num_layers: int
    dim_feedforward: int
    context: int
    gating: bool = True  # SiLU GLU if True else GELU MLP
    norm: str = "rms_norm"  # "rms_norm" | "layer_norm"
    positional_embedding: str = "rope"  # "rope" | "sin" | "none"
    max_period: float = 10_000.0
    bias_ff: bool = False
    bias_attn: bool = False
    layer_scale: Optional[float] = None
    head_dim: Optional[int] = None
    cross_attention: bool = False
    ca_gating: str = "normal"  # "normal" | "constant_tanh" | "conditional_*"
    ca_dim: Optional[int] = None  # source dim for cross-attn KV proj
    ca_norm: Optional[str] = None  # norm_cross kind; None -> same as `norm`
    max_seq_len: int = 4096
    # Tensor-parallel mesh axis (shard_map tp): when set, this config
    # describes the PER-SHARD transformer (num_heads = global/tp, head_dim
    # pinned, MLP hidden sliced) and the residual joins psum partial
    # projections over the axis (parallel/mesh.dp_tp_shard_step).  None =
    # single-device / replicated semantics (the depformer and codec
    # transformers always run with None).
    tp_axis: Optional[str] = None

    @property
    def hd(self) -> int:
        return self.head_dim or self.d_model // self.num_heads

    @property
    def norm_kind(self) -> str:
        return self.norm


def _linear_init(key, in_d, out_d, dtype):
    scale = 1.0 / math.sqrt(in_d)
    return jax.random.uniform(key, (out_d, in_d), dtype, -scale, scale)


def init(cfg: TransformerConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    """Init stacked layer params: every leaf has leading axis num_layers."""

    def one_layer(k):
        ks = jax.random.split(k, 8)
        d, h, hd = cfg.d_model, cfg.num_heads, cfg.hd
        p = {
            "in_proj_w": _linear_init(ks[0], d, 3 * h * hd, dtype),
            "out_proj_w": _linear_init(ks[1], h * hd, d, dtype),
            "norm1": norm_mod.norm_init(cfg.norm_kind, d, dtype),
            "norm2": norm_mod.norm_init(cfg.norm_kind, d, dtype),
            "mlp": mlp_mod.init(ks[2], d, cfg.dim_feedforward, cfg.gating, dtype),
        }
        if cfg.bias_attn:
            p["in_proj_b"] = jnp.zeros((3 * h * hd,), dtype)
            p["out_proj_b"] = jnp.zeros((d,), dtype)
        if cfg.layer_scale is not None:
            p["layer_scale_1"] = jnp.full((d,), cfg.layer_scale, dtype)
            p["layer_scale_2"] = jnp.full((d,), cfg.layer_scale, dtype)
        if cfg.cross_attention:
            ca_dim = cfg.ca_dim or d
            p["norm_cross"] = norm_mod.norm_init(cfg.ca_norm or cfg.norm_kind, d, dtype)
            p["ca_q_w"] = _linear_init(ks[3], d, h * hd, dtype)
            p["ca_kv_w"] = _linear_init(ks[4], ca_dim, 2 * h * hd, dtype)
            p["ca_out_w"] = _linear_init(ks[5], h * hd, d, dtype)
            if cfg.ca_gating.startswith("constant"):
                p["ca_gate_alpha"] = jnp.zeros((1,), dtype)
            elif cfg.ca_gating.startswith("conditional"):
                hidden = int(0.125 * d)
                p["ca_gate_in_w"] = _linear_init(ks[6], d, hidden, dtype)
                p["ca_gate_out_w"] = _linear_init(ks[7], hidden, d, dtype)
        return p

    keys = jax.random.split(key, cfg.num_layers)
    return jax.vmap(one_layer)(keys)


def init_state(
    cfg: TransformerConfig,
    batch: int,
    cache_dtype=jnp.bfloat16,
    step_t: int = 1,
    kv_quant: bool = False,
    kv_bits: int = 8,
) -> dict:
    """Streaming state: per-layer KV rings + global tick + validity bitmap.

    * Rings are sized ``context + step_t - 1`` so a step_t-frame append never
      evicts keys still visible to the step's first query (the reference
      keeps ``context + t`` entries; transformer.rs:497-506).
    * ``pos`` is a single global tick counter shared by all slots; per-slot
      lifecycle lives in the ``valid (B, cap)`` bitmap.  KV writes are then
      scalar-indexed dynamic_update_slices (in-place), never scatters.
    * Per-layer caches are separate arrays (not stacked) so XLA can alias
      every update without copying the stack.
    * ``kv_quant`` stores the rings as int8 with per-row f32 scales — half
      the HBM traffic on the serving hot path; scales fold into the
      attention post-scaling (ops/attention.attend_global_split_q).
    """
    h, hd = cfg.num_heads, cfg.hd
    cap = cfg.context + step_t - 1
    # Round capacity up so a fixed-cadence stream always appends a
    # contiguous, non-wrapping block (multiple of step_t — keeps the KV
    # update a single in-place slice, see attention.ring_write_global) that
    # is also aligned for the Pallas ring-commit kernel's row blocks
    # (ops/ring_kernels.py: 32 sublane rows for int8 K/V, 128 lane slots for
    # the f32 scale rings).  Extra rows just stay invalid one lap longer.
    align = 128 if kv_quant else 32
    assert align % step_t == 0, (align, step_t)
    if cap % align:
        cap += align - cap % align
    layers = []
    # kv_bits=4 (opt-in): int4 values nibble-packed into uint8 (Dh/2 bytes
    # per row; attention.pack4) — halves the ring read again vs int8.
    # Packed-uint8 (not jnp.int4) because int4 arrays cannot cross jit
    # boundaries on this environment's backend, and the ring state does so
    # every serving step.  Quality bound: tests/test_kv_int4.py.
    assert kv_bits in (8, 4)
    kv_shape = (batch, h, cap, hd if kv_bits == 8 else hd // 2)
    qdt = jnp.int8 if kv_bits == 8 else jnp.uint8
    for _ in range(cfg.num_layers):
        if kv_quant:
            layers.append(
                {
                    "k": jnp.zeros(kv_shape, qdt),
                    "v": jnp.zeros(kv_shape, qdt),
                    "ks": jnp.zeros((batch, h, cap), jnp.float32),
                    "vs": jnp.zeros((batch, h, cap), jnp.float32),
                }
            )
        else:
            layers.append(
                {
                    "k": jnp.zeros((batch, h, cap, hd), cache_dtype),
                    "v": jnp.zeros((batch, h, cap, hd), cache_dtype),
                }
            )
    return {
        "layers": layers,
        "pos": jnp.zeros((), jnp.int32),
        "valid": jnp.zeros((batch, cap), bool),
    }


def reset_state(state: dict, reset_mask: jax.Array) -> dict:
    """Per-slot reset: clear the slot's validity bitmap row.

    The KV buffers and the global tick are untouched — stale entries stay
    masked until overwritten.  This is the reference's reset_batch_idx
    (kv_cache.rs:111-117) at (B, C)-bool HBM cost.
    """
    return {
        "layers": state["layers"],
        "pos": state["pos"],
        "valid": jnp.where(reset_mask[:, None], False, state["valid"]),
    }


def mm(x: jax.Array, w, site: str = None) -> jax.Array:
    """x @ w.T where ``w`` is either a dense array or a weight-only int8
    dict ``{"q": int8 (O, I), "s": f32 (O,)}`` with per-output-channel
    scales (see :func:`quantize_weights`).

    ``site``: matmul identity for the mixed-profile W8A8 site filter
    (ops/qmm.set_w8a8_sites)."""
    if isinstance(w, dict) and "q" in w:
        if qmm_mod.w8a8_enabled(site):
            # Native int8 MXU dots (W8A8): no bf16 weight-dequant
            # materialisation, 2x MXU rate (ops/qmm.py mm_w8a8).
            return qmm_mod.mm_w8a8(x, w["q"], w["s"])
        if qmm_mod.qmm_enabled() and qmm_mod.supported(x, w["q"]):
            # Fused on-chip dequant (ops/qmm.py): the int8 weight is read
            # once — XLA's lowering materialises a dequantised bf16 copy
            # in HBM first (~3.2 GB/step extra traffic at stt-1b B=128).
            return qmm_mod.qmm(x, w["q"], w["s"])
        y = x @ w["q"].astype(x.dtype).T
        return y * w["s"].astype(x.dtype)
    return x @ w.astype(x.dtype).T


def mm_dequant(x: jax.Array, w) -> jax.Array:
    """x @ w.T forcing the plain weight-dequant path, ignoring the W8A8
    env gate.  For one-time precompute (voice-CA projection) W8A8's
    per-row activation quant buys nothing and its f32/int32 intermediates
    at source length S x 2*H*Dh x L OOM the chip next to a live serving
    state; the amortised dequant matmul is the right tool there."""
    if isinstance(w, dict) and "q" in w:
        y = x @ w["q"].astype(x.dtype).T
        return y * w["s"].astype(x.dtype)
    return x @ w.astype(x.dtype).T


def quantize_weights(tree, min_size: int = 1 << 16):
    """Weight-only int8 quantisation of matmul weights in a param tree.

    Matrix leaves (ndim >= 2, larger than ``min_size`` elements) become
    ``{"q": int8, "s": f32 per-output-channel}``; norms, biases, scales and
    embedding tables are left dense (embeddings are gathered, not
    matmul'd).  Halves the weight HBM read per step.

    Idempotent: already-quantised ``{"q", "s"}`` subtrees pass through
    unchanged, so callers may pre-quantise (and free the full-precision
    originals — at s2s-2b shapes they are 6.6 GB of live HBM) before
    handing params to an engine that quantises on construction.
    """
    import numpy as np

    def _is_q(x):
        return isinstance(x, dict) and "q" in x and "s" in x

    def quant(path, leaf):
        if _is_q(leaf):
            return leaf
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if (
            leaf.ndim < 2
            or leaf.size < min_size
            or "emb" in name  # embedding tables: gathers stay dense
            or "layer_scale" in name
            or "alpha" in name
        ):
            return leaf
        w = np.asarray(leaf, np.float32)
        s = np.max(np.abs(w), axis=-1, keepdims=True) / 127.0
        s = np.maximum(s, 1e-12)
        q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        return {"q": jnp.asarray(q), "s": jnp.asarray(s[..., 0], jnp.float32)}

    return jax.tree_util.tree_map_with_path(quant, tree, is_leaf=_is_q)


def _qkv(cfg, lp, x):
    b, t, _ = x.shape
    h, hd = cfg.num_heads, cfg.hd
    qkv = mm(x, lp["in_proj_w"], site="in_proj")
    if "in_proj_b" in lp:
        qkv = qkv + lp["in_proj_b"].astype(x.dtype)
    qkv = qkv.reshape(b, t, 3, h, hd)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    return q, k, v


def _proj_out(cfg, lp, y, b, t):
    y = y.transpose(0, 2, 1, 3).reshape(b, t, cfg.num_heads * cfg.hd)
    y = mm(y, lp["out_proj_w"], site="out_proj")
    if cfg.tp_axis:
        # Row-parallel output projection: shards hold partial sums over
        # their head slice; reduce BEFORE the (replicated) bias.
        y = jax.lax.psum(y, cfg.tp_axis)
    if "out_proj_b" in lp:
        y = y + lp["out_proj_b"].astype(y.dtype)
    return y


def _ca_gate(cfg, lp, x_normed, y):
    if cfg.ca_gating == "normal":
        return y
    if cfg.ca_gating.startswith("constant"):
        a = lp["ca_gate_alpha"].astype(jnp.float32)
        a = jnp.tanh(a) if "tanh" in cfg.ca_gating else jax.nn.sigmoid(a - 4.0)
        return y * a.astype(y.dtype)
    h = jax.nn.relu(x_normed @ lp["ca_gate_in_w"].astype(y.dtype).T)
    a = h @ lp["ca_gate_out_w"].astype(y.dtype).T
    if "tanh" in cfg.ca_gating:
        a = jnp.tanh(a)
    elif "learnable_bias" in cfg.ca_gating:
        a = jax.nn.sigmoid(a)
    else:
        a = jax.nn.sigmoid(a - 4.0)
    return y * a


def _cross_block(cfg, lp, x, ca_k, ca_v, ca_q=None):
    """``ca_q``: optional int8-quantised source layer
    ``{"k","v" int8, "ks","vs" f32, "s_len"}`` (precompute_ca_kv quant=True);
    takes precedence over ``ca_k/ca_v``."""
    b, t, _ = x.shape
    xn = norm_mod.apply_norm(cfg.ca_norm or cfg.norm_kind, lp["norm_cross"], x)
    q = mm(xn, lp["ca_q_w"], site="ca_q")
    q = q.reshape(b, t, cfg.num_heads, cfg.hd).transpose(0, 2, 1, 3)
    if ca_q is not None:
        if (
            dattn.decode_attn_enabled()
            and t == 1
            and dattn.ca_supported(q, ca_q["k"])
        ):
            y = dattn.ca_decode_attend(
                q, ca_q["k"], ca_q["v"], ca_q["ks"], ca_q["vs"], ca_q["s_len"]
            )
        else:
            y = attn.cross_attend_q(
                q, ca_q["k"], ca_q["v"], ca_q["ks"], ca_q["vs"], ca_q["s_len"]
            )
    else:
        y = attn.cross_attend(q, ca_k, ca_v)
    y = y.transpose(0, 2, 1, 3).reshape(b, t, cfg.num_heads * cfg.hd)
    y = mm(y, lp["ca_out_w"], site="ca_out")
    if cfg.tp_axis:
        # The gate is computed from the replicated xn, so gating commutes
        # with the reduction; reduce first to gate a replicated value.
        y = jax.lax.psum(y, cfg.tp_axis)
    return x + _ca_gate(cfg, lp, xn, y)


def _mlp_block(cfg, lp, x):
    y = norm_mod.apply_norm(cfg.norm_kind, lp["norm2"], x)
    y = mlp_mod.apply(lp["mlp"], y)
    if cfg.tp_axis:
        # Row-parallel linear_out partials over the hidden slice.
        y = jax.lax.psum(y, cfg.tp_axis)
    if "layer_scale_2" in lp:
        y = y * lp["layer_scale_2"].astype(y.dtype)
    return x + y


def precompute_ca_kv(
    cfg: TransformerConfig, params: dict, ca_tokens: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Project a cross-attention source once per session.

    ``ca_tokens (B, S, ca_dim)`` -> stacked per-layer K/V ``(L, B, H, S, Dh)``
    (the reference caches this as CaSrc::KeysValues; transformer.rs:961-980).
    """
    b, s, _ = ca_tokens.shape
    h, hd = cfg.num_heads, cfg.hd

    def proj(ca_kv_w):
        kv = mm_dequant(ca_tokens, ca_kv_w)
        kv = kv.reshape(b, s, 2, h, hd)
        return kv[:, :, 0].transpose(0, 2, 1, 3), kv[:, :, 1].transpose(0, 2, 1, 3)

    # Sequential over layers (lax.map, not vmap): the projection runs once
    # per session/voice, so peak memory — one layer's (B, S, 2*H*Dh)
    # intermediates instead of all L at once (~5 GB at B=64 flagship TTS,
    # which OOM'd next to a live serving state) — matters and latency does
    # not.
    return jax.lax.map(proj, params["ca_kv_w"])


def quantize_ca_kv(ca_kv, s_len: Optional[int] = None) -> dict:
    """Quantise a precomputed CA source to int8 with per-row scales.

    The voice-conditioning KV is the dominant TTS attention read (16 layers
    x 625 source rows of bf16 at dsm-tts-1.6b shapes); int8 halves it and
    the fused kernel (ops/decode_attn.ca_decode_attend) reads it once.
    Source rows are zero-padded up to a 128 multiple (int8 lane tiles);
    ``s_len`` marks the real length, padding is masked in the attention.
    """
    k, v = ca_kv
    s = k.shape[3]
    s_len = s if s_len is None else s_len
    pad = (-s) % 128
    if pad:
        cfgpad = [(0, 0)] * k.ndim
        cfgpad[3] = (0, pad)
        k = jnp.pad(k, cfgpad)
        v = jnp.pad(v, cfgpad)

    def quant(x):  # per (L,B,H,S) row over Dh
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        q = jnp.clip(
            jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
        ).astype(jnp.int8)
        return q, scale

    kq, ks = quant(k)
    vq, vs = quant(v)
    return {"k": kq, "v": vq, "ks": ks, "vs": vs,
            "s_len": jnp.int32(s_len)}


def _pos_embed_sin(cfg, x, positions):
    # PositionalEmbedding::Sin (transformer.rs:940-953): concat(cos, sin).
    c = x.shape[-1]
    half = c // 2
    idx = jnp.arange(half, dtype=jnp.float32)
    inv_freq = 1.0 / (cfg.max_period ** (idx / (half - 1)))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    emb = jnp.concatenate([jnp.cos(freqs), jnp.sin(freqs)], axis=-1)
    return x + emb.astype(x.dtype)


def step(
    cfg: TransformerConfig,
    params: dict,
    state: dict,
    x: jax.Array,
    mask: Optional[jax.Array] = None,
    ca_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
):
    """One streaming step: ``x (B, T, D)`` -> ``(y (B, T, D), state')``.

    T is the (static) number of new frames this step (1 for the LM, 2 for the
    Mimi codec transformer).  ``ca_kv`` is the stacked per-layer
    cross-attention KV from :func:`precompute_ca_kv`.

    Layers are unrolled in Python over per-layer cache dicts: every KV
    append is a scalar-indexed in-place update on its own buffer, which XLA
    aliases without copies (a scan carrying the stacked caches would
    materialise the whole multi-GB stack every step).
    """
    b, t, _ = x.shape
    capacity = state["layers"][0]["k"].shape[2]
    plan = attn.global_ring_plan(state["pos"], capacity, t)
    valid_old = state["valid"]
    valid = attn.update_valid_bitmap(valid_old, plan, mask)

    q_pos_b = jnp.broadcast_to(plan["q_pos"][None, :], (b, t))
    rope = None
    if cfg.positional_embedding == "rope":
        rope = attn.rope_cos_sin(q_pos_b, cfg.hd, cfg.max_period)
    elif cfg.positional_embedding == "sin":
        x = _pos_embed_sin(cfg, x, q_pos_b)

    kv_quant = "ks" in state["layers"][0]
    new_layers = []
    for l in range(cfg.num_layers):
        lp = jax.tree_util.tree_map(lambda a: a[l], params)
        layer_st = state["layers"][l]
        k_l, v_l = layer_st["k"], layer_st["v"]
        xn = norm_mod.apply_norm(cfg.norm_kind, lp["norm1"], x)
        q, k, v = _qkv(cfg, lp, xn)
        if rope is not None:
            q = attn.apply_rope(q, *rope)
            k = attn.apply_rope(k, *rope)
        # Split attention: read the OLD ring + fresh K/V; the ring update
        # below then has the state carry as its only consumer, so XLA keeps
        # it in place instead of copying the cache (see attend_global_split).
        # Two orderings, bitwise-identical results (the rows written this
        # step are masked out of the cache read either way — the fresh K/V
        # attend separately in exact dtype):
        #  * Pallas kernel: COMMIT first, then attend over the kernel's
        #    *output* — the carry-in cache then has exactly one consumer
        #    (the aliased kernel), so XLA keeps it in place; reading the
        #    carry-in alongside an aliased custom call makes XLA
        #    copy-protect the whole ring (~400 MB/layer at stt-1b B=128).
        #  * XLA DUS: attend the OLD ring first, update after — here it's
        #    the reverse order that keeps the update in place
        #    (attend_global_split docstring).
        if kv_quant:
            packed4 = k_l.dtype == jnp.uint8  # nibble-packed int4 profile
            if packed4:
                kq, vq, ks_new, vs_new = attn.quantize_kv_rows_packed4(k, v)
            else:
                kq, vq, ks_new, vs_new = attn.quantize_kv_rows(
                    k, v, dtype=k_l.dtype
                )
            if (
                not packed4
                and dattn.fused_commit_enabled()
                and rkern.ring_kernel_enabled()
                and dattn.decode_attn_enabled()
                and dattn.fused_commit_supported(q, k_l, plan)
                and rkern.scale_commit_supported(layer_st["ks"], ks_new)
            ):
                # Fused commit+attend (VERDICT r4 #2): scales commit first
                # (their only consumer -> in-place), then one kernel both
                # attends and writes the int8 fresh row into the ring
                # (rings aliased, single consumer -> in-place, no separate
                # commit launch).  Bitwise-identical to the split path.
                ks, vs = rkern.scale_commit(
                    layer_st["ks"], layer_st["vs"], ks_new, vs_new,
                    plan["w"][0],
                )
                y, k_l, v_l = dattn.decode_attend_commit(
                    q, k_l, v_l, ks, vs, kq, vq, k, v, plan, valid_old,
                    window=cfg.context,
                )
            elif rkern.ring_kernel_enabled() and rkern.supported(k_l, kq, True):
                k_l, v_l, ks, vs = rkern.ring_commit(
                    k_l, v_l, kq, vq, plan["w"][0],
                    layer_st["ks"], layer_st["vs"], ks_new, vs_new,
                )
                if dattn.decode_attn_enabled() and dattn.supported(
                    q, k_l, plan
                ):  # int8 or packed-int4 (decode_attend dispatches)
                    # Fully fused decode attention: int8 dequant + masked
                    # softmax + both dots in one Pallas pass — the ring is
                    # read once as int8 (the XLA dots materialise bf16
                    # dequant copies; ops/decode_attn.py).
                    y = dattn.decode_attend(
                        q, k_l, v_l, ks, vs, k, v, plan, valid_old,
                        window=cfg.context,
                    )
                else:
                    att = (attn.attend_global_split_q4 if packed4
                           else attn.attend_global_split_q)
                    y = att(
                        q, k_l, v_l, ks, vs, k, v, plan, valid_old,
                        window=cfg.context,
                    )
            else:
                att = (attn.attend_global_split_q4 if packed4
                       else attn.attend_global_split_q)
                y = att(
                    q, k_l, v_l, layer_st["ks"], layer_st["vs"], k, v, plan,
                    valid_old, window=cfg.context,
                )
                k_l, v_l = attn.ring_write_global(k_l, v_l, kq, vq, plan)
                ks, vs = layer_st["ks"], layer_st["vs"]
                for ti in range(t):
                    ks = jax.lax.dynamic_update_slice_in_dim(
                        ks, ks_new[:, :, ti : ti + 1], plan["w"][ti], axis=2
                    )
                    vs = jax.lax.dynamic_update_slice_in_dim(
                        vs, vs_new[:, :, ti : ti + 1], plan["w"][ti], axis=2
                    )
            new_layers.append({"k": k_l, "v": v_l, "ks": ks, "vs": vs})
        else:
            if rkern.ring_kernel_enabled() and rkern.supported(k_l, k, False):
                k_l, v_l = rkern.ring_commit(k_l, v_l, k, v, plan["w"][0])
                y = attn.attend_global_split(
                    q, k_l, v_l, k, v, plan, valid_old, window=cfg.context
                )
            else:
                y = attn.attend_global_split(
                    q, k_l, v_l, k, v, plan, valid_old, window=cfg.context
                )
                k_l, v_l = attn.ring_write_global(k_l, v_l, k, v, plan)
            new_layers.append({"k": k_l, "v": v_l})
        y = _proj_out(cfg, lp, y, b, t)
        if "layer_scale_1" in lp:
            y = y * lp["layer_scale_1"].astype(y.dtype)
        x = x + y
        if ca_kv is not None:
            if isinstance(ca_kv, dict):  # int8-quantised source
                layer_src = {
                    "k": ca_kv["k"][l], "v": ca_kv["v"][l],
                    "ks": ca_kv["ks"][l], "vs": ca_kv["vs"][l],
                    "s_len": ca_kv["s_len"],
                }
                x = _cross_block(cfg, lp, x, None, None, ca_q=layer_src)
            else:
                x = _cross_block(cfg, lp, x, ca_kv[0][l], ca_kv[1][l])
        x = _mlp_block(cfg, lp, x)

    return x, {"layers": new_layers, "pos": plan["new_pos"], "valid": valid}


def micro_init(cfg: TransformerConfig, batch: int, capacity: int, dtype):
    """Dense K/V carry for :func:`micro_step` — per-layer ``(B, H, S, Dh)``
    buffers, no ring/bitmap machinery."""
    h, hd = cfg.num_heads, cfg.hd
    z = jnp.zeros((batch, h, capacity, hd), dtype)
    return {
        "k": [z] * cfg.num_layers,
        "v": [jnp.zeros_like(z)] * cfg.num_layers,
    }


def micro_step(cfg: TransformerConfig, params: dict, kv: dict,
               x: jax.Array, idx: jax.Array):
    """One decoder micro-step specialised for the DepFormer slice chain.

    ``x (B, D)``; ``idx`` — traced position in the tiny dense cache.
    Semantics match :func:`step` at pe="none", T=1, all-active, fresh
    cache (the DepFormer case: lm.rs:640-684 rebuilds the slice KV every
    frame) — but without the serving-cache machinery (global-ring plan,
    validity bitmap, per-row quantisation, split attention), which at 4
    layers x 32 sequential slices per TTS frame dominates the op count.
    The attention math mirrors :func:`forward` exactly: f32 scores + f32
    softmax + f32 second-dot accumulation.
    """
    b, _ = x.shape
    cap = kv["k"][0].shape[2]
    scale = 1.0 / math.sqrt(cfg.hd)
    pos_ok = (jnp.arange(cap) <= idx)[None, None, None, :]
    xt = x[:, None, :]
    new_k, new_v = [], []
    for l in range(cfg.num_layers):
        lp = jax.tree_util.tree_map(lambda a: a[l], params)
        xn = norm_mod.apply_norm(cfg.norm_kind, lp["norm1"], xt)
        q, k, v = _qkv(cfg, lp, xn)  # (B, H, 1, Dh)
        K = jax.lax.dynamic_update_slice_in_dim(kv["k"][l], k, idx, axis=2)
        V = jax.lax.dynamic_update_slice_in_dim(kv["v"][l], v, idx, axis=2)
        new_k.append(K)
        new_v.append(V)
        scores = (
            jnp.einsum("bhtd,bhsd->bhts", q, K,
                       preferred_element_type=jnp.float32) * scale
        )
        scores = jnp.where(pos_ok, scores, attn.NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        y = jnp.einsum(
            "bhts,bhsd->bhtd", probs.astype(V.dtype), V,
            preferred_element_type=jnp.float32,
        ).astype(xt.dtype)
        y = _proj_out(cfg, lp, y, b, 1)
        if "layer_scale_1" in lp:
            y = y * lp["layer_scale_1"].astype(y.dtype)
        xt = xt + y
        xt = _mlp_block(cfg, lp, xt)
    return xt[:, 0, :], {"k": new_k, "v": new_v}


def forward(
    cfg: TransformerConfig,
    params: dict,
    x: jax.Array,
    ca_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> jax.Array:
    """Full-sequence forward (fresh state), causal with sliding window.

    Matches step-by-step streaming exactly (window = `context` most recent
    positions).  Used for offline paths and the streaming-equivalence tests.
    """
    if isinstance(ca_kv, dict):
        raise ValueError(
            "quantised CA sources (quantize_ca_kv) are decode-only; "
            "pass the bf16 (k, v) tuple to forward()"
        )
    b, t, _ = x.shape
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))

    rope = None
    if cfg.positional_embedding == "rope":
        rope = attn.rope_cos_sin(positions, cfg.hd, cfg.max_period)
    elif cfg.positional_embedding == "sin":
        x = _pos_embed_sin(cfg, x, positions)

    q_idx = jnp.arange(t)[:, None]
    k_idx = jnp.arange(t)[None, :]
    valid = (k_idx <= q_idx) & (q_idx - k_idx < cfg.context)
    bias = jnp.where(valid, 0.0, attn.NEG_INF)[None, None]

    def body(xc, per_layer):
        if ca_kv is None:
            (lp,) = per_layer
            ca_k = ca_v = None
        else:
            lp, ca_k, ca_v = per_layer
        xn = norm_mod.apply_norm(cfg.norm_kind, lp["norm1"], xc)
        q, k, v = _qkv(cfg, lp, xn)
        if rope is not None:
            q = attn.apply_rope(q, *rope)
            k = attn.apply_rope(k, *rope)
        scale = 1.0 / math.sqrt(cfg.hd)
        scores = (
            jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
            * scale
            + bias
        )
        probs = jax.nn.softmax(scores, axis=-1)
        y = jnp.einsum(
            "bhts,bhsd->bhtd",
            probs.astype(v.dtype),
            v,
            preferred_element_type=jnp.float32,
        ).astype(xc.dtype)
        y = _proj_out(cfg, lp, y, b, t)
        if "layer_scale_1" in lp:
            y = y * lp["layer_scale_1"].astype(y.dtype)
        xc = xc + y
        if ca_k is not None:
            xc = _cross_block(cfg, lp, xc, ca_k, ca_v)
        xc = _mlp_block(cfg, lp, xc)
        return xc, None

    xs = (params,) if ca_kv is None else (params,) + ca_kv
    y, _ = jax.lax.scan(body, x, xs)
    return y
