"""Pallas TPU fused decode-attention over the int8 KV ring (T = 1).

After the ring-commit kernel removed the KV *write* cost, the serving-profile
LM step is dominated by the attention *read*: `attend_global_split_q`
(ops/attention.py) lowers to two XLA dots whose int8->bf16 operand conversion
materialises dequantised copies of the ring in HBM — roughly tripling the
traffic of the 402 MB/layer int8 ring at stt-1b B=128 shapes (measured
18.98 ms LM step vs a ~9 ms bandwidth floor; docs/PERFORMANCE.md).

This kernel fuses the whole decode-attention read into one pass:

    scores = q . K_ring^T        (dequant int8 in VMEM, per-row k_scale)
    mask   = ring validity (scalar pos + window + per-slot bitmap)
    p      = softmax(scores ++ fresh-row score)
    out    = (p * v_scale) . V_ring  +  p_new * v_fresh

so the only HBM traffic is the int8 ring itself (plus the small scales),
once.  Semantics are identical to `attend_global_split_q` with T=1 over the
*committed* ring (the row written this step is masked out of the ring read
and the fresh K/V attend separately in exact bf16, same as the XLA path).

Replaces the reference's per-step cache read + masked softmax
(moshi-core/src/batched_transformer.rs:64-121, kv_cache.rs:119-173) with a
single fused TPU pass.

Environment notes:
- like ops/ring_kernels.py, only block loads + vector ops + MXU dots — no
  manual DMA (the remote kernel compiler crashes on those);
- In-kernel reshapes: Mosaic's shape-cast inference only supports a few
  layout-preserving patterns.  ``(1, h, dh) -> (h, 1, dh)`` lowers at
  h<=16/dh=128 but fails at dh=64 or h=32 ("unsupported shape cast").
  Two kernel families therefore coexist:
  * the original 4-D-block bodies (``*_4d``) for h<=16/dh=128 — operands
    keep their ``(B, H, C, Dh)`` shapes, which also avoids the XLA-side
    collapse of the multi-GB ring between the commit and attend custom
    calls (measured +1.1 ms/step bf16-act, +3.6 ms W8A8 at stt-1b B=128
    when collapsed);
  * reshape-free head-major bodies taking ``(B*H, 1|C, Dh)`` operands for
    every other shape (stt-2.6b / tts_202501 / s2s flash), where the 4-D
    bodies cannot lower at all.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


@functools.partial(
    jax.jit, static_argnames=("h", "window", "interpret")
)
def _decode_attend_q(
    q, k_cache, v_cache, k_scale, v_scale, k_new, v_new, valid, pos,
    *, h: int, window: int, interpret: bool = False
):
    """Whole-ring-per-block variant.

    Head-major operands: q/k_new/v_new ``(B*H, 1, Dh)``, ring ``(B*H, C,
    Dh)`` int8, scales ``(B*H, 1, C)``, valid ``(B, 1, C)``.
    """
    g, _, dh = q.shape
    b = g // h
    c = k_cache.shape[1]
    scale = 1.0 / (dh ** 0.5)

    def kernel(pos_ref, q_ref, kc, vc, ks, vs, kn, vn, va, out):
        p = pos_ref[0]
        w = p % c
        j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c), 2)
        k_pos = p - ((w - j) % c)
        ok = (k_pos >= 0) & (p - k_pos < window) & (j != w)  # (1, 1, C)
        ok = ok & (va[...] != 0)  # va block (1, 1, C)

        qf = q_ref[...]  # (h, 1, Dh) bf16
        scores = jax.lax.dot_general(
            qf, kc[...].astype(qf.dtype),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (h, 1, C)
        scores = scores * (ks[...] * scale)
        scores = jnp.where(ok, scores, NEG_INF)

        s_new = jnp.sum(
            qf.astype(jnp.float32) * kn[...].astype(jnp.float32), axis=-1
        ) * scale  # (h, 1)

        m = jnp.maximum(jnp.max(scores, axis=-1), s_new)  # (h, 1)
        e_c = jnp.exp(scores - m[..., None])  # masked rows underflow to 0
        e_n = jnp.exp(s_new - m)
        denom = jnp.sum(e_c, axis=-1) + e_n  # (h, 1)

        p_c = (e_c * vs[...]).astype(jnp.bfloat16)  # (h, 1, C)
        out_c = jax.lax.dot_general(
            p_c, vc[...].astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (h, 1, Dh)
        res = (out_c + e_n[..., None] * vn[...].astype(jnp.float32)) / denom[
            ..., None
        ]
        out[...] = res.astype(out.dtype)

    # One batch row (= h head rows) per block: K+V int8 + dequant copies
    # fit VMEM (_mono_ok).
    kv_spec = pl.BlockSpec((h, c, dh), lambda i, p_ref: (i, 0, 0))
    s_spec = pl.BlockSpec((h, 1, c), lambda i, p_ref: (i, 0, 0))
    row_spec = pl.BlockSpec((h, 1, dh), lambda i, p_ref: (i, 0, 0))
    va_spec = pl.BlockSpec((1, 1, c), lambda i, p_ref: (i, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[row_spec, kv_spec, kv_spec, s_spec, s_spec,
                  row_spec, row_spec, va_spec],
        out_specs=row_spec,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, 1, dh), q.dtype),
        interpret=interpret,
    )(pos, q, k_cache, v_cache, k_scale, v_scale, k_new, v_new, valid)


@functools.partial(
    jax.jit, static_argnames=("h", "window", "interpret")
)
def _decode_attend_q4(
    q, k_cache, v_cache, k_scale, v_scale, k_new, v_new, valid, pos,
    *, h: int, window: int, interpret: bool = False
):
    """Packed-int4 variant: the ring is uint8 nibbles (B*H, C, Dh/2),
    excess-8 encoded (ops/attention.pack4).  Unpack is add/shift arithmetic
    on the VPU; everything else matches _decode_attend_q."""
    g, _, dh = q.shape
    b = g // h
    c = k_cache.shape[1]
    scale = 1.0 / (dh ** 0.5)

    def kernel(pos_ref, q_ref, kc, vc, ks, vs, kn, vn, va, out):
        p = pos_ref[0]
        w = p % c
        j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c), 2)
        k_pos = p - ((w - j) % c)
        ok = (k_pos >= 0) & (p - k_pos < window) & (j != w)
        ok = ok & (va[...] != 0)

        qf = q_ref[...]  # (h, 1, Dh)

        def unpack(blk):  # (h, C, Dh/2) uint8 -> (h, C, Dh) bf16
            pi = blk[...].astype(jnp.int32)
            lo = (pi & 15) - 8
            hi = (pi >> 4) - 8
            return jnp.concatenate([lo, hi], axis=-1).astype(jnp.bfloat16)

        scores = jax.lax.dot_general(
            qf.astype(jnp.bfloat16), unpack(kc),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (h, 1, C)
        scores = scores * (ks[...] * scale)
        scores = jnp.where(ok, scores, NEG_INF)

        s_new = jnp.sum(
            qf.astype(jnp.float32) * kn[...].astype(jnp.float32), axis=-1
        ) * scale

        m = jnp.maximum(jnp.max(scores, axis=-1), s_new)
        e_c = jnp.exp(scores - m[..., None])
        e_n = jnp.exp(s_new - m)
        denom = jnp.sum(e_c, axis=-1) + e_n

        p_c = (e_c * vs[...]).astype(jnp.bfloat16)
        out_c = jax.lax.dot_general(
            p_c, unpack(vc),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        res = (out_c + e_n[..., None] * vn[...].astype(jnp.float32)) / denom[
            ..., None
        ]
        out[...] = res.astype(out.dtype)

    dh2 = dh // 2
    kv_spec = pl.BlockSpec((h, c, dh2), lambda i, p_ref: (i, 0, 0))
    s_spec = pl.BlockSpec((h, 1, c), lambda i, p_ref: (i, 0, 0))
    row_spec = pl.BlockSpec((h, 1, dh), lambda i, p_ref: (i, 0, 0))
    va_spec = pl.BlockSpec((1, 1, c), lambda i, p_ref: (i, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[row_spec, kv_spec, kv_spec, s_spec, s_spec,
                  row_spec, row_spec, va_spec],
        out_specs=row_spec,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, 1, dh), q.dtype),
        interpret=interpret,
    )(pos, q, k_cache, v_cache, k_scale, v_scale, k_new, v_new, valid)


@functools.partial(
    jax.jit, static_argnames=("h", "window", "interpret")
)
def _decode_attend_q_flash(
    q, k_cache, v_cache, k_scale, v_scale, k_new, v_new, valid, pos,
    *, h: int, window: int, interpret: bool = False
):
    """c-blocked streaming-softmax variant for rings too large for one VMEM
    block (s2s-2b: 20 heads x ring 3072 x 128 = 7.9 MB int8/slot) and for
    head counts the mono grid never supported (h % 8 != 0).

    Grid (B, C/cb); per batch row the ring streams through VMEM in cb-wide
    chunks with the standard online-softmax update (m/l/acc carried in VMEM
    scratch).  The fresh bf16 row seeds the running max at block 0, so an
    all-masked first block cannot produce the exp(NEG_INF - NEG_INF) = 1
    artefact.  Semantics match _decode_attend_q / attend_global_split_q
    (fp-association-level; tests/test_decode_attn.py)."""
    g, _, dh = q.shape
    b = g // h
    c = k_cache.shape[1]
    cb = _pick_cblock(h, c, dh)
    nc = c // cb
    scale = 1.0 / (dh ** 0.5)

    def kernel(pos_ref, q_ref, kc, vc, ks, vs, kn, vn, va, out,
               acc, mbuf, lbuf):
        jb = pl.program_id(1)
        p = pos_ref[0]
        w = p % c
        jj = jb * cb + jax.lax.broadcasted_iota(jnp.int32, (1, 1, cb), 2)
        k_pos = p - ((w - jj) % c)
        ok = (k_pos >= 0) & (p - k_pos < window) & (jj != w)  # (1, 1, cb)
        ok = ok & (va[...] != 0)

        qf = q_ref[...]  # (h, 1, Dh) bf16
        scores = jax.lax.dot_general(
            qf, kc[...].astype(qf.dtype),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (h, 1, cb)
        scores = scores * (ks[...] * scale)
        scores = jnp.where(ok, scores, NEG_INF)
        blk_m = jnp.max(scores, axis=-1)  # (h, 1)

        def blk_dot(e):  # (h, 1, cb) f32 -> (h, 1, Dh) f32
            pc = (e * vs[...]).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                pc, vc[...].astype(jnp.bfloat16),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

        @pl.when(jb == 0)
        def _init():
            s_new = jnp.sum(
                qf.astype(jnp.float32) * kn[...].astype(jnp.float32), axis=-1
            ) * scale  # (h, 1) — always finite: seeds the running max
            m0 = jnp.maximum(blk_m, s_new)
            e_c = jnp.exp(scores - m0[..., None])
            e_n = jnp.exp(s_new - m0)
            acc[...] = blk_dot(e_c) + e_n[..., None] * vn[...].astype(
                jnp.float32
            )
            l0 = jnp.sum(e_c, axis=-1) + e_n
            mbuf[...] = jnp.broadcast_to(m0[..., None], (h, 1, 128))
            lbuf[...] = jnp.broadcast_to(l0[..., None], (h, 1, 128))

        @pl.when(jb > 0)
        def _accum():
            m_old = mbuf[...][:, :, 0]
            l_old = lbuf[...][:, :, 0]
            m_new = jnp.maximum(m_old, blk_m)
            corr = jnp.exp(m_old - m_new)
            e_c = jnp.exp(scores - m_new[..., None])
            acc[...] = acc[...] * corr[..., None] + blk_dot(e_c)
            l_new = l_old * corr + jnp.sum(e_c, axis=-1)
            mbuf[...] = jnp.broadcast_to(m_new[..., None], (h, 1, 128))
            lbuf[...] = jnp.broadcast_to(l_new[..., None], (h, 1, 128))

        @pl.when(jb == nc - 1)
        def _final():
            out[...] = (
                acc[...] / lbuf[...][:, :, 0][..., None]
            ).astype(out.dtype)

    kv_spec = pl.BlockSpec((h, cb, dh), lambda i, j, p_ref: (i, j, 0))
    s_spec = pl.BlockSpec((h, 1, cb), lambda i, j, p_ref: (i, 0, j))
    row_spec = pl.BlockSpec((h, 1, dh), lambda i, j, p_ref: (i, 0, 0))
    va_spec = pl.BlockSpec((1, 1, cb), lambda i, j, p_ref: (i, 0, j))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nc),
        in_specs=[row_spec, kv_spec, kv_spec, s_spec, s_spec,
                  row_spec, row_spec, va_spec],
        out_specs=row_spec,
        scratch_shapes=[
            pltpu.VMEM((h, 1, dh), jnp.float32),   # acc
            pltpu.VMEM((h, 1, 128), jnp.float32),  # running max
            pltpu.VMEM((h, 1, 128), jnp.float32),  # running denom
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, 1, dh), q.dtype),
        interpret=interpret,
    )(pos, q, k_cache, v_cache, k_scale, v_scale, k_new, v_new, valid)


def _mono_ok(h: int, c: int, dh: int, packed4: bool) -> bool:
    """Whole-ring-per-block variant: needs h % 8 (Mosaic-validated grid) and
    the full (h, C, Dh) K/V blocks + their bf16 dequant copies in VMEM —
    ~2.4 MB int8 per block is the proven ceiling (tts-1.6b ctx-1024 shapes;
    the s2s ctx-3000 ring at 7.9 MB/block does not fit)."""
    row_bytes = dh // 2 if packed4 else dh
    return h % 8 == 0 and h * c * row_bytes <= 2_500_000


def _pick_cblock(h: int, c: int, dh: int):
    """Largest source-block length for the flash variant that divides the
    ring and keeps K+V int8 blocks + bf16 dequant copies well under VMEM."""
    for cb in (512, 384, 256, 128):
        # ~6x: K + V int8 blocks and their bf16 copies (2 bytes) in flight.
        if c % cb == 0 and 6 * h * cb * dh <= 14_000_000:
            return cb
    return None


def supported(q, k_cache, plan) -> bool:
    """T=1 decode over an int8 (or packed-int4 uint8) ring big enough to
    beat the XLA path.  Two lowering strategies: whole-ring blocks
    (_decode_attend_q / _q4) when the ring fits VMEM and h % 8 == 0, else
    the c-blocked streaming-softmax variant (_decode_attend_q_flash; int8
    only) — which is what serves long-context / odd-head models like
    s2s-2b (20 heads, ring 3072)."""
    if q.ndim != 4 or q.shape[2] != 1:
        return False
    b, h, _, dh = q.shape
    c = k_cache.shape[2]
    packed4 = k_cache.dtype == jnp.uint8  # nibble-packed int4
    if packed4:
        if k_cache.shape[3] * 2 != dh:
            return False
    elif k_cache.dtype != jnp.int8:
        return False
    # dh 64 or 128: the head dim is the block's minor (lane) dim and is
    # always the full array dim, so a 64-wide head (stt-2.6b / tts_202501 /
    # tts_v0_1 shapes) lowers fine — it just half-fills the lane tile.
    if c < 256 or c % 128 or dh % 64 or dh > 128:
        return False
    if plan["w"].shape[0] != 1:
        return False
    if _mono_ok(h, c, dh, packed4):
        return True
    return (not packed4) and _pick_cblock(h, c, dh) is not None


def _legacy_4d(h: int, dh: int) -> bool:
    """Shapes whose original 4-D-block kernels both lower AND measure
    faster than the head-major variants: at h <= 16 / Dh = 128 the
    in-kernel ``(1,h,*) -> (h,1,*)`` shape casts lower fine, and keeping
    operands 4-D avoids the XLA-side collapse of the multi-GB ring
    between the commit and attend custom calls (measured +1.1 ms/step
    bf16-act / +3.6 ms W8A8 at stt-1b B=128 when collapsed).  Dh = 64 or
    h > 16 hits Mosaic's "unsupported shape cast" in the 4-D bodies and
    must take the reshape-free head-major path."""
    return dh == 128 and h % 8 == 0 and h <= 16

@functools.partial(
    jax.jit, static_argnames=("window", "interpret")
)
def _decode_attend_q_4d(
    q, k_cache, v_cache, k_scale, v_scale, k_new, v_new, valid, pos,
    *, window: int, interpret: bool = False
):
    b, h, dh = q.shape
    c = k_cache.shape[2]
    scale = 1.0 / (dh ** 0.5)

    def kernel(pos_ref, q_ref, kc, vc, ks, vs, kn, vn, va, out):
        p = pos_ref[0]
        w = p % c
        j = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
        k_pos = p - ((w - j) % c)
        ok = (k_pos >= 0) & (p - k_pos < window) & (j != w)  # (1, C)
        ok = ok & (va[...][:, 0, :] != 0)  # va (bb, 1, C) -> (bb, C)

        qv = q_ref[...]  # (bb, H, Dh) bf16
        bb = qv.shape[0]
        g = bb * h
        qf = qv.reshape(g, 1, dh)
        kcf = kc[...].reshape(g, c, dh)
        scores = jax.lax.dot_general(
            qf, kcf.astype(qv.dtype),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(bb, h, c)
        scores = scores * (ks[...] * scale)
        scores = jnp.where(ok[:, None, :], scores, NEG_INF)

        s_new = jnp.sum(
            qv.astype(jnp.float32) * kn[...].astype(jnp.float32), axis=-1
        ) * scale  # (bb, H)

        m = jnp.maximum(jnp.max(scores, axis=-1), s_new)
        e_c = jnp.exp(scores - m[..., None])  # masked rows underflow to 0
        e_n = jnp.exp(s_new - m)
        denom = jnp.sum(e_c, axis=-1) + e_n

        p_c = (e_c * vs[...]).astype(jnp.bfloat16)
        vcf = vc[...].reshape(g, c, dh)
        out_c = jax.lax.dot_general(
            p_c.reshape(g, 1, c), vcf.astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(bb, h, dh)
        res = (out_c + e_n[..., None] * vn[...].astype(jnp.float32)) / denom[
            ..., None
        ]
        out[...] = res.astype(out.dtype)

    bb = 1  # one batch row per block: K+V int8 + dequant copies fit VMEM
    kv_spec = pl.BlockSpec((bb, h, c, dh), lambda i, p_ref: (i, 0, 0, 0))
    s_spec = pl.BlockSpec((bb, h, c), lambda i, p_ref: (i, 0, 0))
    row_spec = pl.BlockSpec((bb, h, dh), lambda i, p_ref: (i, 0, 0))
    # (B, 1, C): TPU block shapes need the second-minor dim to be a
    # multiple of 8 or the full array dim — a singleton middle axis
    # satisfies that for the per-slot bitmap.
    va_spec = pl.BlockSpec((bb, 1, c), lambda i, p_ref: (i, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb,),
        in_specs=[row_spec, kv_spec, kv_spec, s_spec, s_spec,
                  row_spec, row_spec, va_spec],
        out_specs=row_spec,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, dh), q.dtype),
        interpret=interpret,
    )(pos, q, k_cache, v_cache, k_scale, v_scale, k_new, v_new, valid)


@functools.partial(
    jax.jit, static_argnames=("window", "interpret")
)
def _decode_attend_q4_4d(
    q, k_cache, v_cache, k_scale, v_scale, k_new, v_new, valid, pos,
    *, window: int, interpret: bool = False
):
    """Packed-int4 variant: the ring is uint8 nibbles (B, H, C, Dh/2),
    excess-8 encoded (ops/attention.pack4).  Unpack is add/shift arithmetic
    on the VPU; everything else matches _decode_attend_q."""
    b, h, dh = q.shape
    c = k_cache.shape[2]
    scale = 1.0 / (dh ** 0.5)

    def kernel(pos_ref, q_ref, kc, vc, ks, vs, kn, vn, va, out):
        p = pos_ref[0]
        w = p % c
        j = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
        k_pos = p - ((w - j) % c)
        ok = (k_pos >= 0) & (p - k_pos < window) & (j != w)
        ok = ok & (va[...][:, 0, :] != 0)

        qv = q_ref[...]
        bb = qv.shape[0]
        g = bb * h

        def unpack(blk):  # (bb, H, C, Dh/2) uint8 -> (g, C, Dh) bf16
            pi = blk[...].astype(jnp.int32)
            lo = (pi & 15) - 8
            hi = (pi >> 4) - 8
            full = jnp.concatenate([lo, hi], axis=-1)
            return full.reshape(g, c, dh).astype(jnp.bfloat16)

        qf = qv.reshape(g, 1, dh)
        scores = jax.lax.dot_general(
            qf.astype(jnp.bfloat16), unpack(kc),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(bb, h, c)
        scores = scores * (ks[...] * scale)
        scores = jnp.where(ok[:, None, :], scores, NEG_INF)

        s_new = jnp.sum(
            qv.astype(jnp.float32) * kn[...].astype(jnp.float32), axis=-1
        ) * scale

        m = jnp.maximum(jnp.max(scores, axis=-1), s_new)
        e_c = jnp.exp(scores - m[..., None])
        e_n = jnp.exp(s_new - m)
        denom = jnp.sum(e_c, axis=-1) + e_n

        p_c = (e_c * vs[...]).astype(jnp.bfloat16)
        out_c = jax.lax.dot_general(
            p_c.reshape(g, 1, c), unpack(vc),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(bb, h, dh)
        res = (out_c + e_n[..., None] * vn[...].astype(jnp.float32)) / denom[
            ..., None
        ]
        out[...] = res.astype(out.dtype)

    bb = 1
    dh2 = dh // 2
    kv_spec = pl.BlockSpec((bb, h, c, dh2), lambda i, p_ref: (i, 0, 0, 0))
    s_spec = pl.BlockSpec((bb, h, c), lambda i, p_ref: (i, 0, 0))
    row_spec = pl.BlockSpec((bb, h, dh), lambda i, p_ref: (i, 0, 0))
    va_spec = pl.BlockSpec((bb, 1, c), lambda i, p_ref: (i, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb,),
        in_specs=[row_spec, kv_spec, kv_spec, s_spec, s_spec,
                  row_spec, row_spec, va_spec],
        out_specs=row_spec,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, dh), q.dtype),
        interpret=interpret,
    )(pos, q, k_cache, v_cache, k_scale, v_scale, k_new, v_new, valid)


@functools.partial(
    jax.jit, static_argnames=("window", "interpret")
)
def _decode_attend_commit_q_4d(
    q, k_cache, v_cache, k_scale, v_scale, kq_new, vq_new, k_new, v_new,
    valid, pw, *, window: int, interpret: bool = False
):
    """4-D attend body + in-kernel ring commit (VERDICT r4 #2).

    The separate per-layer ring_commit launch re-reads and re-writes the
    row-block the attend pass already holds in VMEM; folding the commit in
    here removes that launch and its DMA entirely.  The kernel attends
    over the PRE-commit ring — bitwise-identical to attending the
    committed ring because row ``w`` is masked out of the ring read and
    the fresh K/V attend separately in exact bf16 (same invariant as
    decode_attend) — and writes the quantized fresh row into the ring's
    ``w`` row-block via aliased outputs whose index map targets that block
    (the ring_commit write pattern, grid (B,) instead of (B//bb,)).

    The K/V rings MUST have this kernel as their only consumer (aliased
    in/out); the scale rings commit beforehand (ring_kernels.scale_commit)
    and are read here committed — row ``w``'s scale is masked anyway.

    ``pw``: int32 (2,) = [pos, w] scalar-prefetch pair (the out-spec index
    maps need ``w``; the validity mask needs ``pos``).
    """
    b, h, dh = q.shape
    c = k_cache.shape[2]
    r = min(32, c)  # int8 ring row-block (ring_kernels._row_block)
    scale = 1.0 / (dh ** 0.5)

    def kernel(pw_ref, q_ref, kc, vc, ks, vs, kqn, vqn, kn, vn, va,
               out, ko, vo):
        p = pw_ref[0]
        w = pw_ref[1]
        j = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
        k_pos = p - ((w - j) % c)
        ok = (k_pos >= 0) & (p - k_pos < window) & (j != w)  # (1, C)
        ok = ok & (va[...][:, 0, :] != 0)

        qv = q_ref[...]  # (1, H, Dh) bf16
        bb = qv.shape[0]
        g = bb * h
        qf = qv.reshape(g, 1, dh)
        kcf = kc[...].reshape(g, c, dh)
        scores = jax.lax.dot_general(
            qf, kcf.astype(qv.dtype),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(bb, h, c)
        scores = scores * (ks[...] * scale)
        scores = jnp.where(ok[:, None, :], scores, NEG_INF)

        s_new = jnp.sum(
            qv.astype(jnp.float32) * kn[...].astype(jnp.float32), axis=-1
        ) * scale  # (1, H)

        m = jnp.maximum(jnp.max(scores, axis=-1), s_new)
        e_c = jnp.exp(scores - m[..., None])
        e_n = jnp.exp(s_new - m)
        denom = jnp.sum(e_c, axis=-1) + e_n

        p_c = (e_c * vs[...]).astype(jnp.bfloat16)
        vcf = vc[...].reshape(g, c, dh)
        out_c = jax.lax.dot_general(
            p_c.reshape(g, 1, c), vcf.astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(bb, h, dh)
        res = (out_c + e_n[..., None] * vn[...].astype(jnp.float32)) / denom[
            ..., None
        ]
        out[...] = res.astype(out.dtype)

        # Commit: replace ring row w inside its r-row block.  The old rows
        # come from the full-ring block already in VMEM (dynamic sublane
        # slice, r-aligned start).
        base = (w // r) * r
        old_k = kc[:, :, pl.ds(base, r), :]  # (1, H, r, Dh) int8
        old_v = vc[:, :, pl.ds(base, r), :]
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, r, 1), 2)
        sel = rows == (w % r)
        ko[...] = jnp.where(sel, kqn[...][:, :, None, :], old_k)
        vo[...] = jnp.where(sel, vqn[...][:, :, None, :], old_v)

    bb = 1
    kv_spec = pl.BlockSpec((bb, h, c, dh), lambda i, pw_ref: (i, 0, 0, 0))
    s_spec = pl.BlockSpec((bb, h, c), lambda i, pw_ref: (i, 0, 0))
    row_spec = pl.BlockSpec((bb, h, dh), lambda i, pw_ref: (i, 0, 0))
    va_spec = pl.BlockSpec((bb, 1, c), lambda i, pw_ref: (i, 0, 0))
    blk_spec = pl.BlockSpec(
        (bb, h, r, dh), lambda i, pw_ref: (i, 0, pw_ref[1] // r, 0)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb,),
        in_specs=[row_spec, kv_spec, kv_spec, s_spec, s_spec,
                  row_spec, row_spec, row_spec, row_spec, va_spec],
        out_specs=(row_spec, blk_spec, blk_spec),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, dh), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        # inputs: [pw, q, kc, vc, ks, vs, kq_new, vq_new, k_new, v_new, va]
        input_output_aliases={2: 1, 3: 2},
        interpret=interpret,
    )(pw, q, k_cache, v_cache, k_scale, v_scale, kq_new, vq_new,
      k_new, v_new, valid)


@functools.partial(
    jax.jit, static_argnames=("h", "window", "interpret")
)
def _decode_attend_commit_q(
    q, k_cache, v_cache, k_scale, v_scale, kq_new, vq_new, k_new, v_new,
    valid, pw, *, h: int, window: int, interpret: bool = False
):
    """Head-major fused commit+attend: the reshape-free mono body
    (_decode_attend_q) plus the in-kernel ring-row commit — the fused
    path for hd=64 / h=32 presets (stt-2.6b, tts_202501) where the 4-D
    bodies cannot lower.  Same contract as _decode_attend_commit_q_4d."""
    g, _, dh = q.shape
    b = g // h
    c = k_cache.shape[1]
    r = min(32, c)
    scale = 1.0 / (dh ** 0.5)

    def kernel(pw_ref, q_ref, kc, vc, ks, vs, kqn, vqn, kn, vn, va,
               out, ko, vo):
        p = pw_ref[0]
        w = pw_ref[1]
        j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c), 2)
        k_pos = p - ((w - j) % c)
        ok = (k_pos >= 0) & (p - k_pos < window) & (j != w)  # (1, 1, C)
        ok = ok & (va[...] != 0)

        qf = q_ref[...]  # (h, 1, Dh) bf16
        scores = jax.lax.dot_general(
            qf, kc[...].astype(qf.dtype),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (h, 1, C)
        scores = scores * (ks[...] * scale)
        scores = jnp.where(ok, scores, NEG_INF)

        s_new = jnp.sum(
            qf.astype(jnp.float32) * kn[...].astype(jnp.float32), axis=-1
        ) * scale  # (h, 1)

        m = jnp.maximum(jnp.max(scores, axis=-1), s_new)
        e_c = jnp.exp(scores - m[..., None])
        e_n = jnp.exp(s_new - m)
        denom = jnp.sum(e_c, axis=-1) + e_n

        p_c = (e_c * vs[...]).astype(jnp.bfloat16)
        out_c = jax.lax.dot_general(
            p_c, vc[...].astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (h, 1, Dh)
        res = (out_c + e_n[..., None] * vn[...].astype(jnp.float32)) / denom[
            ..., None
        ]
        out[...] = res.astype(out.dtype)

        # Commit the quantized fresh row into the ring's r-row block.
        base = (w // r) * r
        old_k = kc[:, pl.ds(base, r), :]  # (h, r, Dh) int8
        old_v = vc[:, pl.ds(base, r), :]
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, r, 1), 1)
        sel = rows == (w % r)
        ko[...] = jnp.where(sel, kqn[...], old_k)  # kqn (h, 1, Dh)
        vo[...] = jnp.where(sel, vqn[...], old_v)

    kv_spec = pl.BlockSpec((h, c, dh), lambda i, pw_ref: (i, 0, 0))
    s_spec = pl.BlockSpec((h, 1, c), lambda i, pw_ref: (i, 0, 0))
    row_spec = pl.BlockSpec((h, 1, dh), lambda i, pw_ref: (i, 0, 0))
    va_spec = pl.BlockSpec((1, 1, c), lambda i, pw_ref: (i, 0, 0))
    blk_spec = pl.BlockSpec(
        (h, r, dh), lambda i, pw_ref: (i, pw_ref[1] // r, 0)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[row_spec, kv_spec, kv_spec, s_spec, s_spec,
                  row_spec, row_spec, row_spec, row_spec, va_spec],
        out_specs=(row_spec, blk_spec, blk_spec),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((g, 1, dh), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        # inputs: [pw, q, kc, vc, ks, vs, kq_new, vq_new, k_new, v_new, va]
        input_output_aliases={2: 1, 3: 2},
        interpret=interpret,
    )(pw, q, k_cache, v_cache, k_scale, v_scale, kq_new, vq_new,
      k_new, v_new, valid)


def fused_commit_supported(q, k_cache, plan) -> bool:
    """Fused commit+attend path: int8 rings that fit a mono VMEM block
    (4-D body at h<=16/Dh=128, head-major body otherwise), T=1
    non-wrapping appends.  Flash (c-blocked) and packed-int4 shapes take
    the split pipeline."""
    if q.ndim != 4 or q.shape[2] != 1:
        return False
    b, h, _, dh = q.shape
    c = k_cache.shape[2]
    if k_cache.dtype != jnp.int8:
        return False
    if c < 256 or c % 128 or c % 32:
        return False
    if plan["w"].shape[0] != 1:
        return False
    if not _mono_ok(h, c, dh, False):
        return False
    if _legacy_4d(h, dh):
        return True
    # Head-major body (Dh=64 / h>16): bit-exact but measured SLOWER than
    # the split pipeline (15.17 vs 9.48 ms at stt-2.6b shapes,
    # docs/chipq/fused_probe_26b_b8.json) — explicit opt-in only.
    return os.environ.get("DSM_FUSED_ATTN") == "1"


def fused_commit_enabled() -> bool:
    """Fused commit+attend kernel gate.  DEFAULT ON since the on-chip
    A/B at both measurement scales: bit-exact (tokens, rings, logits)
    and faster at the 4-D stt-1b shapes — 12.62 vs 13.16 ms at B=128
    (docs/chipq/lm_fused_b128.json) and 698.8 vs 672.6 headline streams
    at B=224 (docs/chipq/headline_b224_fused.json).  ``DSM_FUSED_ATTN=0``
    opts out; shape support (fused_commit_supported) keeps the
    measured-slower head-major presets on the split pipeline."""
    from . import ring_kernels as _rk

    if _rk.kernels_override() is not None and not _rk.kernels_override():
        return False
    env = os.environ.get("DSM_FUSED_ATTN")
    if env is not None:
        return env not in ("0", "false", "")
    return True


def decode_attend_commit(
    q, k_cache, v_cache, ks_committed, vs_committed, kq_new, vq_new,
    k_new, v_new, plan, valid_old, *, window: int, interpret=None
):
    """Fused replacement for ``ring_commit(k, v) + decode_attend`` at the
    4-D shapes: attends over the ring AND commits the quantized fresh row
    in one launch.  The scale rings must already be committed
    (ring_kernels.scale_commit).  Returns ``(y, k_ring, v_ring)``."""
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except Exception:
            interpret = True
    b, h, t, dh = q.shape
    c = k_cache.shape[2]
    pw = jnp.stack([
        jnp.asarray(plan["q_pos"][0], jnp.int32),
        jnp.asarray(plan["w"][0], jnp.int32),
    ])
    if _legacy_4d(h, dh):
        y, k_ring, v_ring = _decode_attend_commit_q_4d(
            q[:, :, 0, :], k_cache, v_cache,
            ks_committed.astype(jnp.float32),
            vs_committed.astype(jnp.float32),
            kq_new[:, :, 0, :], vq_new[:, :, 0, :],
            k_new[:, :, 0, :], v_new[:, :, 0, :],
            valid_old.astype(jnp.int8)[:, None, :], pw,
            window=window, interpret=bool(interpret),
        )
        return y[:, :, None, :], k_ring, v_ring
    g = b * h
    y, k_ring, v_ring = _decode_attend_commit_q(
        q[:, :, 0, :].reshape(g, 1, dh),
        k_cache.reshape(g, c, dh), v_cache.reshape(g, c, dh),
        ks_committed.astype(jnp.float32).reshape(g, 1, c),
        vs_committed.astype(jnp.float32).reshape(g, 1, c),
        kq_new[:, :, 0, :].reshape(g, 1, dh),
        vq_new[:, :, 0, :].reshape(g, 1, dh),
        k_new[:, :, 0, :].reshape(g, 1, dh),
        v_new[:, :, 0, :].reshape(g, 1, dh),
        valid_old.astype(jnp.int8)[:, None, :], pw,
        h=h, window=window, interpret=bool(interpret),
    )
    return (y.reshape(b, h, dh)[:, :, None, :],
            k_ring.reshape(b, h, c, dh), v_ring.reshape(b, h, c, dh))


def decode_attend(
    q, k_cache, v_cache, k_scale, v_scale, k_new, v_new, plan, valid_old,
    *, window: int, interpret=None
):
    """Drop-in for ``attend_global_split_q`` at T=1 over the committed ring.

    ``k_cache``/``v_cache``/``k_scale``/``v_scale`` are the ring *after* this
    step's commit (ops/ring_kernels.ring_commit); the committed row is masked
    from the ring read and the fresh ``k_new``/``v_new`` attend in exact
    dtype, so results match the XLA split path.

    Operands are collapsed to head-major ``(B*H, ...)`` here — in XLA, where
    a row-major leading-dim collapse is free — so the kernels stay
    reshape-free (see module docstring).
    """
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except Exception:
            interpret = True
    b, h, t, dh = q.shape
    c = k_cache.shape[2]
    pos = jnp.asarray(plan["q_pos"][0], jnp.int32).reshape((1,))
    packed4 = k_cache.dtype == jnp.uint8
    if _legacy_4d(h, dh) and _mono_ok(h, c, dh, packed4):
        fn4 = _decode_attend_q4_4d if packed4 else _decode_attend_q_4d
        out = fn4(
            q[:, :, 0, :], k_cache, v_cache,
            k_scale.astype(jnp.float32), v_scale.astype(jnp.float32),
            k_new[:, :, 0, :], v_new[:, :, 0, :],
            valid_old.astype(jnp.int8)[:, None, :], pos,
            window=window, interpret=bool(interpret),
        )
        return out[:, :, None, :]
    if packed4:
        fn = _decode_attend_q4
    elif _mono_ok(h, c, dh, False):
        fn = _decode_attend_q
    else:
        fn = _decode_attend_q_flash
    g = b * h
    out = fn(
        q[:, :, 0, :].reshape(g, 1, dh),
        k_cache.reshape(g, c, k_cache.shape[3]),
        v_cache.reshape(g, c, v_cache.shape[3]),
        k_scale.astype(jnp.float32).reshape(g, 1, c),
        v_scale.astype(jnp.float32).reshape(g, 1, c),
        k_new[:, :, 0, :].reshape(g, 1, dh),
        v_new[:, :, 0, :].reshape(g, 1, dh),
        valid_old.astype(jnp.int8)[:, None, :], pos,
        h=h, window=window, interpret=bool(interpret),
    )
    return out.reshape(b, h, dh)[:, :, None, :]


@functools.partial(jax.jit, static_argnames=("h", "interpret"))
def _ca_decode_attend_q(q, k_src, v_src, k_scale, v_scale, s_len,
                        *, h: int, interpret: bool = False):
    """Head-major operands like _decode_attend_q: q ``(B*H, 1, Dh)``,
    source ``(B*H, S, Dh)`` int8, scales ``(B*H, 1, S)``."""
    g, _, dh = q.shape
    b = g // h
    s = k_src.shape[1]
    scale = 1.0 / (dh ** 0.5)

    def kernel(slen_ref, q_ref, kc, vc, ks, vs, out):
        n = slen_ref[0]
        j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2)
        ok = j < n  # mask the int8-tile padding rows
        qf = q_ref[...]  # (h, 1, Dh)
        scores = jax.lax.dot_general(
            qf, kc[...].astype(qf.dtype),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (h, 1, S)
        scores = scores * (ks[...] * scale)
        scores = jnp.where(ok, scores, NEG_INF)
        m = jnp.max(scores, axis=-1)
        e = jnp.exp(scores - m[..., None])
        denom = jnp.sum(e, axis=-1)
        p = (e * vs[...]).astype(jnp.bfloat16)
        out_c = jax.lax.dot_general(
            p, vc[...].astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (h, 1, Dh)
        out[...] = (out_c / denom[..., None]).astype(out.dtype)

    kv_spec = pl.BlockSpec((h, s, dh), lambda i, n_ref: (i, 0, 0))
    s_spec = pl.BlockSpec((h, 1, s), lambda i, n_ref: (i, 0, 0))
    row_spec = pl.BlockSpec((h, 1, dh), lambda i, n_ref: (i, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[row_spec, kv_spec, kv_spec, s_spec, s_spec],
        out_specs=row_spec,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, 1, dh), q.dtype),
        interpret=interpret,
    )(s_len, q, k_src, v_src, k_scale, v_scale)


def ca_supported(q, k_src) -> bool:
    """T=1 decode over an int8-quantised static CA source."""
    if q.ndim != 4 or q.shape[2] != 1:
        return False
    b, h, _, dh = q.shape
    if k_src.dtype != jnp.int8:
        return False
    s = k_src.shape[2]
    return s >= 128 and s % 128 == 0 and dh % 64 == 0 and dh <= 128 \
        and h % 8 == 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ca_decode_attend_q_4d(q, k_src, v_src, k_scale, v_scale, s_len,
                        *, interpret: bool = False):
    b, h, dh = q.shape
    s = k_src.shape[2]
    scale = 1.0 / (dh ** 0.5)

    def kernel(slen_ref, q_ref, kc, vc, ks, vs, out):
        n = slen_ref[0]
        j = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
        ok = j < n  # mask the int8-tile padding rows
        qv = q_ref[...]
        bb = qv.shape[0]
        g = bb * h
        qf = qv.reshape(g, 1, dh)
        scores = jax.lax.dot_general(
            qf, kc[...].reshape(g, s, dh).astype(qv.dtype),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(bb, h, s)
        scores = scores * (ks[...] * scale)
        scores = jnp.where(ok[:, None, :], scores, NEG_INF)
        m = jnp.max(scores, axis=-1)
        e = jnp.exp(scores - m[..., None])
        denom = jnp.sum(e, axis=-1)
        p = (e * vs[...]).astype(jnp.bfloat16)
        out_c = jax.lax.dot_general(
            p.reshape(g, 1, s), vc[...].reshape(g, s, dh).astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(bb, h, dh)
        out[...] = (out_c / denom[..., None]).astype(out.dtype)

    bb = 1
    kv_spec = pl.BlockSpec((bb, h, s, dh), lambda i, n_ref: (i, 0, 0, 0))
    s_spec = pl.BlockSpec((bb, h, s), lambda i, n_ref: (i, 0, 0))
    row_spec = pl.BlockSpec((bb, h, dh), lambda i, n_ref: (i, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb,),
        in_specs=[row_spec, kv_spec, kv_spec, s_spec, s_spec],
        out_specs=row_spec,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, dh), q.dtype),
        interpret=interpret,
    )(s_len, q, k_src, v_src, k_scale, v_scale)



def ca_decode_attend(q, k_src, v_src, k_scale, v_scale, s_len,
                     *, interpret=None):
    """Fused decode cross-attention over a quantised voice-conditioning
    source (the TTS CaSrc::KeysValues read, transformer.rs:961-980): int8
    dequant + softmax + both dots in one pass, source read once as int8.

    ``k_src/v_src (B, H, S_pad, Dh)`` int8 with per-row scales
    ``(B, H, S_pad)``; rows at ``j >= s_len`` are tile padding, masked out.
    """
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except Exception:
            interpret = True
    b, h, t, dh = q.shape
    s = k_src.shape[2]
    n = jnp.asarray(s_len, jnp.int32).reshape((1,))
    if _legacy_4d(h, dh):
        out = _ca_decode_attend_q_4d(
            q[:, :, 0, :], k_src, v_src,
            k_scale.astype(jnp.float32), v_scale.astype(jnp.float32),
            n, interpret=bool(interpret),
        )
        return out[:, :, None, :]
    g = b * h
    out = _ca_decode_attend_q(
        q[:, :, 0, :].reshape(g, 1, dh),
        k_src.reshape(g, s, dh), v_src.reshape(g, s, dh),
        k_scale.astype(jnp.float32).reshape(g, 1, s),
        v_scale.astype(jnp.float32).reshape(g, 1, s),
        n, h=h, interpret=bool(interpret),
    )
    return out.reshape(b, h, dh)[:, :, None, :]


def decode_attn_enabled() -> bool:
    """Serving-profile switch, same contract as ring_kernel_enabled():
    default ON on a real TPU backend; force with ``DSM_DECODE_ATTN=1``
    (interpret-mode tests) or disable with ``DSM_DECODE_ATTN=0``."""
    from . import ring_kernels as _rk

    if _rk.kernels_override() is not None:
        return _rk.kernels_override()
    env = os.environ.get("DSM_DECODE_ATTN")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
