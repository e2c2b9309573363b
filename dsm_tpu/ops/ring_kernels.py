"""Pallas TPU ring-commit kernel: in-place KV ring row writes.

Replaces the XLA ``dynamic_update_slice`` KV append of the global-ring cache
(ops/attention.ring_write_global) on the serving hot path.  The XLA update of
a ``(B, H, T, Dh)`` slab inside a ``(B, H, C, Dh)`` ring shatters into ~B*H
partial-tile read-modify-writes (one sub-sublane row per (b, h) pane), which
is DMA-latency-bound: ~9 ms/step of the Mimi codec transformer's 11 ms and
~4 ms of the LM's 16 ms at B=128 (docs/PERFORMANCE.md).

This kernel instead streams the *aligned row-block* containing the write
position through VMEM (block shapes respect the (sublane, lane) tiling), and
replaces the T target rows with a vector select — so the HBM traffic is a
handful of full-tile DMAs per (batch-block, layer) instead of ~B*H
descriptor-latency-bound partial tiles.  The rings are aliased in place
(``input_output_aliases``); everything outside the touched row-block is
untouched memory.

This is the TPU-native replacement for the reference's scatter append
(moshi-core/src/kv_cache.rs:119-173): same effect (append T frames at the
ring head), no scatter, no per-slot work — the global ring design makes every
slot's write index identical.

Environment note: manual ``make_async_copy`` DMA kernels crash this
environment's remote kernel compiler (a first attempt written that way was
dropped).  This kernel uses only block copies + scalar prefetch + vector
selects.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_block(dtype) -> int:
    """Ring rows per VMEM block: the native second-minor tile size."""
    if dtype == jnp.int8 or dtype == jnp.uint8:
        return 32  # uint8: the nibble-packed int4 rings (attention.pack4)
    if dtype == jnp.bfloat16 or dtype == jnp.float16:
        return 16
    return 8


def _select_rows(w_ref, r, t, new_blk, old_blk, axis=2):
    """Replace ring rows [w%r, w%r+t) of ``old_blk`` along ``axis``."""
    wm = w_ref[0] % r
    shape = [1] * old_blk.ndim
    shape[axis] = r
    rows = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), axis)
    out = old_blk[...]
    idx = [slice(None)] * old_blk.ndim
    for ti in range(t):
        sel = rows == (wm + ti)
        idx[axis] = slice(ti, ti + 1)
        out = jnp.where(sel, new_blk[tuple(idx)], out)
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ring_commit_q(k_cache, v_cache, ks_cache, vs_cache,
                   k_new, v_new, ks_new, vs_new, w, *, interpret=False):
    b, h, t, dh = k_new.shape
    cap = k_cache.shape[2]
    r = min(_row_block(k_cache.dtype), cap)
    # Scales are (B, H, C): their ring dim is the *lane* dim, so blocks span
    # 128 ring slots (full lane tiles); K/V blocks span ``r`` sublane rows.
    rs = min(128, cap)
    # Mosaic double-buffers every in/out block; at h=32 presets (stt-2.6b,
    # tts_202501) the 16-row batch block overflows the 16 MB scoped-VMEM
    # limit (measured 18 MB at h32/dh64/cap384/B64) — the wider scale
    # blocks and select temporaries outgrow what h<=16 configs fit.  Halve
    # the batch block there; h<=16 keeps the proven headline program.
    bb = min(b, 16 if h <= 16 else 8)

    def kernel(w_ref, kn, vn, ksn, vsn, kcb, vcb, kscb, vscb,
               ko, vo, kso, vso):
        ko[...] = _select_rows(w_ref, r, t, kn, kcb)
        vo[...] = _select_rows(w_ref, r, t, vn, vcb)
        kso[...] = _select_rows(w_ref, rs, t, ksn, kscb, axis=2)
        vso[...] = _select_rows(w_ref, rs, t, vsn, vscb, axis=2)

    kv_spec_new = pl.BlockSpec((bb, h, t, dh), lambda i, w_ref: (i, 0, 0, 0))
    kv_spec_blk = pl.BlockSpec(
        (bb, h, r, dh), lambda i, w_ref: (i, 0, w_ref[0] // r, 0)
    )
    s_spec_new = pl.BlockSpec((bb, h, t), lambda i, w_ref: (i, 0, 0))
    s_spec_blk = pl.BlockSpec(
        (bb, h, rs), lambda i, w_ref: (i, 0, w_ref[0] // rs)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb,),
        in_specs=[kv_spec_new, kv_spec_new, s_spec_new, s_spec_new,
                  kv_spec_blk, kv_spec_blk, s_spec_blk, s_spec_blk],
        out_specs=(kv_spec_blk, kv_spec_blk, s_spec_blk, s_spec_blk),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(ks_cache.shape, ks_cache.dtype),
            jax.ShapeDtypeStruct(vs_cache.shape, vs_cache.dtype),
        ),
        # inputs: [w, k_new, v_new, ks_new, vs_new, kc, vc, ksc, vsc]
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        interpret=interpret,
    )(w, k_new, v_new, ks_new, vs_new, k_cache, v_cache, ks_cache, vs_cache)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ring_commit(k_cache, v_cache, k_new, v_new, w, *, interpret=False):
    b, h, t, dh = k_new.shape
    cap = k_cache.shape[2]
    r = _row_block(k_cache.dtype)
    r = min(r, cap)
    bb = min(b, 16)

    def kernel(w_ref, kn, vn, kcb, vcb, ko, vo):
        ko[...] = _select_rows(w_ref, r, t, kn, kcb)
        vo[...] = _select_rows(w_ref, r, t, vn, vcb)

    def new_map(i, w_ref):
        del w_ref
        return (i, 0, 0, 0)

    def blk_map(i, w_ref):
        return (i, 0, w_ref[0] // r, 0)

    kv_spec_new = pl.BlockSpec((bb, h, t, dh), new_map)
    kv_spec_blk = pl.BlockSpec((bb, h, r, dh), blk_map)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb,),
        in_specs=[kv_spec_new, kv_spec_new, kv_spec_blk, kv_spec_blk],
        out_specs=(kv_spec_blk, kv_spec_blk),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(w, k_new, v_new, k_cache, v_cache)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _scale_commit(ks_cache, vs_cache, ks_new, vs_new, w, *, interpret=False):
    b, h, t = ks_new.shape
    cap = ks_cache.shape[2]
    rs = min(128, cap)
    bb = min(b, 16 if h <= 16 else 8)

    def kernel(w_ref, ksn, vsn, kscb, vscb, kso, vso):
        kso[...] = _select_rows(w_ref, rs, t, ksn, kscb, axis=2)
        vso[...] = _select_rows(w_ref, rs, t, vsn, vscb, axis=2)

    s_spec_new = pl.BlockSpec((bb, h, t), lambda i, w_ref: (i, 0, 0))
    s_spec_blk = pl.BlockSpec(
        (bb, h, rs), lambda i, w_ref: (i, 0, w_ref[0] // rs)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb,),
        in_specs=[s_spec_new, s_spec_new, s_spec_blk, s_spec_blk],
        out_specs=(s_spec_blk, s_spec_blk),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(ks_cache.shape, ks_cache.dtype),
            jax.ShapeDtypeStruct(vs_cache.shape, vs_cache.dtype),
        ),
        # inputs: [w, ks_new, vs_new, ksc, vsc]
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(w, ks_new, vs_new, ks_cache, vs_cache)


def scale_commit_supported(ks_cache, ks_new) -> bool:
    b, h, t = ks_new.shape
    cap = ks_cache.shape[2]
    rs = min(128, cap)
    bb = min(b, 16 if h <= 16 else 8)
    return cap % rs == 0 and rs % t == 0 and b % bb == 0


def scale_commit(ks_cache, vs_cache, ks_new, vs_new, w, *,
                 interpret: Optional[bool] = None):
    """Append the fresh KV scale rows at scalar ring index ``w``, in place —
    the scale half of :func:`ring_commit`, standalone.  Used by the fused
    commit+attend path (ops/decode_attn.decode_attend_commit): the scale
    rings commit FIRST (this kernel is their only consumer, so the aliased
    update stays in place) and the fused kernel then reads the committed
    scales while attending and committing the int8 K/V rows itself."""
    if not scale_commit_supported(ks_cache, ks_new):
        raise ValueError(
            f"scale_commit unsupported shapes: cache {ks_cache.shape}, "
            f"new {ks_new.shape}"
        )
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except Exception:
            interpret = True
    w_arr = jnp.asarray(w, jnp.int32).reshape((1,))
    return _scale_commit(
        ks_cache, vs_cache, ks_new.astype(ks_cache.dtype),
        vs_new.astype(vs_cache.dtype), w_arr, interpret=interpret,
    )


def supported(k_cache, k_new, quantized: bool) -> bool:
    b, h, t, dh = k_new.shape
    cap = k_cache.shape[2]
    r = min(_row_block(k_cache.dtype), cap)
    bb = min(b, 16)
    if cap % r or b % bb:
        return False
    # T rows must not straddle a row-block boundary: writes land at
    # w ≡ 0 (mod t) (transformer.init_state rounds capacity), so t | r works.
    if r % t:
        return False
    if quantized:
        rs = min(128, cap)
        if cap % rs or rs % t:
            return False
    return True


def ring_commit(
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    w,
    ks_cache: Optional[jax.Array] = None,
    vs_cache: Optional[jax.Array] = None,
    ks_new: Optional[jax.Array] = None,
    vs_new: Optional[jax.Array] = None,
    *,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, ...]:
    """Append ``T`` contiguous ring rows at scalar index ``w``, in place.

    Requires the global-ring invariants from transformer.init_state: the ring
    capacity is a multiple of the row-block and ``w`` a multiple of T (a
    fixed-cadence stream appends contiguous, non-wrapping blocks).  With the
    optional int8 scale rings (serving profile) all four updates ride one
    kernel launch.  Returns the updated caches: ``(k, v)`` or
    ``(k, v, ks, vs)``.
    """
    if not supported(k_cache, k_new, ks_cache is not None):
        raise ValueError(
            f"ring_commit unsupported shapes: cache {k_cache.shape} "
            f"{k_cache.dtype}, new {k_new.shape}"
        )
    if interpret is None:  # interpret everywhere but a real TPU backend
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except Exception:
            interpret = True
    w_arr = jnp.asarray(w, jnp.int32).reshape((1,))
    if ks_cache is not None:
        return _ring_commit_q(
            k_cache, v_cache, ks_cache, vs_cache,
            k_new.astype(k_cache.dtype), v_new.astype(v_cache.dtype),
            ks_new.astype(ks_cache.dtype), vs_new.astype(vs_cache.dtype),
            w_arr, interpret=interpret,
        )
    return _ring_commit(
        k_cache, v_cache, k_new.astype(k_cache.dtype),
        v_new.astype(v_cache.dtype), w_arr, interpret=interpret,
    )


# Kernel gate: None = per-kernel env/platform default; False = all Pallas
# serving kernels off.  tp-meshed engines trace with False — pallas_call
# is a custom call GSPMD cannot partition, so under a tp-sharded jit the
# XLA paths (which GSPMD shards cleanly) are the multi-chip
# implementation.  The override is THREAD-LOCAL and scoped (context
# manager): a process-global flag would silently strip the kernels from
# every other engine traced afterwards in the same worker.
import contextlib
import threading

_TLS = threading.local()


@contextlib.contextmanager
def kernels_forced(value):
    """Scope a kernel on/off override to the enclosed block — wrap the
    *body* of a jitted step so it applies exactly while that step traces
    (enabled() checks run at trace time)."""
    prev = getattr(_TLS, "override", None)
    _TLS.override = value
    try:
        yield
    finally:
        _TLS.override = prev


def set_kernels_enabled(value) -> None:
    """Thread-local, unscoped variant of :func:`kernels_forced` (None
    restores the env/platform default)."""
    _TLS.override = value


def kernels_override():
    return getattr(_TLS, "override", None)


def ring_kernel_enabled() -> bool:
    """Serving-profile switch: use the Pallas commit kernel on TPU.

    Default ON when running on a real TPU backend; force with
    ``DSM_RING_KERNEL=1`` (interpret-mode tests force the path on CPU) or
    disable with ``DSM_RING_KERNEL=0``.
    """
    if kernels_override() is not None:
        return kernels_override()
    env = os.environ.get("DSM_RING_KERNEL")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
