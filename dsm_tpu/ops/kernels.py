"""Pallas TPU kernels for the streaming hot path.

``ring_write_kernel``: in-place per-slot KV ring-buffer row write.

The XLA scatter that a ``cache.at[arange(B), :, w, :].set(...)`` lowers to
costs ~50 ms/step at (B=64, H=16, C=750, Dh=128) on v5e — it rewrites far
more than the touched rows.  The actual work is 64 strided row copies of a
few KB each; this kernel issues exactly those DMAs (grid over batch slots,
one async copy per new frame) against HBM-resident caches aliased in-place,
and skips inactive slots entirely (cleaner than the reference's
overwrite-at-current-index behaviour for masked slots,
kv_cache.rs:130-170).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ring_write_kernel(w_ref, m_ref, knew_blk, vnew_blk, kc, vc, ko, vo, sem_k, sem_v):
    # Grid (B, T).  knew_blk/vnew_blk are (1, H, 1, Dh) VMEM blocks for this
    # (slot, frame); kc/vc are the full HBM caches aliased to ko/vo.  The
    # only memory this program touches is one (H, Dh) cache row.
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(m_ref[b] != 0)
    def _():
        w = w_ref[b, t]
        ck = pltpu.make_async_copy(
            knew_blk, ko.at[pl.ds(b, 1), :, pl.ds(w, 1), :], sem_k
        )
        cv = pltpu.make_async_copy(
            vnew_blk, vo.at[pl.ds(b, 1), :, pl.ds(w, 1), :], sem_v
        )
        ck.start()
        cv.start()
        ck.wait()
        cv.wait()


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _ring_write_tpu(
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    w: jax.Array,
    mask: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    b, h, _, dh = k_cache.shape
    t_new = k_new.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # w (B, T), mask (B,)
        grid=(b, t_new),
        in_specs=[
            pl.BlockSpec(
                (1, h, 1, dh), lambda i, t, *_: (i, 0, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, h, 1, dh), lambda i, t, *_: (i, 0, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # k_cache (stays in HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),  # v_cache
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        _ring_write_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        # inputs: [w, mask, k_new, v_new, k_cache, v_cache] -> alias caches.
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(w, mask.astype(jnp.int32), k_new, v_new, k_cache, v_cache)


def ring_write_inplace(
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    w: jax.Array,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Write T new KV rows per slot at ring indices ``w (B, T)``, in place.

    On TPU this is the Pallas DMA kernel; on CPU (tests) it falls back to the
    jnp scatter path.  Inactive slots (mask False) are not written at all.
    """
    if mask is None:
        mask = jnp.ones((k_cache.shape[0],), bool)
    if jax.default_backend() == "tpu" or _is_tpu_like():
        return _ring_write_tpu(
            k_cache, v_cache, k_new.astype(k_cache.dtype),
            v_new.astype(v_cache.dtype), w, mask,
        )
    b_idx = jnp.arange(k_cache.shape[0])
    for t in range(k_new.shape[2]):
        wt = w[:, t]
        kt = k_new[:, :, t, :].astype(k_cache.dtype)
        vt = v_new[:, :, t, :].astype(v_cache.dtype)
        m = mask[:, None, None]
        kt = jnp.where(m, kt, k_cache[b_idx, :, wt, :])
        vt = jnp.where(m, vt, v_cache[b_idx, :, wt, :])
        k_cache = k_cache.at[b_idx, :, wt, :].set(kt)
        v_cache = v_cache.at[b_idx, :, wt, :].set(vt)
    return k_cache, v_cache


def _is_tpu_like() -> bool:
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu",) or "tpu" in str(jax.devices()[0]).lower()
