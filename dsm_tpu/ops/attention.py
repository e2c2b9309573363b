"""Streaming attention with fixed ring-buffer KV caches.

TPU-native redesign of the reference's two cache flavours
(moshi-core/src/kv_cache.rs: RotatingKvCache wrapper :297-331 and
ScatteredKvCache/ScatteredCacheBuilder :20-295): one implementation, a static
``(B, H, context, Dh)`` ring per layer with a per-slot position counter.

Where the reference builds scatter indices and additive masks on the host
(kv_cache.rs:119-237, with CPU round-trips in the slow paths), here both are
pure on-device arithmetic from the position counter, so the whole step stays
inside one compiled program:

  write index   w   = pos % C
  key position  kpos[j] = p_last - ((w_last - j) mod C)   (ring unwind)
  validity      kpos >= 0  &&  kpos <= q_pos

Per-slot reset = zeroing that slot's ``pos`` (stale ring entries then resolve
to kpos < 0 and mask out — no cache zeroing needed), which is the reference's
``reset_batch_index`` (kv_cache.rs:111-117) without the host sync.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


# ---------------------------------------------------------------------------
# Rotary embeddings (interleaved pairs, = candle rope_i; transformer.rs:366-403)
# ---------------------------------------------------------------------------


def rope_cos_sin(
    positions: jax.Array, head_dim: int, max_period: float
) -> Tuple[jax.Array, jax.Array]:
    """positions (B, T) int -> cos, sin (B, T, Dh/2) f32."""
    half = head_dim // 2
    idx = jnp.arange(half, dtype=jnp.float32)
    inv_freq = 1.0 / (max_period ** (2.0 * idx / head_dim))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x (B, H, T, Dh) with interleaved rotary pairs (x0,x1),(x2,x3),..."""
    b, h, t, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, t, d // 2, 2)
    x1, x2 = xf[..., 0], xf[..., 1]
    c = cos[:, None, :, :]
    s = sin[:, None, :, :]
    o1 = x1 * c - x2 * s
    o2 = x1 * s + x2 * c
    return jnp.stack([o1, o2], axis=-1).reshape(b, h, t, d).astype(x.dtype)


# ---------------------------------------------------------------------------
# Ring-buffer KV cache
# ---------------------------------------------------------------------------


def kv_init(
    batch: int, heads: int, context: int, head_dim: int, dtype=jnp.bfloat16
) -> dict:
    return {
        "k": jnp.zeros((batch, heads, context, head_dim), dtype),
        "v": jnp.zeros((batch, heads, context, head_dim), dtype),
        "pos": jnp.zeros((batch,), jnp.int32),
    }


def global_ring_plan(pos: jax.Array, context: int, t_new: int) -> dict:
    """Ring plan with a single *global* position shared by every slot.

    This is the TPU-native cache design: because every slot writes at the
    same ring index each tick, the KV write is a ``dynamic_update_slice`` at
    a scalar index (in-place, no scatter), and per-slot stream lifecycle is
    carried by a (B, C) validity bitmap instead of per-slot positions — the
    same trick as the reference's global-cache + ``last_reset_pos`` masking
    (transformer.rs:862-959), generalised to arbitrary per-slot resets.

    ``pos`` is a scalar int32 tick counter.  Returns ``w (T,)`` write
    indices, ``q_pos (T,)``, ``k_pos (C,)`` and ``new_pos`` scalar.
    """
    t_idx = jnp.arange(t_new, dtype=jnp.int32)
    w = (pos + t_idx) % context
    q_pos = pos + t_idx
    p_last = pos + t_new - 1
    w_last = p_last % context
    j = jnp.arange(context, dtype=jnp.int32)
    k_pos = p_last - ((w_last - j) % context)
    return {"w": w, "q_pos": q_pos, "k_pos": k_pos, "new_pos": pos + t_new}


def ring_write_global(
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    plan: dict,
) -> Tuple[jax.Array, jax.Array]:
    """In-place KV append at the global ring index (caches (B, H, C, Dh)).

    When the ring capacity is a multiple of the (fixed) step frame count —
    init_state rounds it up so — a multi-frame append never wraps and lands
    as ONE contiguous dynamic_update_slice.  Two chained single-row updates
    at T=2 defeated XLA's in-place analysis and copied the whole cache
    (~9 ms/step for the Mimi codec transformer at B=128).
    """
    t_new = k_new.shape[2]
    cap = k_cache.shape[2]
    if t_new == 1 or cap % t_new == 0:
        # pos advances by t_new every step -> w[0] is a multiple of t_new
        # and the t_new rows are contiguous, no wrap.
        k_cache = jax.lax.dynamic_update_slice_in_dim(
            k_cache, k_new.astype(k_cache.dtype), plan["w"][0], axis=2
        )
        v_cache = jax.lax.dynamic_update_slice_in_dim(
            v_cache, v_new.astype(v_cache.dtype), plan["w"][0], axis=2
        )
        return k_cache, v_cache
    for t in range(t_new):
        k_cache = jax.lax.dynamic_update_slice_in_dim(
            k_cache, k_new[:, :, t : t + 1, :].astype(k_cache.dtype),
            plan["w"][t], axis=2,
        )
        v_cache = jax.lax.dynamic_update_slice_in_dim(
            v_cache, v_new[:, :, t : t + 1, :].astype(v_cache.dtype),
            plan["w"][t], axis=2,
        )
    return k_cache, v_cache


def update_valid_bitmap(
    valid: jax.Array, plan: dict, mask: Optional[jax.Array]
) -> jax.Array:
    """Mark the rows written this step valid per slot (False for inactive
    slots — their ring rows hold garbage and stay masked)."""
    b, cap = valid.shape
    m = mask if mask is not None else jnp.ones((b,), bool)
    t_new = plan["w"].shape[0]
    if t_new == 1 or cap % t_new == 0:
        return jax.lax.dynamic_update_slice_in_dim(
            valid, jnp.broadcast_to(m[:, None], (b, t_new)), plan["w"][0], axis=1
        )
    for t in range(t_new):
        valid = jax.lax.dynamic_update_slice_in_dim(
            valid, m[:, None], plan["w"][t], axis=1
        )
    return valid


def pack4(q: jax.Array) -> jax.Array:
    """Pack int4 values in [-7, 7] (last dim even) into uint8 nibbles.

    Excess-8 encoding (stored = q + 8) keeps both nibbles non-negative so
    pack/unpack is pure add/mul/div — no sign-extension tricks, Mosaic- and
    XLA-friendly.  Layout is DEINTERLEAVED: byte d holds dims (d, d + Dh/2)
    — low nibbles are the first half of the feature dim, high nibbles the
    second — so the unpacked halves concatenate contiguously.
    """
    d = q.shape[-1]
    u = (q.astype(jnp.int32) + 8).astype(jnp.uint8)
    lo, hi = u[..., : d // 2], u[..., d // 2 :]
    return lo | (hi << 4)


def unpack4(p: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Inverse of :func:`pack4`: uint8 nibbles -> values, concat [lo, hi]."""
    pi = p.astype(jnp.int32)
    lo = (pi & 15) - 8
    hi = (pi >> 4) - 8
    return jnp.concatenate([lo, hi], axis=-1).astype(dtype)


def quantize_kv_rows_packed4(k_new: jax.Array, v_new: jax.Array):
    """Per-row int4 quantisation, nibble-packed into uint8 (half the int8
    ring bytes; the int4 serving profile).  Returns packed (B, H, T, Dh/2)
    uint8 + f32 scales."""
    def one(x):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
        scale = jnp.maximum(amax, 1e-8) / 7.0
        q = jnp.clip(
            jnp.round(x.astype(jnp.float32) / scale[..., None]), -7, 7
        ).astype(jnp.int32)
        return pack4(q), scale

    kq, ks = one(k_new)
    vq, vs = one(v_new)
    return kq, vq, ks, vs


def attend_global_split_q4(
    q, k_cache_old, v_cache_old, k_scale, v_scale, k_new, v_new, plan,
    valid_old, window: int
):
    """attend_global_split_q over a nibble-packed int4 ring (XLA path:
    unpack, then identical math)."""
    kc = unpack4(k_cache_old, jnp.bfloat16)
    vc = unpack4(v_cache_old, jnp.bfloat16)
    # unpack4 emits [first-half dims, second-half dims] == pack4's input
    # layout, so no permutation is needed.
    head_dim = q.shape[-1]
    scale = 1.0 / math.sqrt(head_dim)
    b, h, t, _ = q.shape
    c = kc.shape[2]

    scores_c = jnp.einsum(
        "bhtd,bhcd->bhtc", q, kc.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    scores_c = scores_c * (k_scale[:, :, None, :] * scale)
    k_pos = plan["k_pos"][None, :]
    q_pos = plan["q_pos"][None, :]
    ok = (
        (k_pos[:, None, :] >= 0)
        & (k_pos[:, None, :] <= q_pos[:, :, None])
        & (q_pos[:, :, None] - k_pos[:, None, :] < window)
    )
    j = jnp.arange(c)
    stale = jnp.zeros((c,), bool)
    for ti in range(t):
        stale = stale | (j == plan["w"][ti])
    ok = ok & ~stale[None, None, :] & valid_old[:, None, :]
    scores_c = jnp.where(ok[:, None, :, :], scores_c, NEG_INF)

    scores_s = jnp.einsum(
        "bhtd,bhsd->bhts", q, k_new.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    intra = jnp.tril(jnp.ones((t, t), bool))
    scores_s = jnp.where(intra[None, None], scores_s, NEG_INF)

    probs = jax.nn.softmax(jnp.concatenate([scores_c, scores_s], -1), axis=-1)
    pc, ps = probs[..., :c], probs[..., c:]
    pc = pc * v_scale[:, :, None, :]
    out = jnp.einsum(
        "bhtc,bhcd->bhtd", pc.astype(jnp.bfloat16), vc,
        preferred_element_type=jnp.float32,
    ) + jnp.einsum(
        "bhts,bhsd->bhtd", ps.astype(v_new.dtype), v_new,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def quantize_kv_rows(k_new: jax.Array, v_new: jax.Array, dtype=jnp.int8):
    """Per-row symmetric integer quantisation of fresh KV frames.

    Returns (k_q, v_q ``dtype``, k_scale, v_scale (B, H, T) f32).  The
    scales fold into the attention as post-scaling (scores * k_scale per
    key row; probs * v_scale before the V matmul), so dequantisation costs
    no extra HBM pass — the cache read halves vs bf16 at int8, quarters at
    int4 (opt-in serving profile; quality bound in tests/test_kv_int4.py).
    """
    qmax = 7.0 if dtype == jnp.int4 else 127.0

    def one(x):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
        scale = jnp.maximum(amax, 1e-8) / qmax
        q = jnp.clip(
            jnp.round(x.astype(jnp.float32) / scale[..., None]), -qmax, qmax
        ).astype(dtype)
        return q, scale

    kq, ks = one(k_new)
    vq, vs = one(v_new)
    return kq, vq, ks, vs


def attend_global_split_q(
    q: jax.Array,
    k_cache_old: jax.Array,  # int8 (B, H, C, Dh)
    v_cache_old: jax.Array,  # int8
    k_scale: jax.Array,      # f32 (B, H, C)
    v_scale: jax.Array,
    k_new: jax.Array,        # bf16 fresh rows (B, H, T, Dh)
    v_new: jax.Array,
    plan: dict,
    valid_old: jax.Array,
    window: int,
) -> jax.Array:
    """attend_global_split over an int8-quantised ring cache."""
    head_dim = q.shape[-1]
    scale = 1.0 / math.sqrt(head_dim)
    b, h, t, _ = q.shape
    c = k_cache_old.shape[2]

    scores_c = jnp.einsum(
        "bhtd,bhcd->bhtc", q, k_cache_old.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    scores_c = scores_c * (k_scale[:, :, None, :] * scale)
    k_pos = plan["k_pos"][None, :]
    q_pos = plan["q_pos"][None, :]
    ok = (
        (k_pos[:, None, :] >= 0)
        & (k_pos[:, None, :] <= q_pos[:, :, None])
        & (q_pos[:, :, None] - k_pos[:, None, :] < window)
    )
    j = jnp.arange(c)
    stale = jnp.zeros((c,), bool)
    for ti in range(t):
        stale = stale | (j == plan["w"][ti])
    ok = ok & ~stale[None, None, :] & valid_old[:, None, :]
    scores_c = jnp.where(ok[:, None, :, :], scores_c, NEG_INF)

    scores_s = jnp.einsum(
        "bhtd,bhsd->bhts", q, k_new.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    intra = jnp.tril(jnp.ones((t, t), bool))
    scores_s = jnp.where(intra[None, None], scores_s, NEG_INF)

    probs = jax.nn.softmax(jnp.concatenate([scores_c, scores_s], -1), axis=-1)
    pc, ps = probs[..., :c], probs[..., c:]
    pc = pc * v_scale[:, :, None, :]  # fold V dequant into the probs
    out = jnp.einsum(
        "bhtc,bhcd->bhtd", pc.astype(jnp.bfloat16),
        v_cache_old.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) + jnp.einsum(
        "bhts,bhsd->bhtd", ps.astype(v_new.dtype), v_new,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def attend_global_split(
    q: jax.Array,
    k_cache_old: jax.Array,
    v_cache_old: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    plan: dict,
    valid_old: jax.Array,
    window: int,
) -> jax.Array:
    """Attention split into past-cache + this-step's fresh K/V.

    Numerically identical to writing the new rows then attending, but the
    ring buffers are only *read* here (their update's sole consumer is the
    state carry), which lets XLA keep the dynamic_update_slice in place —
    attending over the just-updated buffer forces a full-cache copy per
    layer (~11 ms/step at stt-1b serving shapes).

    ``valid_old`` is the bitmap *before* this step's update; ring slots
    being overwritten this step hold stale entries and are masked out.
    """
    head_dim = q.shape[-1]
    scale = 1.0 / math.sqrt(head_dim)
    b, h, t, _ = q.shape
    c = k_cache_old.shape[2]

    scores_c = jnp.einsum(
        "bhtd,bhcd->bhtc", q, k_cache_old.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    k_pos = plan["k_pos"][None, :]
    q_pos = plan["q_pos"][None, :]
    ok = (
        (k_pos[:, None, :] >= 0)
        & (k_pos[:, None, :] <= q_pos[:, :, None])
        & (q_pos[:, :, None] - k_pos[:, None, :] < window)
    )
    # Mask the slots being overwritten this step (stale in the old cache).
    j = jnp.arange(c)
    stale = jnp.zeros((c,), bool)
    for ti in range(t):
        stale = stale | (j == plan["w"][ti])
    ok = ok & ~stale[None, None, :]
    ok = ok & valid_old[:, None, :]
    scores_c = jnp.where(ok[:, None, :, :], scores_c, NEG_INF)

    scores_s = jnp.einsum(
        "bhtd,bhsd->bhts", q, k_new.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    intra = jnp.tril(jnp.ones((t, t), bool))
    scores_s = jnp.where(intra[None, None], scores_s, NEG_INF)

    scores = jnp.concatenate([scores_c, scores_s], axis=-1)
    probs = jax.nn.softmax(scores, axis=-1)
    pc, ps = probs[..., :c], probs[..., c:]
    out = jnp.einsum(
        "bhtc,bhcd->bhtd", pc.astype(v_cache_old.dtype), v_cache_old,
        preferred_element_type=jnp.float32,
    ) + jnp.einsum(
        "bhts,bhsd->bhtd", ps.astype(v_new.dtype), v_new,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def attend_global(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    plan: dict,
    valid: jax.Array,
    window: int,
) -> jax.Array:
    """Causal windowed attention with the global-ring plan + validity bitmap."""
    head_dim = q.shape[-1]
    scale = 1.0 / math.sqrt(head_dim)
    scores = jnp.einsum(
        "bhtd,bhcd->bhtc",
        q,
        k_cache.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scale
    k_pos = plan["k_pos"][None, :]  # (1, C)
    q_pos = plan["q_pos"][None, :]  # (1, T)
    ok = (
        (k_pos[:, None, :] >= 0)
        & (k_pos[:, None, :] <= q_pos[:, :, None])
        & (q_pos[:, :, None] - k_pos[:, None, :] < window)
    )  # (1, T, C)
    ok = ok & valid[:, None, :]  # (B, T, C)
    scores = jnp.where(ok[:, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhtc,bhcd->bhtd",
        probs.astype(v_cache.dtype),
        v_cache,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def ring_plan(
    pos: jax.Array, context: int, t_new: int, mask: Optional[jax.Array] = None
) -> dict:
    """Compute the write/read plan for appending ``t_new`` frames.

    The plan is shared by every layer of a transformer (all layers append in
    lock-step), so it is computed once per step:
      * ``w (B, T)``      ring write indices
      * ``q_pos (B, T)``  absolute positions of the queries
      * ``k_pos (B, C)``  absolute position stored at each ring slot *after*
                          the append (< 0 = never written since reset)
      * ``new_pos (B,)``  advanced position counters (mask-aware)
    """
    b = pos.shape[0]
    t_idx = jnp.arange(t_new, dtype=jnp.int32)
    w = (pos[:, None] + t_idx[None, :]) % context
    q_pos = pos[:, None] + t_idx[None, :]
    p_last = pos + t_new - 1
    w_last = p_last % context
    j = jnp.arange(context, dtype=jnp.int32)[None, :]
    dist = (w_last[:, None] - j) % context
    k_pos = p_last[:, None] - dist
    if mask is None:
        new_pos = pos + t_new
    else:
        new_pos = pos + jnp.where(mask, t_new, 0).astype(pos.dtype)
    return {"w": w, "q_pos": q_pos, "k_pos": k_pos, "new_pos": new_pos}


def ring_write(
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    plan: dict,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Scatter T new K/V frames into the ring (caches (B, H, C, Dh)).

    Slots with ``mask == False`` rewrite their current contents (a (B,H,1,Dh)
    gather + select), avoiding a full-cache ``where`` — the HBM-cheap
    equivalent of the reference's inactive-slot scatter
    (kv_cache.rs:28-42 + batched mask logic).
    """
    b = k_cache.shape[0]
    b_idx = jnp.arange(b)
    t_new = k_new.shape[2]
    for t in range(t_new):  # static and small (1-2)
        w = plan["w"][:, t]
        kt = k_new[:, :, t, :].astype(k_cache.dtype)
        vt = v_new[:, :, t, :].astype(v_cache.dtype)
        if mask is not None:
            m = mask[:, None, None]
            kt = jnp.where(m, kt, k_cache[b_idx, :, w, :])
            vt = jnp.where(m, vt, v_cache[b_idx, :, w, :])
        k_cache = k_cache.at[b_idx, :, w, :].set(kt)
        v_cache = v_cache.at[b_idx, :, w, :].set(vt)
    return k_cache, v_cache


def attend_kv(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    q_pos: jax.Array,
    k_pos: jax.Array,
    window: Optional[int] = None,
) -> jax.Array:
    """Causal windowed attention of ``q (B,H,T,Dh)`` over the ring cache.

    ``window`` is the sliding attention context (number of most recent
    positions visible).  The ring capacity may exceed it by step_t - 1 so
    that multi-frame appends don't evict keys still inside the window of the
    step's first query (the reference keeps ``context + t`` entries for the
    same reason; transformer.rs:497-506).
    """
    head_dim = q.shape[-1]
    scale = 1.0 / math.sqrt(head_dim)
    scores = jnp.einsum(
        "bhtd,bhcd->bhtc",
        q,
        k_cache.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scale
    valid = (k_pos[:, None, :] >= 0) & (k_pos[:, None, :] <= q_pos[:, :, None])
    if window is not None:
        valid = valid & (q_pos[:, :, None] - k_pos[:, None, :] < window)
    scores = jnp.where(valid[:, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhtc,bhcd->bhtd",
        probs.astype(v_cache.dtype),
        v_cache,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


# Convenience single-layer API (used by unit tests).


def kv_append(
    cache: dict,
    k_new: jax.Array,
    v_new: jax.Array,
    mask: Optional[jax.Array] = None,
) -> Tuple[dict, dict]:
    context = cache["k"].shape[2]
    plan = ring_plan(cache["pos"], context, k_new.shape[2], mask)
    k_cache, v_cache = ring_write(cache["k"], cache["v"], k_new, v_new, plan, mask)
    return {"k": k_cache, "v": v_cache, "pos": plan["new_pos"]}, plan


def attend(q: jax.Array, cache: dict, plan: dict) -> jax.Array:
    return attend_kv(q, cache["k"], cache["v"], plan["q_pos"], plan["k_pos"])


# ---------------------------------------------------------------------------
# Cross attention (precomputed KV; transformer.rs:204-364)
# ---------------------------------------------------------------------------


def cross_attend_q(
    q: jax.Array,
    k_src: jax.Array,   # int8 (B, H, S_pad, Dh)
    v_src: jax.Array,
    k_scale: jax.Array,  # f32 (B, H, S_pad)
    v_scale: jax.Array,
    s_len,
) -> jax.Array:
    """cross_attend over an int8-quantised source (scales folded as post-
    scaling, padding rows masked).  XLA fallback for the fused kernel
    (ops/decode_attn.ca_decode_attend)."""
    head_dim = q.shape[-1]
    scale = 1.0 / math.sqrt(head_dim)
    s = k_src.shape[2]
    scores = jnp.einsum(
        "bhtd,bhsd->bhts", q, k_src.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    scores = scores * (k_scale[:, :, None, :] * scale)
    ok = jnp.arange(s) < s_len
    scores = jnp.where(ok[None, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs * v_scale[:, :, None, :]
    out = jnp.einsum(
        "bhts,bhsd->bhtd", probs.astype(q.dtype), v_src.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def cross_attend(q: jax.Array, ca_k: jax.Array, ca_v: jax.Array) -> jax.Array:
    """q (B,H,T,Dh) over static source K/V (B,H,S,Dh); no mask (full vision)."""
    head_dim = q.shape[-1]
    scale = 1.0 / math.sqrt(head_dim)
    scores = jnp.einsum(
        "bhtd,bhsd->bhts", q, ca_k.astype(q.dtype), preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(scores * scale, axis=-1)
    out = jnp.einsum(
        "bhts,bhsd->bhtd",
        probs.astype(ca_v.dtype),
        ca_v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)
