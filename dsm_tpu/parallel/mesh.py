"""Device mesh + sharding rules for multi-chip serving.

The reference is single-GPU (SURVEY.md §5: no distributed backend; batch
parallelism only).  The TPU-native analogue: shard the continuous batch
across chips over ICI with ``jax.sharding`` (pure data parallel, weights
replicated — these models are <= 2.6B), with optional tensor parallelism over
attention heads / MLP hidden for the larger presets.  XLA/GSPMD inserts the
collectives; nothing here hand-schedules communication.

Mesh axes:
  * ``dp`` — continuous-batch slots (each chip owns B/dp streams' state)
  * ``tp`` — attention heads + MLP hidden (all-reduce over ICI per block)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def _spec_for_param(path: str, leaf) -> P:
    """TP sharding rules for stacked transformer layer params.

    Leaves have a leading num_layers axis.  Column-parallel for the input
    projections (shard the fused output dim), row-parallel for the output
    projections (shard the input dim) — the standard Megatron split, which
    GSPMD turns into one psum per attention/MLP block over ICI.
    """
    if path.endswith("in_proj_w") or path.endswith("ca_q_w") or path.endswith("ca_kv_w"):
        return P(None, "tp", None)
    if path.endswith("out_proj_w") or path.endswith("ca_out_w"):
        return P(None, None, "tp")
    if path.endswith("mlp/linear_in") or path.endswith("mlp/linear1"):
        return P(None, "tp", None)
    if path.endswith("mlp/linear_out") or path.endswith("mlp/linear2"):
        return P(None, None, "tp")
    return P()  # replicated


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
    return "/".join(parts)


def shard_transformer_params(mesh: Mesh, params, tp: bool = True):
    """Place stacked transformer params on the mesh (TP-sharded or replicated)."""

    def place(path, leaf):
        spec = _spec_for_param(_path_str(path), leaf) if tp else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def replicate(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())), tree
    )


def _batch_spec(leaf, known_batch: int) -> P:
    """Shard the batch axis of a state leaf on dp.

    Per-layer KV rings are (B, H, C, Dh): batch over dp, heads over tp.
    Everything else in session state is batch-leading (conv carries,
    validity bitmaps, token buffers) or a replicated scalar (global tick).
    """
    if leaf.ndim == 4 and leaf.shape[0] == known_batch:
        return P("dp", "tp", None, None)
    if leaf.ndim >= 1 and leaf.shape[0] == known_batch:
        return P(*(("dp",) + (None,) * (leaf.ndim - 1)))
    return P()


def shard_batched_state(mesh: Mesh, state, batch: int):
    """Place a session state pytree: batch over dp, KV heads over tp."""

    def place(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, _batch_spec(leaf, batch)))

    return jax.tree_util.tree_map(place, state)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


# -- sharding trees (for AOT lowering from abstract avals; no materialized
#    weights needed to compile the flagship serving step on a mesh) --


def param_shardings(mesh: Mesh, params, tp: bool = True):
    """NamedSharding tree for a params pytree (same rules as
    :func:`shard_transformer_params`, but no device_put — usable with
    ``jax.jit(fn, in_shardings=...)`` + abstract lowering)."""

    def spec(path, leaf):
        s = _spec_for_param(_path_str(path), leaf) if tp else P()
        if len(s) > getattr(leaf, "ndim", 0):
            s = P()
        return NamedSharding(mesh, s)

    return jax.tree_util.tree_map_with_path(spec, params)


def state_shardings(mesh: Mesh, state, batch: int):
    """NamedSharding tree for a session state pytree (batch over dp)."""
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, _batch_spec(leaf, batch)), state
    )


# -- dp shard_map: per-chip Pallas kernels ----------------------------------
#
# The GSPMD path above (plain jit + NamedSharding) cannot partition
# pallas_call custom calls, so meshed engines fall back to the XLA KV paths
# (ops/ring_kernels.set_kernels_enabled).  For pure data-parallel meshes the
# continuous batch is embarrassingly parallel: shard_map runs the FULL
# serving step per chip on its own B/dp slots — Pallas kernels included,
# zero collectives (the reference has no cross-stream coupling either;
# SURVEY.md §5 distributed backend).


def _is_prng_key(leaf) -> bool:
    """True for typed PRNG-key arrays and legacy raw ``(2,)``/``(4,)``
    uint32 key buffers — these replicate, never shard over dp."""
    dt = getattr(leaf, "dtype", None)
    if dt is None:
        return False
    try:
        if jax.dtypes.issubdtype(dt, jax.dtypes.prng_key):
            return True
    except (TypeError, AttributeError):
        pass
    shape = getattr(leaf, "shape", ())
    return dt == jnp.uint32 and len(shape) == 1 and shape[0] in (2, 4)


def _dp_spec(leaf, batch: int) -> P:
    if _is_prng_key(leaf):
        return P()
    nd = getattr(leaf, "ndim", 0)
    shape = getattr(leaf, "shape", ())
    if nd >= 1 and shape[0] == batch:
        return P(*(("dp",) + (None,) * (nd - 1)))
    return P()


def dp_shard_step(mesh: Mesh, fn, batch: int, params, *example_args):
    """Wrap ``fn(params, *args)`` with shard_map over a dp-only mesh.

    ``params`` is replicated wholesale (weight leaves can accidentally have
    a leading dim equal to the batch — never shard by heuristic there).
    Every other arg/output leaf whose leading dim == ``batch`` is split
    over ``dp``; the rest (scalar tick counters, rng keys) replicate.
    Requires ``mesh.shape['tp'] == 1`` and dp | batch.  Returns the wrapped
    fn (jit it yourself, with donation if wanted).
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    if mesh.shape.get("tp", 1) != 1:
        raise ValueError("dp_shard_step requires a dp-only mesh (tp=1)")
    dp = mesh.shape["dp"]
    if batch % dp:
        raise ValueError(f"batch {batch} not divisible by dp={dp}")

    in_specs = (jax.tree_util.tree_map(lambda _: P(), params),) + tuple(
        jax.tree_util.tree_map(lambda leaf: _dp_spec(leaf, batch), a)
        for a in example_args
    )
    out_shape = jax.eval_shape(fn, params, *example_args)
    out_specs = jax.tree_util.tree_map(
        lambda leaf: _dp_spec(leaf, batch), out_shape
    )
    try:
        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except TypeError:  # older jax spells it check_rep
        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )
