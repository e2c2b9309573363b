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
    if dp * tp > n:
        raise ValueError(f"dp*tp = {dp}*{tp} > {n} devices")
    # A mesh smaller than the machine is valid (e.g. two modules from one
    # TOML each meshing a subset); take the leading devices.
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def _spec_for_param(path: str, leaf) -> P:
    """TP sharding rules for stacked transformer layer params.

    Leaves have leading stacking axes — (L, out, in) for the main
    transformer, (S, L, out, in) for the depformer's per-slice stacks —
    and the projection dims are always the LAST two.  Column-parallel for
    the input projections (shard the fused output dim), row-parallel for
    the output projections (shard the input dim) — the standard Megatron
    split, which GSPMD turns into one psum per attention/MLP block over
    ICI.
    """
    nd = getattr(leaf, "ndim", 0)
    # Weight-only-int8 dicts (ops/transformer.quantize_weights) hang a
    # {"q": int8, "s": per-out-channel f32} pair under the dense leaf's
    # name: "q" shards exactly like the dense weight; "s" follows the OUT
    # dim (sharded for column-parallel, replicated for row-parallel).
    quant_leaf = None
    if path.endswith("/q") or path.endswith("/s"):
        quant_leaf = path[-1]
        path = path[:-2]
    col = (
        path.endswith("in_proj_w") or path.endswith("ca_q_w")
        or path.endswith("ca_kv_w") or path.endswith("mlp/linear_in")
        or path.endswith("mlp/linear1")
    )
    row = (
        path.endswith("out_proj_w") or path.endswith("ca_out_w")
        or path.endswith("mlp/linear_out") or path.endswith("mlp/linear2")
    )
    if not (col or row):
        return P()
    if quant_leaf == "s":
        return P(*(None,) * (nd - 1), "tp") if col else P()
    if nd < 2:
        return P()
    lead = (None,) * (nd - 2)
    return P(*lead, "tp", None) if col else P(*lead, None, "tp")


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


# -- dp x tp shard_map: per-chip Pallas kernels WITH head-sharded tp --------
#
# GSPMD tp (the NamedSharding rules above) cannot partition pallas_call, so
# tp meshes used to trace with the kernels off.  shard_map removes the
# limitation: each chip runs the serving step over its own batch slice AND
# head slice with the kernels live, and the transformer reduces the three
# row-parallel projections itself (ops/transformer.py `tp_axis` psums —
# the standard Megatron split, one psum per attention/CA/MLP block).
#
# Division of labour: the MAIN LM transformer is head/hidden-sharded; the
# depformer, codec transformer, embeddings, heads and sampling are small
# and run replicated per shard (deterministic → all shards agree).

_TP_INTERLEAVE = {
    # fused-projection row blocks that a contiguous tp split would cross:
    # in_proj rows are [q|k|v], ca_kv rows [k|v], gated mlp rows [a|b]
    "in_proj_w": 3, "in_proj_b": 3, "ca_kv_w": 2, "linear_in": 2,
}
_TP_ROW_SHARD = (
    "in_proj_w", "in_proj_b", "ca_q_w", "ca_kv_w", "linear_in", "linear1"
)
_TP_COL_SHARD = ("out_proj_w", "ca_out_w", "linear_out", "linear2")


def _lm_transformer_path(parts) -> bool:
    """True for leaves of the MAIN LM transformer stack (params["lm"]
    ["transformer"]...).  The codec transformer (params["mimi"]...) and the
    depformer stay replicated."""
    return "lm" in parts and "transformer" in parts and "depformer" not in parts


def permute_tp_params(params, tp: int):
    """Pre-permute fused projection rows of the LM main transformer so a
    contiguous tp split yields per-shard [q|k|v] / [k|v] / [a|b] blocks in
    the standard layout (ops/transformer._qkv reshapes then work unchanged
    with the per-shard head count).  Apply BEFORE quantize_weights."""

    def perm(path, leaf):
        parts = _path_str(path).split("/")
        if not _lm_transformer_path(parts):
            return leaf
        # int8-quantised leaves appear as .../<name>/q and .../<name>/s;
        # quantisation is per-output-row, so permuting q and s rows is
        # exactly equivalent to permuting before quantize_weights.
        name = parts[-1]
        if name in ("q", "s") and len(parts) >= 2:
            name = parts[-2]
        groups = _TP_INTERLEAVE.get(name)
        if groups is None:
            return leaf
        w = np.asarray(leaf)
        L, O = w.shape[0], w.shape[1]
        if O % (groups * tp):
            raise ValueError(
                f"{_path_str(path)}: fused dim {O} not divisible by "
                f"{groups}*tp={groups * tp}"
            )
        rest = w.shape[2:]
        w = w.reshape((L, groups, tp, O // (groups * tp)) + rest)
        w = w.swapaxes(1, 2).reshape((L, O) + rest)
        return jnp.asarray(w)

    return jax.tree_util.tree_map_with_path(perm, params)


def _tp_param_spec(path, leaf) -> P:
    """Partition spec for a (permuted, possibly int8-quantised) param leaf.
    Quantised leaves appear as .../<name>/q and .../<name>/s."""
    parts = _path_str(path).split("/")
    if not _lm_transformer_path(parts):
        return P()
    name = parts[-1]
    base = parts[-2] if name in ("q", "s") and len(parts) >= 2 else name
    nd = getattr(leaf, "ndim", 0)
    if base in _TP_ROW_SHARD:
        # dense (L, O, I) / bias (L, O) / q (L, O, I) / s (L, O)
        return P(*((None, "tp") + (None,) * (nd - 2)))
    if base in _TP_COL_SHARD:
        if name == "s":  # per-output-channel scales: output dim is full
            return P()
        return P(None, None, "tp") if nd == 3 else P()
    return P()


def _dp_tp_state_spec(path, leaf, batch: int, heads: int) -> P:
    """KV rings/scales of the LM main transformer shard (dp, tp); every
    other batch-leading leaf shards dp only (codec KV included — the codec
    transformer runs replicated over tp)."""
    parts = _path_str(path).split("/")
    nd = getattr(leaf, "ndim", 0)
    shape = getattr(leaf, "shape", ())
    if (
        "lm" in parts
        and "layers" in parts
        and parts[-1] in ("k", "v", "ks", "vs")
        and nd >= 3
        and shape[0] == batch
        and shape[1] == heads
    ):
        return P(*(("dp", "tp") + (None,) * (nd - 2)))
    return _dp_spec(leaf, batch)


def dp_tp_shard_step(
    mesh: Mesh, local_fn, global_fn, batch: int, heads: int, params,
    *example_args,
):
    """shard_map ``local_fn`` over a dp x tp mesh with Pallas kernels live.

    ``local_fn`` must be built against the PER-SHARD config
    (num_heads = heads/tp, head_dim pinned to the global hd,
    tp_axis="tp") over params permuted by :func:`permute_tp_params`;
    ``global_fn`` is the unsharded step used only to derive output
    shapes/specs.  ``heads`` is the GLOBAL head count (disambiguates LM KV
    leaves from codec state).  Returns the wrapped fn (jit it yourself).
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    tp = mesh.shape.get("tp", 1)
    dp = mesh.shape.get("dp", 1)
    if batch % dp:
        raise ValueError(f"batch {batch} not divisible by dp={dp}")
    if heads % tp:
        raise ValueError(f"heads {heads} not divisible by tp={tp}")

    in_specs = (
        jax.tree_util.tree_map_with_path(_tp_param_spec, params),
    ) + tuple(
        jax.tree_util.tree_map_with_path(
            lambda p, l: _dp_tp_state_spec(p, l, batch, heads), a
        )
        for a in example_args
    )
    out_shape = jax.eval_shape(global_fn, params, *example_args)
    out_specs = jax.tree_util.tree_map_with_path(
        lambda p, l: _dp_tp_state_spec(p, l, batch, heads), out_shape
    )
    kwargs = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    try:
        return shard_map(local_fn, check_vma=False, **kwargs)
    except TypeError:  # older jax spells it check_rep
        return shard_map(local_fn, check_rep=False, **kwargs)


def tp_local_transformer_cfg(tcfg, tp: int):
    """Per-shard view of a transformer config for dp_tp_shard_step: heads
    split over tp, head_dim pinned (hd must not be re-derived from the
    reduced head count), psums enabled at the residual joins."""
    import dataclasses

    if tcfg.num_heads % tp:
        raise ValueError(f"num_heads {tcfg.num_heads} not divisible by {tp}")
    return dataclasses.replace(
        tcfg, num_heads=tcfg.num_heads // tp, head_dim=tcfg.hd, tp_axis="tp"
    )


def place_tp_params(mesh: Mesh, params):
    """device_put a (permuted) params tree with the tp sharding rules."""
    return jax.tree_util.tree_map_with_path(
        lambda p, l: jax.device_put(
            l, NamedSharding(mesh, _tp_param_spec(p, l))
        ),
        params,
    )


def place_dp_tp_state(mesh: Mesh, state, batch: int, heads: int):
    """device_put a session state tree: LM KV over (dp, tp), batch-leading
    leaves over dp, everything else replicated."""
    return jax.tree_util.tree_map_with_path(
        lambda p, l: jax.device_put(
            l, NamedSharding(mesh, _dp_tp_state_spec(p, l, batch, heads))
        ),
        state,
    )
