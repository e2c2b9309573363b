"""Pytree helpers for masked per-slot state updates.

The continuous-batching scheduler keeps one state pytree for the whole batch;
individual streams come and go.  Instead of slicing tensors per slot (dynamic
shapes, recompiles), every update is a batched ``jnp.where`` over the leading
batch axis — the TPU-native equivalent of the reference's per-slot
``where_cond`` state masking (moshi-core/src/conv.rs:347-366) and
``reset_batch_idx`` (moshi-core/src/kv_cache.rs:111-117).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bmask(mask: jax.Array, leaf: jax.Array) -> jax.Array:
    """Broadcast a (B,) bool mask against a (B, ...) leaf."""
    extra = leaf.ndim - 1
    return mask.reshape(mask.shape + (1,) * extra)


def where_mask(mask: jax.Array, new: jax.Array, old: jax.Array) -> jax.Array:
    """Per-slot select: ``new`` where mask else ``old`` (leading batch axis)."""
    return jnp.where(_bmask(mask, new), new, old)


def masked_update(mask: jax.Array, new_tree, old_tree):
    """Tree-wide per-slot select between a new and an old state pytree."""
    return jax.tree_util.tree_map(
        lambda n, o: where_mask(mask, n, o), new_tree, old_tree
    )


def slot_reset(reset_mask: jax.Array, init_tree, state_tree):
    """Reset the slots flagged in ``reset_mask`` to their init values.

    Equivalent to the reference's reset_batch_idx chain but over the whole
    batch at once and inside jit (no recompilation, no host sync).
    """
    return masked_update(reset_mask, init_tree, state_tree)
