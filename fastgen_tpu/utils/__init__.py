"""Shared utilities for fastgen-tpu."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from fastgen_tpu.configs.lazy import LazyCall, LazyDict, instantiate, locate  # noqa: F401

# dtype name map (reference: fastgen/utils/basic_utils.py PRECISION_MAP)
PRECISION_MAP = {
    "float64": jnp.float64,
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def expand_like(t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Right-pad ``t``'s shape with singleton dims so it broadcasts against ``x``.

    The reference's ``fastgen.utils.expand_like``: t of shape [B] (or scalar)
    becomes [B, 1, 1, ...] matching x.ndim.
    """
    t = jnp.asarray(t)
    if t.ndim == 0:
        return t
    assert t.ndim <= x.ndim, f"expand_like: t.ndim={t.ndim} > x.ndim={x.ndim}"
    return t.reshape(t.shape + (1,) * (x.ndim - t.ndim))


def to_dtype_tree(tree: Any, dtype) -> Any:
    """Cast every inexact-dtype leaf of a pytree to ``dtype``."""
    def cast(leaf):
        if isinstance(leaf, jnp.ndarray) and jnp.issubdtype(leaf.dtype, jnp.inexact):
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map(cast, tree)


def tree_size_bytes(tree: Any) -> int:
    return sum(leaf.size * leaf.dtype.itemsize for leaf in jax.tree_util.tree_leaves(tree)
               if hasattr(leaf, "size"))


def count_params(tree: Any) -> int:
    return sum(leaf.size for leaf in jax.tree_util.tree_leaves(tree) if hasattr(leaf, "size"))
