"""Federated wire format: parameter pytree ⇄ ordered list of numpy arrays.

Parity with the reference's get_parameters/set_parameters
(nerve_cl/federated/client.py:15-24), generalised from torch state_dicts to
arbitrary JAX pytrees with a stable (sorted-path) ordering so client and
server agree without exchanging structure.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Any


def tree_to_arrays(tree: Params) -> List[np.ndarray]:
    """Flatten a pytree into numpy arrays in deterministic traversal order."""
    leaves = jax.tree_util.tree_leaves(tree)
    return [np.asarray(l) for l in leaves]


def tree_from_arrays(template: Params, arrays: Sequence[np.ndarray]) -> Params:
    """Rebuild a pytree with ``template``'s structure from flat arrays."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(arrays) != len(leaves):
        raise ValueError(f"expected {len(leaves)} arrays, got {len(arrays)}")
    new_leaves = [
        jnp.asarray(a, dtype=l.dtype).reshape(l.shape) for a, l in zip(arrays, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


# Reference-named aliases (client.py:15-24).
def get_parameters(params: Params) -> List[np.ndarray]:
    return tree_to_arrays(params)


def set_parameters(template: Params, arrays: Sequence[np.ndarray]) -> Params:
    return tree_from_arrays(template, arrays)
