"""Checkpoint / resume for VO state pytrees.

The reference keeps all state in memory and never persists anything
(SURVEY.md §5 "Checkpoint / resume: none") — this is a new capability: the
full device-resident state (keyframe ring buffer, reference frame pyramid,
PRNG key, frame counter) round-trips through one ``.npz`` file, so long runs
can resume and BA stages can hand off keyframe windows between processes.

Works for any registered-dataclass pytree (VOState, RGBDState,
KeyframeHistory, BAWindow): leaves are stored by their tree path, and
loading restores them into a structurally-identical template (normally the
output of the matching ``*_init``), which keeps dtypes/shardings explicit.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


# Leaf names (last path segment) added to state pytrees AFTER the
# checkpoint format shipped; these — and only these — load as template
# init values when absent (graceful forward-compat).
_FORWARD_COMPAT_LEAVES = {"kf_id"}   # KeyframeHistory.kf_id, round 5


def _leaf_key(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_state(path: str, state: Any) -> None:
    """Serialize a pytree of arrays to ``path`` (.npz)."""
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    data = {}
    for p, leaf in leaves:
        data[_leaf_key(p)] = np.asarray(leaf)
    np.savez_compressed(path, **data)


def load_state(path: str, template: Any) -> Any:
    """Load a pytree saved by ``save_state`` into the structure of
    ``template`` (same type tree; array shapes/dtypes must match what was
    saved)."""
    with np.load(path) as data:
        leaves_t, treedef = jax.tree_util.tree_flatten_with_path(template)
        new_leaves = []
        for p, leaf in leaves_t:
            key = _leaf_key(p)
            if key not in data:
                # Forward-compat is scoped to the explicit allowlist of
                # fields ADDED after checkpoints in the wild were written
                # — any other missing leaf means a truncated/mismatched
                # checkpoint and must fail fast, not resume from init
                # values.
                if key.split("/")[-1] in _FORWARD_COMPAT_LEAVES:
                    import warnings

                    warnings.warn(
                        f"checkpoint {path} missing leaf {key!r}; using "
                        "the template's init value (checkpoint predates "
                        "the field)"
                    )
                    new_leaves.append(jax.numpy.asarray(leaf))
                    continue
                raise KeyError(f"checkpoint {path} missing leaf {key!r}")
            arr = data[key]
            want = np.asarray(leaf)
            if arr.shape != want.shape:
                raise ValueError(
                    f"leaf {key!r}: checkpoint shape {arr.shape} != template {want.shape}"
                )
            new_leaves.append(jax.numpy.asarray(arr.astype(want.dtype)))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), new_leaves
    )
