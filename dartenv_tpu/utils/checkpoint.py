"""Checkpoint / resume (SURVEY.md §5.4).

The reference's checkpoint primitive is `state_vector()` /
`set_state_vector()` (full sim state = (q, dq), `dart_env.py:~120` †); our
SimState/EnvState are already pytrees, so checkpointing is serialization of
a pytree plus the RNG keys — a resumed rollout is bit-identical.

Backends: orbax (sharded arrays, async, multi-host) when available, with a
dependency-free msgpack-style .npz fallback that round-trips any pytree of
arrays + scalars.
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_pytree(path: str, tree: Any) -> None:
    """Dependency-free checkpoint: arrays into one .npz + treedef JSON."""
    flat, treedef = _flatten_with_paths(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)
    meta = path[:-4] if path.endswith(".npz") else path
    with open(meta + ".treedef.json", "w") as f:
        json.dump({"treedef": str(treedef), "n": len(flat)}, f)


def load_pytree(path: str, like: Any) -> Any:
    """Restore into the structure of `like` (shape/dtype checked)."""
    npz = np.load(path if path.endswith(".npz") else path + ".npz")
    flat, treedef = jax.tree_util.tree_flatten(like)
    loaded = [npz[f"leaf_{i}"] for i in range(len(flat))]
    out = []
    for ref, arr in zip(flat, loaded):
        ref_arr = np.asarray(ref)
        if ref_arr.shape != arr.shape:
            raise ValueError(
                f"checkpoint leaf shape {arr.shape} != expected "
                f"{ref_arr.shape}"
            )
        out.append(
            jax.numpy.asarray(arr.astype(ref_arr.dtype))
            if hasattr(ref, "dtype") else type(ref)(arr)
        )
    return jax.tree_util.tree_unflatten(treedef, out)


def have_orbax() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401

        return True
    except Exception:
        return False


def save_orbax(directory: str, tree: Any, step: int = 0) -> None:
    """Sharded/async-capable checkpoint via orbax (multi-host safe)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, f"step_{step}"), tree, force=True)
    ckptr.wait_until_finished()


def load_orbax(directory: str, like: Any, step: int = 0) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(path, f"step_{step}"), target=like)
