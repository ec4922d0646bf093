"""Checkpoint / resume.

The reference has NO model-state checkpointing — a crash loses the run
(SURVEY §5); only preprocessing caches exist (data_graph.py:9,27).
This module adds periodic checkpoints of the full training state
(params, optimizer state, model state, RNG keys, best-results
bookkeeping) so restarts resume mid-run.

Format: one ``.npz`` of flattened pytree leaves plus a JSON sidecar
with the step and host-RNG state. Restore unflattens against a
template with the same structure (the engine always has one from
initialization), so no pickled code is involved.
"""

from __future__ import annotations

import json
import os
import re

import jax
import numpy as np

_CKPT_RE = re.compile(r"ckpt_(\d+)\.npz$")


def _to_host(leaf) -> np.ndarray:
    """Materialize a (possibly globally-sharded) array on this host.

    Multi-process meshes have leaves spanning non-addressable devices;
    ``np.asarray`` on those raises — gather them across hosts first."""
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        from jax.experimental import multihost_utils

        leaf = multihost_utils.process_allgather(leaf, tiled=True)
    return np.asarray(leaf)


def save_checkpoint(directory: str, epoch: int, tree, np_rng_state: dict | None = None,
                    best: dict | None = None, keep: int = 2,
                    write: bool = True) -> str | None:
    """Gather the tree to host and (if ``write``) persist it.

    Multi-process note: the host-gather of non-addressable leaves is a
    COLLECTIVE (process_allgather) — every process must call this; pass
    ``write=is_primary()`` so only host 0 touches the filesystem."""
    leaves = [_to_host(l) for l in jax.tree.leaves(tree)]
    if not write:
        return None
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"ckpt_{epoch}.npz")
    tmp = path + ".tmp.npz"
    np.savez(tmp, *leaves)
    os.replace(tmp, path)
    meta = {"epoch": epoch, "num_leaves": len(leaves)}
    if np_rng_state is not None:
        meta["np_rng_state"] = np_rng_state
    if best is not None:
        meta["best"] = best
    with open(os.path.join(directory, f"ckpt_{epoch}.json"), "w") as f:
        json.dump(meta, f, default=_jsonable)

    # prune old checkpoints
    epochs = sorted(_list_epochs(directory))
    for old in epochs[:-keep]:
        for suffix in (".npz", ".json"):
            try:
                os.remove(os.path.join(directory, f"ckpt_{old}{suffix}"))
            except OSError:
                pass
    return path


def _jsonable(x):
    if isinstance(x, np.ndarray):
        return x.tolist()
    if isinstance(x, (np.floating, np.integer)):
        return x.item()
    raise TypeError(type(x))


def _list_epochs(directory: str) -> list[int]:
    out = []
    try:
        names = os.listdir(directory)
    except OSError:
        return out
    for name in names:
        m = _CKPT_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return out


def latest_checkpoint(directory: str) -> int | None:
    epochs = _list_epochs(directory)
    return max(epochs) if epochs else None


def load_checkpoint(directory: str, epoch: int, template):
    """Returns (tree, meta) with the template's structure/leaf order."""
    with np.load(os.path.join(directory, f"ckpt_{epoch}.npz")) as z:
        arrays = [z[f"arr_{i}"] for i in range(len(z.files))]
    treedef = jax.tree.structure(template)
    leaves = jax.tree.leaves(template)
    if len(arrays) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(arrays)} leaves, template has {len(leaves)}"
        )
    def _fit(a, t):
        # read the template's dtype/shape WITHOUT materializing it —
        # on a multi-process mesh the template leaves span
        # non-addressable devices and np.asarray would raise
        t_dtype = getattr(t, "dtype", None) or np.asarray(t).dtype
        t_shape = tuple(t.shape) if hasattr(t, "shape") else np.asarray(t).shape
        a = np.asarray(a, dtype=t_dtype)
        if a.shape == t_shape:
            return a
        if a.ndim == len(t_shape) and a.shape[1:] == t_shape[1:]:
            # padded-storage row counts (mesh training pads table rows
            # to 128-multiples, parallel/padding.py) differ ONLY in the
            # leading dim; trailing dims differing means a genuinely
            # incompatible checkpoint (e.g. another embedding_size) —
            # silently slicing those would load truncated garbage
            if a.shape[0] > t_shape[0]:
                # padded checkpoint into a true-shape template, e.g.
                # serving single-chip from a mesh-trained run: the real
                # rows are the leading block
                return a[: t_shape[0]]
            # true-shape checkpoint into a padded template (single-chip
            # run resumed on a mesh): pad rows are zeros by the
            # pad_tree contract
            pad = np.zeros((t_shape[0] - a.shape[0],) + t_shape[1:], t_dtype)
            return np.concatenate([a, pad], axis=0)
        if a.size == int(np.prod(t_shape)):
            # pure rank difference of the same data (e.g. () vs (1,))
            return a.reshape(t_shape)
        raise ValueError(
            f"checkpoint leaf shape {a.shape} is incompatible with the "
            f"template's {t_shape} — was the run configuration "
            f"(embedding_size / layers / dataset) changed since the "
            f"checkpoint was written?"
        )

    restored = [_fit(a, t) for a, t in zip(arrays, leaves)]
    tree = jax.tree.unflatten(treedef, restored)
    with open(os.path.join(directory, f"ckpt_{epoch}.json")) as f:
        meta = json.load(f)
    return tree, meta
