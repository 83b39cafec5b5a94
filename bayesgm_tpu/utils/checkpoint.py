"""Pytree checkpointing.

The reference checkpoints nets + optimizers via ``tf.train.Checkpoint`` with
silent auto-restore of the latest checkpoint (causalbgm/base.py:112-128) but
does NOT checkpoint the latent table.  Here the entire training state —
params, optimizer states, latent table ``Z``, and the PRNG key — is one pytree
saved atomically as a single ``.npz``, which closes that resume gap.
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np

_CKPT_RE = re.compile(r"^ckpt-(\d+)\.npz$")


def _key_str(path) -> str:
    return jax.tree_util.keystr(path)


def save_pytree(path: str, pytree) -> str:
    """Save an arbitrary pytree of arrays to ``path`` (.npz, atomic)."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(pytree)[0]
    arrays = {_key_str(p): np.asarray(leaf) for p, leaf in leaves_with_paths}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)
    return path


def save_checkpoint(ckpt_dir: str, step: int, pytree, max_to_keep: int = 5) -> str:
    """Save ``pytree`` as ``{ckpt_dir}/ckpt-{step}.npz`` (atomic rename)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = save_pytree(os.path.join(ckpt_dir, f"ckpt-{step}.npz"), pytree)
    _prune(ckpt_dir, max_to_keep)
    return path


def _prune(ckpt_dir: str, max_to_keep: int):
    steps = sorted(
        int(m.group(1)) for f in os.listdir(ckpt_dir) if (m := _CKPT_RE.match(f))
    )
    for step in steps[:-max_to_keep]:
        os.remove(os.path.join(ckpt_dir, f"ckpt-{step}.npz"))


def latest_checkpoint(ckpt_dir: str):
    """Path to the newest ``ckpt-*.npz`` in ``ckpt_dir``, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(
        int(m.group(1)) for f in os.listdir(ckpt_dir) if (m := _CKPT_RE.match(f))
    )
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"ckpt-{steps[-1]}.npz")


def restore_checkpoint(path: str, template):
    """Restore a pytree saved by :func:`save_checkpoint` into the structure of
    ``template`` (leaves are replaced by the stored arrays)."""
    with np.load(path) as data:
        leaves_with_paths = jax.tree_util.tree_flatten_with_path(template)[0]
        treedef = jax.tree_util.tree_structure(template)
        new_leaves = []
        for key_path, leaf in leaves_with_paths:
            key = _key_str(key_path)
            if key not in data:
                raise KeyError(f"Checkpoint {path} missing leaf {key}")
            stored = data[key]
            new_leaves.append(stored.reshape(np.shape(leaf)).astype(np.asarray(leaf).dtype))
        return jax.tree_util.tree_unflatten(treedef, new_leaves)
