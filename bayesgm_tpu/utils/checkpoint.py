"""Pytree checkpointing.

The reference checkpoints nets + optimizers via ``tf.train.Checkpoint`` with
silent auto-restore of the latest checkpoint (causalbgm/base.py:112-128) but
does NOT checkpoint the latent table.  Here every model's fit loop saves one
uniform full-state bundle — nets (+ model extras such as ``prior_net``), all
optimizer states, the latent table ``Z`` and its Adam moments, the PRNG key,
and the epoch/best-metric counters — as a single atomic ``.npz``, which
closes that resume gap: restore + continue reproduces the uninterrupted
run's eval trajectory exactly (tests/test_resume.py).

Restores are template-driven: :func:`restore_checkpoint` fills the leaves of
a caller-supplied pytree from the stored arrays, so a *subset* template (e.g.
``{"nets": ...}`` at ``__init__`` time, before the data-dependent shapes are
known) restores fine against a full-state file.
"""

from __future__ import annotations

import os
import re

import jax
import jax.numpy as jnp
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


def checkpoint_step(path: str) -> int:
    """The step number encoded in a ``ckpt-{step}.npz`` filename."""
    m = _CKPT_RE.match(os.path.basename(path))
    if m is None:
        raise ValueError(f"Not a checkpoint filename: {path}")
    return int(m.group(1))


def has_group(path: str, name: str) -> bool:
    """Whether the stored file contains any leaf under top-level key ``name``
    (i.e. was saved from a bundle that included that entry)."""
    prefix = f"['{name}']"
    with np.load(path) as data:
        return any(k == prefix or k.startswith(prefix) for k in data.files)


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
            stored = stored.reshape(np.shape(leaf)).astype(np.asarray(leaf).dtype)
            # Materialize as a device array: restored state feeds straight
            # into jitted code (e.g. traced-index gathers on data_u).
            new_leaves.append(jnp.asarray(stored))
        return jax.tree_util.tree_unflatten(treedef, new_leaves)
