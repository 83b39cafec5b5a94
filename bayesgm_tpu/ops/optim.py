"""Functional Adam matching ``tf.keras.optimizers.Adam`` semantics.

Two variants:

- :func:`adam_update` — dense Adam over an arbitrary pytree (used for all
  network parameters).  Keras defaults where the reference relies on them:
  ``epsilon = 1e-7``; bias correction via a global step count.

- :func:`table_adam_update_rows` — row-sparse Adam for the per-sample latent
  table ``Z`` of shape (n, z_dim): moments live in (n, z_dim) tables sharded
  with the data axis, and a mini-batch update gathers/updates/scatters only
  the touched rows.  This is the TPU-native replacement for the reference's
  ``tf.Variable`` + IndexedSlices path (causalbgm/base.py:246-302), keeping
  per-row first/second moments persistent across epochs with no host
  round-trips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

EPS = 1e-7  # Keras Adam default epsilon


class AdamState(NamedTuple):
    m: object  # pytree like params
    v: object  # pytree like params
    t: jax.Array  # scalar int32 step count


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(m=zeros, v=jax.tree.map(jnp.zeros_like, params), t=jnp.zeros((), jnp.int32))


def adam_update(grads, state: AdamState, params, lr: float, b1: float = 0.9, b2: float = 0.99):
    t = state.t + 1
    tf_ = t.astype(jnp.float32)
    m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g, state.m, grads)
    v = jax.tree.map(lambda v_, g: b2 * v_ + (1 - b2) * g * g, state.v, grads)
    # Keras formulation: lr_t = lr * sqrt(1-b2^t) / (1-b1^t); p -= lr_t * m / (sqrt(v)+eps)
    lr_t = lr * jnp.sqrt(1 - b2**tf_) / (1 - b1**tf_)
    new_params = jax.tree.map(lambda p, m_, v_: p - lr_t * m_ / (jnp.sqrt(v_) + EPS), params, m, v)
    return new_params, AdamState(m=m, v=v, t=t)


class TableAdamState(NamedTuple):
    m: jax.Array  # (n, d)
    v: jax.Array  # (n, d)
    t: jax.Array  # scalar int32 (global step, Keras sparse-Adam convention)


def table_adam_init(table: jax.Array) -> TableAdamState:
    return TableAdamState(
        m=jnp.zeros_like(table), v=jnp.zeros_like(table), t=jnp.zeros((), jnp.int32)
    )


def table_adam_update_rows(grad_rows, idx, state: TableAdamState, table, lr: float,
                           b1: float = 0.9, b2: float = 0.99):
    """Adam update of ``table[idx]`` given ``grad_rows`` (len(idx), d).

    Matches ``tf.keras.optimizers.Adam`` applied to IndexedSlices gradients
    (the reference's posterior_optimizer path over the gathered latent
    table): the first/second moments of ALL rows decay every step
    (``m <- b1*m``, ``v <- b2*v`` are dense assigns in Keras'
    ``_resource_apply_sparse``), while the ``(1-b)`` gradient contribution
    and the parameter update touch only the gathered rows.  Bias correction
    uses the global step count.  The dense decay is two elementwise passes
    over the (n, d) moment tables per step — negligible next to the net
    forwards on TPU — and means rows untouched for many steps lose their
    momentum, exactly as in the reference.
    """
    t = state.t + 1
    tf_ = t.astype(jnp.float32)
    m = (b1 * state.m).at[idx].add((1 - b1) * grad_rows)
    v = (b2 * state.v).at[idx].add((1 - b2) * grad_rows * grad_rows)
    lr_t = lr * jnp.sqrt(1 - b2**tf_) / (1 - b1**tf_)
    new_rows = table[idx] - lr_t * m[idx] / (jnp.sqrt(v[idx]) + EPS)
    new_table = table.at[idx].set(new_rows)
    return new_table, TableAdamState(m=m, v=v, t=t)


def lr_schedule_scale(decay, epoch, total_epochs):
    """Multiplicative learning-rate scale at ``epoch`` of a ``total_epochs``
    horizon.

    ``decay`` is ``'cosine'`` (half-cosine from 1 to 0), ``'linear'``
    (1 -> 0.05 floor), or None/'' (constant 1 — the reference's behavior).
    The scale is a traced f32 scalar, so schedules cause no recompiles.  The
    horizon is the *current fit call's* epochs: resume a killed run with the
    same ``epochs`` to replay the same schedule.
    """
    import math

    frac = epoch / max(1, total_epochs)
    if decay == "cosine":
        return jnp.float32(0.5 * (1.0 + math.cos(math.pi * min(frac, 1.0))))
    if decay == "linear":
        return jnp.float32(max(1.0 - frac, 0.05))
    return jnp.float32(1.0)
