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

    Moments are updated only on the touched rows; bias correction uses the
    global step count, matching Keras' sparse-gradient Adam behavior.
    """
    t = state.t + 1
    tf_ = t.astype(jnp.float32)
    m_rows = b1 * state.m[idx] + (1 - b1) * grad_rows
    v_rows = b2 * state.v[idx] + (1 - b2) * grad_rows * grad_rows
    lr_t = lr * jnp.sqrt(1 - b2**tf_) / (1 - b1**tf_)
    new_rows = table[idx] - lr_t * m_rows / (jnp.sqrt(v_rows) + EPS)
    new_table = table.at[idx].set(new_rows)
    new_state = TableAdamState(
        m=state.m.at[idx].set(m_rows), v=state.v.at[idx].set(v_rows), t=t
    )
    return new_table, new_state
