"""Likelihood terms with the exact reference conventions.

These reproduce (to float32 round-off) the negative-log-likelihood forms used
throughout the reference models so that log-posteriors agree numerically:

- isotropic Gaussian with a *scalar-per-sample* variance and the
  ``d * log(sigma^2) / 2`` normalizer (causalbgm/base.py:167-168),
- diagonal Gaussian with per-dimension variance (bgm/base.py:151-152),
- Bernoulli over logits == ``tf.nn.sigmoid_cross_entropy_with_logits``
  (causalbgm/base.py:191-192),
- softplus variance floor ``softplus(raw) + 1e-6`` (causalbgm/base.py:164).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softplus_var(raw, eps: float = 1e-6):
    """Variance head transform: softplus(raw) + eps."""
    return jax.nn.softplus(raw) + eps


def gaussian_nll_iso(x, mu, sigma_sq, n_dims: int):
    """Per-sample NLL (up to const): sum_d (x-mu)^2 / (2 s^2) + d log(s^2)/2.

    ``sigma_sq`` is a scalar or per-sample scalar variance shared across the
    ``n_dims`` output dimensions (the CausalBGM convention).
    Returns shape ``(batch,)``.
    """
    sq = jnp.sum((x - mu) ** 2, axis=-1)
    return sq / (2.0 * sigma_sq) + n_dims * jnp.log(sigma_sq) / 2.0


def gaussian_nll_diag(x, mu, sigma_sq):
    """Per-sample NLL with per-dimension variance (the BGM convention).

    Returns shape ``(batch,)``: sum_d [ (x-mu)^2/(2 s_d^2) + 0.5 log s_d^2 ].
    """
    return jnp.sum((x - mu) ** 2 / (2.0 * sigma_sq) + 0.5 * jnp.log(sigma_sq), axis=-1)


def bernoulli_logits_nll(labels, logits):
    """Elementwise sigmoid cross-entropy, identical to
    ``tf.nn.sigmoid_cross_entropy_with_logits``:
    max(l, 0) - l * z + log(1 + exp(-|l|)).
    """
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def standard_normal_neg_log_prior(z):
    """Per-sample -log N(z; 0, I) up to const: sum(z^2)/2.  Shape (batch,)."""
    return jnp.sum(z**2, axis=-1) / 2.0


def conditional_gaussian_neg_log_prior(z, mu_z, sigma_sq_z):
    """Per-sample -log N(z; mu(u), diag(s^2(u))) for the identifiable variant."""
    return jnp.sum((z - mu_z) ** 2 / (2.0 * sigma_sq_z) + 0.5 * jnp.log(sigma_sq_z), axis=-1)
