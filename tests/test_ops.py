"""Unit tests for the functional network/distribution/optimizer ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesgm_tpu.ops import distributions as dist
from bayesgm_tpu.ops import nn, optim


def test_mlp_shapes_and_determinism():
    key = jax.random.PRNGKey(0)
    net = nn.init_mlp(key, 5, 3, [16, 8])
    x = jax.random.normal(jax.random.PRNGKey(1), (7, 5))
    out = nn.mlp_apply(net, x)
    assert out.shape == (7, 3)
    assert jnp.allclose(out, nn.mlp_apply(net, x))


def test_critic_scalar_output():
    net = nn.init_critic(jax.random.PRNGKey(0), 4, [8, 8])
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 4))
    assert nn.critic_apply(net, x).shape == (5, 1)


def test_variational_mlp_positive_variance():
    params, state = nn.init_variational_mlp(jax.random.PRNGKey(0), 4, 6, [8])
    x = jax.random.normal(jax.random.PRNGKey(1), (10, 4))
    mean, var, new_state = nn.variational_mlp_apply(params, x, state, train=True)
    assert mean.shape == (10, 6)
    assert var.shape == (10, 6)
    assert bool(jnp.all(var > 0))
    # running stats moved toward the batch statistics
    assert not jnp.allclose(new_state["norm"]["mean"], state["norm"]["mean"])


def test_lowrank_covariance_identities():
    params, state, meta = nn.init_lowrank_variational_mlp(jax.random.PRNGKey(0), 3, 5, [8], rank=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3))
    mean, var_diag, u, _ = nn.lowrank_variational_mlp_apply(params, x, meta, state)
    assert u.shape == (4, 5, 2)
    # Woodbury inverse against dense inverse
    sigma = jnp.eye(5) * var_diag[:, :, None] + jnp.einsum("bpr,bqr->bpq", u, u)
    sigma_inv = nn.lowrank_covariance_inverse(var_diag, u)
    dense_inv = np.linalg.inv(np.asarray(sigma, dtype=np.float64))
    np.testing.assert_allclose(dense_inv, np.asarray(sigma_inv), rtol=1e-1, atol=1e-2)
    # Sylvester log-det against dense slogdet
    _, dense_logdet = np.linalg.slogdet(np.asarray(sigma))
    np.testing.assert_allclose(dense_logdet, np.asarray(nn.lowrank_log_det(var_diag, u)),
                               rtol=1e-2, atol=2e-2)


def test_lowrank_reparameterize_moments():
    key = jax.random.PRNGKey(0)
    mean = jnp.zeros((20000, 2))
    var_diag = jnp.full((20000, 2), 0.5)
    u = jnp.tile(jnp.array([[[0.5], [0.0]]]), (20000, 1, 1))
    z = nn.lowrank_reparameterize(key, mean, var_diag, u)
    cov = np.cov(np.asarray(z).T)
    np.testing.assert_allclose(cov[0, 0], 0.75, atol=0.05)  # 0.5 + 0.25
    np.testing.assert_allclose(cov[1, 1], 0.5, atol=0.05)


def test_flipout_mlp_stochastic_but_mean_centered():
    net = nn.init_flipout_mlp(jax.random.PRNGKey(0), 4, 3, [8])
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 4))
    o1 = nn.flipout_mlp_apply(net, x, jax.random.PRNGKey(2))
    o2 = nn.flipout_mlp_apply(net, x, jax.random.PRNGKey(3))
    assert o1.shape == (6, 3)
    assert not jnp.allclose(o1, o2)  # stochastic forward
    kl = nn.flipout_mlp_kl(net)
    assert float(kl) > 0


def test_flipout_kl_analytic():
    # single layer, known loc/rho
    p = {"loc": jnp.ones((2, 2)), "rho": jnp.zeros((2, 2)), "b": jnp.zeros((2,))}
    scale = jax.nn.softplus(0.0)
    expected = 4 * 0.5 * (scale**2 + 1.0 - 1.0 - np.log(scale**2))
    np.testing.assert_allclose(float(nn.flipout_dense_kl(p, 1.0)), expected, rtol=1e-5)


def test_gaussian_nll_conventions():
    x = jnp.array([[1.0, 2.0]])
    mu = jnp.array([[0.0, 0.0]])
    # isotropic with scalar variance 2.0, d=2
    iso = dist.gaussian_nll_iso(x, mu, 2.0, 2)
    np.testing.assert_allclose(float(iso[0]), 5.0 / 4.0 + np.log(2.0), rtol=1e-5)
    # diagonal
    s = jnp.array([[1.0, 4.0]])
    diag = dist.gaussian_nll_diag(x, mu, s)
    np.testing.assert_allclose(float(diag[0]), 0.5 + 0.5 + 0.5 * np.log(4.0), rtol=1e-5)


def test_bernoulli_nll_matches_formula():
    logits = jnp.array([-2.0, 0.0, 3.0])
    labels = jnp.array([0.0, 1.0, 1.0])
    got = dist.bernoulli_logits_nll(labels, logits)
    expected = np.maximum(logits, 0) - logits * labels + np.log1p(np.exp(-np.abs(logits)))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4)


def test_adam_matches_keras_first_step():
    params = {"w": jnp.array([1.0])}
    grads = {"w": jnp.array([0.5])}
    state = optim.adam_init(params)
    new_params, state = optim.adam_update(grads, state, params, lr=0.1, b1=0.9, b2=0.99)
    # Keras: lr_t = lr*sqrt(1-b2)/(1-b1); m=0.05, v=0.0025
    lr_t = 0.1 * np.sqrt(1 - 0.99) / (1 - 0.9)
    expected = 1.0 - lr_t * 0.05 / (np.sqrt(0.0025) + 1e-7)
    np.testing.assert_allclose(float(new_params["w"][0]), expected, rtol=1e-5)


def test_table_adam_only_touches_rows():
    table = jnp.zeros((10, 3))
    state = optim.table_adam_init(table)
    idx = jnp.array([2, 5])
    grads = jnp.ones((2, 3))
    new_table, new_state = optim.table_adam_update_rows(grads, idx, state, table, lr=0.01)
    touched = np.asarray(new_table[np.array([2, 5])])
    untouched = np.delete(np.asarray(new_table), [2, 5], axis=0)
    assert np.all(touched != 0)
    assert np.all(untouched == 0)
    assert np.all(np.asarray(new_state.m[2]) != 0)
    assert np.all(np.asarray(new_state.m[0]) == 0)


def test_table_adam_dense_moment_decay():
    """Keras Adam over IndexedSlices decays ALL rows' moments every step;
    rows untouched in a step must lose momentum by b1/b2 factors."""
    table = jnp.zeros((6, 2))
    state = optim.table_adam_init(table)
    _, state = optim.table_adam_update_rows(
        jnp.ones((2, 2)), jnp.array([0, 1]), state, table, lr=0.01, b1=0.9, b2=0.99)
    m_before = np.asarray(state.m[0]).copy()
    _, state = optim.table_adam_update_rows(
        jnp.ones((2, 2)), jnp.array([4, 5]), state, table, lr=0.01, b1=0.9, b2=0.99)
    np.testing.assert_allclose(np.asarray(state.m[0]), 0.9 * m_before, rtol=1e-6)


def test_flat_weights_roundtrip():
    net = nn.init_mlp(jax.random.PRNGKey(0), 3, 2, [4])
    flat, unravel = nn.flatten_params(net)
    rebuilt = unravel(flat)
    x = jnp.ones((1, 3))
    np.testing.assert_allclose(np.asarray(nn.mlp_apply(net, x)),
                               np.asarray(nn.mlp_apply(rebuilt, x)), rtol=1e-6)


def test_standard_normal_log_prior():
    w = jnp.array([0.0, 1.0])
    expected = -0.5 * 1.0 - np.log(2 * np.pi)
    np.testing.assert_allclose(float(nn.standard_normal_log_prior(w)), expected, rtol=1e-5)


def test_flipout_fused_draws_preserve_output_moments():
    """The fused one-launch eps/sign draw (nn._fused_flipout_draws) must be
    exactly distribution-preserving vs per-layer draws: for a single flipout
    layer the per-example output variance is analytic,
    Var[out_bo] = sum_i x_bi^2 softplus(rho_io)^2 (signs square to 1, eps is
    unit-variance, cross terms vanish).  Checks mean and variance against
    the analytic law over 4000 keys."""
    p = {"loc": jnp.asarray([[0.7, -0.2], [0.1, 0.4], [-0.5, 0.3]]),
         "rho": jnp.asarray([[-1.0, 0.0], [0.5, -2.0], [0.0, 1.0]]),
         "b": jnp.asarray([0.3, -0.1])}
    x = jnp.asarray([[1.0, -2.0, 0.5], [0.0, 1.5, -1.0]])

    def one(key):
        e, ri, ro = nn._fused_flipout_draws(key, [p], x.shape[0])
        return nn._flipout_dense_pre(p, x, e[0], ri[0], ro[0])

    outs = jax.vmap(one)(jax.random.split(jax.random.PRNGKey(0), 4000))
    mean_expected = x @ p["loc"] + p["b"]
    scale = jax.nn.softplus(p["rho"])
    var_expected = (x ** 2) @ (scale ** 2)
    np.testing.assert_allclose(np.asarray(outs.mean(0)),
                               np.asarray(mean_expected),
                               atol=4 * float(jnp.sqrt(var_expected.max() / 4000)))
    np.testing.assert_allclose(np.asarray(outs.var(0)),
                               np.asarray(var_expected), rtol=0.15)
