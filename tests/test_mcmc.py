"""Statistical tests for the MCMC kernels (sampling from known targets)."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesgm_tpu.ops import mcmc


def _std_normal_logp(z, key):
    return -0.5 * jnp.sum(z**2, axis=-1)


def test_adaptive_mh_recovers_standard_normal():
    n_chains, dim = 64, 3
    init = jnp.zeros((n_chains, dim))
    res = mcmc.adaptive_mh(_std_normal_logp, init, jax.random.PRNGKey(0),
                           burn_in=500, n_keep=2000, q_sd=1.0, adaptive=True)
    samples = np.asarray(res.samples).reshape(-1, dim)
    np.testing.assert_allclose(samples.mean(axis=0), 0.0, atol=0.1)
    np.testing.assert_allclose(samples.std(axis=0), 1.0, atol=0.1)
    # adaptation pushed acceptance into the target band
    assert 0.10 < float(res.accept_rate) < 0.45


def test_adaptive_mh_adapts_q_sd_down_for_tight_target():
    # Very tight target: initial q_sd=1.0 must shrink during burn-in.
    def logp(z, key):
        return -0.5 * jnp.sum((z / 0.01) ** 2, axis=-1)

    init = jnp.zeros((16, 2))
    res = mcmc.adaptive_mh(logp, init, jax.random.PRNGKey(1),
                           burn_in=1000, n_keep=100, q_sd=1.0, adaptive=True)
    assert float(res.q_sd) < 0.5


def test_adaptive_mh_fixed_q_sd_unchanged():
    init = jnp.zeros((8, 2))
    res = mcmc.adaptive_mh(_std_normal_logp, init, jax.random.PRNGKey(2),
                           burn_in=200, n_keep=50, q_sd=0.7, adaptive=False)
    np.testing.assert_allclose(float(res.q_sd), 0.7, rtol=1e-6)


def test_adaptive_mh_collect_statistic():
    init = jnp.zeros((32, 2))
    res = mcmc.adaptive_mh(
        _std_normal_logp, init, jax.random.PRNGKey(3), burn_in=100, n_keep=200,
        collect=lambda s, k: jnp.mean(s**2))
    assert res.samples.shape == (200,)
    np.testing.assert_allclose(float(np.mean(np.asarray(res.samples))), 1.0, atol=0.25)


def test_hmc_recovers_shifted_normal():
    mu = jnp.array([1.5, -0.5])

    def logp(z, key):
        return -0.5 * jnp.sum((z - mu) ** 2, axis=-1)

    init = jnp.zeros((32, 2))
    res = mcmc.hmc(logp, init, jax.random.PRNGKey(0), burn_in=300, n_keep=1000,
                   step_size=0.2, num_leapfrog=5)
    samples = np.asarray(res.samples).reshape(-1, 2)
    np.testing.assert_allclose(samples.mean(axis=0), np.asarray(mu), atol=0.12)
    np.testing.assert_allclose(samples.std(axis=0), 1.0, atol=0.12)
    assert float(res.accept_rate) > 0.5


def test_hmc_step_size_adapts_up():
    init = jnp.zeros((8, 2))
    res = mcmc.hmc(_std_normal_logp, init, jax.random.PRNGKey(1), burn_in=500,
                   n_keep=50, step_size=0.001, num_leapfrog=3)
    # tiny initial step + high acceptance -> adaptation grows the step size
    assert float(res.step_size) > 0.001


def test_adaptive_mala_recovers_standard_normal():
    samples_res = mcmc.adaptive_mala(
        _std_normal_logp, jnp.zeros((64, 3)), jax.random.PRNGKey(5),
        burn_in=300, n_keep=1500, step_size=0.5)
    samples = np.asarray(samples_res.samples).reshape(-1, 3)
    np.testing.assert_allclose(samples.mean(axis=0), 0.0, atol=0.1)
    np.testing.assert_allclose(samples.std(axis=0), 1.0, atol=0.1)
    # adaptation toward the MALA-optimal band
    assert 0.4 < float(samples_res.accept_rate) <= 1.0
