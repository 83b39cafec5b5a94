"""Lifecycle tests for IdentifiableCausalBGM, FullMCMCCausalBGM, MNISTBGM,
and the sharded multi-chip paths."""

import jax
import numpy as np
import pytest

from bayesgm_tpu.models.fullmcmc import FullMCMCCausalBGM
from bayesgm_tpu.models.identifiable import IdentifiableCausalBGM
from bayesgm_tpu.models.mnist import MNISTBGM


@pytest.fixture(scope="module")
def causal_data():
    rng = np.random.RandomState(0)
    n, v_dim = 96, 5
    v = rng.randn(n, v_dim).astype("float32")
    x = rng.rand(n, 1).astype("float32")
    y = (x + v[:, :1] + 0.1 * rng.randn(n, 1)).astype("float32")
    return x, y, v


def _params(v_dim=5, tmpdir="/tmp/bgm_tests", **kw):
    p = dict(v_dim=v_dim, z_dims=[1, 1, 1, 2], binary_treatment=False,
             dataset="unit", output_dir=tmpdir, use_bnn=False,
             g_units=[8, 8], e_units=[8, 8], f_units=[8], h_units=[8],
             dz_units=[8], save_res=False, save_model=False)
    p.update(kw)
    return p


def test_identifiable_lifecycle(causal_data, tmp_path):
    x, y, v = causal_data
    m = IdentifiableCausalBGM(_params(tmpdir=str(tmp_path), prior_units=[8]), random_seed=1)
    m.fit((x, y, v), epochs=2, epochs_per_eval=2, batch_size=16, use_egm_init=False, verbose=0)
    # 7-tuple evaluate (fixes the reference's arity bug)
    out = m.evaluate((x, y, v), m.data_z)
    assert len(out) == 7
    causal_pre, mse_x, mse_y, mse_v, x_pred, y_pred, v_pred = out
    assert x_pred.shape == (96, 1) and v_pred.shape == (96, 5)

    # log posterior needs U
    u = np.asarray(m._sample_u(10))
    z = np.random.RandomState(0).randn(10, 5).astype("float32")
    lp = np.asarray(m.get_log_posterior(x[:10], y[:10], v[:10], z, u))
    assert lp.shape == (10,) and np.all(np.isfinite(lp))

    # sampler returns (samples, data_u)
    zs, du = m.metropolis_hastings_sampler((x[:8], y[:8], v[:8]), burn_in=20, n_keep=10)
    assert zs.shape == (10, 8, 5) and du.shape == (8, 10)

    adrf, ci = m.predict((x, y, v), alpha=0.1, n_mcmc=10, burn_in=20, x_values=[0.5, 1.0])
    assert adrf.shape == (2,) and ci.shape == (2, 2)
    assert np.all(ci[:, 0] <= ci[:, 1])

    # diagnostics mirror the CausalBGM contract
    adrf, ci, diag = m.predict((x, y, v), alpha=0.1, n_mcmc=30, burn_in=30,
                               x_values=[0.5, 1.0], return_diagnostics=True)
    assert diag["ess"].shape == (2,) and diag["rhat"].shape == (2,)
    assert 0.0 <= diag["accept_rate"] <= 1.0

    # MALA through the conditional-prior target (beyond-reference)
    adrf_m, ci_m, diag_m = m.predict((x, y, v), alpha=0.1, n_mcmc=30,
                                     burn_in=30, x_values=[0.5, 1.0],
                                     sampler="mala", return_diagnostics=True)
    assert adrf_m.shape == (2,) and np.all(np.isfinite(adrf_m))
    assert np.all(ci_m[:, 0] <= ci_m[:, 1])
    assert 0.0 <= diag_m["accept_rate"] <= 1.0
    with pytest.raises(ValueError, match="Unknown sampler"):
        m.predict((x, y, v), x_values=[0.5], sampler="hmcx")


def test_identifiable_conditional_prior_matters(causal_data, tmp_path):
    x, y, v = causal_data
    m = IdentifiableCausalBGM(_params(tmpdir=str(tmp_path), prior_units=[8]), random_seed=2)
    z = np.zeros((4, 5), dtype="float32")
    u1 = np.eye(10, dtype="float32")[[0, 0, 0, 0]]
    u2 = np.eye(10, dtype="float32")[[5, 5, 5, 5]]
    key = jax.random.PRNGKey(0)
    lp1 = np.asarray(m.get_log_posterior(x[:4], y[:4], v[:4], z, u1, key=key))
    lp2 = np.asarray(m.get_log_posterior(x[:4], y[:4], v[:4], z, u2, key=key))
    assert not np.allclose(lp1, lp2)  # prior depends on the segment


def test_fullmcmc_lifecycle(causal_data, tmp_path):
    x, y, v = causal_data
    m = FullMCMCCausalBGM(_params(tmpdir=str(tmp_path)), random_seed=3)
    m.fit((x, y, v), epochs=1, epochs_per_eval=1, batch_size=16, use_egm_init=False, verbose=0)
    m.run_mcmc_training((x, y, v), num_samples=20, num_burnin=20)
    assert m.g_net_samples.shape[0] == 20
    assert m.f_net_samples.ndim == 2

    # weight-conditioned log posterior
    z = np.random.RandomState(1).randn(8, 5).astype("float32")
    lp = np.asarray(m.get_log_posterior(x[:8], y[:8], v[:8], z,
                                        m.g_net_samples[0], m.h_net_samples[0],
                                        m.f_net_samples[0]))
    assert lp.shape == (8,) and np.all(np.isfinite(lp))

    adrf, ci = m.predict((x[:16], y[:16], v[:16]), alpha=0.1, n_mcmc=10,
                         burn_in=20, x_values=[0.5, 1.0])
    assert adrf.shape == (2,) and ci.shape == (2, 2)

    # paired-weight effect draws API
    zs = m.metropolis_hastings_sampler((x[:8], y[:8], v[:8]), burn_in=10, n_keep=5)
    draws = m.infer_from_latent_posterior(zs, x_values=[1.0])
    assert draws.shape == (5, 1)


def test_fullmcmc_weight_sampling_changes_output(causal_data, tmp_path):
    x, y, v = causal_data
    m = FullMCMCCausalBGM(_params(tmpdir=str(tmp_path)), random_seed=4)
    m.fit((x, y, v), epochs=0, epochs_per_eval=1, batch_size=16, use_egm_init=False, verbose=0)
    m.run_mcmc_training((x, y, v), num_samples=10, num_burnin=10)
    z = np.zeros((4, 5), dtype="float32")
    lp_a = np.asarray(m.get_log_posterior(x[:4], y[:4], v[:4], z,
                                          m.g_net_samples[0], m.h_net_samples[0], m.f_net_samples[0]))
    lp_b = np.asarray(m.get_log_posterior(x[:4], y[:4], v[:4], z,
                                          m.g_net_samples[-1], m.h_net_samples[-1], m.f_net_samples[-1]))
    assert not np.allclose(lp_a, lp_b)


@pytest.fixture(scope="module")
def mnist_like_data():
    rng = np.random.RandomState(0)
    return (rng.rand(64, 28, 28, 1) > 0.5).astype("float32")


def test_mnistbgm_lifecycle(mnist_like_data, tmp_path):
    data = mnist_like_data
    m = MNISTBGM(dict(x_dim=784, z_dim=4, dataset="unit", output_dir=str(tmp_path),
                      use_bnn=False, dz_units=[8], save_res=False, save_model=False),
                 random_seed=5)
    m.fit(data, batch_size=16, epochs=1, epochs_per_eval=1,
          use_egm_init=True, egm_n_iter=2, egm_batches_per_eval=2, verbose=0)
    assert len(m.history_loss) >= 1

    gen = np.asarray(m.generate(nb_samples=8))
    assert gen.shape == (8, 28, 28, 1)
    assert np.all(gen >= 0) and np.all(gen <= 1)

    # inpainting with a shared pixel mask
    from bayesgm_tpu.utils import mnist_mask_indices

    obs, miss = mnist_mask_indices(mode="upper_half")
    test = np.array(data[:4])
    test_flat = test.reshape(4, -1)
    test_flat[:, miss] = np.nan
    test = test_flat.reshape(4, 28, 28, 1)
    imputed, intervals = m.predict(test, alpha=0.2, n_mcmc=10, burn_in=20)
    assert imputed.shape == (4, 28, 28, 1)
    assert not np.any(np.isnan(imputed))
    assert intervals.shape == (4, len(miss), 2)
    # observed pixels untouched
    np.testing.assert_allclose(imputed.reshape(4, -1)[:, obs],
                               data[:4].reshape(4, -1)[:, obs], rtol=1e-5)

    # diagnostics carry image shape with NaN at observed pixels
    _, _, diag = m.predict(test, alpha=0.2, n_mcmc=10, burn_in=20,
                           return_diagnostics=True)
    assert diag["ess"].shape == (4, 28, 28, 1)
    flat_ess = diag["ess"].reshape(4, -1)
    assert np.all(np.isfinite(flat_ess[:, miss]))
    assert np.all(np.isnan(flat_ess[:, obs]))


def test_mnistbgm_bnn_generator_stochastic(tmp_path):
    m = MNISTBGM(dict(x_dim=784, z_dim=4, dataset="unit", output_dir=str(tmp_path),
                      use_bnn=True, dz_units=[8], save_res=False, save_model=False),
                 random_seed=6)
    import jax.numpy as jnp

    from bayesgm_tpu.ops import conv as cnn

    z = jax.random.normal(jax.random.PRNGKey(9), (2, 4))
    m1, _ = cnn.mnist_generator_apply(m.nets["g"], z, jax.random.PRNGKey(0))
    m2, _ = cnn.mnist_generator_apply(m.nets["g"], z, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(m1), np.asarray(m2))
    assert float(cnn.mnist_generator_kl(m.nets["g"])) > 0


def test_dryrun_multichip_8():
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft_entry", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ensemble_causalbgm_lifecycle(tmp_path):
    """EnsembleCausalBGM: K independent members, averaged effects."""
    import numpy as np

    from bayesgm_tpu import EnsembleCausalBGM

    rng = np.random.RandomState(0)
    n, v_dim = 64, 4
    v = rng.randn(n, v_dim).astype("float32")
    x = rng.rand(n, 1).astype("float32")
    y = (x + v[:, :1]).astype("float32")
    p = dict(v_dim=v_dim, z_dims=[1, 1, 1, 2], binary_treatment=False,
             dataset="ens", output_dir=str(tmp_path), use_bnn=False,
             n_members=2, g_units=[8], e_units=[8], f_units=[8], h_units=[8],
             dz_units=[8], save_res=False, save_model=False)
    m = EnsembleCausalBGM(p, random_seed=5)
    assert len(m.members) == 2
    # distinct initializations
    a = m.members[0].nets["g"]["layers"][0]["w"]
    b = m.members[1].nets["g"]["layers"][0]["w"]
    assert float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) > 1e-4
    m.fit((x, y, v), epochs=2, epochs_per_eval=2, batch_size=16,
          use_egm_init=False, verbose=0)
    adrf, ci = m.predict((x, y, v), alpha=0.2, n_mcmc=10, burn_in=20,
                         x_values=[0.5, 1.0])
    assert adrf.shape == (2,) and ci.shape == (2, 2)
    assert np.all(np.isfinite(adrf)) and np.all(ci[:, 0] <= ci[:, 1])
    causal, mse_x, mse_y, mse_v = m.evaluate((x, y, v))
    assert causal.shape == (200,) and np.isfinite(mse_y)
