"""BGM/MNISTBGM ``predict`` must honor ``bs`` (reference contract
bgm/base.py:527-663): subjects are processed in batches through the HMC
sampler so the host-side (n_mcmc, n, x_dim) sample cube is bounded.
Chains are per-subject independent, so batching only changes RNG pairing —
per-subject posterior means agree within Monte-Carlo tolerance."""

import warnings

import numpy as np

from bayesgm_tpu.models.bgm import BGM


def _fitted_bgm(tmp_path, n=80, x_dim=4, z_dim=2):
    rng = np.random.RandomState(0)
    z = rng.randn(n, z_dim)
    w = rng.randn(z_dim, x_dim)
    data = (z @ w + 0.1 * rng.randn(n, x_dim)).astype("float32")
    p = dict(x_dim=x_dim, z_dim=z_dim, dataset="bs_test", output_dir=str(tmp_path),
             use_bnn=False, g_units=[16, 16], e_units=[16, 16], dz_units=[8],
             dx_units=[8], save_res=False, save_model=False)
    m = BGM(p, random_seed=11)
    m.fit(data, epochs=8, epochs_per_eval=8, batch_size=16, use_egm_init=True,
          egm_n_iter=200, egm_batches_per_eval=200, verbose=0)
    return m, data


def test_bgm_predict_honors_bs(tmp_path):
    m, data = _fitted_bgm(tmp_path)
    test = np.array(data[:40])
    truth = test[:, 0].copy()
    test[:, 0] = np.nan

    one_shot, iv_one = m.predict(test, alpha=0.2, bs=1000, n_mcmc=300, burn_in=300)
    batched, iv_bat = m.predict(test, alpha=0.2, bs=16, n_mcmc=300, burn_in=300)

    assert one_shot.shape == batched.shape == test.shape
    assert iv_one.shape == iv_bat.shape == (40, 1, 2)
    # Observed entries are passed through unchanged in both paths.
    np.testing.assert_array_equal(one_shot[:, 1:], batched[:, 1:])
    # Posterior means of independent converged chains agree per subject.
    diff = np.abs(one_shot[:, 0] - batched[:, 0])
    assert np.median(diff) < 0.35, (np.median(diff), diff.max())
    # And a gross misalignment (e.g. batches written to wrong rows) would
    # destroy the correlation with the truth in one path but not the other.
    c_one = np.corrcoef(one_shot[:, 0], truth)[0, 1]
    c_bat = np.corrcoef(batched[:, 0], truth)[0, 1]
    assert abs(c_one - c_bat) < 0.3


def test_bgm_predict_bs_return_samples(tmp_path):
    m, data = _fitted_bgm(tmp_path)
    test = np.array(data[:10])
    test[:, 0] = np.nan
    cube, intervals = m.predict(test, alpha=0.2, bs=3, n_mcmc=50, burn_in=50,
                                return_samples=True)
    assert cube.shape == (50, 10, 4)
    assert intervals.shape == (10, 1, 2)
    assert np.all(np.isfinite(cube))


# ---------------------------------------------------------------------------
# CausalBGM subject batching: exactness of the draw-index combination
# ---------------------------------------------------------------------------

import pytest

from bayesgm_tpu.models.causalbgm import CausalBGM


@pytest.fixture(scope="module")
def fitted_causal(tmp_path_factory):
    rng = np.random.RandomState(3)
    n, v_dim = 120, 4
    v = rng.randn(n, v_dim).astype("float32")
    x = (v[:, :1] + 0.3 * rng.randn(n, 1)).astype("float32")
    y = (x + v[:, 1:2] + 0.3 * rng.randn(n, 1)).astype("float32")
    p = dict(v_dim=v_dim, z_dims=[1, 1, 1, 2], binary_treatment=False,
             dataset="bs_causal", output_dir=str(tmp_path_factory.mktemp("bsc")),
             use_bnn=False, save_res=False, save_model=False)
    m = CausalBGM(p, random_seed=5)
    m.fit((x, y, v), epochs=3, epochs_per_eval=3, batch_size=30,
          use_egm_init=False, verbose=0)
    return m, (x, y, v)


def test_batched_intervals_match_unbatched(fitted_causal):
    """Continuous-treatment predict with n_test > bs combines per-batch ADRF
    draws at a common draw index; because per-subject chains are independent
    either way, the batched draw series has the SAME law as the unbatched
    one — intervals agree within Monte-Carlo tolerance (VERDICT r2 item 5)."""
    m, data = fitted_causal
    kw = dict(alpha=0.1, n_mcmc=400, burn_in=400, x_values=[0.5, 1.5], q_sd=1.0)
    adrf_one, iv_one = m.predict(data, bs=1000, **kw)
    adrf_bat, iv_bat = m.predict(data, bs=50, **kw)

    assert adrf_one.shape == adrf_bat.shape == (2,)
    np.testing.assert_allclose(adrf_one, adrf_bat, atol=0.25)
    width = np.maximum(iv_one[:, 1] - iv_one[:, 0], 1e-3)
    for col in (0, 1):
        diff = np.abs(iv_one[:, col] - iv_bat[:, col])
        assert np.all(diff < 0.75 * width + 0.05), (col, diff, width)


def test_aggregate_predict_continuous_unit():
    """Deterministic contract of _aggregate_predict: weighted draw-index
    averaging, quantiles of the combined series, per-batch-conservative
    diagnostics (min ESS / max R-hat), and raw-draw passthrough."""
    p = dict(v_dim=3, z_dims=[1, 1, 1, 2], binary_treatment=False,
             dataset="agg_unit", output_dir="/tmp/agg_unit",
             use_bnn=False, save_res=False, save_model=False)
    m = CausalBGM(p, random_seed=1)
    n_test, n_mcmc, grid = 70, 50, 3
    rng = np.random.RandomState(0)
    per_batch = {}

    def run_batch(bx, by, bv):
        b = len(bx)
        eff = rng.randn(n_mcmc, grid).astype("float32") + b  # (n_mcmc, grid)
        per_batch[len(per_batch)] = (eff, b)
        return eff, 0.25

    data = tuple(np.zeros((n_test, 1), np.float32) for _ in range(3))
    adrf, iv, diag, draws = m._aggregate_predict(
        run_batch, data, 0.2, n_mcmc, 30, np.zeros(grid), True,
        return_draws=True)

    expected = sum(eff.T * b for eff, b in per_batch.values()) / n_test
    np.testing.assert_allclose(draws, expected, rtol=1e-6)
    np.testing.assert_allclose(adrf, expected.mean(axis=1), rtol=1e-6)
    np.testing.assert_allclose(iv[:, 0], np.quantile(expected, 0.1, axis=1), rtol=1e-5)
    np.testing.assert_allclose(iv[:, 1], np.quantile(expected, 0.9, axis=1), rtol=1e-5)
    from bayesgm_tpu.ops import mcmc as mcmc_mod
    ds = [mcmc_mod.chain_diagnostics(eff.T, axis=1) for eff, _ in per_batch.values()]
    np.testing.assert_allclose(diag["ess"], np.min([d["ess"] for d in ds], axis=0))
    np.testing.assert_allclose(diag["rhat"], np.max([d["rhat"] for d in ds], axis=0))
    assert diag["accept_rate"] == pytest.approx(0.25)


def test_ensemble_pools_member_draws(fitted_causal, tmp_path):
    """EnsembleCausalBGM intervals are quantiles of the POOLED member draw
    set (mixture posterior), not averaged member bounds (VERDICT r2 item 5)."""
    from bayesgm_tpu.models.ensemble import EnsembleCausalBGM

    _, data = fitted_causal
    p = dict(v_dim=4, z_dims=[1, 1, 1, 2], binary_treatment=False,
             dataset="ens_pool", output_dir=str(tmp_path), n_members=2,
             use_bnn=False, save_res=False, save_model=False)
    ens = EnsembleCausalBGM(p, random_seed=9)
    ens.fit(data, epochs=2, epochs_per_eval=2, batch_size=30,
            use_egm_init=False, verbose=0)
    pt, iv, diag, pooled = ens.predict(data, alpha=0.2, n_mcmc=60, burn_in=60,
                                       x_values=[0.5, 1.5], q_sd=1.0,
                                       return_diagnostics=True,
                                       return_draws=True)
    assert pt.shape == (2,) and iv.shape == (2, 2)
    assert np.all(iv[:, 0] <= pt) and np.all(pt <= iv[:, 1])
    assert diag["ess"].shape == (2,) and diag["rhat"].shape == (2,)
    assert 0.0 <= diag["accept_rate"] <= 1.0
    # pooled mixture draw matrix: K * n_mcmc draws per grid point, and the
    # returned point/intervals are exactly its mean/quantiles
    assert pooled.shape == (2, 2 * 60)
    np.testing.assert_allclose(pt, pooled.mean(axis=1), rtol=1e-6)


# ---------------------------------------------------------------------------
# Doubly-robust (kernel-AIPW) estimator
# ---------------------------------------------------------------------------


def test_dr_estimator_corrects_plugin_bias(fitted_causal):
    """estimator='dr' returns the same shapes as the plugin path, stays
    finite, and — the point of double robustness — recovers the true ADRF
    (y = x + v2 + noise, so ADRF(x) = x) far better than the plugin on this
    deliberately under-trained model, because the residual correction fixes
    the outcome head's bias."""
    m, data = fitted_causal
    truth = np.array([0.5, 1.5])
    kw = dict(alpha=0.1, n_mcmc=200, burn_in=200, x_values=list(truth),
              q_sd=1.0)
    plugin, _ = m.predict(data, sample_y=False, **kw)
    dr, iv = m.predict(data, estimator="dr", **kw)
    assert dr.shape == (2,) and iv.shape == (2, 2)
    assert np.all(np.isfinite(dr)) and np.all(np.isfinite(iv))
    assert np.all(iv[:, 0] <= iv[:, 1])
    assert np.all(np.abs(dr - truth) < np.abs(plugin - truth)), (dr, plugin)
    assert np.all(np.abs(dr - truth) < 0.5), dr


def test_dr_collector_zero_residual_equals_plugin(fitted_causal):
    """With y set to the model's own fitted means, residuals vanish and the
    DR collector must reduce to the plugin g-computation exactly."""
    import jax
    import jax.numpy as jnp

    from bayesgm_tpu.models.causalbgm import (_apply, _dr_effect_collector_p,
                                              _effect_collector_p, _split_z)

    m, (x, y, v) = fitted_causal
    cfg = m.cfg
    z = np.random.RandomState(0).randn(len(x), sum(cfg.z_dims)).astype("f4")
    key = jax.random.PRNGKey(7)
    kf, _, _ = jax.random.split(key, 3)  # collectors split (kf, kh, rest)
    z0, z1, _ = _split_z(cfg, jnp.asarray(z))
    y_hat = np.asarray(_apply(cfg, m.nets["f"],
                              jnp.concatenate([z0, z1, x], axis=-1), kf)[:, :1])
    params = {"nets": m.nets, "data": (jnp.asarray(x), jnp.asarray(y_hat),
                                       jnp.asarray(v))}
    grid = [0.5, 1.5]
    dr = _dr_effect_collector_p(cfg, grid, h_bw=0.5)(params, jnp.asarray(z), key)
    plugin = _effect_collector_p(cfg, grid, sample_y=False)(params, jnp.asarray(z), key)
    np.testing.assert_allclose(np.asarray(dr), np.asarray(plugin),
                               rtol=1e-5, atol=1e-5)


def test_dr_estimator_guards(fitted_causal, tmp_path):
    m, data = fitted_causal
    with pytest.raises(ValueError, match="Unknown estimator"):
        m.predict(data, estimator="nope", n_mcmc=10, burn_in=10,
                  x_values=[1.0])
    with pytest.raises(ValueError, match="sampler='mh'"):
        m.predict(data, estimator="dr", sampler="mala", n_mcmc=10,
                  burn_in=10, x_values=[1.0])
    pb = dict(v_dim=4, z_dims=[1, 1, 1, 2], binary_treatment=True,
              dataset="dr_bin", output_dir=str(tmp_path),
              use_bnn=False, save_res=False, save_model=False)
    mb = CausalBGM(pb, random_seed=2)
    xb = (np.asarray(data[0]) > 0).astype("float32")
    with pytest.raises(ValueError, match="continuous treatment only"):
        mb.predict((xb, data[1], data[2]), estimator="dr", n_mcmc=10,
                   burn_in=10)


def test_ess_adaptive_predict_stops_early(fitted_causal):
    """predict(ess_target=...) stops collecting once the effect-series ESS
    and split-R-hat clear the gate at a chunk boundary — fewer draws than
    n_mcmc come back, and the point estimate stays consistent with the
    full-schedule run (VERDICT r3 item 4)."""
    m, data = fitted_causal
    kw = dict(alpha=0.1, burn_in=200, x_values=[0.5, 1.5], q_sd=1.0)
    adrf_full, _, draws_full = m.predict(data, n_mcmc=1500,
                                         return_draws=True, **kw)
    adrf_es, iv_es, draws_es = m.predict(data, n_mcmc=1500, ess_target=20.0,
                                         ess_rhat=1.5, return_draws=True,
                                         **kw)
    assert draws_full.shape[1] == 1500
    assert draws_es.shape[1] < 1500, draws_es.shape  # stopped at a boundary
    assert np.all(np.isfinite(adrf_es)) and np.all(iv_es[:, 0] <= iv_es[:, 1])
    np.testing.assert_allclose(adrf_es, adrf_full, atol=0.3)

    with pytest.raises(ValueError, match="ess_target requires"):
        m.predict(data, n_mcmc=10, burn_in=10, x_values=[1.0],
                  sampler="mala", ess_target=10.0)


# ---------------------------------------------------------------------------
# BNN subject-batching contract (VERDICT r3 item 5): with use_bnn=True and
# continuous treatment the per-launch shared flipout eps makes subject
# batching narrow ADRF intervals, so bs=None must auto-size to n_test and an
# explicit smaller bs must warn — never silent.
# ---------------------------------------------------------------------------

from types import SimpleNamespace

from bayesgm_tpu.models.causalbgm import _resolve_predict_bs


def test_resolve_predict_bs_contract():
    bnn_cont = SimpleNamespace(use_bnn=True, binary_treatment=False)
    plain_cont = SimpleNamespace(use_bnn=False, binary_treatment=False)
    bnn_bin = SimpleNamespace(use_bnn=True, binary_treatment=True)

    # bs=None auto-sizes to one full-data launch only in the BNN+continuous
    # regime; elsewhere batching is exact and the 10000 default stands.
    assert _resolve_predict_bs(bnn_cont, None, 25000) == 25000
    assert _resolve_predict_bs(plain_cont, None, 25000) == 10000
    assert _resolve_predict_bs(bnn_bin, None, 25000) == 10000

    # Explicit bs >= n_test: no warning anywhere.
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert _resolve_predict_bs(bnn_cont, 30000, 25000) == 30000
        assert _resolve_predict_bs(plain_cont, 64, 25000) == 64

    # Explicit bs < n_test with BNN+continuous: honored but warned.
    with pytest.warns(UserWarning, match="shared flipout eps"):
        assert _resolve_predict_bs(bnn_cont, 512, 25000) == 512


def test_bnn_continuous_predict_warns_on_small_bs(tmp_path):
    import warnings as _w

    rng = np.random.RandomState(4)
    n, v_dim = 60, 4
    v = rng.randn(n, v_dim).astype("float32")
    x = (v[:, :1] + 0.3 * rng.randn(n, 1)).astype("float32")
    y = (x + v[:, 1:2] + 0.3 * rng.randn(n, 1)).astype("float32")
    p = dict(v_dim=v_dim, z_dims=[1, 1, 1, 2], binary_treatment=False,
             dataset="bnn_bs", output_dir=str(tmp_path), use_bnn=True,
             save_res=False, save_model=False)
    m = CausalBGM(p, random_seed=6)
    m.fit((x, y, v), epochs=1, epochs_per_eval=1, batch_size=16,
          use_egm_init=False, verbose=0)
    kw = dict(alpha=0.2, n_mcmc=10, burn_in=10, x_values=[1.0], q_sd=1.0)
    with pytest.warns(UserWarning, match="shared flipout eps"):
        m.predict((x, y, v), bs=30, **kw)
    # Default bs=None: one full-data launch, no warning.
    with _w.catch_warnings():
        _w.simplefilter("error", UserWarning)
        adrf, ci = m.predict((x, y, v), **kw)
    assert adrf.shape == (1,) and np.all(np.isfinite(adrf))


def test_bgm_resolve_impute_bs():
    """bs=None auto-sizes to all subjects under the device cube budget;
    explicit bs honored (reference contract bs=100, bgm/base.py:630)."""
    from bayesgm_tpu.models.bgm import BGM

    m = BGM(dict(x_dim=20, z_dim=4, dataset="rb", output_dir="/tmp/rb",
                 save_res=False, save_model=False), random_seed=0)
    # small cube: everything fits -> all subjects in one launch
    assert m._resolve_impute_bs(None, 2000, 5000, 20) == 2000
    # budget-bound: (n_mcmc * flat_dim * 4) per row caps the batch
    assert m._resolve_impute_bs(None, 10**6, 5000, 784,
                                budget_bytes=2 * 2**30) == \
        (2 * 2**30) // (5000 * 784 * 4)
    assert m._resolve_impute_bs(100, 2000, 5000, 20) == 100
