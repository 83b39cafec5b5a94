"""BGM/MNISTBGM ``predict`` must honor ``bs`` (reference contract
bgm/base.py:527-663): subjects are processed in batches through the HMC
sampler so the host-side (n_mcmc, n, x_dim) sample cube is bounded.
Chains are per-subject independent, so batching only changes RNG pairing —
per-subject posterior means agree within Monte-Carlo tolerance."""

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
