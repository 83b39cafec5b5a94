"""Dataset layer tests (modeled on the reference test strategy,
src/bayesgm/tests/test_datasets.py)."""

import numpy as np
import pytest

from bayesgm_tpu.datasets import (
    Base_sampler,
    Gaussian_sampler,
    GMM_indep_sampler,
    Semi_acic_sampler,
    Sim_Colangelo_sampler,
    Sim_Hirano_Imbens_sampler,
    Sim_Sun_sampler,
    Swiss_roll_sampler,
    simulate_heteroskedastic_data,
    simulate_low_rank_data,
    simulate_regression,
    simulate_z_hetero,
)


def test_base_sampler_shapes_and_cycling():
    n, v_dim, bs = 50, 7, 16
    rng = np.random.RandomState(0)
    s = Base_sampler(rng.randn(n), rng.randn(n), rng.randn(n, v_dim), batch_size=bs)
    x, y, v = s.next_batch()
    assert x.shape == (bs, 1) and y.shape == (bs, 1) and v.shape == (bs, v_dim)
    assert x.dtype == np.float32
    # cycle through more than one epoch; batches always full-size
    for _ in range(10):
        x, y, v = s.next_batch()
        assert x.shape == (bs, 1)
    fx, fy, fv = s.load_all()
    assert fx.shape == (n, 1) and fv.shape == (n, v_dim)


def test_base_sampler_normalize():
    rng = np.random.RandomState(0)
    v = rng.randn(100, 5) * 10 + 3
    s = Base_sampler(rng.randn(100), rng.randn(100), v, normalize=True)
    _, _, fv = s.load_all()
    np.testing.assert_allclose(fv.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(fv.std(axis=0), 1.0, atol=1e-4)


@pytest.mark.parametrize("cls,v_dim", [
    (Sim_Hirano_Imbens_sampler, 20),
    (Sim_Sun_sampler, 20),
    (Sim_Colangelo_sampler, 10),
])
def test_sim_samplers(cls, v_dim):
    s = cls(batch_size=8, N=100, v_dim=v_dim, seed=0)
    x, y, v = s.next_batch()
    assert x.shape == (8, 1) and y.shape == (8, 1) and v.shape == (8, v_dim)
    fx, fy, fv = s.load_all()
    assert fx.shape == (100, 1) and fv.shape == (100, v_dim)
    # covariates standardised
    np.testing.assert_allclose(fv.mean(axis=0), 0.0, atol=1e-4)


def test_semi_acic_sampler(tmp_path):
    # fabricate a miniature ACIC directory tree
    import pandas as pd

    n = 30
    rng = np.random.RandomState(0)
    ids = [f"s{i}" for i in range(n)]
    x_df = pd.DataFrame(rng.randn(n, 4), columns=[f"c{i}" for i in range(4)])
    x_df.insert(0, "sample_id", ids)
    x_df.to_csv(tmp_path / "x.csv", index=False)
    (tmp_path / "scaling" / "factuals").mkdir(parents=True)
    sim_df = pd.DataFrame({"sample_id": ids, "z": rng.randint(0, 2, n), "y": rng.randn(n)})
    sim_df.to_csv(tmp_path / "scaling" / "factuals" / "abc.csv", index=False)

    s = Semi_acic_sampler(batch_size=8, path=str(tmp_path), ufid="abc")
    x, y, v = s.next_batch()
    assert x.shape == (8, 1) and v.shape == (8, 4)
    assert set(np.unique(x)).issubset({0.0, 1.0})


def test_bayesgm_data_env_root(tmp_path, monkeypatch):
    """The $BAYESGM_DATA hook resolves real-data directories with no path
    argument, and a missing dataset fails loudly naming the hook."""
    import pandas as pd
    import pytest

    n = 20
    rng = np.random.RandomState(1)
    ids = [f"s{i}" for i in range(n)]
    acic = tmp_path / "ACIC_2018"
    (acic / "scaling" / "factuals").mkdir(parents=True)
    x_df = pd.DataFrame(rng.randn(n, 3), columns=[f"c{i}" for i in range(3)])
    x_df.insert(0, "sample_id", ids)
    x_df.to_csv(acic / "x.csv", index=False)
    sim_df = pd.DataFrame({"sample_id": ids, "z": rng.randint(0, 2, n), "y": rng.randn(n)})
    sim_df.to_csv(acic / "scaling" / "factuals" / "u1.csv", index=False)

    monkeypatch.setenv("BAYESGM_DATA", str(tmp_path))
    s = Semi_acic_sampler(batch_size=4, ufid="u1")
    x, y, v = s.next_batch()
    assert x.shape == (4, 1) and v.shape == (4, 3)

    from bayesgm_tpu.datasets import Semi_Twins_sampler

    with pytest.raises(FileNotFoundError, match="BAYESGM_DATA"):
        Semi_Twins_sampler(batch_size=4)  # no Twins/ under the root


def test_gaussian_sampler():
    s = Gaussian_sampler(mean=np.zeros(3), sd=1.0, N=1000)
    assert s.get_batch(17).shape == (17, 3)
    assert s.train(9).shape == (9, 3)
    assert s.load_all().shape == (1000, 3)


def test_gmm_indep_sampler_density():
    s = GMM_indep_sampler(N=1000, sd=0.1, dim=2, n_components=3, bound=1)
    assert s.X.shape == (1000, 2)
    d = s.get_density(np.zeros((5, 2)))
    assert d.shape == (5,)
    assert np.all(d >= 0)
    assert s.train(12).shape == (12, 2)


def test_swiss_roll_sampler():
    s = Swiss_roll_sampler(N=500)
    assert s.X.shape == (500, 2)
    d = s.get_density(s.X[:4])
    assert d.shape == (4,) and np.all(d > 0)


def test_simulate_regression():
    X, Y = simulate_regression(100, 5, 2)
    assert X.shape == (100, 5) and Y.shape == (100, 2)
    Xl, _ = simulate_regression(100, 5, 2, effective_rank=2)
    assert Xl.shape == (100, 5)


def test_simulate_low_rank_data_covariance():
    X, Z = simulate_low_rank_data(n_samples=20000, sigma_z=False)
    assert X.shape == (20000, 4) and Z.shape == (20000, 2)
    # Marginal covariance of X should be A A^T + D + W W^T
    A = np.array([[1.0, -0.5], [0.3, 0.8], [-0.7, 0.2], [0.5, 1.0]])
    W = np.array([[0.25, 0.0], [0.25, 0.0], [0.0, 0.25], [0.0, 0.25]])
    D = np.diag([0.1, 0.1, 0.2, 0.2])
    expected = A @ A.T + D + W @ W.T
    np.testing.assert_allclose(np.cov(X.T), expected, atol=0.1)


def test_simulate_heteroskedastic_and_z_hetero():
    X, Y, sigma = simulate_heteroskedastic_data(n=200, d=5)
    assert X.shape == (200, 5) and Y.shape == (200,) and sigma.shape == (200,)
    X2, Y2 = simulate_z_hetero(n=300, k=3, d=19)
    assert X2.shape == (300, 19) and Y2.shape == (300,)


def test_semi_twins_sampler(tmp_path):
    """Fabricated Twins CSV trio exercising every filter in the loader:
    NaN-covariate rows dropped, first-twin birthweight >= 2kg pairs dropped,
    both twins stacked, synthetic outcome + auxiliary_constant exposed
    (reference causal_samplers.py:129-170)."""
    import pandas as pd

    from bayesgm_tpu.datasets import Semi_Twins_sampler

    n, v_dim = 40, 6
    rng = np.random.RandomState(1)
    cov = rng.randn(n, v_dim)
    cov[3, 2] = np.nan  # one NaN row -> dropped
    cov_df = pd.DataFrame(cov, columns=[f"cov{i}" for i in range(v_dim)])
    # loader slices .iloc[:, 2:] then drops the two infant-id columns
    cov_df.insert(0, "Unnamed: 0", np.arange(n))
    cov_df.insert(1, "idx", np.arange(n))
    cov_df["infant_id_0"] = np.arange(n)
    cov_df["infant_id_1"] = np.arange(n) + n

    w0 = rng.randint(800, 1900, size=n).astype(float)
    w1 = rng.randint(800, 1900, size=n).astype(float)
    w1[5] = 2400.0  # heavy first-twin pair -> dropped (column dbirwt_1)
    t_df = pd.DataFrame({"Unnamed: 0": np.arange(n), "dbirwt_0": w0, "dbirwt_1": w1})
    y_df = pd.DataFrame({"Unnamed: 0": np.arange(n),
                         "mort_0": rng.randint(0, 2, n),
                         "mort_1": rng.randint(0, 2, n)})

    cov_df.to_csv(tmp_path / "twin_pairs_X_3years_samesex.csv", index=False)
    t_df.to_csv(tmp_path / "twin_pairs_T_3years_samesex.csv", index=False)
    y_df.to_csv(tmp_path / "twin_pairs_Y_3years_samesex.csv", index=False)

    s = Semi_Twins_sampler(batch_size=4, seed=0, path=str(tmp_path))
    x, y, v = s.load_all()
    kept = n - 2  # one NaN row + one heavy pair
    assert x.shape == (2 * kept, 1) and y.shape == (2 * kept, 1)
    assert v.shape == (2 * kept, v_dim)
    # treatments are birthweight / 1000 of BOTH twins, all under the 2kg cap
    assert np.all(x < 2.0) and np.all(x > 0)
    assert np.isfinite(s.auxiliary_constant)
    # covariates standardised by the base sampler
    np.testing.assert_allclose(v.mean(axis=0), 0.0, atol=1e-4)
