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
