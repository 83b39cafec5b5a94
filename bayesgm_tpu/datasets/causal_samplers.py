"""Causal benchmark dataset samplers.

Same generative definitions as the reference
(src/bayesgm/datasets/causal_samplers.py:10-170) so benchmarks are comparable;
implementations are fresh numpy.
"""

from __future__ import annotations

import os

import numpy as np

from bayesgm_tpu.datasets.base_sampler import Base_sampler


def resolve_data_path(path, subdir: str, probe: str) -> str:
    """Resolve a real-data directory for the semi-synthetic loaders.

    Order: an explicit ``path`` argument wins; otherwise
    ``$BAYESGM_DATA/<subdir>`` when the env var is set; otherwise the
    reference's relative default ``../data/<subdir>``.  Raises a
    FileNotFoundError that names the env-var hook when ``probe`` (a file the
    loader is about to read) is absent, so a data-bearing environment can be
    pointed at the datasets with zero code changes.
    """
    if path is None:
        root = os.environ.get("BAYESGM_DATA")
        path = os.path.join(root, subdir) if root else os.path.join("..", "data", subdir)
    probe_path = os.path.join(path, probe)
    if not os.path.exists(probe_path):
        raise FileNotFoundError(
            f"Dataset file '{probe_path}' not found. Download the {subdir} "
            "data and either pass path=... or set the BAYESGM_DATA "
            f"environment variable to a directory containing '{subdir}/'.")
    return path


class Semi_acic_sampler(Base_sampler):
    """ACIC-2018 semi-synthetic loader (binary treatment).

    Joins the shared covariate table ``x.csv`` with the per-setting factuals
    ``scaling/factuals/{ufid}.csv`` on ``sample_id``; treatment is the ``z``
    column, outcome the ``y`` column (reference causal_samplers.py:30-38).
    Data directory resolves via :func:`resolve_data_path` (``$BAYESGM_DATA``).
    """

    def __init__(self, batch_size: int = 32, path: str | None = None,
                 ufid: str = "d5bd8e4814904c58a79d7cdcd7c2a1bb"):
        import pandas as pd

        path = resolve_data_path(path, "ACIC_2018", "x.csv")
        self.df_covariants = pd.read_csv(f"{path}/x.csv", index_col="sample_id", header=0, sep=",")
        self.df_sim = pd.read_csv(f"{path}/scaling/factuals/{ufid}.csv", index_col="sample_id", header=0, sep=",")
        dataset = self.df_covariants.join(self.df_sim, how="inner")
        x = dataset["z"].values.reshape(-1, 1)
        y = dataset["y"].values.reshape(-1, 1)
        v = dataset.values[:, :-2]
        super().__init__(x, y, v, batch_size=batch_size, normalize=True)


class Sim_Hirano_Imbens_sampler(Base_sampler):
    """Hirano–Imbens continuous-treatment simulation.

    V ~ Exp(1)^{v_dim}; X | V ~ Exp(rate = V1 + V2);
    Y | X, V ~ N(X + (V1+V3) exp(-X (V1+V3)), 1).
    (reference causal_samplers.py:58-67; true ADRF: x + 2/(1+x)^3.)
    """

    def __init__(self, batch_size: int = 32, N: int = 20000, v_dim: int = 200, seed: int = 0):
        rng = np.random.RandomState(seed)
        v = rng.exponential(scale=1.0, size=(N, v_dim))
        rate = v[:, 0] + v[:, 1]
        x = rng.exponential(scale=1.0 / rate)
        y = rng.normal(x + (v[:, 0] + v[:, 2]) * np.exp(-x * (v[:, 0] + v[:, 2])), 1)
        super().__init__(x.reshape(-1, 1), y.reshape(-1, 1), v, batch_size=batch_size, normalize=True)


class Sim_Sun_sampler(Base_sampler):
    """Sun continuous-treatment simulation with trig/polynomial confounding
    (reference causal_samplers.py:88-94; true ADRF: x - 1/2 + e^{-0.5} + 1)."""

    def __init__(self, batch_size: int = 32, N: int = 20000, v_dim: int = 200, seed: int = 0):
        rng = np.random.RandomState(seed)
        v = rng.normal(0, 1, size=(N, v_dim))
        x = rng.normal(-2 * np.sin(2 * v[:, 0]) + (v[:, 1] ** 2 - 1.0 / 3) + (v[:, 2] - 0.5) + np.cos(v[:, 3]), 1)
        y = rng.normal((v[:, 0] - 0.5) + np.cos(v[:, 1]) + v[:, 4] ** 2 + v[:, 5] + x, 1)
        super().__init__(x.reshape(-1, 1), y.reshape(-1, 1), v, batch_size=batch_size, normalize=True)


class Sim_Colangelo_sampler(Base_sampler):
    """Colangelo continuous-treatment simulation with tridiagonal-covariance
    Gaussian covariates (reference causal_samplers.py:117-127; true ADRF:
    1.2 x + x^3, the 'Lee' oracle)."""

    def __init__(self, batch_size: int = 32, N: int = 20000, v_dim: int = 100, seed: int = 0,
                 rho: float = 0.5, d: float = 1.0, a: float = 3.0, b: float = 0.75):
        from scipy.stats import norm

        rng = np.random.RandomState(seed)
        sigma = (np.eye(v_dim)
                 + rho * np.eye(v_dim, k=1)
                 + rho * np.eye(v_dim, k=-1))
        theta = 1.0 / np.arange(1, v_dim + 1) ** 2
        epsilon = rng.normal(0, 1, N)
        nu = rng.normal(0, 1, N)
        v = rng.multivariate_normal(np.zeros(v_dim), sigma, size=[N])
        x = d * norm.cdf(a * (v @ theta)) + b * nu - 0.5
        y = 1.2 * x + x**3 + x * v[:, 0] + 1.2 * (v @ theta) + epsilon
        super().__init__(x.reshape(-1, 1), y.reshape(-1, 1), v, batch_size=batch_size, normalize=True)


class Semi_Twins_sampler(Base_sampler):
    """Twins semi-synthetic dataset (continuous treatment = birthweight/1000).

    Loads the CSV trio, drops NaN rows and pairs with first-twin birthweight
    >= 2kg, stacks both twins, and synthesises the outcome
    y = -2 sigmoid(3x) + V gamma + eps (reference causal_samplers.py:146-168).
    Exposes ``auxiliary_constant`` = mean(V gamma) for ADRF centering.
    Data directory resolves via :func:`resolve_data_path` (``$BAYESGM_DATA``).
    """

    def __init__(self, batch_size: int = 32, seed: int = 0, path: str | None = None):
        import pandas as pd

        path = resolve_data_path(path, "Twins", "twin_pairs_X_3years_samesex.csv")
        covariate_df = (pd.read_csv(f"{path}/twin_pairs_X_3years_samesex.csv")
                        .iloc[:, 2:].drop(["infant_id_0", "infant_id_1"], axis=1))
        treatment_df = pd.read_csv(f"{path}/twin_pairs_T_3years_samesex.csv").iloc[:, 1:]
        outcome_df = pd.read_csv(f"{path}/twin_pairs_Y_3years_samesex.csv").iloc[:, 1:]

        nan_rows = covariate_df.index[covariate_df.isnull().any(axis=1)]
        covariate_df = covariate_df.drop(nan_rows)
        treatment_df = treatment_df.drop(nan_rows)
        outcome_df = outcome_df.drop(nan_rows)

        heavy_rows = treatment_df.index[treatment_df["dbirwt_1"] >= 2000]
        covariate_df = covariate_df.drop(heavy_rows)
        treatment_df = treatment_df.drop(heavy_rows)
        outcome_df = outcome_df.drop(heavy_rows)

        x = np.concatenate([treatment_df.values[:, 0], treatment_df.values[:, 1]]) / 1000.0
        v = np.concatenate([covariate_df.values, covariate_df.values])
        rng = np.random.RandomState(seed)
        eps = rng.normal(0, 0.25, size=(v.shape[0],))
        gamma = rng.normal(0, 0.025, size=(v.shape[1],))
        y = -2.0 / (1.0 + np.exp(-3.0 * x)) + v @ gamma + eps
        self.auxiliary_constant = float(np.mean(v @ gamma))
        super().__init__(x.reshape(-1, 1), y.reshape(-1, 1), v, batch_size=batch_size, normalize=True)
