"""Python-side contract tests for the R (reticulate) marshalling.

R is not installed in this image, so the r-package/ wrappers cannot be
executed by testthat here.  These tests replay the EXACT call pattern the
R6 wrappers emit through reticulate (r-package/bayesgm/R/CausalBGM.R,
BGM.R; reference surface /root/reference/r-package/bayesgm/R/CausalBGM.R:40-103)
against the real engine:

- ``params`` arrives as a plain dict whose values carry R-converted types
  (R integer -> int, numeric -> float, logical -> bool, integer vector ->
  list of ints, character -> str);
- data arrives as a tuple (CausalBGM) / matrix (BGM) of float32 numpy
  arrays with column-matrix shapes;
- every ``fit``/``predict`` kwarg the R wrappers forward must be accepted
  under its exact name and R-converted type;
- the return value is positionally indexable (R uses ``res[[1]]``,
  ``res[[2]]``).
"""

import numpy as np
import pytest

from bayesgm_tpu.models.bgm import BGM
from bayesgm_tpu.models.causalbgm import CausalBGM


def _np_f32(a):
    # .np_f32 in python-config.R: float32 numpy array, column matrix.
    a = np.asarray(a, dtype=np.float32)
    return a.reshape(len(a), -1)


@pytest.fixture(scope="module")
def triplet():
    rng = np.random.RandomState(0)
    n, v_dim = 60, 4
    v = rng.randn(n, v_dim)
    x = v[:, :1] + 0.3 * rng.randn(n, 1)
    y = x + v[:, 1:2] + 0.3 * rng.randn(n, 1)
    return _np_f32(x), _np_f32(y), _np_f32(v)


def test_causalbgm_reticulate_call_pattern(triplet, tmp_path):
    x, y, v = triplet
    # reticulate::dict(p) after modifyList of .causalbgm_defaults:
    params = {
        "z_dims": [1, 1, 1, 2],          # R integer vector -> list[int]
        "binary_treatment": False,        # R logical -> bool
        "use_bnn": False,
        "dataset": "Rdata",               # R character -> str
        "output_dir": str(tmp_path),
        "save_res": False,
        "save_model": False,
        "g_units": [16, 16],
        "e_units": [16, 16],
        "f_units": [8, 8],
        "h_units": [8, 8],
        "dz_units": [8],
        "lr": 2e-4, "lr_theta": 1e-4, "lr_z": 1e-4,  # R numeric -> float
        "g_d_freq": 5, "kl_weight": 1e-4,
        "use_z_rec": 1.0,                 # R numeric 1.0, not bool
        "v_dim": 4,                       # ncol(v), as R integer
    }
    m = CausalBGM(params=params, random_seed=123)

    # Full fit kwarg surface the R wrapper forwards (CausalBGM.R fit).
    m.fit(data=(x, y, v), epochs=1, epochs_per_eval=1, batch_size=16,
          startoff=0, use_egm_init=True, egm_n_iter=20,
          egm_batches_per_eval=20, save_format="txt", verbose=0)

    # Full predict kwarg surface; x_values arrives as a list of floats
    # (as.numeric vector) and the result must be positionally indexable.
    res = m.predict(data=(x, y, v), alpha=0.1, n_mcmc=10, burn_in=10,
                    q_sd=1.0, sample_y=True, x_values=[0.5, 1.5], bs=60)
    effect, interval = res[0], res[1]  # R: res[[1]], res[[2]]
    assert np.asarray(effect).shape == (2,)
    assert np.asarray(interval).shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(effect)))

    # bs omitted (R bs=NULL): engine auto-sizes — must also be accepted.
    res2 = m.predict(data=(x, y, v), alpha=0.1, n_mcmc=10, burn_in=10,
                     q_sd=1.0, sample_y=True, x_values=[0.5, 1.5])
    assert np.asarray(res2[0]).shape == (2,)

    # Reference's R wrapper passes x_values as a float32 np array
    # (reticulate::np_array(..., dtype="float32")) — accept that too.
    res3 = m.predict(data=[x, y, v],  # reference passes list(), not tuple()
                     alpha=0.1, n_mcmc=10, burn_in=10, q_sd=1.0,
                     sample_y=True,
                     x_values=np.asarray([0.5, 1.5], np.float32))
    assert np.asarray(res3[0]).shape == (2,)


def test_bgm_reticulate_call_pattern(tmp_path):
    rng = np.random.RandomState(1)
    n, x_dim, z_dim = 50, 3, 2
    z = rng.randn(n, z_dim)
    w = rng.randn(z_dim, x_dim)
    data = _np_f32(z @ w + 0.1 * rng.randn(n, x_dim))

    params = {
        "z_dim": 2, "use_bnn": False, "dataset": "Rdata",
        "output_dir": str(tmp_path), "save_res": False, "save_model": False,
        "g_units": [16, 16], "e_units": [16, 16],
        "dz_units": [8], "dx_units": [8],
        "lr": 1e-3, "lr_theta": 5e-3, "lr_z": 5e-3,
        "gamma": 0.0, "alpha": 0.0, "g_d_freq": 1, "kl_weight": 5e-5,
        "x_dim": 3,
    }
    m = BGM(params=params, random_seed=11)
    m.fit(data=data, epochs=1, epochs_per_eval=1, batch_size=16,
          use_egm_init=True, egm_n_iter=20, egm_batches_per_eval=20,
          verbose=0)

    test = np.array(data[:10])
    test[:, 0] = np.nan
    res = m.predict(data=test, alpha=0.1, return_samples=False, bs=100,
                    n_mcmc=20, burn_in=20, step_size=0.01,
                    num_leapfrog_steps=10, seed=42)
    imputed, interval = res[0], res[1]
    assert np.asarray(imputed).shape == test.shape
    assert not np.any(np.isnan(np.asarray(imputed)))

    # generate(nb_samples=...) as the R wrapper calls it; R unwraps res[[1]].
    gen = m.generate(nb_samples=7)
    first = gen[0] if isinstance(gen, (tuple, list)) else gen
    assert np.asarray(first).shape == (7, 3)


def test_datasets_loaders_reticulate_call_pattern():
    """Replay r-package/bayesgm/R/datasets.R (reference R/datasets.R:1-77).

    load_sim_hirano_imbens: Sim_Hirano_Imbens_sampler(batch_size=, N=,
    v_dim=, seed=) with R-converted integer kwargs, then load_all() unpacked
    positionally into (x, y, v).  load_sim_heteroskedastic: simulate_z_hetero
    (n=, k=z_dim, d=x_dim-1, seed=) split by sklearn train_test_split
    (test_size=, random_state=split_seed), response appended as the LAST
    column of data_train and an NA column on data_test.
    """
    import bayesgm_tpu as b

    sampler = b.Sim_Hirano_Imbens_sampler(batch_size=32, N=50, v_dim=6, seed=0)
    triplet = sampler.load_all()
    x, y, v = triplet[0], triplet[1], triplet[2]  # R: [[1]], [[2]], [[3]]
    assert np.asarray(x).shape == (50, 1)
    assert np.asarray(y).shape == (50, 1)
    assert np.asarray(v).shape == (50, 6)

    pytest.importorskip("sklearn")
    from sklearn.model_selection import train_test_split

    n, z_dim, x_dim = 40, 3, 5
    sim = b.simulate_z_hetero(n=n, k=z_dim, d=x_dim - 1, seed=42)
    X, Y = sim[0], sim[1]
    split = train_test_split(X, Y, test_size=0.1, random_state=123)
    X_train, X_test, Y_train, Y_test = split[0], split[1], split[2], split[3]
    assert X_train.shape == (36, x_dim - 1) and X_test.shape == (4, x_dim - 1)
    # R: cbind(X_train, Y_train) / cbind(X_test, NA column)
    data_train = np.concatenate([X_train, np.reshape(Y_train, (-1, 1))], axis=1)
    data_test = np.concatenate(
        [X_test, np.full((len(X_test), 1), np.nan)], axis=1)
    assert data_train.shape == (36, x_dim) and data_test.shape == (4, x_dim)
    assert np.all(np.isnan(data_test[:, -1]))
    assert np.all(np.isfinite(data_train))
