"""Utils/IO tests (modeled on src/bayesgm/tests/test_utils.py)."""

import numpy as np
import pytest

from bayesgm_tpu.utils import (
    estimate_latent_dims,
    get_ADRF,
    mnist_mask_indices,
    parse_file,
    parse_file_triplet,
    save_data,
)
from bayesgm_tpu.utils.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)


def test_save_data_roundtrip(tmp_path):
    data = np.random.RandomState(0).randn(5, 3).astype("float32")
    for ext in ("npy", "txt", "csv"):
        path = str(tmp_path / f"out.{ext}")
        save_data(path, data)
        loaded = np.load(path) if ext == "npy" else np.loadtxt(path, delimiter="\t")
        np.testing.assert_allclose(loaded, data, atol=1e-5)
    with pytest.raises(ValueError):
        save_data(str(tmp_path / "out.bad"), data)


def test_parse_file_formats(tmp_path):
    rng = np.random.RandomState(0)
    data = rng.randn(20, 4).astype("float32")
    npz = str(tmp_path / "d.npz")
    np.savez(npz, data=data)
    loaded = parse_file(npz, normalize=False)
    np.testing.assert_allclose(loaded, data)

    txt = str(tmp_path / "d.txt")
    np.savetxt(txt, data, delimiter="\t")
    loaded = parse_file(txt, normalize=True)
    np.testing.assert_allclose(loaded.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(loaded.std(axis=0), 1.0, atol=1e-4)

    bad = str(tmp_path / "d.bad")
    with open(bad, "w") as f:
        f.write("1\t2\n")
    with pytest.raises(SystemExit):
        parse_file(bad)


def test_parse_file_triplet(tmp_path):
    rng = np.random.RandomState(0)
    x = rng.randn(30, 1).astype("float32")
    y = rng.randn(30, 1).astype("float32")
    v = rng.randn(30, 6).astype("float32")

    npz = str(tmp_path / "t.npz")
    np.savez(npz, x=x, y=y, v=v)
    lx, ly, lv = parse_file_triplet(npz, normalize=False)
    np.testing.assert_allclose(lx, x)

    txt = str(tmp_path / "t.txt")
    np.savetxt(txt, np.hstack([x, y, v]), delimiter="\t")
    lx, ly, lv = parse_file_triplet(txt, normalize=True)
    assert lx.shape == (30, 1) and ly.shape == (30, 1) and lv.shape == (30, 6)
    np.testing.assert_allclose(lv.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(lx, x, atol=1e-5)  # x not normalized


def test_get_adrf_oracles():
    xs = np.array([0.0, 1.0, 2.0], dtype="float32")
    np.testing.assert_allclose(get_ADRF(x_values=xs, dataset="Imbens"),
                               xs + 2 / (1 + xs) ** 3, rtol=1e-6)
    np.testing.assert_allclose(get_ADRF(x_values=xs, dataset="Lee"),
                               1.2 * xs + xs**3, rtol=1e-6)
    vals = get_ADRF(x_min=0.0, x_max=3.0, nb_intervals=20, dataset="Sun")
    assert vals.shape == (20,)
    with pytest.raises(ValueError):
        get_ADRF(x_values=xs, dataset="nope")
    with pytest.raises(ValueError):
        get_ADRF()


def test_estimate_latent_dims():
    rng = np.random.RandomState(0)
    n, v_dim = 500, 20
    v = rng.randn(n, v_dim)
    x = (v[:, :3].sum(axis=1) + 0.1 * rng.randn(n)).reshape(-1, 1)
    y = (v[:, 3:5].sum(axis=1) + 0.1 * rng.randn(n)).reshape(-1, 1)
    dims = estimate_latent_dims(x, y, v)
    assert len(dims) == 4
    assert dims[0] == 3
    assert all(d >= 1 for d in dims)


def test_sir_slicing_golden():
    """Golden outputs computed once from the reference implementation
    (src/bayesgm/utils/helpers.py slice_y/get_SDR_dim) on fixed inputs —
    pins the rewritten slicing algorithm to exact numerical parity."""
    from bayesgm_tpu.utils.helpers import get_SDR_dim, slice_y

    rng = np.random.RandomState(42)
    _, counts = slice_y(np.sort(rng.randn(101)), n_slices=7)
    assert counts.tolist() == [14, 14, 14, 14, 14, 14, 14, 3]

    y_tied = np.repeat(np.arange(5), [3, 10, 1, 40, 6]).astype(float)
    _, counts = slice_y(y_tied, n_slices=3)
    assert counts.tolist() == [54, 6]

    X = rng.randn(300, 12)
    y = X[:, 0] + 2 * X[:, 1] - X[:, 2] + 0.05 * rng.randn(300)
    assert get_SDR_dim(X, y.reshape(-1, 1), n_slices=10, ratio=0.8) == 2
    y2 = np.sin(X[:, 3]) + 0.05 * rng.randn(300)
    assert get_SDR_dim(X, y2.reshape(-1, 1), n_slices=8, ratio=0.9) == 3

    with pytest.raises(ValueError):
        slice_y(np.ones(10))


def test_mnist_mask_indices():
    obs, miss = mnist_mask_indices(mode="upper_half")
    assert len(obs) + len(miss) == 784
    assert len(miss) == 392
    obs, miss = mnist_mask_indices(mode="hole", center=(14, 14), hole_size=3)
    assert len(miss) == 9
    obs, miss = mnist_mask_indices(mode="edge_stripe", orientation="vertical", stripe_width=4)
    assert len(miss) == 4 * 28
    with pytest.raises(ValueError):
        mnist_mask_indices(mode="bogus")


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": [jnp.zeros(2), jnp.ones(3)]}
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 1, tree)
    tree2 = {"a": jnp.full((2, 3), 7.0), "b": [jnp.full(2, 7.0), jnp.full(3, 7.0)]}
    save_checkpoint(d, 5, tree2)
    assert latest_checkpoint(d).endswith("ckpt-5.npz")
    restored = restore_checkpoint(latest_checkpoint(d), tree)
    np.testing.assert_allclose(np.asarray(restored["a"]), 7.0)
    # prune with max_to_keep
    for step in range(6, 15):
        save_checkpoint(d, step, tree, max_to_keep=3)
    import os

    assert len(os.listdir(d)) == 3


def test_roofline_cost_model_and_report():
    """bnn_eval_cost counts 2 matmuls/layer over the live g/h/f nets and
    roofline_report classifies against measured anchors (VERDICT r4 #5)."""
    from bayesgm_tpu.models.causalbgm import CausalBGM
    from bayesgm_tpu.utils import roofline

    params = dict(v_dim=200, z_dims=[1, 1, 1, 7], binary_treatment=False,
                  dataset="rf", output_dir="/tmp/rf_test", use_bnn=True,
                  save_res=False, save_model=False)
    m = CausalBGM(params, random_seed=0)
    fl, by = roofline.bnn_eval_cost(m.nets, v_dim=200)
    # g [10,64x5,201], f [3,64,32,8,2], h [2,64,32,8,2]:
    # sum(in*out) = 29888 + 2512 + 2448 = 34848; x2 matmuls x2 flops/MAC.
    assert fl == 4 * 34848
    assert 1000 < by < 2500  # ~852 B row IO + ~560 B amortized weights

    rep = roofline.roofline_report(1e6, fl, by, matmul_peak=1e12, hbm_bw=1e11)
    assert rep["pct_peak_mxu"] == round(100 * 1e6 * fl / 1e12, 2)
    assert rep["arithmetic_intensity_flops_per_byte"] > rep["ridge_flops_per_byte"]
    assert rep["bound"].startswith("compute")
