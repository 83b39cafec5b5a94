"""CLI tests: mocked plumbing tests (modeled on src/bayesgm/tests/test_cli.py
— argument plumbing into fit/predict kwargs, output paths) plus one REAL
unmocked end-to-end run exercising parse -> fit -> predict -> save."""

from unittest import mock

import numpy as np
import pytest

from bayesgm_tpu.cli import cli


@pytest.fixture
def triplet(tmp_path):
    rng = np.random.RandomState(0)
    x = rng.randint(0, 2, (30, 1)).astype("float32")
    y = rng.randn(30, 1).astype("float32")
    v = rng.randn(30, 4).astype("float32")
    path = str(tmp_path / "t.npz")
    np.savez(path, x=x, y=y, v=v)
    return path, (x, y, v)


def test_causalbgm_binary_branch(triplet, tmp_path):
    path, (x, y, v) = triplet
    fake_model = mock.MagicMock()
    fake_model.save_dir = str(tmp_path)
    fake_model.predict.return_value = (np.zeros(30), np.zeros((30, 2)))

    with mock.patch.object(cli, "_run_causalbgm", wraps=cli._run_causalbgm), \
         mock.patch("bayesgm_tpu.models.causalbgm.CausalBGM", return_value=fake_model) as M, \
         mock.patch("bayesgm_tpu.utils.save_data") as S:
        cli.main(["causalbgm", "-o", str(tmp_path), "-i", path, "-B",
                  "-E", "3", "-M", "7", "--burn_in", "11", "-q", "0.5"])

    # model constructed with inferred v_dim
    params = M.call_args.kwargs["params"]
    assert params["v_dim"] == 4
    assert params["binary_treatment"] is True
    # fit called with the CLI's epochs / EGM settings
    fit_kwargs = fake_model.fit.call_args.kwargs
    assert fit_kwargs["epochs"] == 3
    assert fit_kwargs["egm_n_iter"] == 30000
    # predict called without x_values for binary treatment
    pred_kwargs = fake_model.predict.call_args.kwargs
    assert pred_kwargs["n_mcmc"] == 7
    assert pred_kwargs["burn_in"] == 11
    assert pred_kwargs["q_sd"] == 0.5
    assert "x_values" not in pred_kwargs
    # outputs saved
    paths = [c.args[0] for c in S.call_args_list]
    assert any("causal_effect_point_estimate" in p for p in paths)
    assert any("causal_effect_posterior_interval" in p for p in paths)


def test_causalbgm_continuous_branch(triplet, tmp_path):
    path, _ = triplet
    fake_model = mock.MagicMock()
    fake_model.save_dir = str(tmp_path)
    fake_model.predict.return_value = (np.zeros(3), np.zeros((3, 2)))

    with mock.patch("bayesgm_tpu.models.causalbgm.CausalBGM", return_value=fake_model), \
         mock.patch("bayesgm_tpu.utils.save_data"):
        cli.main(["causalbgm", "-o", str(tmp_path), "-i", path,
                  "--no-binary_treatment", "--x_values", "0.5", "1.0", "1.5"])

    pred_kwargs = fake_model.predict.call_args.kwargs
    assert pred_kwargs["x_values"] == [0.5, 1.0, 1.5]


def test_bgm_branch_alpha_remap(tmp_path):
    rng = np.random.RandomState(0)
    data = rng.randn(20, 5).astype("float32")
    path = str(tmp_path / "d.npz")
    np.savez(path, data=data)

    fake_model = mock.MagicMock()
    fake_model.save_dir = str(tmp_path)
    fake_model.predict.return_value = (np.zeros((20, 5)), np.zeros((20, 0, 2)))

    with mock.patch("bayesgm_tpu.models.bgm.BGM", return_value=fake_model) as M, \
         mock.patch("bayesgm_tpu.utils.save_data"):
        cli.main(["bgm", "-o", str(tmp_path), "-i", path,
                  "--alpha", "0.1", "--egm_reg_alpha", "0.02", "--step_size", "0.05"])

    params = M.call_args.kwargs["params"]
    assert params["x_dim"] == 5
    # significance level routed to predict, regularizer to the model
    assert params["alpha"] == 0.02
    pred_kwargs = fake_model.predict.call_args.kwargs
    assert pred_kwargs["alpha"] == 0.1
    assert pred_kwargs["step_size"] == 0.05


def test_version_and_help(capsys):
    with pytest.raises(SystemExit):
        cli.main(["--version"])
    out = capsys.readouterr().out
    assert "1.0.2" in out
    cli.main([])  # no subcommand -> help, no crash


def test_causalbgm_cli_end_to_end(triplet, tmp_path):
    """One real (unmocked) console run: parse_file_triplet -> CausalBGM ->
    fit -> predict -> save_data, with tiny nets / 1 epoch / n_mcmc=5."""
    import glob
    import os

    path, (x, y, v) = triplet
    out = str(tmp_path / "e2e")
    cli.main([
        "causalbgm", "-o", out, "-i", path, "-d", "e2e",
        "--no-use_bnn", "--no-use_egm_init",
        "-Z", "1", "1", "1", "2",
        "--g_units", "8", "--e_units", "8", "--f_units", "8", "--h_units", "8",
        "--dz_units", "8",
        "-E", "1", "--epochs_per_eval", "1", "-M", "5", "--burn_in", "5",
        "--alpha", "0.1",
    ])
    dirs = glob.glob(os.path.join(out, "results", "e2e", "*"))
    assert len(dirs) == 1
    est = np.loadtxt(os.path.join(dirs[0], "causal_effect_point_estimate.txt"))
    iv = np.loadtxt(os.path.join(dirs[0], "causal_effect_posterior_interval.txt"))
    assert est.shape == (30,) and iv.shape == (30, 2)
    assert np.all(np.isfinite(est)) and np.all(iv[:, 0] <= iv[:, 1])


def test_legacy_causalbgm_entry(triplet, tmp_path):
    path, _ = triplet
    fake_model = mock.MagicMock()
    fake_model.save_dir = str(tmp_path)
    fake_model.predict.return_value = (np.zeros(30), np.zeros((30, 2)))
    with mock.patch("bayesgm_tpu.models.causalbgm.CausalBGM", return_value=fake_model), \
         mock.patch("bayesgm_tpu.utils.save_data"):
        cli.main_causalbgm(["-o", str(tmp_path), "-i", path, "-E", "2"])
    assert fake_model.fit.call_args.kwargs["epochs"] == 2
