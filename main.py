"""Research driver: run a recipe from configs/*.yaml (reference src/main.py).

Branches on ``dataset`` in the YAML config:
- Sim_Hirano_Imbens / Semi_acic -> CausalBGM fit + ADRF/ATE predict
- Sim_heteroskedastic / Sim_low_rank -> BGM fit + NaN imputation eval
- MNIST -> MNISTBGM fit + inpainting eval

Usage: python main.py -c configs/Sim_Hirano_Imbens.yaml [-e EPOCHS] [-b EGM_ITERS]
"""

import argparse
import inspect
import os

import numpy as np
import yaml


def _load_causal_dataset(name):
    """Instantiate the right sampler and its ADRF ground truth.

    Returns ``(x, y, v, truth_fn)`` where ``truth_fn(x_grid) -> true ADRF``
    or None when no oracle exists.  File-backed datasets (ACIC, Twins) raise
    FileNotFoundError with a clear message when the CSVs are absent.
    """
    from bayesgm_tpu.datasets import (
        Semi_acic_sampler,
        Semi_Twins_sampler,
        Sim_Colangelo_sampler,
        Sim_Hirano_Imbens_sampler,
        Sim_Sun_sampler,
    )
    from bayesgm_tpu.utils import get_ADRF

    if name == "Sim_Hirano_Imbens":
        ds = Sim_Hirano_Imbens_sampler(N=20000, v_dim=200)
        return (*ds.load_all(), lambda g: get_ADRF(x_values=g, dataset="Imbens"))
    if name == "Sim_Sun":
        ds = Sim_Sun_sampler(N=20000, v_dim=200)
        return (*ds.load_all(), lambda g: get_ADRF(x_values=g, dataset="Sun"))
    if name == "Sim_Colangelo":
        ds = Sim_Colangelo_sampler(N=20000, v_dim=100)
        return (*ds.load_all(), lambda g: get_ADRF(x_values=g, dataset="Lee"))
    if name == "Semi_Twins":
        try:
            ds = Semi_Twins_sampler()
        except (FileNotFoundError, OSError) as e:
            raise FileNotFoundError(
                "Semi_Twins needs the Twins CSV trio under ../data/Twins "
                "(twin_pairs_{X,T,Y}_3years_samesex.csv); not present in this "
                f"environment: {e}") from e
        # Synthetic outcome y = -2 sigmoid(3x) + V gamma + eps, so the true
        # dose-response is -2 sigmoid(3x) + mean(V gamma).
        const = ds.auxiliary_constant
        return (*ds.load_all(), lambda g: -2.0 / (1.0 + np.exp(-3.0 * np.asarray(g))) + const)
    if name == "Semi_acic":
        try:
            ds = Semi_acic_sampler(ufid="629e3d2c63914e45b227cc913c09cebe")
        except (FileNotFoundError, OSError) as e:
            raise FileNotFoundError(
                "Semi_acic needs the ACIC-2018 CSVs under ../data/ACIC_2018 "
                f"(x.csv + scaling/factuals/<ufid>.csv); not present: {e}") from e
        return (*ds.load_all(), None)
    raise ValueError(f"Unknown causal dataset {name}")


def _predict_overrides(params):
    """Pop and validate the optional ``predict:`` mapping from a YAML config.

    Overrides inference kwargs (burn_in / n_mcmc / ess_target / q_sd /
    alpha).  This is how the measured fast-predict recipe ships
    (configs/Sim_Hirano_Imbens_fast.yaml: burn_in=1000 + ess_target=400
    matches the reference's fixed 5000+3000 schedule at half the steps on
    every probed seed — RESULTS.md round 4).
    """
    overrides = dict(params.pop("predict", None) or {})
    allowed = {"burn_in", "n_mcmc", "ess_target", "q_sd", "alpha"}
    unknown = set(overrides) - allowed
    if unknown:
        raise ValueError(f"Unknown predict override(s) {sorted(unknown)}; "
                         f"valid keys: {sorted(allowed)}")
    return overrides


def _fit_overrides(params, cls, engine):
    """Pop and validate the optional ``fit:`` mapping from a YAML config.

    Overrides training kwargs (egm_batch_size / egm_n_iter / batch_size /
    epochs_per_eval / startoff) — e.g. the measured EGM warm-start schedule
    egm_batch_size=128 + egm_n_iter=7500 (equal sample-visits at ~1/4 the
    serial steps; RESULTS.md round 5).  Validated against the SELECTED
    engine's fit signature so config errors fail before training."""
    overrides = dict(params.pop("fit", None) or {})
    allowed = {"egm_batch_size", "egm_n_iter", "batch_size",
               "epochs_per_eval", "startoff"}
    unknown = set(overrides) - allowed
    if unknown:
        raise ValueError(f"Unknown fit override(s) {sorted(unknown)}; "
                         f"valid keys: {sorted(allowed)}")
    sig = inspect.signature(cls.fit)
    if not any(p.kind is inspect.Parameter.VAR_KEYWORD
               for p in sig.parameters.values()):
        unsupported = set(overrides) - set(sig.parameters)
        if unsupported:
            raise ValueError(
                f"fit override(s) {sorted(unsupported)} not supported by "
                f"model '{engine}' ({cls.__name__}.fit)")
    return overrides


def _check_overrides_against_engine(cls, engine, predict_overrides):
    """Fail fast (before the expensive fit) if a predict override isn't a
    kwarg of the SELECTED engine's predict — e.g. FullMCMCCausalBGM.predict
    takes no ess_target (its chain pairing precludes the ESS gate).  A
    predict with ``**kwargs`` (EnsembleCausalBGM forwards to its member
    CausalBGMs) accepts anything, so the check is skipped there."""
    sig = inspect.signature(cls.predict)
    if any(p.kind is inspect.Parameter.VAR_KEYWORD
           for p in sig.parameters.values()):
        return
    unsupported = set(predict_overrides) - set(sig.parameters)
    if unsupported:
        raise ValueError(
            f"predict override(s) {sorted(unsupported)} not supported by "
            f"model '{engine}' ({cls.__name__}.predict)")


def run_causal(params, epochs, egm_iters):
    """The optional ``model:`` config key picks the engine:
    ``causalbgm`` (default) | ``identifiable`` | ``fullmcmc`` | ``ensemble``."""
    from bayesgm_tpu.models.causalbgm import CausalBGM
    from bayesgm_tpu.models.ensemble import EnsembleCausalBGM
    from bayesgm_tpu.models.fullmcmc import FullMCMCCausalBGM
    from bayesgm_tpu.models.identifiable import IdentifiableCausalBGM

    x, y, v, truth_fn = _load_causal_dataset(params["dataset"])

    engines = {"causalbgm": CausalBGM, "identifiable": IdentifiableCausalBGM,
               "fullmcmc": FullMCMCCausalBGM, "ensemble": EnsembleCausalBGM}
    predict_overrides = _predict_overrides(params)
    engine = params.pop("model", "causalbgm")
    if engine not in engines:
        raise ValueError(f"Unknown model '{engine}'; valid options: "
                         f"{sorted(engines)}")
    cls = engines[engine]
    _check_overrides_against_engine(cls, engine, predict_overrides)
    fit_overrides = _fit_overrides(params, cls, engine)
    model = cls(params=params, random_seed=None)
    fit_kwargs = dict(epochs=epochs, epochs_per_eval=10, use_egm_init=True,
                      egm_n_iter=egm_iters, egm_batches_per_eval=500, verbose=1)
    fit_kwargs.update(fit_overrides)
    model.fit(data=(x, y, v), **fit_kwargs)
    if engine == "fullmcmc":
        # weight-space HMC over the fitted nets — predict() requires the
        # posterior weight samples (fullmcmc.py: f_net_samples).
        model.run_mcmc_training((x, y, v))

    if params.get("binary_treatment"):
        kwargs = dict(alpha=0.01, n_mcmc=3000, burn_in=5000, q_sd=1.0)
        kwargs.update(predict_overrides)
        causal_pre, pos_intervals = model.predict(data=(x, y, v), **kwargs)
        print("ATE estimate:", float(np.mean(causal_pre)))
    else:
        # HI uses the reference tutorial's fixed [0, 3] grid; the other
        # continuous datasets evaluate on the in-sample [p5, p95] range.
        if params["dataset"] == "Sim_Hirano_Imbens":
            x_grid = np.linspace(0, 3, 20)
        else:
            lo, hi = np.quantile(x, [0.05, 0.95])
            x_grid = np.linspace(lo, hi, 20)
        # The reference tutorial predicts with bs=n (one full-data launch,
        # tutorial_py.ipynb): exact-protocol intervals for BNN targets, and
        # one chain instead of ceil(n/10000) on TPU (step cost is flat in
        # chain count; docs/performance.md "Choosing bs").
        kwargs = dict(alpha=0.01, n_mcmc=3000, burn_in=5000, q_sd=1.0)
        kwargs.update(predict_overrides)
        causal_pre, pos_intervals = model.predict(
            data=(x, y, v), x_values=x_grid, bs=len(x), **kwargs)
        if truth_fn is not None:
            true = np.asarray(truth_fn(x_grid.astype("float32")))
            rmse = float(np.sqrt(np.mean((causal_pre - true) ** 2)))
            mape = float(np.mean(np.abs((causal_pre - true) / true)))
            print(f"ADRF RMSE: {rmse:.4f}  MAPE: {mape:.4f}")
    return causal_pre, pos_intervals


def run_bgm(params, epochs, egm_iters):
    """BGM branches.  Sim_heteroskedastic mirrors the reference driver's
    correlation eval (src/main.py:71-155): train on [X, Y], hold out a test
    split, NaN the outcome column, and report Pearson correlations of the
    posterior-mean and posterior-median predictions plus interval stats."""
    from bayesgm_tpu.datasets import simulate_low_rank_data, simulate_z_hetero
    from bayesgm_tpu.models.bgm import BGM

    if params["dataset"] == "Sim_low_rank":
        data, _ = simulate_low_rank_data(n_samples=10000, z_dim=params["z_dim"],
                                         x_dim=params["x_dim"])
        X_test = Y_test = None
    else:
        X, Y = simulate_z_hetero(n=20000, k=params.get("z_dim", 3), d=params["x_dim"] - 1)
        n_test = len(X) // 10
        X_train, X_test = X[:-n_test], X[-n_test:]
        Y_train, Y_test = Y[:-n_test], Y[-n_test:]
        data = np.hstack([X_train, Y_train.reshape(-1, 1)]).astype("float32")

    fit_overrides = _fit_overrides(params, BGM, "bgm")
    model = BGM(params=params, random_seed=123)
    fit_kwargs = dict(epochs=epochs, epochs_per_eval=10, use_egm_init=True,
                      egm_n_iter=egm_iters, egm_batches_per_eval=500, verbose=1)
    fit_kwargs.update(fit_overrides)
    model.fit(data=data, **fit_kwargs)

    if X_test is None:
        # low-rank branch: hide the first column of a held-out train slice
        test = np.array(data[:1000])
        truth = test[:, 0].copy()
        test[:, 0] = np.nan
        imputed, intervals = model.predict(test, alpha=0.05, n_mcmc=3000, burn_in=3000)
        rmse = float(np.sqrt(np.mean((imputed[:, 0] - truth) ** 2)))
        covered = np.mean((intervals[:, 0, 0] <= truth) & (truth <= intervals[:, 0, 1]))
        print(f"Imputation RMSE: {rmse:.4f}  95%-interval coverage: {covered:.3f}")
        return imputed, intervals

    # p(Y | X) on the held-out split: NaN the last (outcome) column.
    from scipy.stats import pearsonr

    data_test = np.hstack([X_test, np.full((len(X_test), 1), np.nan)]).astype("float32")
    cube, intervals = model.predict(data_test, alpha=0.05, bs=500, n_mcmc=5000,
                                    burn_in=5000, return_samples=True)
    y_draws = cube[:, :, -1]  # (n_mcmc, n_test)
    y_mean, y_median = y_draws.mean(axis=0), np.median(y_draws, axis=0)
    corr_mean = pearsonr(Y_test, y_mean)[0]
    corr_median = pearsonr(Y_test, y_median)[0]
    covered = np.mean((intervals[:, 0, 0] <= Y_test) & (Y_test <= intervals[:, 0, 1]))
    length = float(np.mean(intervals[:, 0, 1] - intervals[:, 0, 0]))
    print(f"Pearson corr (posterior mean): {corr_mean:.4f}")
    print(f"Pearson corr (posterior median): {corr_median:.4f}")
    print(f"95%-interval coverage: {covered:.3f}  mean length: {length:.3f}")
    np.savez(f"{model.save_dir}/data_pred_heter.npz",
             y_mean=y_mean, y_median=y_median, pred_interval=intervals)
    return y_mean, intervals


def _load_mnist_images():
    """Binarized MNIST train images (n, 28, 28, 1), best available source.

    Resolution order: a local ``mnist.npz`` (``$BAYESGM_MNIST_NPZ``, then
    ``$BAYESGM_DATA/mnist.npz``, then the standard keras cache
    ``~/.keras/datasets/mnist.npz``), then the keras downloader (needs
    egress), then the seeded synthetic-ellipse generator the committed
    inpainting benchmark uses (structured images, so the pipeline smoke-runs
    meaningfully without network access)."""
    explicit = os.environ.get("BAYESGM_MNIST_NPZ", "")
    if explicit and not os.path.exists(explicit):
        raise FileNotFoundError(
            f"BAYESGM_MNIST_NPZ is set to '{explicit}' but no such file "
            f"exists — refusing to fall back silently.")
    data_root = os.environ.get("BAYESGM_DATA", "")
    candidates = [explicit,
                  os.path.join(data_root, "mnist.npz") if data_root else "",
                  os.path.expanduser("~/.keras/datasets/mnist.npz")]
    for path in candidates:
        if path and os.path.exists(path):
            with np.load(path) as z:
                x_train = z["x_train"]
            print(f"Loaded MNIST from {path}")
            return (x_train.astype("float32") / 255.0 > 0.5).astype("float32")[..., None]
    try:
        from tensorflow.keras.datasets import mnist as tf_mnist  # optional

        (x_train, _), _ = tf_mnist.load_data()
        return (x_train.astype("float32") / 255.0 > 0.5).astype("float32")[..., None]
    except Exception:
        print("MNIST unavailable (no local npz, no egress); "
              "using seeded synthetic ellipse images.")
        import importlib.util

        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "mnist_inpaint.py")
        spec = importlib.util.spec_from_file_location("_bgm_mnist_inpaint", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.make_ellipse_images(8192, seed=0)


def run_mnist(params, epochs, egm_iters):
    from bayesgm_tpu.models.mnist import MNISTBGM
    from bayesgm_tpu.utils import mnist_mask_indices

    data = _load_mnist_images()

    fit_overrides = _fit_overrides(params, MNISTBGM, "mnist")
    model = MNISTBGM(params=params, random_seed=123)
    fit_kwargs = dict(epochs=epochs, epochs_per_eval=10, use_egm_init=True,
                      egm_n_iter=egm_iters, egm_batches_per_eval=500, verbose=1)
    fit_kwargs.update(fit_overrides)
    model.fit(data=data, **fit_kwargs)

    # Multi-mask inpainting sweep (the reference driver's eval loops,
    # src/main.py:157-255, covered the stripe/hole/half masks one at a time
    # with hardcoded paths; here each mode runs on the fitted model).
    modes = [
        dict(mode="lower_half"),
        dict(mode="upper_half"),
        dict(mode="edge_stripe", orientation="horizontal", stripe_pos=14, stripe_width=5),
        dict(mode="hole", center=(14, 14), hole_size=5),
    ]
    n_test = 64
    results = {}
    for mk in modes:
        obs, miss = mnist_mask_indices(**mk)
        test = np.array(data[:n_test]).reshape(n_test, -1)
        truth = test[:, miss].copy()
        test[:, miss] = np.nan
        imputed, intervals = model.predict(test.reshape(n_test, 28, 28, 1),
                                           alpha=0.05, bs=n_test,
                                           n_mcmc=2000, burn_in=2000)
        pred = imputed.reshape(n_test, -1)[:, miss]
        err = float(np.mean(np.abs(pred - truth)))
        acc = float(np.mean((pred > 0.5) == (truth > 0.5)))
        results[mk["mode"]] = (err, acc)
        print(f"Inpainting [{mk['mode']}]: mean pixel error {err:.4f}, "
              f"binarized accuracy {acc:.3f}")
        np.savez(f"{model.save_dir}/data_pred_mnist_{mk['mode']}.npz",
                 imputed=imputed, pred_interval=np.asarray(intervals, dtype=object))
    return results


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True, help="path to config file")
    parser.add_argument("-e", "--epochs", type=int, default=100)
    parser.add_argument("-b", "--batches", type=int, default=30000, help="EGM iterations")
    args = parser.parse_args()

    with open(args.config) as f:
        params = yaml.safe_load(f)

    dataset = params["dataset"]
    if dataset in ("Sim_Hirano_Imbens", "Semi_acic", "Sim_Sun", "Sim_Colangelo", "Semi_Twins"):
        run_causal(params, args.epochs, args.batches)
    elif dataset in ("Sim_heteroskedastic", "Sim_low_rank"):
        run_bgm(params, args.epochs, args.batches)
    elif dataset == "MNIST":
        run_mnist(params, args.epochs, args.batches)
    else:
        raise ValueError(f"Unknown dataset {dataset}")
