"""Executed BGM tutorial (docs/tutorials/bgm_tutorial.md).

Every tutorial section at a REDUCED, committed scale; transcript diffable
against ``bgm_tutorial_executed.txt``.  Scale vs tutorial: n=2000 (20000),
d=10 (20), epochs=20 (100), EGM 1000 (20000), HMC n_mcmc=300/burn_in=300
(3000/3000).  CPU-forced for reproducibility.

Regenerate with:
    python docs/tutorials/executed/run_bgm_tutorial.py \
        | tee docs/tutorials/executed/bgm_tutorial_executed.txt
"""

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import warnings

warnings.filterwarnings("ignore")
np.set_printoptions(precision=4, suppress=True)


def section(title):
    print(f"\n=== {title} ===", flush=True)


# ---------------------------------------------------------------------------
section("1. Fit a BGM (simulate_z_hetero, reduced scale)")
from bayesgm_tpu import BGM
from bayesgm_tpu.datasets import simulate_z_hetero

X, Y = simulate_z_hetero(n=2000, k=3, d=9)
data = np.hstack([Y.reshape(-1, 1), X]).astype("float32")   # (2000, 10)
print(f"data shape: {data.shape}")

params = dict(dataset="tutorial_bgm", output_dir="/tmp/tutorial_exec_bgm",
              x_dim=10, z_dim=5, use_bnn=False, lr_decay="cosine",
              save_res=False, save_model=False)
model = BGM(params=params, random_seed=123)
model.fit(data, epochs=20, epochs_per_eval=10,
          use_egm_init=True, egm_n_iter=1000, egm_batches_per_eval=1000,
          verbose=1)

# ---------------------------------------------------------------------------
section("2. Generate synthetic data")
samples, sigma_sq = model.generate(nb_samples=1000)
means, _ = model.generate(nb_samples=1000, use_x_sd=False)
print(f"samples {samples.shape}, sigma_sq {sigma_sq.shape}")
print(f"generated col means : {np.asarray(samples).mean(axis=0)[:5]} ...")
print(f"train     col means : {data.mean(axis=0)[:5]} ...")

# ---------------------------------------------------------------------------
section("3. Conditional inference / imputation with uncertainty: p(Y | X)")
test = np.array(data[:400])
truth = test[:, 0].copy()
test[:, 0] = np.nan

imputed, intervals = model.predict(test, alpha=0.05, n_mcmc=300, burn_in=300)
err = imputed[:, 0] - truth
cover = float(np.mean((intervals[:, 0, 0] <= truth) & (truth <= intervals[:, 0, 1])))
print(f"imputed shape {imputed.shape}, intervals shape {intervals.shape}")
print(f"imputation RMSE : {float(np.sqrt(np.mean(err ** 2))):.4f}")
print(f"corr(imputed, true): {float(np.corrcoef(imputed[:, 0], truth)[0, 1]):.4f}")
print(f"95% prediction-interval coverage: {cover:.3f}")

# ---------------------------------------------------------------------------
section("4. Ragged missingness (different pattern per row)")
test2 = np.array(data[:5])
test2[0, 1] = np.nan
test2[2, 2] = np.nan
test2[2, 3] = np.nan
imputed2, intervals2 = model.predict(test2, n_mcmc=100, burn_in=100)
print(f"ragged intervals: {[iv.shape for iv in intervals2]}")
print(f"no NaNs left: {not np.any(np.isnan(imputed2))}")

# ---------------------------------------------------------------------------
section("5. Posterior diagnostics on imputation")
_, _, diag = model.predict(test[:100], alpha=0.05, n_mcmc=200, burn_in=200,
                           return_diagnostics=True)
ess = np.asarray(diag["ess"])
print(f"ess shape {ess.shape}; finite at imputed entries: "
      f"{bool(np.all(np.isfinite(ess[:, 0])))}; "
      f"NaN at observed entries: {bool(np.all(np.isnan(ess[:, 1:])))}")
print(f"HMC acceptance: {diag['accept_rate']:.3f}")

print("\nOK — tutorial executed end-to-end.")
