"""Seeded MNISTBGM inpainting benchmark on synthetic structured images.

Real MNIST is not downloadable in this environment (no egress), so the
benchmark uses seeded binarized random-ellipse images — structured enough
that lower-half inpainting from the upper half is learnable, with a known
majority-class baseline.  Reference contract: mnist.py:467-613 (pixel-level
HMC posterior + inpainting).

Usage: python benchmarks/mnist_inpaint.py [--epochs 60] [--egm 5000]
"""

import argparse
import json
import time

import numpy as np


def make_ellipse_images(n, seed=0):
    """Binarized random ellipses on a 28x28 grid (seeded)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:28, 0:28].astype(np.float32)
    imgs = np.zeros((n, 28, 28, 1), np.float32)
    for i in range(n):
        cx, cy = rng.uniform(8, 20, size=2)
        ax_, by_ = rng.uniform(3, 9, size=2)
        th = rng.uniform(0, np.pi)
        c, s = np.cos(th), np.sin(th)
        u = (xx - cx) * c + (yy - cy) * s
        w = -(xx - cx) * s + (yy - cy) * c
        imgs[i, :, :, 0] = ((u / ax_) ** 2 + (w / by_) ** 2 <= 1.0).astype(np.float32)
    return imgs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--n_test", type=int, default=64)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--egm", type=int, default=5000)
    p.add_argument("--n_mcmc", type=int, default=2000)
    p.add_argument("--burn_in", type=int, default=2000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--lr_decay", type=str, default=None)
    args = p.parse_args()

    from bayesgm_tpu.models.mnist import MNISTBGM

    imgs = make_ellipse_images(args.n + args.n_test, seed=args.seed)
    train, test = imgs[: args.n], imgs[args.n :].copy()
    truth = test.copy()

    mparams = dict(z_dim=10, dataset="mnist_inpaint",
                   output_dir="/tmp/mnist_inpaint",
                   save_res=False, save_model=False)
    if args.lr_decay:
        mparams["lr_decay"] = args.lr_decay
    model = MNISTBGM(mparams, random_seed=args.seed)
    t0 = time.time()
    model.fit(train, epochs=args.epochs, epochs_per_eval=20,
              use_egm_init=True, egm_n_iter=args.egm,
              egm_batches_per_eval=args.egm, verbose=0)
    t_fit = time.time() - t0
    mse_rec = float(model.evaluate(train[:2048]))

    # Lower-half inpainting: NaN the bottom 14 rows.
    test[:, 14:, :, :] = np.nan
    t0 = time.time()
    imputed, _ = model.predict(test, alpha=0.05, bs=args.n_test,
                               n_mcmc=args.n_mcmc, burn_in=args.burn_in,
                               seed=args.seed)
    t_pred = time.time() - t0

    miss = np.isnan(test)
    l1 = float(np.mean(np.abs(imputed[miss] - truth[miss])))
    acc = float(np.mean((imputed[miss] > 0.5) == (truth[miss] > 0.5)))
    majority = float(np.mean(truth[miss] <= 0.5))  # all-off baseline accuracy

    print(json.dumps(dict(
        inpaint_l1=round(l1, 4), inpaint_accuracy=round(acc, 4),
        majority_baseline=round(max(majority, 1 - majority), 4),
        mse_reconstruction=round(mse_rec, 5),
        fit_s=round(t_fit, 1), predict_s=round(t_pred, 1))))


if __name__ == "__main__":
    main()
