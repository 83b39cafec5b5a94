"""HMC step breakdown for the BGM / MNIST imputation predict path.

VERDICT r4 #3: "is it actually fast" was unanswered for the HMC family.
This measures, on the chip, at the committed benchmark shapes
(bgm_impute.py: x_dim=20 z_dim=10 5x64 generator; mnist_inpaint.py: conv
generator, 784 Bernoulli pixels, lower-half inpainting):

1. steady-state seconds/HMC-step via the marginal two-length method
   (burn_in 500 vs 3000, identical small keep leg so its cost cancels),
   at the reference's default subject batch (bs=100 / 64) AND at the full
   test set in ONE batch — per-sample posterior statistics are exact under
   batching (independent chains), so if s/step is flat in bs the predict
   wall-clock scales down by n/bs.
2. chain-glue overhead: the same chain on a trivial N(0,I) target.
3. standalone fused logp+grad eval time -> expected compute per HMC step
   (num_leapfrog grad evals + 1 logp eval) vs the measured step.

Prints one JSON line per configuration (appended to
benchmarks/artifacts/hmc_breakdown_r5.jsonl by the caller).

Reference contract being measured: bgm/base.py:709-830 (tfp HMC sampler),
mnist.py:615-657 (pixel-gather Bernoulli posterior).
"""

import json
import time

import numpy as np


def _marginal(run, short=500, long=3000):
    """Marginal s/step over the KEEP leg: ``run(n_keep)`` must hold burn_in
    fixed, because hmc's burn-chunk cache key includes n_adapt =
    0.8*burn_in — varying burn_in forces a fresh compile per length through
    the flaky remote compiler and the compile times do NOT cancel (first
    version of this benchmark produced a 92x artifact that way).  Keep
    chunks share one compiled program across lengths."""
    run(100)                      # warm the programs
    t_s = run(short)
    t_l = run(long)
    return (t_l - t_s) / (long - short)


def main():
    import jax
    import jax.numpy as jnp
    from bayesgm_tpu.models.bgm import BGM
    from bayesgm_tpu.models.mnist import MNISTBGM
    from bayesgm_tpu.ops import mcmc

    import importlib.util as _ilu
    import os as _os
    _spec = _ilu.spec_from_file_location(
        "mnist_inpaint",
        _os.path.join(_os.path.dirname(__file__), "mnist_inpaint.py"))
    _mi = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_mi)
    make_ellipse_images = _mi.make_ellipse_images

    backend = jax.devices()[0].platform
    results = []

    # ---------------- BGM (Gaussian likelihood, 5x64 MLP generator) --------
    x_dim, z_dim, n_test = 20, 10, 2000
    rng = np.random.RandomState(0)
    data = rng.randn(n_test, x_dim).astype(np.float32)
    holes = data.copy()
    holes[:, -1] = np.nan
    params = dict(x_dim=x_dim, z_dim=z_dim, dataset="hmcbd",
                  output_dir="/tmp/hmcbd", save_res=False, save_model=False)
    m = BGM(params, random_seed=0)

    is_nan = np.isnan(holes)
    clean = np.nan_to_num(holes, nan=0.0)

    def bgm_run(bs):
        ind = [np.where(~row)[0].tolist() for row in is_nan[:bs]]

        def run(keep):
            t0 = time.perf_counter()
            out = m.tfp_mcmc_sampler(data=clean[:bs], ind_x1=ind,
                                     n_mcmc=keep, burn_in=100, seed=1)
            jax.block_until_ready(out)
            return time.perf_counter() - t0

        return run

    for bs in (100, n_test):
        s_per_step = _marginal(bgm_run(bs))
        results.append(dict(model="bgm", backend=backend, bs=bs,
                            ms_per_step=round(s_per_step * 1e3, 4)))
        print(json.dumps(results[-1]), flush=True)

    # glue-only chain at bs=100 (trivial target, same leapfrog count)
    init = jnp.asarray(rng.randn(100, z_dim), jnp.float32)

    cheap_cache = {}

    def cheap_run(keep):
        lp = lambda z, k: -jnp.sum(z * z, axis=1) / 2.0
        t0 = time.perf_counter()
        out = mcmc.hmc(lp, init, jax.random.PRNGKey(0), burn_in=100,
                       n_keep=keep, num_leapfrog=10, jit_cache=cheap_cache)
        jax.block_until_ready(out.samples)
        return time.perf_counter() - t0

    t_glue = _marginal(cheap_run)
    results.append(dict(model="bgm_glue_only", backend=backend, bs=100,
                        ms_per_step=round(t_glue * 1e3, 4)))
    print(json.dumps(results[-1]), flush=True)

    # standalone logp+grad eval at bs=100 (the compute an HMC step needs
    # num_leapfrog of, plus one logp)
    ind_mat, obs_mask = m._prep_obs_indices(clean[:100], [
        np.where(~row)[0].tolist() for row in is_nan[:100]])

    @jax.jit
    def eval_grad(z, k):
        return jax.grad(lambda zz, kk: jnp.sum(m.get_log_posterior(
            zz, clean[:100], ind_x1=ind_mat, obs_mask=obs_mask, key=kk)))(z, k)

    z0 = init
    k0 = jax.random.PRNGKey(2)
    jax.block_until_ready(eval_grad(z0, k0))
    t0 = time.perf_counter()
    reps = 200
    for _ in range(reps):
        z0 = eval_grad(z0, k0)
    jax.block_until_ready(z0)
    t_eval = (time.perf_counter() - t0) / reps
    results.append(dict(model="bgm_logp_grad_eval", backend=backend, bs=100,
                        ms_per_eval=round(t_eval * 1e3, 4),
                        note="HMC step ~= 10 grad evals + 1 logp"))
    print(json.dumps(results[-1]), flush=True)

    # ---------------- MNIST (Bernoulli pixel-gather, conv generator) -------
    imgs = make_ellipse_images(512, seed=3)
    flat = imgs.reshape(512, -1)
    # lower-half missing (inpainting pattern)
    miss = np.zeros_like(flat, bool)
    miss[:, 392:] = True
    mclean = flat.copy()
    mclean[miss] = 0.0
    mm = MNISTBGM(dict(z_dim=10, dataset="hmcbd_mnist",
                       output_dir="/tmp/hmcbd_m", save_res=False,
                       save_model=False), random_seed=0)

    def mnist_run(bs):
        ind = [np.where(~miss[i])[0].tolist() for i in range(bs)]

        def run(keep):
            t0 = time.perf_counter()
            out = mm.tfp_mcmc_sampler(data=mclean[:bs], ind_x1=ind,
                                      n_mcmc=keep, burn_in=100, seed=1)
            jax.block_until_ready(out)
            return time.perf_counter() - t0

        return run

    for bs in (64, 512):
        s_per_step = _marginal(mnist_run(bs))
        results.append(dict(model="mnist", backend=backend, bs=bs,
                            ms_per_step=round(s_per_step * 1e3, 4)))
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps(dict(summary=results)))


if __name__ == "__main__":
    main()
