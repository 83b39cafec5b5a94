"""In-process A/B: gather-based vs dense-mask HMC targets (BGM + MNIST).

hmc_breakdown.py showed the imputation HMC step is compute-bound and linear
in rows (glue = 0.01 ms/step), with `take_along_axis` in the likelihood —
whose gradient is a scatter — as the prime suspect.  The dense-mask
formulation computes the FULL (n, x_dim) NLL and multiplies by a 0/1
observed mask: identical log-posterior (missing entries contribute exactly
0 either way), gather/scatter-free forward AND backward.

Both variants run through mcmc.hmc in THIS process (chip state cancels),
timed by the keep-leg marginal method.

Usage: python benchmarks/hmc_mask_ab.py  (TPU chip)
"""

import json
import time

import numpy as np


def _marginal(run, short=500, long=3000):
    run(100)
    t_s = run(short)
    t_l = run(long)
    return (t_l - t_s) / (long - short)


def main():
    import jax
    import jax.numpy as jnp
    from bayesgm_tpu.models.bgm import BGM, _g_apply
    from bayesgm_tpu.models.mnist import MNISTBGM, _gen_apply
    from bayesgm_tpu.ops import distributions as dist
    from bayesgm_tpu.ops import mcmc, nn

    backend = jax.devices()[0].platform
    results = []

    # ----------------------------- BGM -------------------------------------
    x_dim, z_dim = 20, 10
    rng = np.random.RandomState(0)
    m = BGM(dict(x_dim=x_dim, z_dim=z_dim, dataset="maskab",
                 output_dir="/tmp/maskab", save_res=False, save_model=False),
            random_seed=0)
    cfg, nets, g_state = m.cfg, m.nets, m.g_state

    for bs in (100, 2000):
        data = jnp.asarray(rng.randn(bs, x_dim), jnp.float32)
        # last column missing -> observed = first x_dim-1 columns
        ind = jnp.asarray(np.tile(np.arange(x_dim - 1), (bs, 1)), jnp.int32)
        mask = jnp.ones((bs, x_dim - 1), jnp.float32)
        dense = jnp.asarray(
            np.concatenate([np.ones((bs, x_dim - 1), np.float32),
                            np.zeros((bs, 1), np.float32)], axis=1))

        def lp_gather(params, z, key):
            mu, s, _ = _g_apply(cfg, params["nets"]["g"], params["gs"], z,
                                key, train=False)
            x_c = jnp.take_along_axis(params["data"], params["ind"], axis=1)
            mu_c = jnp.take_along_axis(mu, params["ind"], axis=1)
            s_c = jnp.take_along_axis(s, params["ind"], axis=1)
            ll = ((x_c - mu_c) ** 2 / (2.0 * s_c)
                  + 0.5 * jnp.log(s_c)) * params["mask"]
            return -(dist.standard_normal_neg_log_prior(z)
                     + jnp.sum(ll, axis=1))

        def lp_dense(params, z, key):
            mu, s, _ = _g_apply(cfg, params["nets"]["g"], params["gs"], z,
                                key, train=False)
            ll = ((params["data"] - mu) ** 2 / (2.0 * s)
                  + 0.5 * jnp.log(s)) * params["dense"]
            return -(dist.standard_normal_neg_log_prior(z)
                     + jnp.sum(ll, axis=1))

        params = {"nets": nets, "gs": g_state, "data": data, "ind": ind,
                  "mask": mask, "dense": dense}
        init = jnp.asarray(rng.randn(bs, z_dim), jnp.float32)

        # numerical identity check first
        k = jax.random.PRNGKey(0)
        a = lp_gather(params, init, k)
        b = lp_dense(params, init, k)
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4), \
            (np.abs(np.asarray(a - b)).max())

        for tag, lp in (("gather", lp_gather), ("dense", lp_dense)):
            cache = {}

            def run(keep, lp=lp, cache=cache):
                t0 = time.perf_counter()
                out = mcmc.hmc(lp, init, jax.random.PRNGKey(1), burn_in=100,
                               n_keep=keep, num_leapfrog=10, params=params,
                               jit_cache=cache)
                jax.block_until_ready(out.samples)
                return time.perf_counter() - t0

            ms = _marginal(run) * 1e3
            results.append(dict(model="bgm", variant=tag, backend=backend,
                                bs=bs, ms_per_step=round(ms, 4)))
            print(json.dumps(results[-1]), flush=True)

    # ----------------------------- MNIST -----------------------------------
    mm = MNISTBGM(dict(z_dim=10, dataset="maskab_m", output_dir="/tmp/maskab_m",
                       save_res=False, save_model=False), random_seed=0)
    mcfg, mnets = mm.cfg, mm.nets
    n_pix = 784
    for bs in (64, 512):
        flat = jnp.asarray((rng.rand(bs, n_pix) > 0.5).astype(np.float32))
        obs = np.arange(392)
        ind = jnp.asarray(np.tile(obs, (bs, 1)), jnp.int32)
        mask = jnp.ones((bs, 392), jnp.float32)
        dense = jnp.asarray(
            np.concatenate([np.ones((bs, 392), np.float32),
                            np.zeros((bs, 392), np.float32)], axis=1))

        def mlp_gather(params, z, key):
            k_g, k_rep = jax.random.split(key)
            mu, var = _gen_apply(mcfg, params["nets"]["g"], z, k_g)
            logits = jnp.clip(nn.reparameterize(k_rep, mu, var), -10.0, 10.0)
            lf = logits.reshape(z.shape[0], -1)
            x_c = jnp.take_along_axis(params["data"], params["ind"], axis=1)
            l_c = jnp.take_along_axis(lf, params["ind"], axis=1)
            ll = jnp.sum((x_c * l_c - jax.nn.softplus(l_c)) * params["mask"],
                         axis=1)
            return -dist.standard_normal_neg_log_prior(z) + ll

        def mlp_dense(params, z, key):
            k_g, k_rep = jax.random.split(key)
            mu, var = _gen_apply(mcfg, params["nets"]["g"], z, k_g)
            logits = jnp.clip(nn.reparameterize(k_rep, mu, var), -10.0, 10.0)
            lf = logits.reshape(z.shape[0], -1)
            ll = jnp.sum((params["data"] * lf - jax.nn.softplus(lf))
                         * params["dense"], axis=1)
            return -dist.standard_normal_neg_log_prior(z) + ll

        params = {"nets": mnets, "data": flat, "ind": ind, "mask": mask,
                  "dense": dense}
        init = jnp.asarray(rng.randn(bs, 10), jnp.float32)

        k = jax.random.PRNGKey(0)
        a = mlp_gather(params, init, k)
        b = mlp_dense(params, init, k)
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-3), \
            (np.abs(np.asarray(a - b)).max())

        for tag, lp in (("gather", mlp_gather), ("dense", mlp_dense)):
            cache = {}

            def run(keep, lp=lp, cache=cache):
                t0 = time.perf_counter()
                out = mcmc.hmc(lp, init, jax.random.PRNGKey(1), burn_in=100,
                               n_keep=keep, num_leapfrog=10, params=params,
                               jit_cache=cache)
                jax.block_until_ready(out.samples)
                return time.perf_counter() - t0

            ms = _marginal(run, short=200, long=1200) * 1e3
            results.append(dict(model="mnist", variant=tag, backend=backend,
                                bs=bs, ms_per_step=round(ms, 4)))
            print(json.dumps(results[-1]), flush=True)

    print(json.dumps(dict(summary=results)))


if __name__ == "__main__":
    main()
