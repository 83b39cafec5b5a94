"""Conditioning-leakage (deconfounding) study on the flagship protocol.

Round-3 groundwork (benchmarks/warmstart_selector_study.py +
RESULTS.md "Round 3") showed the flagship ADRF error is dominated by a
*shared systematic bias* that correlates 0.67 with the confounded-minus-true
direction: posterior conditioning on the observed (x, y) leaks outcome noise
into counterfactual predictions.  This study isolates WHERE the leak enters
by training each seed ONCE at the exact reference protocol and then running
several inference-time variants on the same trained model:

  A  baseline        exact reference predict (posterior z, all channels)
  B  prior-z1        chain unchanged; effect collector redraws the y-only
                     channel z1 ~ N(0,1) per kept step (posterior z0 kept)
  B0 prior-z0        same but redraws the shared channel z0 (posterior z1)
  C  no-y chain      MH target drops the y-likelihood term entirely
                     (condition on x, v only); standard collector
  D  C + prior-z1    no-y chain and prior z1 in the collector
  E  prior g-comp    no chain at all: ADRF(x*) = E_{z~N(0,I)} f(z0, z1, x*)
  F  Z-table g-comp  same but z = the trained latent table (model.data_z)

The variants bracket the leakage: A vs B/B0 splits the leak by channel,
A vs C removes conditioning-on-y altogether, E/F test whether the fitted f
is unbiased when fed its own training-time latent distribution vs the prior.

Usage:
    python benchmarks/deconfound_study.py --seeds 123 456 789 1011 1213 \
        --out benchmarks/artifacts/deconfound_r3.jsonl

One JSON line per (seed, variant) with the full ADRF curve; summarize with
benchmarks/deconfound_analyze.py.  Reference protocol: n=20000, v_dim=200,
z_dims=[1,1,1,7], BNN, EGM 30000, 100 epochs, predict n_mcmc=3000,
burn_in=5000, q_sd=1.0, 20-point grid on [0, 3]
(reference src/bayesgm/models/causalbgm/base.py:434-532).
"""

import argparse
import json
import time

import numpy as np


def build_model(seed, args):
    from bayesgm_tpu.models.causalbgm import CausalBGM

    params = dict(
        v_dim=200, z_dims=list(args.z_dims), binary_treatment=False,
        dataset="HI_deconfound", output_dir=args.output_dir,
        use_bnn=True, save_res=False, save_model=False,
        kl_weight=1e-4, lr=2e-4, lr_theta=1e-4, lr_z=1e-4,
        use_z_rec=1.0, lr_decay=args.lr_decay)
    if args.latent_y_weight is not None:
        # Training-time leak probe: downweight the y-likelihood term in the
        # LATENT-TABLE update only (f/h/g net updates unchanged) so Z stops
        # co-adapting to the observed outcome noise.  Patches the XLA latent
        # loss; the fused Pallas latent kernel computes the full posterior,
        # so it is disabled for these runs.
        import jax.numpy as jnp

        import bayesgm_tpu.models.causalbgm as cb

        params["use_pallas_latent"] = False
        w = float(args.latent_y_weight)
        if not getattr(cb, "_y_weight_patched", False):
            cb._orig_neg_log_posterior_rows = cb._neg_log_posterior_rows

            def weighted_latent_loss(cfg, nets, z, x, y, v, key):
                full = cb._orig_neg_log_posterior_rows(cfg, nets, z, x, y,
                                                       v, key)
                _, _, kf = __import__("jax").random.split(key, 3)
                z0, z1, _ = cb._split_z(cfg, z)
                f_out = cb._apply(cfg, nets["f"],
                                  jnp.concatenate([z0, z1, x], axis=-1), kf)
                from bayesgm_tpu.ops import distributions as dist

                loss_py = dist.gaussian_nll_iso(
                    y, f_out[:, :1], cb._sigma_sq(cfg.sigma_y, f_out[:, -1]), 1)
                return jnp.mean(full - (1.0 - cb._LATENT_Y_WEIGHT[0]) * loss_py)

            cb._latent_loss = weighted_latent_loss
            cb._y_weight_patched = True
        cb._LATENT_Y_WEIGHT = [w]
    return CausalBGM(params, random_seed=seed)


def make_resample_collector(cfg, x_values, sample_y, resample):
    """Effect collector that redraws the given z channels from the prior.

    ``resample`` is a subset of {"z0", "z1"}.  Mirrors
    causalbgm._effect_collector's continuous branch (per-step grid means with
    optional y-noise sampling) but swaps the selected posterior channels for
    fresh N(0,1) draws — the counterfactual outcome then cannot see the
    observed y through those channels.
    """
    import jax
    import jax.numpy as jnp

    from bayesgm_tpu.models.causalbgm import _apply, _sigma_sq, _split_z

    xv = jnp.asarray(x_values, jnp.float32)

    def collect_p(params, z, key):
        nets = params["nets"]
        z0, z1, _ = _split_z(cfg, z)
        k0, k1, key = jax.random.split(key, 3)
        if "z0" in resample:
            z0 = jax.random.normal(k0, z0.shape)
        if "z1" in resample:
            z1 = jax.random.normal(k1, z1.shape)
        keys = jax.random.split(key, xv.shape[0])

        def per_x(x_scalar, k):
            col = jnp.full((z.shape[0], 1), x_scalar, jnp.float32)
            k_net, k_noise = jax.random.split(k)
            out = _apply(cfg, nets["f"],
                         jnp.concatenate([z0, z1, col], axis=-1), k_net)
            mu = out[:, 0]
            if sample_y:
                s2 = _sigma_sq(cfg.sigma_y, out[:, 1])
                mu = mu + jnp.sqrt(s2) * jax.random.normal(k_noise, mu.shape)
            return jnp.mean(mu)

        return jax.vmap(per_x)(xv, keys)

    return collect_p


def make_dr_collector(cfg, x_values, h_bw, gps_floor=1e-3):
    """Doubly-robust (kernel-AIPW) ADRF collector, computed per kept MCMC
    step entirely in-chain.

    For each grid point x*, per draw z:
        plugin(x*) = mean_i f_mean(z_i, x*)
        resid_i    = y_i - f_mean(z_i, x_i)
        gps_i(x*)  = Normal(x*; mu_x(z_i), sigma_x(z_i)) density (the h net
                     IS a generalized propensity model)
        w_i(x*)    = K_h(x_i - x*) / max(gps_i, gps_floor)
        dr_ipw     = plugin + mean_i w_i resid_i
        dr_hajek   = plugin + sum_i w_i resid_i / sum_i w_i

    Returns a (3, len(grid)) array per step: [plugin, dr_ipw, dr_hajek].
    The correction term is the Colangelo-Lee kernel-DML form with the
    model's own posterior latents standing in for the cross-fitted nuisance
    estimates; it is consistent if EITHER the outcome head f or the
    propensity head h is well-specified.

    Study twin of the shipped ``causalbgm._dr_effect_collector_p`` (which
    returns only the Hajek variant and drops the kernel's constant
    normalization — the self-normalized ratio cancels it); keep the weight
    forms in sync if either changes.
    """
    import jax
    import jax.numpy as jnp

    from bayesgm_tpu.models.causalbgm import _apply, _sigma_sq, _split_z

    xv = jnp.asarray(x_values, jnp.float32)
    h_bw = jnp.float32(h_bw)

    def collect_p(params, z, key):
        nets = params["nets"]
        x, y, v = params["data"]
        z0, z1, z2 = _split_z(cfg, z)
        kf, kh, key = jax.random.split(key, 3)
        f_obs = _apply(cfg, nets["f"],
                       jnp.concatenate([z0, z1, x], axis=-1), kf)
        resid = y[:, 0] - f_obs[:, 0]
        h_out = _apply(cfg, nets["h"],
                       jnp.concatenate([z0, z2], axis=-1), kh)
        mu_x = h_out[:, 0]
        s2x = _sigma_sq(cfg.sigma_x, h_out[:, 1])
        keys = jax.random.split(key, xv.shape[0])

        def per_x(x_s, k):
            col = jnp.full((z.shape[0], 1), x_s, jnp.float32)
            mu = _apply(cfg, nets["f"],
                        jnp.concatenate([z0, z1, col], axis=-1), k)[:, 0]
            plugin = jnp.mean(mu)
            gps = jnp.exp(-0.5 * (x_s - mu_x) ** 2 / s2x) / jnp.sqrt(
                2.0 * jnp.pi * s2x)
            kern = jnp.exp(-0.5 * ((x[:, 0] - x_s) / h_bw) ** 2) / (
                h_bw * jnp.sqrt(2.0 * jnp.pi))
            w = kern / jnp.maximum(gps, gps_floor)
            corr_ipw = jnp.mean(w * resid)
            corr_haj = jnp.sum(w * resid) / jnp.maximum(jnp.sum(w), 1e-12)
            return jnp.stack([plugin, plugin + corr_ipw, plugin + corr_haj])

        return jax.vmap(per_x)(xv, keys).T  # (3, len(grid))

    return collect_p


def make_noy_log_prob(cfg, nets, x, y, v):
    """XLA-composite MH target with the y-likelihood term REMOVED: the chain
    conditions on (x, v) only.  Mirrors causalbgm._neg_log_posterior_rows
    minus loss_py (reference base.py:246-295)."""
    import jax
    import jax.numpy as jnp

    from bayesgm_tpu.models.causalbgm import _apply, _sigma_sq, _split_z
    from bayesgm_tpu.ops import distributions as dist

    def log_prob(z, key):
        kg, kh = jax.random.split(key)
        g_out = _apply(cfg, nets["g"], z, kg)
        mu_v = g_out[:, : cfg.v_dim]
        sigma_sq_v = _sigma_sq(cfg.sigma_v, g_out[:, -1])
        loss_pv = dist.gaussian_nll_iso(v, mu_v, sigma_sq_v, cfg.v_dim)

        z0, _, z2 = _split_z(cfg, z)
        h_out = _apply(cfg, nets["h"], jnp.concatenate([z0, z2], axis=-1), kh)
        mu_x = h_out[:, :1]
        sigma_sq_x = _sigma_sq(cfg.sigma_x, h_out[:, -1])
        loss_px = dist.gaussian_nll_iso(x, mu_x, sigma_sq_x, 1)

        loss_prior = dist.standard_normal_neg_log_prior(z)
        return -(loss_pv + loss_px + loss_prior)

    return log_prob


def run_chain_variant(model, data, grid, *, collector=None, noy=False,
                      n_mcmc=3000, burn_in=5000):
    """One MH chain at the protocol budget with an optional custom collector
    and/or the no-y target.  Returns (len(grid), n_mcmc) ADRF draws."""
    import jax
    import jax.numpy as jnp

    from bayesgm_tpu.models.causalbgm import (_effect_collector,
                                              _effect_collector_p)
    from bayesgm_tpu.ops import mcmc

    cfg = model.cfg
    x, y, v = (jnp.asarray(a, jnp.float32) for a in data)
    init = jax.random.normal(model._next_key(), (x.shape[0], sum(cfg.z_dims)))

    if noy:
        log_prob = make_noy_log_prob(cfg, model.nets, x, y, v)
        collect = (_effect_collector(cfg, model.nets, grid, sample_y=True)
                   if collector is None else
                   (lambda z, key: collector({"nets": model.nets}, z, key)))
        res = mcmc.adaptive_mh(
            log_prob, init, model._next_key(), burn_in=burn_in,
            n_keep=n_mcmc, q_sd=1.0, adaptive=False,
            recompute_current=cfg.use_bnn, collect=collect)
    else:
        lp, plp, make_params, _ = model._make_param_log_prob()
        collect_p = (_effect_collector_p(cfg, grid, sample_y=True)
                     if collector is None else collector)
        paired = cfg.use_bnn and plp is not None
        params = make_params(model.nets, (x, y, v), paired)
        res = mcmc.adaptive_mh(
            lp, init, model._next_key(), burn_in=burn_in, n_keep=n_mcmc,
            q_sd=1.0, adaptive=False, recompute_current=cfg.use_bnn,
            collect=collect_p, paired_log_prob_fn=plp if paired else None,
            params=params)
    return np.asarray(res.samples).T, float(res.accept_rate)


def gcomp_adrf(model, z, grid, n_keys=8):
    """ADRF(x*) = mean_z mean_keys f_mean(z0, z1, x*) for a fixed z matrix
    (prior draws or the trained latent table); averages the flipout weight
    noise over ``n_keys`` independent draws."""
    import jax
    import jax.numpy as jnp

    from bayesgm_tpu.models.causalbgm import _apply, _split_z

    cfg = model.cfg
    z = jnp.asarray(z, jnp.float32)
    z0, z1, _ = _split_z(cfg, z)

    @jax.jit
    def one(x_scalar, key):
        col = jnp.full((z.shape[0], 1), x_scalar, jnp.float32)
        inp = jnp.concatenate([z0, z1, col], axis=-1)

        def per_key(k):
            return jnp.mean(_apply(cfg, model.nets["f"], inp, k)[:, 0])

        return jnp.mean(jax.vmap(per_key)(jax.random.split(key, n_keys)))

    keys = jax.random.split(model._next_key(), len(grid))
    return np.array([float(one(xs, k)) for xs, k in zip(grid, keys)])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+",
                   default=[123, 456, 789, 1011, 1213])
    p.add_argument("--data_seed", type=int, default=0)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--egm", type=int, default=30000)
    p.add_argument("--z_dims", type=int, nargs="+", default=[1, 1, 1, 7])
    p.add_argument("--lr_decay", type=str, default="cosine")
    p.add_argument("--variants", type=str, nargs="+",
                   default=["A", "B", "B0", "C", "D", "E", "F"])
    p.add_argument("--out", type=str,
                   default="benchmarks/artifacts/deconfound_r3.jsonl")
    p.add_argument("--output_dir", type=str, default="/tmp/deconfound_study")
    p.add_argument("--n", type=int, default=20000)
    p.add_argument("--n_mcmc", type=int, default=3000)
    p.add_argument("--burn_in", type=int, default=5000)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke runs)")
    p.add_argument("--dr_bw_scale", type=float, default=1.0,
                   help="multiplier on the Silverman bandwidth for variant G")
    p.add_argument("--latent_y_weight", type=float, default=None,
                   help="weight on the y-likelihood in the latent-table "
                        "update (training-time leak probe; forces the XLA "
                        "latent path)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from bayesgm_tpu.datasets import Sim_Hirano_Imbens_sampler
    from bayesgm_tpu.utils import get_ADRF

    x, y, v = Sim_Hirano_Imbens_sampler(
        N=args.n, v_dim=200, seed=args.data_seed).load_all()
    grid = np.linspace(0, 3, 20)
    true = get_ADRF(x_values=grid, dataset="Imbens")

    def emit(rec):
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        brief = {k: rec[k] for k in ("seed", "variant", "rmse", "t_s")}
        print(json.dumps(brief), flush=True)

    for seed in args.seeds:
        model = build_model(seed, args)
        t0 = time.time()
        model.fit((x, y, v), epochs=args.epochs, epochs_per_eval=10,
                  batch_size=32, use_egm_init=True, egm_n_iter=args.egm,
                  egm_batches_per_eval=args.egm, verbose=0)
        t_fit = time.time() - t0

        cfg = model.cfg

        def record(variant, adrf, t_s, accept=None):
            emit(dict(seed=seed, variant=variant, data_seed=args.data_seed,
                      latent_y_weight=args.latent_y_weight,
                      t_fit=round(t_fit, 1), t_s=round(t_s, 1),
                      accept=accept,
                      rmse=float(np.sqrt(np.mean((adrf - true) ** 2))),
                      adrf=[float(a) for a in adrf],
                      grid=[float(g) for g in grid]))

        mcmc_kw = dict(n_mcmc=args.n_mcmc, burn_in=args.burn_in)
        for variant in args.variants:
            t0 = time.time()
            if variant == "A":
                adrf, _ = model.predict(
                    (x, y, v), alpha=0.01, x_values=grid, q_sd=1.0,
                    bs=len(x), **mcmc_kw)
                record("A", adrf, time.time() - t0)
            elif variant in ("B", "B0"):
                resample = {"B": ("z1",), "B0": ("z0",)}[variant]
                col = make_resample_collector(cfg, grid, True, resample)
                draws, rate = run_chain_variant(model, (x, y, v), grid,
                                                collector=col, **mcmc_kw)
                record(variant, draws.mean(axis=1), time.time() - t0, rate)
            elif variant == "C":
                draws, rate = run_chain_variant(model, (x, y, v), grid,
                                                noy=True, **mcmc_kw)
                record("C", draws.mean(axis=1), time.time() - t0, rate)
            elif variant == "D":
                col = make_resample_collector(cfg, grid, True, ("z1",))
                draws, rate = run_chain_variant(model, (x, y, v), grid,
                                                collector=col, noy=True,
                                                **mcmc_kw)
                record("D", draws.mean(axis=1), time.time() - t0, rate)
            elif variant == "G":
                h_bw = (args.dr_bw_scale * 1.06 * float(np.std(x))
                        * len(x) ** (-0.2))
                col = make_dr_collector(cfg, grid, h_bw)
                draws, rate = run_chain_variant(model, (x, y, v), grid,
                                                collector=col, **mcmc_kw)
                # draws comes back transposed: (3, len(grid), n_mcmc) ->
                # run_chain_variant returns samples.T, i.e. the stacked
                # (n_mcmc, 3, grid) pytree transposed on the outer axes;
                # recover by averaging over the draw axis directly.
                arr = np.asarray(draws)  # (grid, 3, n_mcmc) after .T
                mean3 = arr.mean(axis=-1)  # (grid, 3)
                for j, name in enumerate(["G_plugin", "G_ipw", "G_hajek"]):
                    record(name, mean3[:, j], time.time() - t0, rate)
            elif variant == "E":
                import jax

                z = jax.random.normal(model._next_key(),
                                      (len(x), sum(cfg.z_dims)))
                record("E", gcomp_adrf(model, z, grid), time.time() - t0)
            elif variant == "F":
                record("F", gcomp_adrf(model, model.data_z, grid),
                       time.time() - t0)

    print("done", flush=True)


if __name__ == "__main__":
    main()
