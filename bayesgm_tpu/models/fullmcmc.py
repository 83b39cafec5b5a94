"""FullMCMCCausalBGM: fully-Bayesian CausalBGM with weight-space HMC.

TPU-native re-design of src/bayesgm/models/causalbgm/fullmcmc.py:20-487.
After the SGD :meth:`fit`, :meth:`run_mcmc_training` draws HMC posterior
samples of the flattened g/h/f network weights conditioned on the fitted
latent table; :meth:`predict` then marginalises over *both* weight and latent
uncertainty — the latent MH chain redraws a random weight sample every step,
and each kept draw is paired with a random f-weight draw for the effect
computation.

Because networks here are already pure pytrees, the reference's
``call_with_weights`` unflatten bridge (networks/base.py:397-435) collapses
to ``ravel_pytree``'s unravel function; the HMC state is the flat vector
itself.  Networks are deterministic MLPs (weight uncertainty comes from HMC,
not flipout), which resolves the reference's mixed MCMC-net/flipout-e-net
construction (fullmcmc.py:49-57) into a single principled scheme.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from bayesgm_tpu.models import causalbgm as cb
from bayesgm_tpu.ops import distributions as dist
from bayesgm_tpu.ops import mcmc, nn


def _gaussian_logprob_sum(x, mu, sigma_sq):
    """Full Normal log-density summed over all entries (with constants,
    matching tfp.distributions.Normal.log_prob in fullmcmc.py:142-147)."""
    return jnp.sum(
        -0.5 * (x - mu) ** 2 / sigma_sq - 0.5 * jnp.log(sigma_sq) - 0.5 * math.log(2 * math.pi)
    )


class FullMCMCCausalBGM(cb.CausalBGM):
    """CausalBGM with HMC over network weights + MH over latents.

    Same params as :class:`CausalBGM`; networks are deterministic MLPs.
    """

    def __init__(self, params, timestamp=None, random_seed=None):
        params = dict(params)
        # Weight uncertainty comes from HMC; the in-training nets are plain.
        params["use_bnn"] = False
        super().__init__(params, timestamp=timestamp, random_seed=random_seed)
        self.g_net_samples = None
        self.h_net_samples = None
        self.f_net_samples = None
        self._unravel = {
            name: nn.flatten_params(self.nets[name])[1] for name in ("g", "h", "f")
        }

    # -- weight-space HMC ------------------------------------------------------

    def _weight_log_prob_fn(self, name, inputs, targets, likelihood):
        """Target over flattened weights: N(0,1) prior + full-data likelihood
        (run_mcmc_for_net, networks/base.py:444-505)."""
        unravel = self._unravel[name]

        def log_prob(flat_batch, key):
            # flat_batch: (1, D) single chain
            def single(flat):
                net = unravel(flat)
                out = nn.mlp_apply(net, inputs)
                return nn.standard_normal_log_prior(flat) + likelihood(targets, out)

            return jax.vmap(single)(flat_batch)

        return log_prob

    def run_mcmc_training(self, data, num_samples=2000, num_burnin=1000, eps=1e-6,
                          step_size=1e-4, num_leapfrog=3, adaptation_rate=0.05,
                          mesh=None):
        """HMC over g/h/f weights conditioned on the fitted latent table
        (fullmcmc.py:115-181).  Must be called after :meth:`fit`.

        ``mesh`` row-shards the conditioning data (the likelihood is a sum
        over rows, so XLA reduces per-shard partial sums with one psum per
        leapfrog gradient); the flat weight chain itself is replicated —
        weight-space HMC is data-parallel, not parameter-parallel, at these
        network sizes."""
        assert self.data_z is not None, "Call fit() before run_mcmc_training()."
        cfg = self.cfg
        data_x, data_y, data_v = [jnp.asarray(a, jnp.float32) for a in data]
        if mesh is not None:
            from bayesgm_tpu.parallel import replicate, shard_rows

            data_x, data_y, data_v = (shard_rows(a, mesh)
                                      for a in (data_x, data_y, data_v))
            self.data_z = shard_rows(self.data_z, mesh)
            self.nets = replicate(self.nets, mesh)
        z = self.data_z
        z0, z1, z2 = cb._split_z(cfg, z)

        def g_likelihood(v_true, out):
            mu_v = out[:, : cfg.v_dim]
            sigma_sq = dist.softplus_var(out[:, -1:])
            return _gaussian_logprob_sum(v_true, mu_v, sigma_sq)

        def h_likelihood(x_true, out):
            mu_x = out[:, :1]
            if cfg.binary_treatment:
                return -jnp.sum(dist.bernoulli_logits_nll(x_true, mu_x))
            sigma_sq = dist.softplus_var(out[:, -1])
            return _gaussian_logprob_sum(x_true, mu_x, sigma_sq[:, None])

        def f_likelihood(y_true, out):
            mu_y = out[:, :1]
            sigma_sq = dist.softplus_var(out[:, -1])
            return _gaussian_logprob_sum(y_true, mu_y, sigma_sq[:, None])

        jobs = [
            ("g", z, data_v, g_likelihood),
            ("h", jnp.concatenate([z0, z2], axis=-1), data_x, h_likelihood),
            ("f", jnp.concatenate([z0, z1, data_x], axis=-1), data_y, f_likelihood),
        ]
        for name, inputs, targets, lik in jobs:
            print(f"Running HMC for {name}_net...")
            flat0, _ = nn.flatten_params(self.nets[name])
            log_prob = self._weight_log_prob_fn(name, inputs, targets, lik)
            # Weight-space posteriors over ~10^4 parameters with a
            # full-dataset likelihood are extremely sharp: start small and
            # adapt aggressively (the reference's fixed 0.01 step yields
            # ~zero acceptance at this scale).
            res = mcmc.hmc(log_prob, flat0[None, :], self._next_key(),
                           burn_in=num_burnin, n_keep=num_samples,
                           step_size=step_size, num_leapfrog=num_leapfrog,
                           adapt_fraction=0.8, adaptation_rate=adaptation_rate)
            samples = np.asarray(res.samples)[:, 0, :]  # (num_samples, D)
            setattr(self, f"{name}_net_samples", samples)
            print(f"HMC for {name}_net finished. Acceptance rate: {float(res.accept_rate):.4f}")

    # -- posterior over Z given sampled weights --------------------------------

    def _neg_log_posterior_with_weights(self, z, x, y, v, g_flat, h_flat, f_flat):
        """Per-sample -log p(z | x,y,v, weights) (fullmcmc.py:344-393)."""
        cfg = self.cfg
        g_net = self._unravel["g"](g_flat)
        h_net = self._unravel["h"](h_flat)
        f_net = self._unravel["f"](f_flat)
        z0, z1, z2 = cb._split_z(cfg, z)

        g_out = nn.mlp_apply(g_net, z)
        mu_v = g_out[:, : cfg.v_dim]
        sigma_sq_v = dist.softplus_var(g_out[:, -1])
        loss_pv = dist.gaussian_nll_iso(v, mu_v, sigma_sq_v, cfg.v_dim)

        h_out = nn.mlp_apply(h_net, jnp.concatenate([z0, z2], axis=-1))
        mu_x = h_out[:, :1]
        if cfg.binary_treatment:
            loss_px = jnp.squeeze(dist.bernoulli_logits_nll(x, mu_x), axis=-1)
        else:
            sigma_sq_x = dist.softplus_var(h_out[:, -1])
            loss_px = dist.gaussian_nll_iso(x, mu_x, sigma_sq_x, 1)

        f_out = nn.mlp_apply(f_net, jnp.concatenate([z0, z1, x], axis=-1))
        mu_y = f_out[:, :1]
        sigma_sq_y = dist.softplus_var(f_out[:, -1])
        loss_py = dist.gaussian_nll_iso(y, mu_y, sigma_sq_y, 1)

        return loss_pv + loss_px + loss_py + dist.standard_normal_neg_log_prior(z)

    def get_log_posterior(self, data_x, data_y, data_v, data_z, g_weights, h_weights, f_weights):
        args = [jnp.asarray(a, jnp.float32)
                for a in (data_x, data_y, data_v, data_z, g_weights, h_weights, f_weights)]
        return -self._neg_log_posterior_with_weights(
            args[3], args[0], args[1], args[2], args[4], args[5], args[6])

    def _make_weighted_log_prob(self, data):
        """MH target that redraws one random weight triple per step via the
        threaded PRNG key (fullmcmc.py:438-449)."""
        x, y, v = data
        g_s = jnp.asarray(self.g_net_samples)
        h_s = jnp.asarray(self.h_net_samples)
        f_s = jnp.asarray(self.f_net_samples)
        n_w = g_s.shape[0]

        def log_prob(z, key):
            # adaptive_mh is run with shared_eval_key=True, so within one MH
            # step the proposed and current evaluations receive the SAME key
            # and therefore the same weight-sample index — matching the
            # reference's one rand_idx per step (fullmcmc.py:443-452).
            idx = jax.random.randint(jax.random.fold_in(key, 0), (), 0, n_w)
            return -self._neg_log_posterior_with_weights(
                z, x, y, v, g_s[idx], h_s[idx], f_s[idx])

        return log_prob

    def _weighted_log_prob_p(self, params, z, key):
        """Params-mode MH target (see adaptive_mh(params=...)): the weight
        stacks and data flow through the jitted chain as arguments, so
        repeat predicts reuse one compiled program."""
        g_s, h_s, f_s = params["w"]
        x, y, v = params["data"]
        idx = jax.random.randint(jax.random.fold_in(key, 0), (), 0, g_s.shape[0])
        return -self._neg_log_posterior_with_weights(
            z, x, y, v, g_s[idx], h_s[idx], f_s[idx])

    def metropolis_hastings_sampler(self, data, g_net_samples=None, h_net_samples=None,
                                    f_net_samples=None, initial_q_sd=1.0, q_sd=None,
                                    burn_in=5000, n_keep=3000, target_acceptance_rate=0.25,
                                    tolerance=0.05, adjustment_interval=50, adaptive_sd=None,
                                    window_size=100, mesh=None):
        """Adaptive MH over Z with per-step random weight draws
        (fullmcmc.py:396-487).  Returns (n_keep, n, z_dim).

        ``mesh`` shards the per-subject chains (rows of the data and the
        chain state) over the device mesh; the weight-sample stacks are
        replicated, and the per-step random weight index derives from the
        replicated step key, so every shard conditions on the SAME weight
        draw — numerics match the single-device chain."""
        if g_net_samples is not None:
            self.g_net_samples = np.asarray(g_net_samples)
        if h_net_samples is not None:
            self.h_net_samples = np.asarray(h_net_samples)
        if f_net_samples is not None:
            self.f_net_samples = np.asarray(f_net_samples)
        assert self.g_net_samples is not None, "Run run_mcmc_training() first."

        data = tuple(jnp.asarray(a, jnp.float32) for a in data)
        n = data[0].shape[0]
        if adaptive_sd is None:
            adaptive_sd = q_sd is None or q_sd <= 0
        q0 = initial_q_sd if adaptive_sd else q_sd

        init = jax.random.normal(self._next_key(), (n, sum(self.cfg.z_dims)))
        w = (jnp.asarray(self.g_net_samples),
             jnp.asarray(self.h_net_samples),
             jnp.asarray(self.f_net_samples))
        if mesh is not None:
            from bayesgm_tpu.parallel import replicate, shard_rows

            data = tuple(shard_rows(a, mesh) for a in data)
            init = shard_rows(init, mesh)
            w = replicate(w, mesh)
        params = {"w": w, "data": data}
        res = mcmc.adaptive_mh(
            self._weighted_log_prob_p, init, self._next_key(),
            burn_in=burn_in, n_keep=n_keep, q_sd=float(q0), adaptive=bool(adaptive_sd),
            target_rate=target_acceptance_rate, tolerance=tolerance,
            adjustment_interval=adjustment_interval, window_size=window_size,
            # weights change per step -> recompute the current logp, with one
            # shared weight draw for both sides of the accept ratio
            recompute_current=True, shared_eval_key=True,
            params=params,
            jit_cache=self._jit_cache(
                ("mh_chain_jit_w", None if mesh is None else str(mesh)), dict))
        print(f"Final MCMC Acceptance Rate: {float(res.accept_rate):.4f}")
        return np.asarray(res.samples)

    def infer_from_latent_posterior(self, data_posterior_z, f_net_weights=None,
                                    x_values=None, sample_y=True):
        """Effects from paired (Z draw, f-weight draw) samples
        (fullmcmc.py:285-341).  Binary: (n_keep, n); continuous:
        (n_keep, len(x_values))."""
        cfg = self.cfg
        z_draws = jnp.asarray(data_posterior_z, jnp.float32)
        if f_net_weights is None:
            idx = np.asarray(jax.random.randint(
                self._next_key(), (z_draws.shape[0],), 0, self.f_net_samples.shape[0]))
            f_net_weights = self.f_net_samples[idx]
        f_w = jnp.asarray(f_net_weights)
        unravel_f = self._unravel["f"]
        xv = None if x_values is None else jnp.asarray(np.atleast_1d(x_values), jnp.float32)

        def outcome(z, f_flat, xv_col, key):
            z0, z1, _ = cb._split_z(cfg, z)
            out = nn.mlp_apply(unravel_f(f_flat), jnp.concatenate([z0, z1, xv_col], axis=-1))
            mu_y = out[:, 0]
            if sample_y:
                sigma_sq = dist.softplus_var(out[:, 1])
                return mu_y + jnp.sqrt(sigma_sq) * jax.random.normal(key, mu_y.shape)
            return mu_y

        if cfg.binary_treatment:

            def per_draw(z, f_flat, key):
                k1, k2 = jax.random.split(key)
                ones = jnp.ones((z.shape[0], 1), jnp.float32)
                return outcome(z, f_flat, ones, k1) - outcome(z, f_flat, 0.0 * ones, k2)

        else:

            def per_draw(z, f_flat, key):
                keys = jax.random.split(key, xv.shape[0])

                def per_x(x_scalar, k):
                    col = jnp.full((z.shape[0], 1), x_scalar, jnp.float32)
                    return jnp.mean(outcome(z, f_flat, col, k))

                return jax.vmap(per_x)(xv, keys)

        keys = jax.random.split(self._next_key(), z_draws.shape[0])
        # Batch over draws: a single vmap across all n_keep draws would
        # materialize (n_keep, len(x_values), n, hidden) activations at once
        # (hundreds of GB at reference scale).
        vm = jax.jit(jax.vmap(per_draw))
        bs = 64
        outs = []
        for start in range(0, z_draws.shape[0], bs):
            end = min(start + bs, z_draws.shape[0])
            outs.append(np.asarray(vm(z_draws[start:end], f_w[start:end], keys[start:end])))
        return np.concatenate(outs, axis=0)

    def predict(self, data, alpha=0.01, n_mcmc=3000, burn_in=5000, x_values=None,
                q_sd=1.0, sample_y=True, bs=10000, return_diagnostics=False,
                mesh=None):
        """Causal effects marginalising over weight AND latent uncertainty
        (fullmcmc.py:184-281).  ``return_diagnostics=True`` appends
        ESS / split-R-hat of the effect draw series (weight-redraw noise is
        part of each series, so ESS here reflects the PAIRED weight+latent
        chain).  ``mesh`` shards the latent chains over the device mesh (see
        :meth:`metropolis_hastings_sampler`); effect aggregation happens on
        host from the gathered draws."""
        assert 0 < alpha < 1, "The significance level 'alpha' must be greater than 0 and less than 1."
        assert self.f_net_samples is not None, "Run run_mcmc_training() first."
        cfg = self.cfg
        if not cfg.binary_treatment and x_values is None:
            raise ValueError(
                "For continuous treatment, 'x_values' must not be None. "
                "Provide a list or a single treatment value.")
        if x_values is not None:
            x_values = np.atleast_1d(np.asarray(x_values, dtype=float))

        print("MCMC Latent Variable Sampling ...")
        z_draws = self.metropolis_hastings_sampler(data, burn_in=burn_in, n_keep=n_mcmc,
                                                   q_sd=q_sd, mesh=mesh)
        effects = self.infer_from_latent_posterior(z_draws, x_values=x_values, sample_y=sample_y)
        # effects: (n_mcmc, n) binary / (n_mcmc, len(x_values)) continuous

        point = effects.mean(axis=0)
        upper = np.quantile(effects, 1 - alpha / 2, axis=0)
        lower = np.quantile(effects, alpha / 2, axis=0)
        if return_diagnostics:
            diag = mcmc.chain_diagnostics(effects)
            return point, np.stack([lower, upper], axis=1), diag
        return point, np.stack([lower, upper], axis=1)
