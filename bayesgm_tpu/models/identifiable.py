"""IdentifiableCausalBGM: iVAE-style identifiable variant of CausalBGM.

TPU-native re-design of src/bayesgm/models/causalbgm/identifiable.py:15-616.
Adds an auxiliary one-hot segment variable ``U`` and a conditional latent
prior ``Z | U ~ N(mu(U), sigma^2(U) I)`` produced by a ``prior_net``; the
latent update becomes a joint E-step (gradient ascent on Z) + M-step (Adam on
prior_net) sharing one loss evaluation.

Two reference quirks are fixed (documented in SURVEY.md §2.2):
- ``evaluate`` here returns the 7-tuple the reference ``fit`` expects
  (identifiable.py:334 unpacks 7 values from the inherited 4-value
  ``CausalBGM.evaluate``);
- ``predict`` forwards ``burn_in`` to the sampler (the reference drops it,
  identifiable.py:397).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from bayesgm_tpu.models import causalbgm as cb
from bayesgm_tpu.ops import distributions as dist
from bayesgm_tpu.ops import mcmc, nn, optim
from bayesgm_tpu.utils.data_io import save_data


def _prior_apply(cfg, prior_net, u, key):
    out = cb._apply(cfg, prior_net, u, key)
    z_dim = sum(cfg.z_dims)
    mu_z = out[:, :z_dim]
    sigma_sq_z = dist.softplus_var(out[:, -1:])  # (n, 1) scalar variance
    return mu_z, sigma_sq_z


def _conditional_prior_nll(cfg, prior_net, z, u, key):
    """-log N(z; mu(u), sigma^2(u) I) per sample (identifiable.py:199-210)."""
    mu_z, sigma_sq_z = _prior_apply(cfg, prior_net, u, key)
    s = jnp.squeeze(sigma_sq_z, axis=-1)
    z_dim = sum(cfg.z_dims)
    return jnp.sum((z - mu_z) ** 2, axis=1) / (2.0 * s) + z_dim * jnp.log(s) / 2.0


def _ivae_latent_loss(cfg, nets, prior_net, z, x, y, v, u, key, kl_weight):
    """Posterior loss with the conditional prior replacing N(0, I)
    (identifiable.py:151-216)."""
    k_lik, k_prior = jax.random.split(key)
    rows = cb._neg_log_posterior_rows(cfg, nets, z, x, y, v, k_lik)
    # remove the standard-normal prior term and add the conditional one
    rows = rows - dist.standard_normal_neg_log_prior(z)
    loss = jnp.mean(rows) + jnp.mean(_conditional_prior_nll(cfg, prior_net, z, u, k_prior))
    if cfg.use_bnn:
        loss = loss + nn.flipout_mlp_kl(prior_net) * kl_weight
    return loss


def _ivae_train_batch_step(cfg, kl_weight, carry, idx, key, data, data_u,
                           lr_scale=1.0):
    """g/h/f updates + joint (Z, prior_net) update (identifiable.py:303-323)."""
    nets, opts, prior_net, prior_opt, z_table, z_opt = carry
    x, y, v = data
    bx, by, bv, bu = x[idx], y[idx], v[idx], data_u[idx]
    bz = z_table[idx]
    kg, kh, kf, kz = jax.random.split(key, 4)
    lr_th = cfg.lr_theta * lr_scale

    (loss_v, mse_v), g_grads = jax.value_and_grad(
        lambda g: cb._loss_v(cfg, g, bz, bv, kg), has_aux=True)(nets["g"])
    new_g, opt_g = optim.adam_update(g_grads, opts["g"], nets["g"], lr_th)

    (loss_x, mse_x), h_grads = jax.value_and_grad(
        lambda h: cb._loss_x(cfg, h, bz, bx, kh), has_aux=True)(nets["h"])
    new_h, opt_h = optim.adam_update(h_grads, opts["h"], nets["h"], lr_th)

    (loss_y, mse_y), f_grads = jax.value_and_grad(
        lambda f: cb._loss_y(cfg, f, bz, bx, by, kf), has_aux=True)(nets["f"])
    new_f, opt_f = optim.adam_update(f_grads, opts["f"], nets["f"], lr_th)

    nets = {**nets, "g": new_g, "h": new_h, "f": new_f}
    opts = {**opts, "g": opt_g, "h": opt_h, "f": opt_f}

    # One loss evaluation, two gradients (E-step on Z rows, M-step on the
    # prior net) — the persistent-tape pattern of identifiable.py:218-226.
    loss_post, (z_grads, prior_grads) = jax.value_and_grad(
        lambda zr, pn: _ivae_latent_loss(cfg, nets, pn, zr, bx, by, bv, bu, kz, kl_weight),
        argnums=(0, 1))(bz, prior_net)
    z_table, z_opt = optim.table_adam_update_rows(z_grads, idx, z_opt, z_table,
                                                  cfg.lr_z * lr_scale)
    prior_net, prior_opt = optim.adam_update(prior_grads, prior_opt, prior_net, lr_th)

    losses = dict(loss_v=loss_v, mse_v=mse_v, loss_x=loss_x, mse_x=mse_x,
                  loss_y=loss_y, mse_y=mse_y, loss_postrior_z=loss_post)
    return (nets, opts, prior_net, prior_opt, z_table, z_opt), losses


def _ivae_evaluate(cfg, nets, data, z, key, nb_intervals=200):
    """7-tuple evaluate: causal_pre + MSEs + predictions (fixes the
    inherited-evaluate arity bug noted in SURVEY.md §2.2)."""
    x, y, v = data
    kg, kf, kh, ke, kfa, kfb = jax.random.split(key, 6)
    if z is None:
        z = cb._apply(cfg, nets["e"], v, ke)
    z0, z1, z2 = cb._split_z(cfg, z)
    v_pred = cb._apply(cfg, nets["g"], z, kg)[:, : cfg.v_dim]
    y_pred = cb._apply(cfg, nets["f"], jnp.concatenate([z0, z1, x], axis=-1), kf)[:, :1]
    x_pred = cb._apply(cfg, nets["h"], jnp.concatenate([z0, z2], axis=-1), kh)[:, :1]
    if cfg.binary_treatment:
        x_pred = jax.nn.sigmoid(x_pred)
    mse_v = jnp.mean((v - v_pred) ** 2)
    mse_x = jnp.mean((x - x_pred) ** 2)
    mse_y = jnp.mean((y - y_pred) ** 2)

    if cfg.binary_treatment:
        ones = jnp.ones((x.shape[0], 1), jnp.float32)
        y_pos = cb._apply(cfg, nets["f"], jnp.concatenate([z0, z1, ones], axis=-1), kfa)[:, :1]
        y_neg = cb._apply(cfg, nets["f"], jnp.concatenate([z0, z1, 0.0 * ones], axis=-1), kfb)[:, :1]
        causal_pre = y_pos - y_neg
    else:
        x_min = jnp.percentile(x, 5.0, method="nearest")
        x_max = jnp.percentile(x, 95.0, method="nearest")
        x_grid = jnp.linspace(x_min, x_max, nb_intervals)

        def dose_response(xv):
            x_tile = jnp.full((x.shape[0], 1), xv, jnp.float32)
            yp = cb._apply(cfg, nets["f"], jnp.concatenate([z0, z1, x_tile], axis=-1), kfa)[:, :1]
            return jnp.mean(yp)

        causal_pre = jax.vmap(dose_response)(x_grid)
    return causal_pre, mse_x, mse_y, mse_v, x_pred, y_pred, v_pred


class IdentifiableCausalBGM(cb.CausalBGM):
    """Identifiable CausalBGM via an auxiliary segment variable U (iVAE).

    Extra optional params: ``'n_segments'`` (10), ``'prior_units'`` ([64]).
    """

    def __init__(self, params, timestamp=None, random_seed=None):
        params = dict(params)
        params.setdefault("n_segments", 10)
        params.setdefault("prior_units", [64])
        super().__init__(params, timestamp=timestamp, random_seed=random_seed)

    def _build_nets(self):
        super()._build_nets()
        cfg, p = self.cfg, self.params
        z_dim = sum(cfg.z_dims)
        kp = self._next_key()
        init = nn.init_flipout_mlp if cfg.use_bnn else nn.init_mlp
        self.prior_net = init(kp, p["n_segments"], z_dim + 1, p["prior_units"])
        self._prior_opt = optim.adam_init(self.prior_net)

    def _sample_u(self, n):
        """One-hot random segment assignments (identifiable.py:277-280), drawn
        from the model's PRNG key chain for deterministic resume."""
        k = self.params["n_segments"]
        seg = np.asarray(jax.random.randint(self._next_key(), (n,), 0, k))
        return jnp.asarray(np.eye(k, dtype="float32")[seg])

    # -- checkpointable training state --------------------------------------

    def _restore_template(self):
        return {"nets": self.nets, "prior_net": self.prior_net}

    def _apply_restore(self, restored):
        self.nets = restored["nets"]
        self.prior_net = restored["prior_net"]

    def _full_state_template(self, n):
        tmpl = super()._full_state_template(n)
        tmpl["prior_net"] = self.prior_net
        tmpl["prior_opt"] = self._prior_opt
        tmpl["data_u"] = jnp.zeros((n, self.params["n_segments"]), jnp.float32)
        return tmpl

    def _full_state_bundle(self, z_opt, epoch, best_loss):
        bundle = super()._full_state_bundle(z_opt, epoch, best_loss)
        bundle["prior_net"] = self.prior_net
        bundle["prior_opt"] = self._prior_opt
        bundle["data_u"] = self.data_u
        return bundle

    def _apply_full_state(self, state):
        self.prior_net = state["prior_net"]
        self._prior_opt = state["prior_opt"]
        self.data_u = state["data_u"]
        return super()._apply_full_state(state)

    def fit(self, data, batch_size=32, epochs=100, epochs_per_eval=5, startoff=0,
            use_egm_init=True, egm_n_iter=30000, egm_batches_per_eval=500,
            verbose=1, save_format="txt", mesh=None, egm_batch_size=None):
        """Train with auxiliary U and the conditional prior
        (identifiable.py:232-348).  Skips the incomplete last batch, as the
        reference does.  ``mesh`` row-shards data/U/latent state (see
        CausalBGM.fit)."""
        data = tuple(jnp.asarray(d, jnp.float32) for d in data)
        data_x, data_y, data_v = data
        n = data_x.shape[0]
        cfg = self.cfg

        if self.params["save_res"]:
            with open(f"{self.save_dir}/params.txt", "w") as f:
                f.write(str(self.params))

        resume = self._try_resume(n)
        if resume is not None:
            z_opt, start_epoch, best_loss = resume
            data_u = self.data_u
        else:
            start_epoch, best_loss = 0, np.inf
            print(f"Generating auxiliary variable U for {self.params['n_segments']} segments.")
            data_u = self._sample_u(n)
            self.data_u = data_u
            if use_egm_init:
                self.egm_init(data, egm_n_iter=egm_n_iter,
                              batch_size=egm_batch_size or batch_size,
                              egm_batches_per_eval=egm_batches_per_eval,
                              verbose=verbose)
                print("Initialize latent variables Z with e(V)...")
                z_init = cb._apply(cfg, self.nets["e"], data_v, self._next_key())
            else:
                print("Random initialization of latent variables Z...")
                z_init = jax.random.normal(self._next_key(), (n, sum(cfg.z_dims)))
            self.data_z = z_init
            z_opt = optim.table_adam_init(self.data_z)

        if mesh is not None:
            from bayesgm_tpu.parallel import replicate, shard_rows

            data, z_opt = self._shard_training_state(mesh, data, z_opt)
            data_u = shard_rows(data_u, mesh)
            self.data_u = data_u
            self.prior_net = replicate(self.prior_net, mesh)
            self._prior_opt = replicate(self._prior_opt, mesh)

        n_full = n // batch_size
        if n_full == 0:
            raise ValueError(
                f"batch_size={batch_size} exceeds n={n}; the identifiable fit "
                "skips incomplete batches (as the reference does), so no "
                "updates would run.")

        step = partial(_ivae_train_batch_step, cfg, float(self.params["kl_weight"]))

        @jax.jit
        def epoch_fn(carry, idx_matrix, key, lr_scale):
            keys = jax.random.split(key, idx_matrix.shape[0])
            carry, losses = jax.lax.scan(
                lambda c, xs: step(c, xs[0], xs[1], data, data_u, lr_scale=lr_scale),
                carry, (idx_matrix, keys))
            return carry, {k: v[-1] for k, v in losses.items()}

        print("Iterative Updating Starts ...")
        from tqdm import tqdm

        # Optional lr schedule (params['lr_decay']), as in CausalBGM.fit.
        decay = self.params.get("lr_decay")

        carry = (self.nets, self.opts, self.prior_net, self._prior_opt,
                 self.data_z, z_opt)
        for epoch in tqdm(range(start_epoch, epochs + 1), desc="Epochs", unit="epoch",
                          disable=not verbose):
            k_perm, k_epoch = self._next_key(2)
            perm = jax.random.permutation(k_perm, n)
            idx_matrix = perm[: n_full * batch_size].reshape(n_full, batch_size)
            carry, losses = epoch_fn(carry, idx_matrix, k_epoch,
                                     optim.lr_schedule_scale(decay, epoch, epochs))

            if epoch % epochs_per_eval == 0:
                (self.nets, self.opts, self.prior_net, self._prior_opt,
                 self.data_z, z_opt) = carry
                causal_pre, mse_x, mse_y, mse_v, *_ = self.evaluate(data, self.data_z)
                causal_pre = np.asarray(causal_pre)
                mse_y = float(mse_y)
                if verbose:
                    print("Epoch [%d/%d]: MSE_x: %.4f, MSE_y: %.4f, MSE_v: %.4f\n"
                          % (epoch, epochs, float(mse_x), mse_y, float(mse_v)))
                if epoch >= startoff and mse_y < best_loss:
                    best_loss = mse_y
                    self.best_causal_pre = causal_pre
                    self.best_epoch = epoch
                    self.best_nets = self.nets
                if epoch >= epochs // 2:  # tail weight averaging (see CausalBGM.fit)
                    self._swa_count += 1
                    if self.swa_nets is None:
                        self.swa_nets = self.nets
                    else:
                        w = 1.0 / self._swa_count
                        self.swa_nets = jax.tree.map(
                            lambda a, b: a + (b - a) * w, self.swa_nets, self.nets)
                if self.params["save_model"]:
                    from bayesgm_tpu.utils import checkpoint as ckpt_lib

                    path = ckpt_lib.save_checkpoint(
                        self.checkpoint_path, epoch,
                        self._full_state_bundle(z_opt, epoch, best_loss))
                    print(f"Saving checkpoint for epoch {epoch} at {path}")
                if self.params["save_res"]:
                    save_data(f"{self.save_dir}/causal_pre_at_{epoch}.{save_format}", causal_pre)

        (self.nets, self.opts, self.prior_net, self._prior_opt,
         self.data_z, z_opt) = carry

    def evaluate(self, data, data_z=None, nb_intervals=200, key=None):
        """7-tuple: (causal_pre, mse_x, mse_y, mse_v, x_pred, y_pred, v_pred)."""
        data = tuple(jnp.asarray(d, jnp.float32) for d in data)
        eval_fn = self._jit_cache(
            ("ivae_evaluate", nb_intervals),
            lambda: jax.jit(partial(_ivae_evaluate, self.cfg, nb_intervals=nb_intervals)))
        return eval_fn(self.nets, data, data_z,
                       self._next_key() if key is None else key)

    def get_log_posterior(self, data_x, data_y, data_v, data_z, data_u, key=None):
        """log p(z | x, y, v, u) with the conditional prior
        (identifiable.py:504-556)."""
        if key is None:
            key = self._next_key()
        k_lik, k_prior = jax.random.split(key)
        x, y, v, z, u = [jnp.asarray(a, jnp.float32)
                         for a in (data_x, data_y, data_v, data_z, data_u)]
        rows = cb._neg_log_posterior_rows(self.cfg, self.nets, z, x, y, v, k_lik)
        rows = rows - dist.standard_normal_neg_log_prior(z)
        rows = rows + _conditional_prior_nll(self.cfg, self.prior_net, z, u, k_prior)
        return -rows

    def _log_prob_with_u(self, data, data_u, nets=None):
        cfg, prior_net = self.cfg, self.prior_net
        nets = self.nets if nets is None else nets
        x, y, v = data

        def log_prob(z, key):
            k_lik, k_prior = jax.random.split(key)
            rows = cb._neg_log_posterior_rows(cfg, nets, z, x, y, v, k_lik)
            rows = rows - dist.standard_normal_neg_log_prior(z)
            rows = rows + _conditional_prior_nll(cfg, prior_net, z, u=data_u, key=k_prior)
            return -rows

        return log_prob

    def metropolis_hastings_sampler(self, data, initial_q_sd=1.0, q_sd=None, burn_in=5000,
                                    n_keep=3000, target_acceptance_rate=0.25, tolerance=0.05,
                                    adjustment_interval=50, adaptive_sd=None, window_size=100):
        """Adaptive MH over the conditional-prior posterior; generates a fresh
        U for the test subjects (identifiable.py:559-616).

        Returns ``(samples (n_keep, n, z_dim), data_u (n, n_segments))``.
        """
        data = tuple(jnp.asarray(a, jnp.float32) for a in data)
        n = data[0].shape[0]
        data_u = self._sample_u(n)
        if adaptive_sd is None:
            adaptive_sd = q_sd is None or q_sd <= 0
        q0 = initial_q_sd if adaptive_sd else q_sd

        init = jax.random.normal(self._next_key(), (n, sum(self.cfg.z_dims)))
        res = mcmc.adaptive_mh(
            self._log_prob_with_u(data, data_u), init, self._next_key(),
            burn_in=burn_in, n_keep=n_keep, q_sd=float(q0), adaptive=bool(adaptive_sd),
            target_rate=target_acceptance_rate, tolerance=tolerance,
            adjustment_interval=adjustment_interval, window_size=window_size,
            recompute_current=self.cfg.use_bnn)
        print(f"Final MCMC Acceptance Rate: {float(res.accept_rate):.4f}")
        return np.asarray(res.samples), np.asarray(data_u)

    def predict(self, data, alpha=0.01, n_mcmc=3000, burn_in=5000, x_values=None,
                q_sd=1.0, sample_y=True, bs=None, mesh=None, sampler="mh",
                use_best_nets=False, use_swa_nets=False,
                return_diagnostics=False, return_draws=False,
                ess_target=None, ess_rhat=1.01):
        """Same interface as :meth:`CausalBGM.predict` (incl.
        ``return_diagnostics`` and ``sampler="mala"`` — gradient-informed
        Langevin proposals through the conditional-prior target), with the
        conditional prior in the chain
        (identifiable.py:350-420; ``burn_in`` is forwarded, fixing the
        reference's dropped-kwarg bug).  Subject batching combines per-batch
        draws at a common draw index — exact for the plain model; with
        ``use_bnn=True`` + continuous treatment the default ``bs=None``
        auto-sizes to ``n_test`` (shared per-launch flipout eps — see
        :meth:`CausalBGM._aggregate_predict`) and an explicit smaller ``bs``
        warns (``CausalBGM._resolve_predict_bs``)."""
        if sampler not in ("mh", "mala"):
            raise ValueError(f"Unknown sampler: {sampler!r} "
                             "(expected 'mh' or 'mala').")
        early_stop = None
        if ess_target is not None:
            if sampler != "mh":
                raise ValueError("ess_target requires sampler='mh' (early "
                                 "stopping hooks the chunked MH chain).")
            early_stop = dict(min_ess=float(ess_target),
                              max_rhat=float(ess_rhat))
        assert 0 < alpha < 1, "The significance level 'alpha' must be greater than 0 and less than 1."
        cfg = self.cfg
        if not cfg.binary_treatment and x_values is None:
            raise ValueError("For continuous treatment, 'x_values' must not be None.")
        if x_values is not None:
            x_values = np.atleast_1d(np.asarray(x_values, dtype=float))

        data_x, data_y, data_v = [np.asarray(a, np.float32) for a in data]
        n_test = len(data_x)
        bs = cb._resolve_predict_bs(cfg, bs, n_test)
        adaptive = q_sd is None or q_sd <= 0
        q0 = 1.0 if adaptive else float(q_sd)
        nets = self.nets
        if use_best_nets and self.best_nets is not None:
            nets = self.best_nets
        elif use_swa_nets and self.swa_nets is not None:
            nets = self.swa_nets
        print("MCMC Latent Variable Sampling ...")

        # Explicit-params chain (see CausalBGM.predict): same-shape batches
        # and repeat predicts reuse one compiled program.
        def lp(params, z, key):
            k_lik, k_prior = jax.random.split(key)
            x, y, v = params["data"]
            rows = cb._neg_log_posterior_rows(cfg, params["nets"], z, x, y, v, k_lik)
            rows = rows - dist.standard_normal_neg_log_prior(z)
            rows = rows + _conditional_prior_nll(cfg, params["prior_net"], z,
                                                 params["u"], k_prior)
            return -rows

        collect_p = cb._effect_collector_p(cfg, x_values, sample_y)
        xv_key = None if x_values is None else tuple(np.asarray(x_values).tolist())
        jit_cache = self._jit_cache(("mh_chain_jit_ivae", xv_key, bool(sample_y)), dict)

        def run_batch(bx, by, bv):
            batch = tuple(jnp.asarray(a) for a in (bx, by, bv))
            data_u = self._sample_u(batch[0].shape[0])
            init = jax.random.normal(self._next_key(), (batch[0].shape[0], sum(cfg.z_dims)))
            if mesh is not None:
                from bayesgm_tpu.parallel import shard_rows

                batch = tuple(shard_rows(a, mesh) for a in batch)
                data_u = shard_rows(data_u, mesh)
                init = shard_rows(init, mesh)
            params = {"nets": nets, "prior_net": self.prior_net,
                      "data": batch, "u": data_u}
            if sampler == "mala":
                # Langevin proposals through the FULL conditional-prior
                # target (likelihood + p(Z|U)); the XLA composite is
                # differentiated by jax.vjp inside adaptive_mala.  Stochastic
                # (flipout) targets re-evaluate both accept-ratio sides with
                # fresh keys, as on :meth:`CausalBGM.predict`.
                bx2, by2, bv2 = batch
                u2, nets2, prior2 = data_u, nets, self.prior_net

                def log_prob(z, key):
                    k_lik, k_prior = jax.random.split(key)
                    rows = cb._neg_log_posterior_rows(cfg, nets2, z,
                                                      bx2, by2, bv2, k_lik)
                    rows = rows - dist.standard_normal_neg_log_prior(z)
                    rows = rows + _conditional_prior_nll(cfg, prior2, z,
                                                         u2, k_prior)
                    return -rows

                collect = cb._effect_collector(cfg, nets2, x_values, sample_y)
                res = mcmc.adaptive_mala(
                    log_prob, init, self._next_key(), burn_in=burn_in,
                    n_keep=n_mcmc, step_size=0.1,
                    recompute_current=cfg.use_bnn, collect=collect)
            else:
                res = mcmc.adaptive_mh(
                    lp, init, self._next_key(),
                    burn_in=burn_in, n_keep=n_mcmc, q_sd=q0, adaptive=adaptive,
                    recompute_current=cfg.use_bnn, collect=collect_p,
                    params=params, jit_cache=jit_cache, early_stop=early_stop)
            print(f"Final MCMC Acceptance Rate: {float(res.accept_rate):.4f}")
            return np.asarray(res.samples), float(res.accept_rate)

        return self._aggregate_predict(run_batch, (data_x, data_y, data_v),
                                       alpha, n_mcmc, bs, x_values,
                                       return_diagnostics,
                                       return_draws=return_draws)
