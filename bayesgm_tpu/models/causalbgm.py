"""CausalBGM: causal inference with a 4-way partitioned latent generative model.

TPU-native re-design of the reference engine (src/bayesgm/models/causalbgm/
base.py:12-904).  Capabilities and the public API (params dict, ``fit`` /
``predict`` / ``evaluate`` / ``egm_init`` / ``get_config``) match the
reference; the internals are re-architected for XLA:

- the EGM warm-start and the iterative updating loop are single jitted
  ``lax.scan`` programs over on-device data (vs. per-batch ``@tf.function``
  dispatches with host-side numpy batching, base.py:403-431, 488-514);
- the per-sample latent table ``Z (n, z_dim)`` and its Adam moments live on
  device and are updated row-sparsely (ops/optim.py);
- posterior inference runs the adaptive Metropolis–Hastings chain fully
  on device (ops/mcmc.py), emitting causal-effect draws per kept step instead
  of materializing the ``(n_keep, n, z_dim)`` sample cube
  (vs. base.py:860-898 which round-trips numpy <-> TF twice per step);
- all randomness is explicit ``jax.random`` key threading.
"""

from __future__ import annotations

import datetime
import os
import warnings
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bayesgm_tpu.ops import distributions as dist
from bayesgm_tpu.ops import mcmc, nn, optim
from bayesgm_tpu.utils import checkpoint as ckpt_lib
from bayesgm_tpu.utils.data_io import save_data


class CBGMConfig(NamedTuple):
    """Hashable static configuration (jit-static)."""

    v_dim: int
    z_dims: tuple
    binary_treatment: bool
    use_bnn: bool
    kl_weight: float
    sigma_v: Optional[float]
    sigma_x: Optional[float]
    sigma_y: Optional[float]
    use_z_rec: float
    lr: float
    lr_theta: float
    lr_z: float
    g_d_freq: int
    # Training-time deconfounding penalty on the f-update (beyond-reference;
    # see _loss_y).  0.0 = reference-exact objective.
    deconf_weight: float = 0.0


DEFAULTS = dict(
    use_bnn=True,
    g_units=[64, 64, 64, 64, 64],
    e_units=[64, 64, 64, 64, 64],
    f_units=[64, 32, 8],
    h_units=[64, 32, 8],
    dz_units=[64, 32, 8],
    lr=2e-4,
    lr_theta=1e-4,
    lr_z=1e-4,
    g_d_freq=5,
    save_model=False,
    save_res=True,
    kl_weight=1e-4,
    use_z_rec=1.0,
)


def _split_z(cfg: CBGMConfig, z):
    d0, d1, d2, _ = cfg.z_dims
    return z[..., :d0], z[..., d0 : d0 + d1], z[..., d0 + d1 : d0 + d1 + d2]


def _apply(cfg: CBGMConfig, net, x, key):
    """Forward through an MLP (plain or flipout-Bayesian)."""
    if cfg.use_bnn:
        return nn.flipout_mlp_apply(net, x, key)
    return nn.mlp_apply(net, x)


def _kl(cfg: CBGMConfig, net):
    return nn.flipout_mlp_kl(net) if cfg.use_bnn else 0.0


def _sigma_sq(fixed: Optional[float], raw):
    """Fixed sigma override vs. softplus variance head (base.py:161-164)."""
    if fixed is not None:
        return jnp.asarray(fixed, jnp.float32) ** 2
    return dist.softplus_var(raw)


# ---------------------------------------------------------------------------
# Loss terms (exact reference forms; see ops/distributions.py)
# ---------------------------------------------------------------------------


def _loss_v(cfg, g_net, z, v, key):
    """-log p(V|Z) + optional KL (update_g_net, base.py:156-180)."""
    out = _apply(cfg, g_net, z, key)
    mu_v = out[:, : cfg.v_dim]
    sigma_sq_v = _sigma_sq(cfg.sigma_v, out[:, -1])
    loss_mse = jnp.mean((v - mu_v) ** 2)
    loss = jnp.mean(dist.gaussian_nll_iso(v, mu_v, sigma_sq_v, cfg.v_dim))
    loss = loss + _kl(cfg, g_net) * cfg.kl_weight
    return loss, loss_mse


def _loss_x(cfg, h_net, z, x, key):
    """-log p(X|Z0,Z2) + optional KL (update_h_net, base.py:183-214)."""
    z0, _, z2 = _split_z(cfg, z)
    out = _apply(cfg, h_net, jnp.concatenate([z0, z2], axis=-1), key)
    mu_x = out[:, :1]
    if cfg.binary_treatment:
        loss_fit = jnp.mean(dist.bernoulli_logits_nll(x, mu_x))
        loss = loss_fit
    else:
        sigma_sq_x = _sigma_sq(cfg.sigma_x, out[:, -1])
        loss_fit = jnp.mean((x - mu_x) ** 2)
        loss = jnp.mean(dist.gaussian_nll_iso(x, mu_x, sigma_sq_x, 1))
    loss = loss + _kl(cfg, h_net) * cfg.kl_weight
    return loss, loss_fit


def _loss_y(cfg, f_net, z, x, y, key):
    """-log p(Y|Z0,Z1,X) + optional KL (update_f_net, base.py:217-243).

    ``cfg.deconf_weight > 0`` (beyond-reference) adds a deconfounding
    penalty: the squared correlation of the outcome residual ``y - mu_y``
    with a cubic-polynomial basis of the treatment, estimated per batch.
    Rationale (RESULTS.md round-3 deconfound study): the flagship's shared
    ~0.017 ADRF bias lives in the trained f and is correlated 0.67 with the
    confounded-minus-true direction — i.e. f leaves a treatment-dependent
    residual that g-computation then integrates into the dose-response.
    Driving corr(residual, phi(x)) to zero at training time attacks that
    channel directly; the reference objective is the ``weight = 0`` limit.
    """
    z0, z1, _ = _split_z(cfg, z)
    out = _apply(cfg, f_net, jnp.concatenate([z0, z1, x], axis=-1), key)
    mu_y = out[:, :1]
    sigma_sq_y = _sigma_sq(cfg.sigma_y, out[:, -1])
    loss_mse = jnp.mean((y - mu_y) ** 2)
    loss = jnp.mean(dist.gaussian_nll_iso(y, mu_y, sigma_sq_y, 1))
    loss = loss + _kl(cfg, f_net) * cfg.kl_weight
    if cfg.deconf_weight:
        r = (y - mu_y)[:, 0]
        rc = r - jnp.mean(r)
        xs = x[:, 0]
        feats = jnp.stack([xs, xs**2, xs**3], axis=1)
        fc = feats - jnp.mean(feats, axis=0, keepdims=True)
        fc = fc / (jnp.sqrt(jnp.mean(fc**2, axis=0, keepdims=True)) + 1e-6)
        cov = jnp.mean(fc * rc[:, None], axis=0)
        r2 = jnp.sum(cov**2) / (jnp.mean(rc**2) + 1e-6)
        loss = loss + cfg.deconf_weight * r2
    return loss, loss_mse


def _neg_log_posterior_rows(cfg, nets, z, x, y, v, key):
    """Per-sample negative log posterior (base.py:246-295, 765-817)."""
    kg, kh, kf = jax.random.split(key, 3)
    g_out = _apply(cfg, nets["g"], z, kg)
    mu_v = g_out[:, : cfg.v_dim]
    sigma_sq_v = _sigma_sq(cfg.sigma_v, g_out[:, -1])
    loss_pv = dist.gaussian_nll_iso(v, mu_v, sigma_sq_v, cfg.v_dim)

    z0, z1, z2 = _split_z(cfg, z)
    h_out = _apply(cfg, nets["h"], jnp.concatenate([z0, z2], axis=-1), kh)
    mu_x = h_out[:, :1]
    if cfg.binary_treatment:
        loss_px = jnp.squeeze(dist.bernoulli_logits_nll(x, mu_x), axis=-1)
    else:
        sigma_sq_x = _sigma_sq(cfg.sigma_x, h_out[:, -1])
        loss_px = dist.gaussian_nll_iso(x, mu_x, sigma_sq_x, 1)

    f_out = _apply(cfg, nets["f"], jnp.concatenate([z0, z1, x], axis=-1), kf)
    mu_y = f_out[:, :1]
    sigma_sq_y = _sigma_sq(cfg.sigma_y, f_out[:, -1])
    loss_py = dist.gaussian_nll_iso(y, mu_y, sigma_sq_y, 1)

    loss_prior = dist.standard_normal_neg_log_prior(z)
    return loss_pv + loss_px + loss_py + loss_prior


def _latent_loss(cfg, nets, z, x, y, v, key):
    """Scalar posterior loss for the SGD latent update.

    The reference averages each of the four terms over the batch
    (base.py:262-295); for the binary-treatment CE it averages the (n,1)
    matrix, which is identical for a 1-column treatment.
    """
    return jnp.mean(_neg_log_posterior_rows(cfg, nets, z, x, y, v, key))


# ---------------------------------------------------------------------------
# Jitted step functions
# ---------------------------------------------------------------------------


def _train_batch_step(cfg: CBGMConfig, carry, idx, key, data, fused_latent_vg=None,
                      lr_scale=1.0):
    """One iterative-updating step: g/h/f Adam updates on the batch's current
    Z rows, then a row-sparse Adam step on the latent table
    (fit driver, base.py:493-505).

    The per-batch PRNG key comes in as scan input (not carry) so the whole
    training state is the externally-checkpointable carry pytree.

    ``fused_latent_vg`` (TPU): a ``(bz, bx, by, bv, nets, key) ->
    (neg_rows, grad_rows)`` closure over the fused forward+backward Pallas
    kernels — the latent value-and-grad then runs as ONE kernel launch
    instead of the XLA forward+backward pair.  The non-BNN swap is
    numerically exact; the flipout (default) swap draws its weight noise
    from the on-core PRNG instead of threefry (same estimator, different
    stream)."""
    nets, opts, z_table, z_opt = carry
    x, y, v = data
    bx, by, bv = x[idx], y[idx], v[idx]
    bz = z_table[idx]
    kg, kh, kf, kz = jax.random.split(key, 4)

    (loss_v, mse_v), g_grads = jax.value_and_grad(
        lambda g: _loss_v(cfg, g, bz, bv, kg), has_aux=True)(nets["g"])
    new_g, opt_g = optim.adam_update(g_grads, opts["g"], nets["g"], cfg.lr_theta * lr_scale)

    (loss_x, mse_x), h_grads = jax.value_and_grad(
        lambda h: _loss_x(cfg, h, bz, bx, kh), has_aux=True)(nets["h"])
    new_h, opt_h = optim.adam_update(h_grads, opts["h"], nets["h"], cfg.lr_theta * lr_scale)

    (loss_y, mse_y), f_grads = jax.value_and_grad(
        lambda f: _loss_y(cfg, f, bz, bx, by, kf), has_aux=True)(nets["f"])
    new_f, opt_f = optim.adam_update(f_grads, opts["f"], nets["f"], cfg.lr_theta * lr_scale)

    nets = {**nets, "g": new_g, "h": new_h, "f": new_f}
    opts = {**opts, "g": opt_g, "h": opt_h, "f": opt_f}

    if fused_latent_vg is not None:
        neg_rows, grad_rows = fused_latent_vg(bz, bx, by, bv, nets, kz)
        loss_post = jnp.mean(neg_rows)
        z_grads = grad_rows / bz.shape[0]  # grad of the batch-mean loss
    else:
        loss_post, z_grads = jax.value_and_grad(
            lambda zr: _latent_loss(cfg, nets, zr, bx, by, bv, kz))(bz)
    z_table, z_opt = optim.table_adam_update_rows(z_grads, idx, z_opt, z_table,
                                                   cfg.lr_z * lr_scale)

    losses = dict(loss_v=loss_v, mse_v=mse_v, loss_x=loss_x, mse_x=mse_x,
                  loss_y=loss_y, mse_y=mse_y, loss_postrior_z=loss_post)
    return (nets, opts, z_table, z_opt), losses


def _egm_disc_step(cfg: CBGMConfig, nets, opt_d, z, v, key):
    """WGAN-GP critic step in latent space (train_disc_step, base.py:305-330)."""
    k_eps, k_e, k_d = jax.random.split(key, 3)
    eps = jax.random.uniform(k_eps, ())
    z_fake = _apply(cfg, nets["e"], v, k_e)
    z_hat = z * eps + z_fake * (1.0 - eps)

    def d_loss_fn(dz_net):
        d_fake = nn.critic_apply(dz_net, z_fake)
        d_real = nn.critic_apply(dz_net, z)
        dz_loss = -jnp.mean(d_real) + jnp.mean(d_fake)
        grad_z = jax.grad(lambda zh: jnp.sum(nn.critic_apply(dz_net, zh)))(z_hat)
        grad_norm = jnp.sqrt(jnp.sum(grad_z**2, axis=1))
        gp = jnp.mean((grad_norm - 1.0) ** 2)
        d_loss = dz_loss + 10.0 * gp
        return d_loss, dz_loss

    (d_loss, dz_loss), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(nets["dz"])
    new_dz, opt_d = optim.adam_update(grads, opt_d, nets["dz"], cfg.lr)
    return {**nets, "dz": new_dz}, opt_d, dict(dz_loss=dz_loss, d_loss=d_loss)


def _egm_gen_step(cfg: CBGMConfig, nets, opt_ge, z, v, x, y, key):
    """Joint g/e/f/h generator step: adversarial + roundtrip + supervised +
    0.001 sigma^2 regularizer (train_gen_step, base.py:332-377)."""
    kg, ke, ke2, kg2, kf, kh = jax.random.split(key, 6)

    def ge_loss_fn(sub):
        g, e, f, h = sub["g"], sub["e"], sub["f"], sub["h"]
        g_out = _apply(cfg, g, z, kg)
        v_fake = g_out[:, : cfg.v_dim]
        sigma_sq_loss = jnp.mean(g_out[:, -1] ** 2)
        z_enc = _apply(cfg, e, v, ke)
        z0, z1, z2 = _split_z(cfg, z_enc)

        z_rec = _apply(cfg, e, v_fake, ke2)
        v_rec = _apply(cfg, g, z_enc, kg2)[:, : cfg.v_dim]
        d_fake = nn.critic_apply(nets["dz"], z_enc)

        l2_loss_v = jnp.mean((v - v_rec) ** 2)
        l2_loss_z = jnp.mean((z - z_rec) ** 2)
        e_loss_adv = -jnp.mean(d_fake)

        f_out = _apply(cfg, f, jnp.concatenate([z0, z1, x], axis=-1), kf)
        y_fake = f_out[:, :1]
        sigma_sq_loss = sigma_sq_loss + jnp.mean(f_out[:, -1] ** 2)
        h_out = _apply(cfg, h, jnp.concatenate([z0, z2], axis=-1), kh)
        x_fake = h_out[:, :1]
        sigma_sq_loss = sigma_sq_loss + jnp.mean(h_out[:, -1] ** 2)

        if cfg.binary_treatment:
            l2_loss_x = jnp.mean(dist.bernoulli_logits_nll(x, x_fake))
        else:
            l2_loss_x = jnp.mean((x_fake - x) ** 2)
        l2_loss_y = jnp.mean((y_fake - y) ** 2)

        g_e_loss = (e_loss_adv + (l2_loss_v + cfg.use_z_rec * l2_loss_z)
                    + (l2_loss_x + l2_loss_y) + 0.001 * sigma_sq_loss)
        aux = dict(e_loss_adv=e_loss_adv, l2_loss_v=l2_loss_v, l2_loss_z=l2_loss_z,
                   l2_loss_x=l2_loss_x, l2_loss_y=l2_loss_y, g_e_loss=g_e_loss)
        return g_e_loss, aux

    sub = {k: nets[k] for k in ("g", "e", "f", "h")}
    (_, aux), grads = jax.value_and_grad(ge_loss_fn, has_aux=True)(sub)
    new_sub, opt_ge = optim.adam_update(grads, opt_ge, sub, cfg.lr)
    return {**nets, **new_sub}, opt_ge, aux


def _egm_iter(cfg: CBGMConfig, carry, key, data, batch_size):
    """One EGM iteration: g_d_freq critic steps + one generator step
    (egm_init loop, base.py:403-417)."""
    nets, opt_d, opt_ge = carry
    x, y, v = data
    n = x.shape[0]
    z_dim = sum(cfg.z_dims)
    keys = jax.random.split(key, cfg.g_d_freq + 1)

    d_losses = None
    for i in range(cfg.g_d_freq):
        k_idx, k_z, k_step = jax.random.split(keys[i], 3)
        idx = jax.random.randint(k_idx, (batch_size,), 0, n)
        batch_z = jax.random.normal(k_z, (batch_size, z_dim))
        nets, opt_d, d_losses = _egm_disc_step(cfg, nets, opt_d, batch_z, v[idx], k_step)

    k_idx, k_z, k_step = jax.random.split(keys[-1], 3)
    idx = jax.random.randint(k_idx, (batch_size,), 0, n)
    batch_z = jax.random.normal(k_z, (batch_size, z_dim))
    nets, opt_ge, g_losses = _egm_gen_step(cfg, nets, opt_ge, batch_z, v[idx], x[idx], y[idx], k_step)
    return (nets, opt_d, opt_ge), {**d_losses, **g_losses}


def _evaluate(cfg: CBGMConfig, nets, data, z, key, nb_intervals: int = 200):
    """Full-data reconstruction MSEs + ITE or ADRF grid (evaluate,
    base.py:534-570)."""
    x, y, v = data
    kg, kf, kh, ke, kfa, kfb = jax.random.split(key, 6)
    if z is None:
        z = _apply(cfg, nets["e"], v, ke)
    z0, z1, z2 = _split_z(cfg, z)
    v_pred = _apply(cfg, nets["g"], z, kg)[:, : cfg.v_dim]
    y_pred = _apply(cfg, nets["f"], jnp.concatenate([z0, z1, x], axis=-1), kf)[:, :1]
    x_pred = _apply(cfg, nets["h"], jnp.concatenate([z0, z2], axis=-1), kh)[:, :1]
    if cfg.binary_treatment:
        x_pred = jax.nn.sigmoid(x_pred)
    mse_v = jnp.mean((v - v_pred) ** 2)
    mse_x = jnp.mean((x - x_pred) ** 2)
    mse_y = jnp.mean((y - y_pred) ** 2)

    if cfg.binary_treatment:
        ones = jnp.ones((x.shape[0], 1), jnp.float32)
        y_pos = _apply(cfg, nets["f"], jnp.concatenate([z0, z1, ones], axis=-1), kfa)[:, :1]
        y_neg = _apply(cfg, nets["f"], jnp.concatenate([z0, z1, 0.0 * ones], axis=-1), kfb)[:, :1]
        causal_pre = y_pos - y_neg
    else:
        # 'nearest' percentile interpolation matches tfp.stats.percentile.
        x_min = jnp.percentile(x, 5.0, method="nearest")
        x_max = jnp.percentile(x, 95.0, method="nearest")
        x_grid = jnp.linspace(x_min, x_max, nb_intervals)

        def dose_response(xv):
            x_tile = jnp.full((x.shape[0], 1), xv, jnp.float32)
            yp = _apply(cfg, nets["f"], jnp.concatenate([z0, z1, x_tile], axis=-1), kfa)[:, :1]
            return jnp.mean(yp)

        causal_pre = jax.vmap(dose_response)(x_grid)
    return causal_pre, mse_x, mse_y, mse_v


def _effect_collector(cfg: CBGMConfig, nets, x_values, sample_y: bool):
    """Build the per-kept-step MCMC statistic.

    Binary treatment: per-subject ITE draw (n,).  Continuous: ADRF grid means
    (len(x_values),).  Mirrors infer_from_latent_posterior
    (base.py:671-763) but fused into the chain scan.
    """

    def outcome(z, xv_col, key):
        z0, z1, _ = _split_z(cfg, z)
        k_net, k_noise = jax.random.split(key)
        out = _apply(cfg, nets["f"], jnp.concatenate([z0, z1, xv_col], axis=-1), k_net)
        mu_y = out[:, 0]
        if sample_y:
            sigma_sq = _sigma_sq(cfg.sigma_y, out[:, 1])
            return mu_y + jnp.sqrt(sigma_sq) * jax.random.normal(k_noise, mu_y.shape)
        return mu_y

    if cfg.binary_treatment:

        def collect(z, key):
            k1, k2 = jax.random.split(key)
            ones = jnp.ones((z.shape[0], 1), jnp.float32)
            return outcome(z, ones, k1) - outcome(z, 0.0 * ones, k2)

    else:
        xv = jnp.asarray(x_values, jnp.float32)

        def collect(z, key):
            keys = jax.random.split(key, xv.shape[0])

            def per_x(x_scalar, k):
                col = jnp.full((z.shape[0], 1), x_scalar, jnp.float32)
                return jnp.mean(outcome(z, col, k))

            return jax.vmap(per_x)(xv, keys)

    return collect


def _effect_collector_p(cfg: CBGMConfig, x_values, sample_y: bool):
    """Params-mode effect collector: nets flow in via ``params["nets"]`` so
    the jitted chain program can be reused across predict calls (weights are
    arguments, not trace constants)."""

    def collect_p(params, z, key):
        return _effect_collector(cfg, params["nets"], x_values, sample_y)(z, key)

    return collect_p


def _dr_effect_collector_p(cfg: CBGMConfig, x_values, h_bw: float,
                           gps_floor: float = 1e-3):
    """Doubly-robust (kernel-AIPW) ADRF collector, per kept MCMC step.

    Augments the plugin g-computation with the Colangelo–Lee kernel-DML
    correction, using the model's own heads as the nuisance estimates: the
    outcome head ``f`` supplies residuals ``y_i - f_mean(z_i, x_i)`` and the
    treatment head ``h`` IS a generalized-propensity model
    ``x | z ~ N(mu_x(z), sigma_x(z))``.  Per grid point x*:

        plugin(x*) = mean_i f_mean(z_i, x*)
        w_i(x*)    = K_h(x_i - x*) / max(gps_i(x*), gps_floor)
        dr(x*)     = plugin(x*) + sum_i w_i resid_i / sum_i w_i   (Hajek)

    The Hajek (self-normalized) form is used: raw IPW weights are unstable
    under thin GPS tails (measured in benchmarks/deconfound_study.py, whose
    ``make_dr_collector`` is the 3-variant study twin of this collector; it
    additionally carries the kernel's 1/(h*sqrt(2pi)) normalization, which
    the Hajek ratio cancels — keep the two in sync if the weight form
    changes).  The
    estimate is consistent if EITHER head is well-specified, which removes
    the plugin's shared f-misfit bias at the cost of kernel-smoothing
    variance.  Continuous treatment only; the correction is evaluated inside
    the chain scan so the collected draws carry posterior-latent uncertainty
    through both terms.  Not in the reference (its predict is plugin-only,
    base.py:671-763).
    """
    xv = jnp.asarray(x_values, jnp.float32)
    h_bw = jnp.float32(h_bw)

    def collect_p(params, z, key):
        nets = params["nets"]
        x, y, _ = params["data"]
        z0, z1, z2 = _split_z(cfg, z)
        kf, kh, key = jax.random.split(key, 3)
        f_obs = _apply(cfg, nets["f"],
                       jnp.concatenate([z0, z1, x], axis=-1), kf)
        resid = y[:, 0] - f_obs[:, 0]
        h_out = _apply(cfg, nets["h"], jnp.concatenate([z0, z2], axis=-1), kh)
        mu_x = h_out[:, 0]
        s2x = _sigma_sq(cfg.sigma_x, h_out[:, -1])
        keys = jax.random.split(key, xv.shape[0])

        def per_x(x_s, k):
            col = jnp.full((z.shape[0], 1), x_s, jnp.float32)
            mu = _apply(cfg, nets["f"],
                        jnp.concatenate([z0, z1, col], axis=-1), k)[:, 0]
            plugin = jnp.mean(mu)
            gps = jnp.exp(-0.5 * (x_s - mu_x) ** 2 / s2x) / jnp.sqrt(
                2.0 * jnp.pi * s2x)
            kern = jnp.exp(-0.5 * ((x[:, 0] - x_s) / h_bw) ** 2)
            w = kern / jnp.maximum(gps, gps_floor)
            return plugin + jnp.sum(w * resid) / jnp.maximum(jnp.sum(w), 1e-12)

        return jax.vmap(per_x)(xv, keys)

    return collect_p


# ---------------------------------------------------------------------------
# Model class
# ---------------------------------------------------------------------------


def _resolve_predict_bs(cfg: CBGMConfig, bs, n_test: int) -> int:
    """Resolve the predict subject-batch size against the BNN eps contract.

    With ``use_bnn=True`` and continuous treatment, the flipout eps of each
    evaluation is shared across a launch (reference semantics,
    base.py:765-817); batching subjects scopes that sharing per batch and
    narrows subject-averaged ADRF intervals vs one full-data launch.
    ``bs=None`` (the default) therefore auto-sizes to ``n_test`` in that
    regime (and to 10000 otherwise, where batching is exact).  An explicit
    smaller ``bs`` is honored but warned about — never silent.
    """
    if bs is None:
        if cfg.use_bnn and not cfg.binary_treatment:
            return max(1, n_test)
        return 10000
    bs = max(1, int(bs))
    if cfg.use_bnn and not cfg.binary_treatment and n_test > bs:
        warnings.warn(
            f"use_bnn=True with continuous treatment and n_test={n_test} > "
            f"bs={bs}: subject batching scopes the shared flipout eps per "
            "batch, narrowing ADRF intervals vs one full-data launch. Set "
            "bs >= n_test (or leave bs=None) for reference-exact intervals.",
            UserWarning, stacklevel=3)
    return bs


class CausalBGM:
    """Causal Bayesian Generative Model.

    Parameters
    ----------
    params : dict
        Configuration dictionary.  Required keys: ``'v_dim'``, ``'z_dims'``
        (list [z0, z1, z2, z3]), ``'binary_treatment'``, ``'dataset'``,
        ``'output_dir'``.  Optional keys (with defaults): ``'use_bnn'`` (True),
        ``'g_units'``/``'e_units'`` ([64]*5), ``'f_units'``/``'h_units'``/
        ``'dz_units'`` ([64,32,8]), ``'lr'`` (2e-4), ``'lr_theta'`` (1e-4),
        ``'lr_z'`` (1e-4), ``'g_d_freq'`` (5), ``'save_model'`` (False),
        ``'save_res'`` (True), ``'kl_weight'`` (1e-4), ``'use_z_rec'`` (1.0),
        and fixed-variance overrides ``'sigma_v'``/``'sigma_x'``/``'sigma_y'``.
    timestamp : str or None
        Run timestamp (current local time if None).
    random_seed : int or None
        Seed for the model's PRNG key chain (default 42).
    """

    def __init__(self, params, timestamp=None, random_seed=None):
        merged = dict(DEFAULTS)
        merged.update(params)
        self.params = merged
        p = merged

        self.cfg = CBGMConfig(
            v_dim=int(p["v_dim"]),
            z_dims=tuple(int(d) for d in p["z_dims"]),
            binary_treatment=bool(p["binary_treatment"]),
            use_bnn=bool(p["use_bnn"]),
            kl_weight=float(p["kl_weight"]),
            sigma_v=p.get("sigma_v"),
            sigma_x=p.get("sigma_x"),
            sigma_y=p.get("sigma_y"),
            use_z_rec=float(p["use_z_rec"]),
            lr=float(p["lr"]),
            lr_theta=float(p["lr_theta"]),
            lr_z=float(p["lr_z"]),
            g_d_freq=int(p["g_d_freq"]),
            deconf_weight=float(p.get("deconf_weight", 0.0)),
        )
        from bayesgm_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        seed = 42 if random_seed is None else int(random_seed)
        self._key = jax.random.PRNGKey(seed)
        self._metrics = None
        if p.get("metrics_path"):
            from bayesgm_tpu.utils.profiling import MetricsLogger

            self._metrics = MetricsLogger(p["metrics_path"])
        self._build_nets()

        self.data_z = None
        self.best_causal_pre = None
        self.best_epoch = None
        self.best_nets = None  # snapshot of nets at the best-mse_y eval
        self.swa_nets = None   # running average of eval-epoch snapshots
        self._swa_count = 0    # (tail half of training; see fit)

        self.timestamp = timestamp
        if self.timestamp is None:
            now = datetime.datetime.now()
            self.timestamp = now.strftime("%Y%m%d_%H%M%S")

        self.checkpoint_path = "{}/checkpoints/{}/{}".format(
            p["output_dir"], p["dataset"], self.timestamp)
        if p["save_model"] and not os.path.exists(self.checkpoint_path):
            os.makedirs(self.checkpoint_path)
        self.save_dir = "{}/results/{}/{}".format(
            p["output_dir"], p["dataset"], self.timestamp)
        if p["save_res"] and not os.path.exists(self.save_dir):
            os.makedirs(self.save_dir)

        # Auto-restore the latest checkpoint, like the reference
        # (base.py:126-128).  Network weights restore immediately; the rest
        # of the training state (optimizers, latent table, PRNG key) has
        # data-dependent shapes and is restored by fit() via _try_resume.
        self._resume_ckpt = ckpt_lib.latest_checkpoint(self.checkpoint_path)
        if self._resume_ckpt is not None:
            restored = ckpt_lib.restore_checkpoint(
                self._resume_ckpt, self._restore_template())
            self._apply_restore(restored)
            print("Latest checkpoint restored!!")

    # -- construction -----------------------------------------------------

    def _next_key(self, num=1):
        self._key, *keys = jax.random.split(self._key, num + 1)
        return keys[0] if num == 1 else keys

    def _build_nets(self):
        cfg, p = self.cfg, self.params
        z_dim = sum(cfg.z_dims)
        kg, ke, kf, kh, kd = self._next_key(5)
        if cfg.use_bnn:
            init = nn.init_flipout_mlp
        else:
            init = nn.init_mlp
        self.nets = {
            "g": init(kg, z_dim, cfg.v_dim + 1, p["g_units"]),
            "e": init(ke, cfg.v_dim, z_dim, p["e_units"]),
            "f": init(kf, cfg.z_dims[0] + cfg.z_dims[1] + 1, 2, p["f_units"]),
            "h": init(kh, cfg.z_dims[0] + cfg.z_dims[2], 2, p["h_units"]),
            "dz": nn.init_critic(kd, z_dim, p["dz_units"]),
        }
        self.opts = {
            "g": optim.adam_init(self.nets["g"]),
            "f": optim.adam_init(self.nets["f"]),
            "h": optim.adam_init(self.nets["h"]),
        }
        self._opt_d = optim.adam_init(self.nets["dz"])
        sub = {k: self.nets[k] for k in ("g", "e", "f", "h")}
        self._opt_ge = optim.adam_init(sub)

    def _restore_template(self):
        """Subtree of the full-state bundle that is restorable before data
        shapes are known (subclasses add their extra nets)."""
        return {"nets": self.nets}

    def _apply_restore(self, restored):
        self.nets = restored["nets"]

    def get_config(self):
        """Return ``{"params": params}`` (reference base.py:130-142)."""
        return {"params": self.params}

    def save_weights(self, path: str):
        """Save all network parameters (and the latent table if fitted) to a
        single ``.npz`` pytree for later serving."""
        bundle = {"nets": self.nets}
        if self.data_z is not None:
            bundle["data_z"] = self.data_z
        return ckpt_lib.save_pytree(path, bundle)

    def load_weights(self, path: str):
        """Restore parameters saved by :meth:`save_weights` (shapes must match
        the current configuration)."""
        import numpy as _np

        self.nets = ckpt_lib.restore_checkpoint(path, {"nets": self.nets})["nets"]
        with _np.load(path) as d:
            if "['data_z']" in d:
                self.data_z = jnp.asarray(d["['data_z']"])
        return self

    def initialize_nets(self, print_summary: bool = False):
        """Networks are built eagerly in ``__init__``; optionally print sizes."""
        if print_summary:
            for name in ("g", "f", "h"):
                n_params = sum(x.size for x in jax.tree.leaves(self.nets[name]))
                print(f"{name}_net: {n_params} parameters")

    # -- EGM initialization -------------------------------------------------

    def egm_init(self, data, egm_n_iter=30000, batch_size=32, egm_batches_per_eval=500, verbose=1):
        """Adversarial EGM warm-start (reference egm_init, base.py:380-431).

        Runs ``egm_n_iter + 1`` iterations of (g_d_freq critic steps + one
        generator step), evaluating every ``egm_batches_per_eval`` iterations.
        """
        data = tuple(jnp.asarray(d, jnp.float32) for d in data)
        cfg = self.cfg

        chunk = self._jit_cache(
            "egm_chunk",
            lambda: jax.jit(partial(self._egm_chunk, cfg), static_argnames=("batch_size", "n_iters")))
        print("EGM Initialization Starts ...")
        carry = (self.nets, self._opt_d, self._opt_ge)
        done = 0
        total = egm_n_iter + 1
        # Fixed inner scan length so the compiled program is independent of
        # egm_batches_per_eval (and hits the persistent compilation cache).
        inner = 500
        while done < total:
            n_eval = min(egm_batches_per_eval, total - done)
            remaining = n_eval
            losses = None
            while remaining > 0:
                n_iters = min(inner, remaining)
                carry, losses = chunk(carry, data, self._next_key(),
                                      batch_size=batch_size, n_iters=n_iters)
                remaining -= n_iters
            done += n_eval
            # float() blocks on chunk completion; converting only when
            # printing lets JAX's async dispatch pipeline the chunks — under
            # host-CPU contention the per-chunk sync alone cost seconds
            # (benchmarks/egm_eval_cost.py).
            if verbose:
                losses = {k: float(val) for k, val in losses.items()}
                print(
                    "EGM Initialization Iter [%d] : e_loss_adv [%.4f], l2_loss_v [%.4f], "
                    "l2_loss_z [%.4f], l2_loss_x [%.4f], l2_loss_y [%.4f], g_e_loss [%.4f], "
                    "dz_loss [%.4f], d_loss [%.4f]"
                    % (done - 1, losses["e_loss_adv"], losses["l2_loss_v"], losses["l2_loss_z"],
                       losses["l2_loss_x"], losses["l2_loss_y"], losses["g_e_loss"],
                       losses["dz_loss"], losses["d_loss"]))
            self.nets, self._opt_d, self._opt_ge = carry
            # The per-interval evaluate() is pure logging — nothing feeds
            # back into training — and its result is only consumed by
            # save_res.  It costs ~1 s/interval on-chip (200-point ADRF grid
            # x full-data BNN forwards; benchmarks/egm_eval_cost.py), which
            # dominated the EGM phase, so skip the compute when unused.  The
            # chain key is advanced UNCONDITIONALLY so runs with and without
            # save_res see bit-identical PRNG streams (and the published
            # campaign streams are preserved exactly).
            k_eval = self._next_key()
            if self.params["save_res"]:
                # star-unpack: the identifiable subclass's evaluate returns extras
                causal_pre, mse_x, mse_y, mse_v, *_ = self.evaluate(data, key=k_eval)
                save_data(f"{self.save_dir}/causal_pre_egm_init_iter-{done - 1}.txt",
                          np.asarray(causal_pre))
        print("EGM Initialization Ends.")

    @staticmethod
    def _egm_chunk(cfg, carry, data, key, batch_size, n_iters):
        keys = jax.random.split(key, n_iters)
        step = partial(_egm_iter, cfg, data=data, batch_size=batch_size)
        carry, losses = jax.lax.scan(step, carry, keys)
        return carry, {k: val[-1] for k, val in losses.items()}

    # -- Iterative updating --------------------------------------------------

    # -- checkpointable training state --------------------------------------

    def _full_state_template(self, n):
        """Pytree template for the full training state saved at each eval
        (one schema per model class; subclasses extend it)."""
        z = jnp.zeros((n, sum(self.cfg.z_dims)), jnp.float32)
        causal_shape = (n, 1) if self.cfg.binary_treatment else (200,)
        return {
            "nets": self.nets,
            "opts": self.opts,
            "opt_d": self._opt_d,
            "opt_ge": self._opt_ge,
            "data_z": z,
            "z_opt": optim.table_adam_init(z),
            "key": self._key,
            "epoch": jnp.zeros((), jnp.int32),
            "best_loss": jnp.zeros((), jnp.float32),
            "best_epoch": jnp.zeros((), jnp.int32),
            "best_causal_pre": jnp.zeros(causal_shape, jnp.float32),
            "best_nets": self.nets,
            "swa_nets": self.nets,
            "swa_count": jnp.zeros((), jnp.int32),
        }

    def _full_state_bundle(self, z_opt, epoch, best_loss):
        zero_pre = self._full_state_template(self.data_z.shape[0])["best_causal_pre"]
        return {
            "nets": self.nets,
            "opts": self.opts,
            "opt_d": self._opt_d,
            "opt_ge": self._opt_ge,
            "data_z": self.data_z,
            "z_opt": z_opt,
            "key": self._key,
            "epoch": jnp.asarray(epoch, jnp.int32),
            "best_loss": jnp.asarray(best_loss, jnp.float32),
            "best_epoch": jnp.asarray(self.best_epoch or 0, jnp.int32),
            "best_causal_pre": (zero_pre if self.best_causal_pre is None
                                else jnp.asarray(self.best_causal_pre).reshape(zero_pre.shape)),
            "best_nets": self.best_nets if self.best_nets is not None else self.nets,
            "swa_nets": self.swa_nets if self.swa_nets is not None else self.nets,
            "swa_count": jnp.asarray(self._swa_count, jnp.int32),
        }

    def _apply_full_state(self, state):
        self.nets = state["nets"]
        self.opts = state["opts"]
        self._opt_d = state["opt_d"]
        self._opt_ge = state["opt_ge"]
        self.data_z = state["data_z"]
        self._key = state["key"]
        self.best_epoch = int(state["best_epoch"])
        self.best_causal_pre = np.asarray(state["best_causal_pre"])
        self.best_nets = state["best_nets"]
        self._swa_count = int(state["swa_count"])
        self.swa_nets = state["swa_nets"] if self._swa_count > 0 else None
        return state["z_opt"], int(state["epoch"]), float(state["best_loss"])

    def _try_resume(self, n):
        """Restore full training state from the latest checkpoint if present.

        Returns ``(z_opt, start_epoch, best_loss)`` or None.  Mirrors the
        reference's silent auto-restore (base.py:126-128) but resumes the
        *entire* state — optimizers, latent table + moments, PRNG key — so
        the continued run reproduces the uninterrupted trajectory.
        """
        if getattr(self, "_resume_ckpt", None) is None:
            return None
        if not ckpt_lib.has_group(self._resume_ckpt, "data_z"):
            return None  # weights-only checkpoint: nets were restored in __init__
        try:
            state = ckpt_lib.restore_checkpoint(self._resume_ckpt, self._full_state_template(n))
        except (KeyError, ValueError) as e:
            print(f"Full-state resume unavailable ({e}); continuing with restored weights only.")
            return None
        z_opt, epoch, best_loss = self._apply_full_state(state)
        print(f"Resuming training from checkpoint at epoch {epoch}.")
        return z_opt, epoch + 1, best_loss

    def _shard_training_state(self, mesh, data, z_opt):
        """Row-shard the (n, ...) arrays (data, latent table, Adam moments)
        over ``mesh`` and replicate parameters/optimizers.  The jitted epoch
        scan then runs under GSPMD: the latent table and its moments never
        leave their shards (row-local update), minibatch gathers ride XLA
        collectives, and numerics match the single-device path
        (tests/test_parallel.py)."""
        from bayesgm_tpu.parallel import replicate, shard_rows

        data = tuple(shard_rows(a, mesh) for a in data)
        self.data_z = shard_rows(self.data_z, mesh)
        z_opt = optim.TableAdamState(
            m=shard_rows(z_opt.m, mesh), v=shard_rows(z_opt.v, mesh),
            t=replicate(z_opt.t, mesh))
        self.nets = replicate(self.nets, mesh)
        self.opts = replicate(self.opts, mesh)
        return data, z_opt

    def fit(self, data, epochs=100, epochs_per_eval=5, batch_size=32, startoff=0,
            use_egm_init=True, egm_n_iter=30000, egm_batches_per_eval=500,
            save_format="txt", verbose=1, mesh=None, egm_batch_size=None):
        """Train with optional EGM warm-start then iterative Gibbs-style
        updating (reference fit, base.py:434-532).

        Each epoch is one jitted ``lax.scan`` over shuffled mini-batches with
        the latent table resident on device.  When ``save_model`` is on, the
        FULL training state is checkpointed at every eval epoch and a later
        re-instantiation with the same checkpoint dir resumes exactly.

        ``mesh`` (a 1-D ``jax.sharding.Mesh``, e.g. ``parallel.make_mesh()``)
        trains with the dataset, latent table, and latent Adam moments
        row-sharded and parameters replicated.  The big wins are memory (the
        (n, z_dim) state scales with the mesh) and the full-data eval; for
        maximum multi-chip training throughput use the full-batch step in
        ``parallel.sharded`` (one global batch per step, zero gather traffic).
        """
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
        else:
            start_epoch, best_loss = 0, np.inf
            if use_egm_init:
                # egm_batch_size decouples the warm-start batch from the
                # iterative phase's (reference-exact bs=32): the EGM scan is
                # latency-bound in its serial update dependency, so a larger
                # batch sees the same data in proportionally fewer serial
                # steps at near-flat per-step cost (RESULTS.md round 5).
                self.egm_init(data, egm_n_iter=egm_n_iter,
                              batch_size=egm_batch_size or batch_size,
                              egm_batches_per_eval=egm_batches_per_eval,
                              verbose=verbose)
                print("Initialize latent variables Z with e(V)...")
                z_init = _apply(cfg, self.nets["e"], data_v, self._next_key())
            else:
                print("Random initialization of latent variables Z...")
                z_init = jax.random.normal(self._next_key(), (n, sum(cfg.z_dims)))
            self.data_z = z_init
            z_opt = optim.table_adam_init(self.data_z)

        if mesh is not None:
            data, z_opt = self._shard_training_state(mesh, data, z_opt)

        n_full = n // batch_size
        remainder = n - n_full * batch_size

        # Fused latent update (VERDICT: make Pallas the training hot path):
        # the latent value-and-grad runs as one kernel launch on TPU — the
        # non-BNN kernel everywhere, the flipout kernel for the default BNN
        # configuration; mesh runs execute it replicated under shard_map
        # (identical per-device results, no partitioning needed at bs rows).
        fused_vg = self._build_fused_latent_vg(batch_size, mesh)

        epoch_fn = jax.jit(partial(self._train_epoch, cfg, fused_latent_vg=fused_vg))
        rem_fn = (jax.jit(partial(_train_batch_step, cfg, fused_latent_vg=fused_vg))
                  if remainder else None)

        print("Iterative Updating Starts ...")
        from tqdm import tqdm

        # Optional learning-rate schedule (params['lr_decay']: 'cosine' |
        # 'linear' | None).  The reference trains at a constant rate; the
        # constant-rate iterative dynamic keeps wandering near the optimum
        # (seed-to-seed 'final vs best nets' variance, RESULTS.md), and a
        # decay converges it.  The scale is a traced scalar — no recompiles.
        # The schedule is defined over THIS call's epoch horizon: resume a
        # killed run with the same `epochs` to replay the same schedule.
        decay = self.params.get("lr_decay")

        def lr_scale_at(epoch):
            return optim.lr_schedule_scale(decay, epoch, epochs)

        carry = (self.nets, self.opts, self.data_z, z_opt)
        for epoch in tqdm(range(start_epoch, epochs + 1), desc="Epochs", unit="epoch",
                          disable=not verbose):
            # Shuffling and per-batch randomness are both drawn from the
            # model's key chain, so a resumed run replays the same stream.
            k_perm, k_epoch = self._next_key(2)
            perm = jax.random.permutation(k_perm, n)
            scale = lr_scale_at(epoch)
            if n_full:  # n < batch_size -> remainder-only epoch
                idx_full = perm[: n_full * batch_size].reshape(n_full, batch_size)
                carry, losses = epoch_fn(carry, idx_full, k_epoch, data, scale)
            if remainder:
                k_rem = self._next_key()
                idx_rem = perm[n_full * batch_size :]
                carry, losses = rem_fn(carry, idx_rem, k_rem, data, lr_scale=scale)

            if epoch % epochs_per_eval == 0:
                self.nets, self.opts, self.data_z, z_opt = carry
                causal_pre, mse_x, mse_y, mse_v = self.evaluate(data, self.data_z)
                causal_pre = np.asarray(causal_pre)
                mse_y = float(mse_y)
                if verbose:
                    print("Epoch [%d/%d]: MSE_x: %.4f, MSE_y: %.4f, MSE_v: %.4f\n"
                          % (epoch, epochs, float(mse_x), mse_y, float(mse_v)))
                if self._metrics is not None:
                    self._metrics.log("eval", epoch=epoch, mse_x=mse_x,
                                      mse_y=mse_y, mse_v=mse_v)
                if epoch >= startoff and mse_y < best_loss:
                    best_loss = mse_y
                    self.best_causal_pre = causal_pre
                    self.best_epoch = epoch
                    self.best_nets = self.nets
                # Tail weight averaging (SWA): running mean of the eval-epoch
                # snapshots over the last half of training.  The iterative
                # dynamic keeps wandering around the optimum (per-seed
                # variance between 'best' and 'final' nets); the average is a
                # lower-variance estimator.  predict(use_swa_nets=True).
                if epoch >= epochs // 2:
                    self._swa_count += 1
                    if self.swa_nets is None:
                        self.swa_nets = self.nets
                    else:
                        w = 1.0 / self._swa_count
                        self.swa_nets = jax.tree.map(
                            lambda a, b: a + (b - a) * w, self.swa_nets, self.nets)
                if self.params["save_model"]:
                    path = ckpt_lib.save_checkpoint(
                        self.checkpoint_path, epoch,
                        self._full_state_bundle(z_opt, epoch, best_loss))
                    print(f"Saving checkpoint for epoch {epoch} at {path}")
                if self.params["save_res"]:
                    save_data(f"{self.save_dir}/causal_pre_at_{epoch}.{save_format}", causal_pre)

        self.nets, self.opts, self.data_z, z_opt = carry

    def _build_fused_latent_vg(self, batch_size, mesh):
        """Closure running the latent value-and-grad as one fused Pallas
        kernel, or None when the XLA path should be used (CPU, or
        params['use_pallas_latent']=False).

        Under a ``mesh`` the kernel is wrapped in a REPLICATED
        ``jax.shard_map``: every device computes the same ~batch_size-row
        launch from the replicated minibatch (GSPMD cannot partition a
        pallas_call; at minibatch scale redundant compute beats sharding),
        so mesh training keeps the fused Pallas hot path.  Explicitly
        setting params['use_pallas_latent']=True builds the kernel even off
        TPU (interpret mode) — how the CPU-mesh tests exercise this path."""
        from bayesgm_tpu.ops import pallas_kernels as pk

        cfg = self.cfg
        use_pallas = self.params.get("use_pallas_latent", "auto")
        if use_pallas == "auto":
            use_pallas = pk.on_tpu()
        if cfg.use_bnn and not pk.on_tpu():
            use_pallas = False  # the flipout kernel needs the on-core PRNG
        if not use_pallas:
            return None
        block = max(8, ((batch_size + 7) // 8) * 8)
        try:
            if cfg.use_bnn:
                fused = pk.make_fused_causal_logp_and_grad_bnn_hosteps(
                    cfg, pk.flipout_mlp_layer_dims(self.nets["g"]),
                    pk.flipout_mlp_layer_dims(self.nets["h"]),
                    pk.flipout_mlp_layer_dims(self.nets["f"]), block_rows=block)

                def vg(bz, bx, by, bv, nets, key):
                    gw, gs = pk.split_flipout_flat(
                        pk.flatten_flipout_params(nets["g"]))
                    hw, hs = pk.split_flipout_flat(
                        pk.flatten_flipout_params(nets["h"]))
                    fw, fs = pk.split_flipout_flat(
                        pk.flatten_flipout_params(nets["f"]))
                    k_eps, k_sig = jax.random.split(key)
                    ps = pk.flipout_step_perturbations(gs + hs + fs, k_eps)
                    return fused(bz, bx, by, bv, pk.key_to_seed(k_sig),
                                 gw, hw, fw, ps)

            else:
                fused = pk.make_fused_causal_logp_and_grad(
                    cfg, pk.mlp_layer_dims(self.nets["g"]),
                    pk.mlp_layer_dims(self.nets["h"]),
                    pk.mlp_layer_dims(self.nets["f"]), block_rows=block)

                def vg(bz, bx, by, bv, nets, key):
                    return fused(bz, bx, by, bv,
                                 pk.flatten_mlp_params(nets["g"]),
                                 pk.flatten_mlp_params(nets["h"]),
                                 pk.flatten_mlp_params(nets["f"]))

            if mesh is not None:
                from bayesgm_tpu.parallel import replicated_shard_map

                vg = replicated_shard_map(vg, mesh)
            return vg
        except Exception as e:  # pragma: no cover
            import warnings

            warnings.warn(f"Fused latent update unavailable "
                          f"({type(e).__name__}: {e}); using XLA.")
            return None

    @staticmethod
    def _train_epoch(cfg, carry, idx_matrix, key, data, lr_scale=1.0,
                     fused_latent_vg=None):
        keys = jax.random.split(key, idx_matrix.shape[0])
        step = partial(_train_batch_step, cfg, data=data,
                       fused_latent_vg=fused_latent_vg, lr_scale=lr_scale)
        carry, losses = jax.lax.scan(lambda c, xs: step(c, xs[0], xs[1]), carry,
                                     (idx_matrix, keys))
        return carry, {k: val[-1] for k, val in losses.items()}

    # -- Evaluation -----------------------------------------------------------

    def evaluate(self, data, data_z=None, nb_intervals=200, key=None):
        """Reconstruction MSEs + in-sample ITE/ADRF (reference evaluate,
        base.py:534-570).  ``key`` lets callers that already advanced the
        model's PRNG chain (egm_init's logging slot) pass the drawn key in."""
        data = tuple(jnp.asarray(d, jnp.float32) for d in data)
        eval_fn = self._jit_cache(
            ("evaluate", nb_intervals),
            lambda: jax.jit(partial(_evaluate, self.cfg, nb_intervals=nb_intervals)))
        return eval_fn(self.nets, data, data_z,
                       self._next_key() if key is None else key)

    def _jit_cache(self, key, build):
        """Per-instance cache of jitted callables (a fresh jax.jit object per
        call would retrace every time)."""
        cache = getattr(self, "_jitted", None)
        if cache is None:
            cache = self._jitted = {}
        if key not in cache:
            cache[key] = build()
        return cache[key]

    # -- Posterior inference ---------------------------------------------------

    def get_log_posterior(self, data_x, data_y, data_v, data_z, key=None):
        """Batched log p(Z | X, Y, V) up to a constant (reference
        base.py:765-817).  Returns shape (n,)."""
        if key is None:
            key = self._next_key()
        args = [jnp.asarray(a, jnp.float32) for a in (data_x, data_y, data_v, data_z)]
        return -_neg_log_posterior_rows(self.cfg, self.nets, args[3], args[0], args[1], args[2], key)

    def _make_log_prob(self, data_x, data_y, data_v, differentiable=False, nets=None,
                       prefer_xla=False, mesh=None):
        """MH log-target over Z.  Non-Bayesian nets on TPU use the fully
        fused Pallas kernel (ops/pallas_kernels.py, ~1.7x the XLA path);
        flipout nets and CPU runs use the XLA composite.  With
        ``differentiable=True`` the fused forward is wrapped in a custom VJP
        whose backward differentiates the XLA composite (the hand-written
        kernel defines no VJP), so gradient-based samplers still get the fast
        forward.  With ``mesh`` the fused kernels run per-shard under
        ``jax.shard_map`` over rows (row-separable target — exact), so
        multi-chip chains keep the Pallas path.  ``prefer_xla=True`` forces
        the composite."""
        cfg = self.cfg
        nets = self.nets if nets is None else nets

        def xla_log_prob(z, key):
            return -_neg_log_posterior_rows(cfg, nets, z, data_x, data_y, data_v, key)

        from bayesgm_tpu.ops import pallas_kernels as pk

        if prefer_xla:
            return xla_log_prob

        def maybe_shard(rowfn, n_row_args, seed_arg=None):
            if mesh is None:
                return rowfn
            from bayesgm_tpu.parallel import rowwise_shard_map

            return rowwise_shard_map(rowfn, mesh, n_row_args,
                                     axis_name=mesh.axis_names[0],
                                     seed_arg=seed_arg)

        if cfg.use_bnn:
            # Default configuration: the flipout posterior runs in the fused
            # BNN kernels (all weight noise drawn by the on-core PRNG).
            # Interpret mode has no TPU PRNG, so CPU runs keep the XLA
            # composite.
            if not pk.on_tpu():
                return xla_log_prob
            try:
                gw, gs = pk.split_flipout_flat(pk.flatten_flipout_params(nets["g"]))
                hw, hs = pk.split_flipout_flat(pk.flatten_flipout_params(nets["h"]))
                fw, fs = pk.split_flipout_flat(pk.flatten_flipout_params(nets["f"]))
                sigs = gs + hs + fs
                dims = (pk.flipout_mlp_layer_dims(nets["g"]),
                        pk.flipout_mlp_layer_dims(nets["h"]),
                        pk.flipout_mlp_layer_dims(nets["f"]))
                if not differentiable:
                    fused = maybe_shard(
                        pk.make_fused_causal_logp_bnn_hosteps(cfg, *dims),
                        4, seed_arg=4)

                    def fused_bnn_log_prob(z, key):
                        k_eps, k_sig = jax.random.split(key)
                        ps = pk.flipout_step_perturbations(sigs, k_eps)
                        return -fused(z, data_x, data_y, data_v,
                                      pk.key_to_seed(k_sig), gw, hw, fw, ps)

                    return fused_bnn_log_prob

                # Gradient samplers (MALA/HMC): the fused forward+backward
                # kernel differentiates through the SAME weight-noise draw.
                fused_vg = maybe_shard(
                    pk.make_fused_causal_logp_and_grad_bnn_hosteps(cfg, *dims),
                    4, seed_arg=4)

                def run_vg(z, key):
                    k_eps, k_sig = jax.random.split(key)
                    ps = pk.flipout_step_perturbations(sigs, k_eps)
                    return fused_vg(z, data_x, data_y, data_v,
                                    pk.key_to_seed(k_sig), gw, hw, fw, ps)

                @jax.custom_vjp
                def log_prob(z, key):
                    neg, _ = run_vg(z, key)
                    return -neg

                def fwd(z, key):
                    neg, grad_neg = run_vg(z, key)
                    return -neg, grad_neg

                def bwd(grad_neg, cotangent):
                    return -cotangent[:, None] * grad_neg, None

                log_prob.defvjp(fwd, bwd)
                return log_prob
            except Exception as e:  # pragma: no cover - pallas unavailable
                import warnings

                warnings.warn(
                    f"Fused BNN Pallas log-posterior unavailable "
                    f"({type(e).__name__}: {e}); using the XLA composite.")
                return xla_log_prob

        try:
            fused = maybe_shard(pk.make_fused_causal_logp(
                cfg, pk.mlp_layer_dims(nets["g"]), pk.mlp_layer_dims(nets["h"]),
                pk.mlp_layer_dims(nets["f"])), 4)
            gf = pk.flatten_mlp_params(nets["g"])
            hf = pk.flatten_mlp_params(nets["h"])
            ff = pk.flatten_mlp_params(nets["f"])

            def fused_log_prob(z, key):
                return -fused(z, data_x, data_y, data_v, gf, hf, ff)

            if not differentiable:
                return fused_log_prob

            fused_vg = maybe_shard(pk.make_fused_causal_logp_and_grad(
                cfg, pk.mlp_layer_dims(nets["g"]), pk.mlp_layer_dims(nets["h"]),
                pk.mlp_layer_dims(nets["f"])), 4)

            @jax.custom_vjp
            def log_prob(z, key):
                return fused_log_prob(z, key)

            def fwd(z, key):
                neg, grad_neg = fused_vg(z, data_x, data_y, data_v, gf, hf, ff)
                return -neg, grad_neg

            def bwd(grad_neg, cotangent):
                # The target is row-separable, so d(sum u_i logp_i)/dz is a
                # row-wise scaling of the per-row gradient from the fused
                # forward+backward kernel.
                return -cotangent[:, None] * grad_neg, None

            log_prob.defvjp(fwd, bwd)
            return log_prob
        except Exception as e:  # pragma: no cover - pallas unavailable
            # Fall back loudly: a shape/dim bug in the kernel build must not
            # silently degrade to the XLA path.
            import warnings

            warnings.warn(
                f"Fused Pallas log-posterior unavailable "
                f"({type(e).__name__}: {e}); using the XLA composite.")
            return xla_log_prob

    def _make_param_log_prob(self, prefer_xla=False, mesh=None):
        """Params-mode MH target for ``ops.mcmc.adaptive_mh(params=...)``.

        ``mesh``: with a device mesh, the fused Pallas kernels run PER SHARD
        under ``jax.shard_map`` over the row axis (the targets are
        row-separable, so per-shard evaluation is exact; each shard's
        in-kernel PRNG stream is decorrelated by mixing the shard index into
        the seed) — multi-chip predict keeps the Pallas hot path.
        ``prefer_xla=True`` skips the Pallas kernels and returns the XLA
        composite even on TPU (tests/benchmarks of the composite).

        Returns ``(lp, plp, make_params, make_multi_step)``:

        - ``lp(params, z, key) -> (n,)`` — the log-posterior with all weights
          and conditioning data passed through ``params`` (a jit argument),
          so repeated chains reuse ONE compiled program instead of paying the
          ~10 s retrace per ``predict`` (closure arrays bake into the trace).
        - ``plp(params, z_prop, z_cur, k1, k2)`` or None — single-launch
          paired evaluation for ``recompute_current`` steps: both states are
          stacked into one fused-kernel call, each half padded up to a
          row-block boundary (``pk.bnn_block_rows``).  Weight-noise eps is
          drawn in XLA per step as TWO independent sets (host-eps kernels)
          whose index map routes set 0 to the proposed half's blocks and set
          1 to the current half's, so each MH state sees its own whole-batch
          eps draw — exactly the reference's two separate
          ``get_log_posterior`` calls per step (causalbgm/base.py:865-866,
          tfp DenseFlipout: one eps per call shared across the batch).
          Per-row Rademacher signs stay on the in-kernel PRNG, seeded per
          row block.
        - ``make_params(nets, data, paired) -> dict`` — builds the params
          pytree (flattened kernel weights, raw nets for the collector, data,
          and the pre-stacked 2n-row data when ``paired``).
        - ``make_multi_step(K)`` or None — builds the K-steps-per-launch
          fused MH window (pallas_kernels.make_fused_mh_steps_bnn) for the
          burn-in phase: weights + data stay in VMEM across the K steps.

        Fused TPU path for the default BNN config; XLA composite elsewhere
        (``plp=None`` — pairing only pays when launches are discrete kernels).
        """
        cfg = self.cfg
        from bayesgm_tpu.ops import pallas_kernels as pk

        paired_block = [None]  # set by the fused-BNN branch below
        mesh_axis = None if mesh is None else mesh.axis_names[0]
        n_shards = 1 if mesh is None else mesh.shape[mesh_axis]

        def make_params(nets, data, paired):
            x, y, v = (jnp.asarray(a, jnp.float32) for a in data)
            p = {"nets": nets, "data": (x, y, v)}
            if not prefer_xla and (pk.on_tpu() or
                                   (mesh is not None and not cfg.use_bnn)):
                flatten = (pk.flatten_flipout_params if cfg.use_bnn
                           else pk.flatten_mlp_params)
                p["flat"] = (flatten(nets["g"]), flatten(nets["h"]),
                             flatten(nets["f"]))
            if paired:
                # Pad each half to a kernel row-block boundary so the
                # proposed/current halves of the paired stack occupy disjoint
                # blocks (independent per-block weight noise; advisor r2).
                # Under a mesh the halves are stacked on a leading pair axis
                # and each SHARD holds aligned [prop; cur] sub-halves, so the
                # padding unit is block_rows * n_shards.
                blk, n = paired_block[0] or 1, x.shape[0]
                unit = blk * n_shards
                n_pad = -(-n // unit) * unit
                halves = ((x, y, v) if n_pad == n else tuple(
                    jnp.pad(a, ((0, n_pad - n), (0, 0))) for a in (x, y, v)))
                if mesh is None:
                    p["data2"] = tuple(jnp.concatenate([a, a], axis=0)
                                       for a in halves)
                else:
                    p["data2"] = tuple(jnp.stack([a, a]) for a in halves)
            return p

        if cfg.use_bnn and pk.on_tpu() and not prefer_xla:
            try:
                dims = (pk.flipout_mlp_layer_dims(self.nets["g"]),
                        pk.flipout_mlp_layer_dims(self.nets["h"]),
                        pk.flipout_mlp_layer_dims(self.nets["f"]))
                # Host-eps kernels: eps drawn in XLA once per evaluation and
                # shared across all rows — the exact tfp DenseFlipout
                # semantics the reference executes (one eps per
                # get_log_posterior call), and ~1.5x faster than in-kernel
                # Box-Muller (benchmarks/mxu_probe.py).
                fused = self._jit_cache(
                    ("fused_bnn_logp_he", tuple(map(tuple, dims))),
                    lambda: pk.make_fused_causal_logp_bnn_hosteps(cfg, *dims))
                fused_paired = self._jit_cache(
                    ("fused_bnn_logp_he2", tuple(map(tuple, dims))),
                    lambda: pk.make_fused_causal_logp_bnn_hosteps(
                        cfg, *dims, paired=True))
                paired_block[0] = pk.bnn_block_rows(cfg, *dims)

                def split_all(params):
                    gw, gs = pk.split_flipout_flat(params["flat"][0])
                    hw, hs = pk.split_flipout_flat(params["flat"][1])
                    fw, fs = pk.split_flipout_flat(params["flat"][2])
                    return gw, hw, fw, gs + hs + fs

                # Antithetic eps across the paired halves (beyond-reference,
                # opt-in): set 1 = -set 0, so the accept ratio's two sides
                # see negatively-correlated weight noise (marginals exact).
                anti = bool(self.params.get("antithetic_eps", False))

                if mesh is None:
                    def lp(params, z, key):
                        gw, hw, fw, sigs = split_all(params)
                        x, y, v = params["data"]
                        k_eps, k_sig = jax.random.split(key)
                        ps = pk.flipout_step_perturbations(sigs, k_eps)
                        return -fused(z, x, y, v, pk.key_to_seed(k_sig),
                                      gw, hw, fw, ps)

                    def plp(params, z_prop, z_cur, k1, k2):
                        gw, hw, fw, sigs = split_all(params)
                        x2, y2, v2 = params["data2"]
                        n = z_prop.shape[0]
                        n_pad = x2.shape[0] // 2  # half length incl. padding
                        if n_pad != n:
                            rp = ((0, n_pad - n), (0, 0))
                            z_prop = jnp.pad(z_prop, rp)
                            z_cur = jnp.pad(z_cur, rp)
                        zz = jnp.concatenate([z_prop, z_cur], axis=0)
                        # Set 0 -> proposed half, set 1 -> current half: two
                        # independent eps draws per step, one per MH state,
                        # as in the reference's two get_log_posterior calls.
                        k_eps, k_sig = jax.random.split(k1)
                        ps2 = pk.flipout_step_perturbations(sigs, k_eps,
                                                            n_sets=2,
                                                            antithetic=anti)
                        neg = fused_paired(zz, x2, y2, v2,
                                           pk.key_to_seed(k_sig),
                                           gw, hw, fw, ps2)
                        return -neg[:n], -neg[n_pad:n_pad + n]
                else:
                    from jax.sharding import PartitionSpec as P

                    from bayesgm_tpu.parallel import rowwise_shard_map

                    sharded_fused = rowwise_shard_map(
                        fused, mesh, 4, axis_name=mesh_axis, seed_arg=4)

                    def lp(params, z, key):
                        gw, hw, fw, sigs = split_all(params)
                        x, y, v = params["data"]
                        # eps is computed once and REPLICATED across shards
                        # (reference: one eps per call over the full batch);
                        # per-row signs decorrelate per shard via the seed.
                        k_eps, k_sig = jax.random.split(key)
                        ps = pk.flipout_step_perturbations(sigs, k_eps)
                        return -sharded_fused(z, x, y, v,
                                              pk.key_to_seed(k_sig),
                                              gw, hw, fw, ps)

                    def paired_local(zz_l, x_l, y_l, v_l, seed, gw, hw, fw,
                                     ps2):
                        # Each shard holds aligned (2, n_l) [prop; cur]
                        # sub-halves with n_l a multiple of block_rows, so
                        # the flattened 2*n_l rows keep the halves in
                        # disjoint blocks and the paired kernel's set index
                        # map routes eps set 0/1 to the right half.  Sign
                        # streams decorrelate via the seed's second word.
                        seed = seed.at[1].add(jax.lax.axis_index(mesh_axis))
                        nl = zz_l.shape[1]
                        flat = lambda a: a.reshape(2 * nl, a.shape[2])
                        neg = fused_paired(flat(zz_l), flat(x_l), flat(y_l),
                                           flat(v_l), seed, gw, hw, fw, ps2)
                        return neg.reshape(2, nl)

                    def plp(params, z_prop, z_cur, k1, k2):
                        gw, hw, fw, sigs = split_all(params)
                        x2, y2, v2 = params["data2"]  # (2, n_pad, d) each
                        n, n_pad = z_prop.shape[0], x2.shape[1]
                        if n_pad != n:
                            rp = ((0, n_pad - n), (0, 0))
                            z_prop = jnp.pad(z_prop, rp)
                            z_cur = jnp.pad(z_cur, rp)
                        zz = jnp.stack([z_prop, z_cur])
                        k_eps, k_sig = jax.random.split(k1)
                        ps2 = pk.flipout_step_perturbations(sigs, k_eps,
                                                            n_sets=2,
                                                            antithetic=anti)
                        sm = jax.shard_map(
                            paired_local, mesh=mesh,
                            in_specs=(P(None, mesh_axis), P(None, mesh_axis),
                                      P(None, mesh_axis), P(None, mesh_axis),
                                      P(), P(), P(), P(), P()),
                            out_specs=P(None, mesh_axis), check_vma=False)
                        neg = sm(zz, x2, y2, v2, pk.key_to_seed(k_sig),
                                 gw, hw, fw, ps2)
                        return -neg[0, :n], -neg[1, :n]

                def make_multi_step(K):
                    fused_ms = self._jit_cache(
                        ("fused_mh_steps", tuple(map(tuple, dims)), K),
                        lambda: pk.make_fused_mh_steps_bnn(cfg, *dims, n_steps=K))

                    def multi_step(params, state, q_sd, key):
                        gf, hf, ff = params["flat"]
                        x, y, v = params["data"]
                        return fused_ms(state, x, y, v, pk.key_to_seed(key),
                                        q_sd, gf, hf, ff)

                    return multi_step

                return lp, plp, make_params, make_multi_step
            except Exception as e:  # pragma: no cover - pallas unavailable
                import warnings

                warnings.warn(
                    f"Fused BNN Pallas log-posterior unavailable "
                    f"({type(e).__name__}: {e}); using the XLA composite.")

        elif not cfg.use_bnn and not prefer_xla and (pk.on_tpu() or mesh is not None):
            # Non-Bayesian nets: deterministic fused kernel (no key use), one
            # launch per evaluation; pairing is moot since recompute_current
            # is off for deterministic targets.  Under a CPU mesh the kernel
            # runs in interpret mode per shard — the same shard_map code path
            # the TPU mesh uses, so the multi-chip dryrun/tests exercise it.
            try:
                dims = (pk.mlp_layer_dims(self.nets["g"]),
                        pk.mlp_layer_dims(self.nets["h"]),
                        pk.mlp_layer_dims(self.nets["f"]))
                fused = self._jit_cache(
                    ("fused_logp", tuple(map(tuple, dims))),
                    lambda: pk.make_fused_causal_logp(cfg, *dims))
                if mesh is not None:
                    from bayesgm_tpu.parallel import rowwise_shard_map

                    fused = rowwise_shard_map(fused, mesh, 4,
                                              axis_name=mesh_axis)

                def lp(params, z, key):
                    gf, hf, ff = params["flat"]
                    x, y, v = params["data"]
                    return -fused(z, x, y, v, gf, hf, ff)

                return lp, None, make_params, None
            except Exception as e:  # pragma: no cover - pallas unavailable
                import warnings

                warnings.warn(
                    f"Fused Pallas log-posterior unavailable "
                    f"({type(e).__name__}: {e}); using the XLA composite.")

        def lp(params, z, key):
            x, y, v = params["data"]
            return -_neg_log_posterior_rows(cfg, params["nets"], z, x, y, v, key)

        return lp, None, make_params, None

    def metropolis_hastings_sampler(self, data, initial_q_sd=1.0, q_sd=None, burn_in=5000,
                                    n_keep=3000, target_acceptance_rate=0.25, tolerance=0.05,
                                    adjustment_interval=50, adaptive_sd=None, window_size=100):
        """Posterior Z samples via on-device adaptive MH (reference
        base.py:820-904).  Returns (n_keep, n, z_dim) numpy array."""
        data_x, data_y, data_v = [jnp.asarray(a, jnp.float32) for a in data]
        cfg, nets = self.cfg, self.nets
        if adaptive_sd is None:
            adaptive_sd = q_sd is None or q_sd <= 0
        q0 = initial_q_sd if adaptive_sd else q_sd

        log_prob = self._make_log_prob(data_x, data_y, data_v)
        init = jax.random.normal(self._next_key(), (data_x.shape[0], sum(cfg.z_dims)))
        res = mcmc.adaptive_mh(
            log_prob, init, self._next_key(), burn_in=burn_in, n_keep=n_keep,
            q_sd=float(q0), adaptive=bool(adaptive_sd),
            target_rate=target_acceptance_rate, tolerance=tolerance,
            adjustment_interval=adjustment_interval, window_size=window_size,
            recompute_current=cfg.use_bnn)
        print(f"Final MCMC Acceptance Rate: {float(res.accept_rate):.4f}")
        return np.asarray(res.samples)

    def infer_from_latent_posterior(self, data_posterior_z, x_values=None, sample_y=True):
        """Map posterior Z draws to causal-effect draws (reference
        base.py:671-763).  Binary: (n_keep, n) ITE draws; continuous:
        (len(x_values), n_keep) ADRF draws."""
        z_draws = jnp.asarray(data_posterior_z, jnp.float32)
        collect = _effect_collector(self.cfg, self.nets, x_values, sample_y)
        keys = jax.random.split(self._next_key(), z_draws.shape[0])
        # Batch over draws to bound activation memory (a single vmap across
        # all draws materializes (n_keep, grid, n, hidden) at once).
        vm = jax.jit(jax.vmap(collect))
        bs = 64
        outs = []
        for start in range(0, z_draws.shape[0], bs):
            end = min(start + bs, z_draws.shape[0])
            outs.append(np.asarray(vm(z_draws[start:end], keys[start:end])))
        out = np.concatenate(outs, axis=0)  # (n_keep, stat)
        if self.cfg.binary_treatment:
            return np.asarray(out)
        return np.asarray(out).T  # (len(x_values), n_keep)

    def predict(self, data, alpha=0.01, n_mcmc=3000, burn_in=5000, x_values=None,
                q_sd=1.0, sample_y=True, bs=None, sampler="mh",
                use_best_nets=False, use_swa_nets=False, mesh=None,
                return_diagnostics=False, return_draws=False,
                estimator="plugin", dr_bw=None, dr_gps_floor=1e-3,
                ess_target=None, ess_rhat=1.01):
        """Causal effects with posterior intervals from latent MCMC
        (reference predict, base.py:573-668).

        Binary: returns (ITE mean (n,), intervals (n, 2)).  Continuous:
        (ADRF (len(x_values),), intervals (len(x_values), 2)).  The chain and
        the effect computation are fused on device; only per-step effect
        draws come back to the host.  ``sampler="mala"`` switches to
        gradient-informed Langevin proposals (better mixing on concentrated
        posteriors; not in the reference).

        ``return_diagnostics=True`` appends a third return value: a dict with
        per-effect-series effective sample size (``ess``), split-R̂
        (``rhat``) computed on the collected effect draws, and the mean MH
        acceptance rate — convergence evidence the reference never reports
        (it prints only the final acceptance, base.py:897-904).  With
        continuous treatment and ``n_test > bs`` the reported ESS is the
        elementwise MINIMUM (and R̂ the maximum) over per-batch chains —
        conservative by construction, never computed on a cross-batch
        average.  ``return_draws=True`` appends the raw effect draw matrix
        (see ``_aggregate_predict``).

        Subject batching (``n_test > bs``) is exact for the plain
        (non-BNN) model: the reference's single full-data chain is n
        independent per-subject chains stepped in lockstep
        (base.py:860-898), so combining per-batch draws at a common draw
        index reproduces the unbatched draw-series law (verified by
        tests/test_predict_batching.py::test_batched_intervals_match_unbatched).
        With ``use_bnn=True`` the per-subject marginals still match, but
        the flipout eps of each evaluation is shared across a launch
        (reference semantics, base.py:765-817), which couples accept
        decisions within a launch; batching scopes that coupling per batch
        instead of across all n, so continuous-treatment ADRF intervals
        come out slightly narrower than one full-data launch.  The default
        ``bs=None`` therefore auto-sizes to ``n_test`` in that regime (and
        to 10000 otherwise, where batching is exact); passing an explicit
        smaller ``bs`` with a BNN + continuous treatment emits a
        ``UserWarning`` (see ``_resolve_predict_bs``).

        ``mesh`` shards the per-subject chains (init state + data rows) over
        the device mesh — MCMC inference is embarrassingly parallel in
        subjects, so chains scale linearly with chips; the only cross-chip
        traffic is the scalar windowed acceptance rate and the final effect
        reductions.

        ``estimator="dr"`` (continuous treatment, ``sampler="mh"`` only;
        beyond-reference) replaces the plugin g-computation with the
        doubly-robust kernel-AIPW form per kept step — see
        ``_dr_effect_collector_p``.  ``dr_bw`` is the treatment-kernel
        bandwidth (default: Silverman ``1.06 std(x) n^{-1/5}`` on the full
        test sample, shared across subject batches so every batch estimates
        the same functional); ``dr_gps_floor`` clips thin generalized-
        propensity tails.  ``sample_y`` is ignored: DR targets the mean dose-
        response, not the posterior predictive.

        ``ess_target`` (beyond-reference; ``sampler="mh"`` only) turns on
        ESS-adaptive chain length: sampling stops early once the minimum
        effective sample size over the collected effect series reaches
        ``ess_target`` AND split-R̂ is at most ``ess_rhat`` everywhere
        (checked host-side at scan-chunk boundaries; see
        ``ops.mcmc.adaptive_mh(early_stop=...)``).  ``n_mcmc`` remains the
        hard cap.  The reference always runs the fixed 5000+3000 schedule
        (base.py:860-898) regardless of measured mixing.
        """
        assert 0 < alpha < 1, "The significance level 'alpha' must be greater than 0 and less than 1."
        cfg = self.cfg
        if not cfg.binary_treatment and x_values is None:
            raise ValueError(
                "For continuous treatment, 'x_values' must not be None. "
                "Provide a list or a single treatment value.")
        if x_values is not None:
            x_values = np.atleast_1d(np.asarray(x_values, dtype=float))

        data_x, data_y, data_v = [np.asarray(a, dtype=np.float32) for a in data]
        n_test = len(data_x)
        bs = _resolve_predict_bs(cfg, bs, n_test)
        # use_best_nets / use_swa_nets: infer with the best-mse_y snapshot or
        # the tail weight-average instead of the final nets (the reference
        # always predicts with final nets; both levers measured in RESULTS.md).
        nets = self.nets
        if use_best_nets and self.best_nets is not None:
            nets = self.best_nets
        elif use_swa_nets and self.swa_nets is not None:
            nets = self.swa_nets

        adaptive = q_sd is None or q_sd <= 0
        q0 = 1.0 if adaptive else float(q_sd)

        if estimator not in ("plugin", "dr"):
            raise ValueError(f"Unknown estimator: {estimator!r} "
                             "(expected 'plugin' or 'dr').")
        early_stop = None
        if ess_target is not None:
            if sampler != "mh":
                raise ValueError("ess_target requires sampler='mh' (early "
                                 "stopping hooks the chunked MH chain).")
            early_stop = dict(min_ess=float(ess_target),
                              max_rhat=float(ess_rhat))

        print("MCMC Latent Variable Sampling ...")

        if mesh is not None:
            from bayesgm_tpu.parallel import replicate

            nets = replicate(nets, mesh)

        if sampler == "mh":
            # Params-mode target: weights/data are jit ARGUMENTS, so every
            # predict (and every same-shape batch) reuses one compiled chain
            # program — no per-call retrace; BNN steps evaluate proposed +
            # current in ONE stacked fused-kernel launch (plp).
            lp, plp, make_params, make_multi_step = self._make_param_log_prob(
                mesh=mesh)
            # K-steps-per-launch burn-in kernel: measured SLOWER than the
            # paired per-step path on the v5e (two serialized n-row evals per
            # step pipeline worse than one flat 2n-row launch; RESULTS.md) —
            # opt-in via params['mh_window_kernel'] for future hardware.
            use_window_kernel = bool(self.params.get("mh_window_kernel", False))
            multi_step = (make_multi_step(50)
                          if use_window_kernel and make_multi_step is not None
                          else None)
            if estimator == "dr":
                if cfg.binary_treatment:
                    raise ValueError(
                        "estimator='dr' supports continuous treatment only "
                        "(the kernel-AIPW correction targets the ADRF).")
                if dr_bw is None:
                    dr_bw = float(1.06 * np.std(data_x)
                                  * max(n_test, 2) ** (-0.2))
                collect_p = _dr_effect_collector_p(cfg, x_values,
                                                   float(dr_bw),
                                                   float(dr_gps_floor))
            else:
                collect_p = _effect_collector_p(cfg, x_values, sample_y)
            xv_key = None if x_values is None else tuple(np.asarray(x_values).tolist())
            jit_cache = self._jit_cache(
                ("mh_chain_jit", xv_key, bool(sample_y), estimator,
                 None if estimator != "dr" else (float(dr_bw),
                                                 float(dr_gps_floor)),
                 None if mesh is None else str(mesh)), dict)
        else:
            if estimator == "dr":
                raise ValueError(
                    "estimator='dr' requires sampler='mh' (the params-mode "
                    "chain carries the observed (x, y) the correction needs).")
            collect = _effect_collector(cfg, nets, x_values, sample_y)

        def run_batch(bx, by, bv):
            bx, by, bv = jnp.asarray(bx), jnp.asarray(by), jnp.asarray(bv)
            init = jax.random.normal(self._next_key(), (bx.shape[0], sum(cfg.z_dims)))
            if mesh is not None:
                from bayesgm_tpu.parallel import shard_rows

                bx, by, bv, init = (shard_rows(a, mesh) for a in (bx, by, bv, init))
            if sampler == "mala":
                # Gradient-informed Langevin proposals (beyond-reference):
                # adapts toward the MALA-optimal ~0.574 acceptance.  For the
                # stochastic flipout target (use_bnn) the chain re-evaluates
                # BOTH sides of the accept ratio with fresh noise keys every
                # step (recompute_current — the MALA analogue of what the MH
                # path does); on TPU each evaluation is one fused
                # forward+backward Pallas launch
                # (make_fused_causal_logp_and_grad_bnn_hosteps), so a BNN-MALA step
                # costs two kernel launches.  Caching the current logp (the
                # deterministic-target fast path) would bias a stochastic
                # chain toward lucky noise draws.
                log_prob = self._make_log_prob(bx, by, bv, differentiable=True,
                                               nets=nets, mesh=mesh)
                res = mcmc.adaptive_mala(
                    log_prob, init, self._next_key(), burn_in=burn_in,
                    n_keep=n_mcmc, step_size=0.1,
                    recompute_current=cfg.use_bnn, collect=collect)
            else:
                paired = cfg.use_bnn and plp is not None
                params = make_params(nets, (bx, by, bv), paired)
                res = mcmc.adaptive_mh(
                    lp, init, self._next_key(), burn_in=burn_in, n_keep=n_mcmc,
                    q_sd=q0, adaptive=adaptive, recompute_current=cfg.use_bnn,
                    collect=collect_p, paired_log_prob_fn=plp if paired else None,
                    multi_step_fn=multi_step if mesh is None else None,
                    params=params, jit_cache=jit_cache, early_stop=early_stop)
            print(f"Final MCMC Acceptance Rate: {float(res.accept_rate):.4f}")
            return np.asarray(res.samples), float(res.accept_rate)

        return self._aggregate_predict(run_batch, (data_x, data_y, data_v),
                                       alpha, n_mcmc, bs, x_values,
                                       return_diagnostics,
                                       return_draws=return_draws)

    def _aggregate_predict(self, run_batch, data, alpha, n_mcmc, bs, x_values,
                           return_diagnostics, return_draws=False):
        """Shared predict aggregation (base + identifiable): batch subjects
        through ``run_batch -> (effect_draws, accept_rate)``, assemble the
        point estimate + ``[alpha/2, 1-alpha/2]`` intervals, and optionally
        the ESS / split-R̂ / pooled-acceptance diagnostics.

        Batching is exact for deterministic targets: per-subject chains are
        then independent whether they share one launch or not (the
        reference's "full-data chain", base.py:860-898, is n independent
        random-walk chains stepped in lockstep), so combining batches at a
        common draw index reproduces the unbatched draw-series law.  For
        stochastic (flipout) targets the shared per-launch eps couples
        accept decisions within a launch, so batching slightly narrows
        subject-averaged (ADRF) intervals vs one full-data launch — see the
        ``predict`` docstring.  Diagnostics for the
        continuous case are computed per batch-chain and aggregated
        conservatively (elementwise min ESS / max R̂ across batches) — never
        on a cross-batch average, which would overstate mixing.

        ``return_draws=True`` appends the raw effect draw matrix (binary:
        ``(n_mcmc, n_test)``; continuous: ``(len(x_values), n_mcmc)``) so
        callers (e.g. the ensemble) can pool draws instead of summaries.
        """
        data_x, data_y, data_v = data
        n_test = len(data_x)
        accept_rates = []

        if self.cfg.binary_treatment:
            ite_mean = np.zeros(n_test, np.float32)
            upper = np.zeros(n_test, np.float32)
            lower = np.zeros(n_test, np.float32)
            ess = np.zeros(n_test, np.float32) if return_diagnostics else None
            rhat = np.zeros(n_test, np.float32) if return_diagnostics else None
            draws_k = [] if return_draws else None
            for start in range(0, n_test, bs):
                end = min(start + bs, n_test)
                effects, rate = run_batch(data_x[start:end], data_y[start:end],
                                          data_v[start:end])
                accept_rates.append((rate, end - start))
                # Per-subject stats are valid on whatever draw count the
                # batch returned (ESS-adaptive early stopping may stop
                # batches at different lengths).
                ite_mean[start:end] = effects.mean(axis=0)
                upper[start:end] = np.quantile(effects, 1 - alpha / 2, axis=0)
                lower[start:end] = np.quantile(effects, alpha / 2, axis=0)
                if return_draws:
                    draws_k.append(effects)
                if return_diagnostics:
                    d = mcmc.chain_diagnostics(effects)
                    ess[start:end] = d["ess"]
                    rhat[start:end] = d["rhat"]
            out = [ite_mean, np.stack([lower, upper], axis=1)]
            if return_diagnostics:
                out.append(dict(ess=ess, rhat=rhat,
                                accept_rate=self._pooled_rate(accept_rates)))
            if return_draws:
                # A common draw matrix needs a common length: truncate every
                # batch to the shortest (only differs under early stopping).
                t_min = min(e.shape[0] for e in draws_k)
                out.append(np.concatenate([e[:t_min] for e in draws_k],
                                          axis=1))
            return tuple(out)

        effects_k, weights = [], []
        ess_min, rhat_max = None, None
        for start in range(0, n_test, bs):
            end = min(start + bs, n_test)
            effects, rate = run_batch(data_x[start:end], data_y[start:end],
                                      data_v[start:end])
            accept_rates.append((rate, end - start))
            effects_k.append(effects)  # (n_draws, len(x_values))
            weights.append(end - start)
            if return_diagnostics:
                # Per-batch-chain diagnostics; the cross-batch average mixes
                # independent chains and would inflate ESS (advisor r2).
                d = mcmc.chain_diagnostics(effects.T, axis=1)
                ess_min = d["ess"] if ess_min is None else np.minimum(ess_min, d["ess"])
                rhat_max = d["rhat"] if rhat_max is None else np.maximum(rhat_max, d["rhat"])
        # Combine per-batch draws at a common draw index; with ESS-adaptive
        # early stopping batches may stop at different lengths — truncate to
        # the shortest (the combined series law is unchanged: chains are
        # independent and stationary past burn-in).
        t_min = min(e.shape[0] for e in effects_k)
        adrf_sums = sum(e[:t_min].T * w for e, w in zip(effects_k, weights))
        causal_effects = adrf_sums / float(sum(weights))
        adrf = causal_effects.mean(axis=1)
        upper = np.quantile(causal_effects, 1 - alpha / 2, axis=1)
        lower = np.quantile(causal_effects, alpha / 2, axis=1)
        out = [adrf, np.stack([lower, upper], axis=1)]
        if return_diagnostics:
            out.append(dict(ess=ess_min, rhat=rhat_max,
                            accept_rate=self._pooled_rate(accept_rates)))
        if return_draws:
            out.append(causal_effects)
        return tuple(out)

    @staticmethod
    def _pooled_rate(rates):
        """Subject-weighted mean acceptance over predict batches."""
        tot = sum(w for _, w in rates)
        return float(sum(r * w for r, w in rates) / max(tot, 1))
