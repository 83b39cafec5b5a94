"""Sharded training and inference steps for CausalBGM/BGM over a device mesh.

Design (new relative to the reference, which is single-device only):

- **Data-parallel full-batch step**: all ``n`` samples are processed as one
  global batch with rows sharded over the ``data`` mesh axis; network
  parameters are replicated, so XLA inserts a gradient all-reduce (psum) per
  net update.  The latent table and its Adam moments are sharded with the
  data — the latent update is purely row-local (zero communication).

- **Sharded MCMC**: chains are per-sample, so the chain state shards on rows;
  the only cross-chip traffic is the scalar acceptance-fraction mean that
  drives the adaptive proposal sd, plus the final effect reductions.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from bayesgm_tpu.models import causalbgm as cb
from bayesgm_tpu.ops import optim


def make_sharded_causal_train_step(cfg, mesh, axis_name: str = "data"):
    """A jitted full-data CausalBGM training step over ``mesh``.

    Returns ``step(nets, opts, z_table, z_opt, data, key) ->
    (nets, opts, z_table, z_opt, losses)`` with ``data = (x, y, v)`` and all
    (n, ...) arrays sharded on rows.
    """
    repl = NamedSharding(mesh, P())
    rows2 = NamedSharding(mesh, P(axis_name, None))

    def step(nets, opts, z_table, z_opt, data, key):
        x, y, v = data
        kg, kh, kf, kz = jax.random.split(key, 4)

        (loss_v, _), g_grads = jax.value_and_grad(
            lambda g: cb._loss_v(cfg, g, z_table, v, kg), has_aux=True)(nets["g"])
        new_g, opt_g = optim.adam_update(g_grads, opts["g"], nets["g"], cfg.lr_theta)

        (loss_x, _), h_grads = jax.value_and_grad(
            lambda h: cb._loss_x(cfg, h, z_table, x, kh), has_aux=True)(nets["h"])
        new_h, opt_h = optim.adam_update(h_grads, opts["h"], nets["h"], cfg.lr_theta)

        (loss_y, _), f_grads = jax.value_and_grad(
            lambda f: cb._loss_y(cfg, f, z_table, x, y, kf), has_aux=True)(nets["f"])
        new_f, opt_f = optim.adam_update(f_grads, opts["f"], nets["f"], cfg.lr_theta)

        nets2 = {**nets, "g": new_g, "h": new_h, "f": new_f}
        opts2 = {**opts, "g": opt_g, "h": opt_h, "f": opt_f}

        # Dense latent update: row-local, no communication.
        loss_post, z_grads = jax.value_and_grad(
            lambda zt: cb._latent_loss(cfg, nets2, zt, x, y, v, kz))(z_table)
        t = z_opt.t + 1
        tf_ = t.astype(jnp.float32)
        m = 0.9 * z_opt.m + 0.1 * z_grads
        v_ = 0.99 * z_opt.v + 0.01 * z_grads * z_grads
        lr_t = cfg.lr_z * jnp.sqrt(1 - 0.99**tf_) / (1 - 0.9**tf_)
        z_table2 = z_table - lr_t * m / (jnp.sqrt(v_) + optim.EPS)
        z_opt2 = optim.TableAdamState(m=m, v=v_, t=t)

        losses = dict(loss_v=loss_v, loss_x=loss_x, loss_y=loss_y, loss_postrior_z=loss_post)
        return nets2, opts2, z_table2, z_opt2, losses

    return jax.jit(
        step,
        in_shardings=(repl, repl, rows2, optim.TableAdamState(rows2, rows2, repl),
                      (rows2, rows2, rows2), repl),
        out_shardings=(repl, repl, rows2, optim.TableAdamState(rows2, rows2, repl), repl),
    )


def make_sharded_mh_predict(cfg, mesh, nets, data, x_values=None, sample_y=True,
                            axis_name: str = "data"):
    """Sharded adaptive-MH posterior inference: chain state sharded on rows.

    Returns ``run(key, burn_in, n_keep, q_sd) -> effect draws`` where the
    effects are ITE draws (n_keep, n) for binary treatment or ADRF grid draws
    (n_keep, len(x_values)) for continuous.
    """
    from bayesgm_tpu.ops import mcmc

    x, y, v = data
    collect = cb._effect_collector(cfg, nets, x_values, sample_y)

    def log_prob(z, key):
        return -cb._neg_log_posterior_rows(cfg, nets, z, x, y, v, key)

    rows2 = NamedSharding(mesh, P(axis_name, None))

    def run(key, burn_in=5000, n_keep=3000, q_sd=1.0):
        k_init, k_chain = jax.random.split(key)
        init = jax.random.normal(k_init, (x.shape[0], sum(cfg.z_dims)))
        init = jax.device_put(init, rows2)
        res = mcmc.adaptive_mh(log_prob, init, k_chain, burn_in=burn_in,
                               n_keep=n_keep, q_sd=q_sd,
                               recompute_current=cfg.use_bnn, collect=collect)
        return res

    return run
