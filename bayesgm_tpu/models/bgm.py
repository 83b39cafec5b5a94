"""BGM: Bayesian Generative Model for tabular data.

TPU-native re-design of the reference engine (src/bayesgm/models/bgm/
base.py:19-830): Z ~ N(0, I), X | Z ~ N(mu(Z), Sigma(Z)) trained by an
iterative algorithm alternating generator updates with per-sample latent
updates, warm-started by a dual (latent + data space) LSGAN, and queried via
HMC posterior inference over Z with NaN-encoded missing-data masks.

Architecture notes (vs. the reference):

- the per-batch training step (generator NLL update + latent-row update) is
  one jitted function scanned over an epoch on device (vs. two
  ``@tf.function`` dispatches + ``scatter_nd_update`` per batch,
  bgm/base.py:399-413);
- latent Adam moments are a persistent (n, z_dim) table (the reference
  re-creates a ``batch_z`` variable per batch, silently resetting moments);
- HMC (ops/mcmc.py) fuses the posterior-predictive decode into the chain:
  each kept step emits a reparameterized ``x`` draw, so imputation never
  materializes the (n_mcmc, n, z_dim) latent cube unless asked to.
"""

from __future__ import annotations

import datetime
import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bayesgm_tpu.ops import distributions as dist
from bayesgm_tpu.ops import mcmc, nn, optim
from bayesgm_tpu.utils import checkpoint as ckpt_lib


class BGMConfig(NamedTuple):
    x_dim: int
    z_dim: int
    use_bnn: bool
    kl_weight: float
    lr: float
    lr_theta: float
    lr_z: float
    gamma: float
    alpha: float
    g_d_freq: int


DEFAULTS = dict(
    use_bnn=False,
    g_units=[64, 64, 64, 64, 64],
    e_units=[64, 64, 64, 64, 64],
    dz_units=[64, 32, 8],
    dx_units=[64, 32, 8],
    lr=0.001,
    lr_theta=0.005,
    lr_z=0.005,
    gamma=0.0,
    alpha=0.0,
    g_d_freq=1,
    save_model=False,
    save_res=True,
    kl_weight=0.00005,
)


def _g_apply(cfg: BGMConfig, g, g_state, x, key, train: bool):
    """Generator forward: (mean, var, new_state)."""
    if cfg.use_bnn:
        return nn.flipout_variational_mlp_apply(g, x, key, state=g_state, train=train)
    return nn.variational_mlp_apply(g, x, state=g_state, train=train)


def _g_kl(cfg: BGMConfig, g):
    return nn.flipout_variational_mlp_kl(g) if cfg.use_bnn else 0.0


# ---------------------------------------------------------------------------
# Iterative-phase step
# ---------------------------------------------------------------------------


def _g_loss(cfg, g, g_state, z, x, key):
    """Gaussian NLL of the generator (update_g_net, bgm/base.py:145-164)."""
    mu, sigma_sq, new_state = _g_apply(cfg, g, g_state, z, key, train=True)
    loss_mse = jnp.mean((x - mu) ** 2)
    loss = jnp.mean(dist.gaussian_nll_diag(x, mu, sigma_sq))
    loss = loss + _g_kl(cfg, g) * cfg.kl_weight
    return loss, (loss_mse, new_state)


def _latent_loss(cfg, g, g_state, z, x, key):
    """-log p(x|z) - log p(z) (update_latent_variable_sgd, bgm/base.py:167-187)."""
    mu, sigma_sq, _ = _g_apply(cfg, g, g_state, z, key, train=True)
    loss_px = jnp.mean(dist.gaussian_nll_diag(x, mu, sigma_sq))
    loss_prior = jnp.mean(dist.standard_normal_neg_log_prior(z))
    return loss_px + loss_prior


def _train_batch_step(cfg: BGMConfig, carry, idx, key, data_x, lr_scale=1.0):
    g, g_state, opt_g, z_table, z_opt = carry
    bx = data_x[idx]
    bz = z_table[idx]
    kg, kz = jax.random.split(key)

    (loss_x, (loss_mse, g_state)), grads = jax.value_and_grad(
        lambda gp: _g_loss(cfg, gp, g_state, bz, bx, kg), has_aux=True)(g)
    g, opt_g = optim.adam_update(grads, opt_g, g, cfg.lr_theta * lr_scale)

    loss_post, z_grads = jax.value_and_grad(
        lambda zr: _latent_loss(cfg, g, g_state, zr, bx, kz))(bz)
    z_table, z_opt = optim.table_adam_update_rows(z_grads, idx, z_opt, z_table,
                                                  cfg.lr_z * lr_scale)

    losses = dict(loss_x=loss_x, loss_mse_x=loss_mse, loss_postrior_z=loss_post)
    return (g, g_state, opt_g, z_table, z_opt), losses


# ---------------------------------------------------------------------------
# EGM initialization (dual LSGAN, bgm/base.py:190-291)
# ---------------------------------------------------------------------------


def _egm_disc_step(cfg: BGMConfig, nets, g_state, opt_d, z, x, key):
    k_ez, k_ex, k_g, k_rep, k_e = jax.random.split(key, 5)
    eps_z = jax.random.uniform(k_ez, ())
    eps_x = jax.random.uniform(k_ex, ())

    z_fake = nn.mlp_apply(nets["e"], x)
    mu, sigma_sq, _ = _g_apply(cfg, nets["g"], g_state, z, k_g, train=True)
    x_fake = nn.reparameterize(k_rep, mu, sigma_sq)
    z_hat = z * eps_z + z_fake * (1.0 - eps_z)
    x_hat = x * eps_x + x_fake * (1.0 - eps_x)

    def d_loss_fn(sub):
        dz, dx = sub["dz"], sub["dx"]
        d_z_fake = nn.critic_apply(dz, z_fake)
        d_x_fake = nn.critic_apply(dx, x_fake)
        d_z_real = nn.critic_apply(dz, z)
        d_x_real = nn.critic_apply(dx, x)
        dz_loss = (jnp.mean((0.9 - d_z_real) ** 2) + jnp.mean((0.1 - d_z_fake) ** 2)) / 2.0
        dx_loss = (jnp.mean((0.9 - d_x_real) ** 2) + jnp.mean((0.1 - d_x_fake) ** 2)) / 2.0

        grad_z = jax.grad(lambda zh: jnp.sum(nn.critic_apply(dz, zh)))(z_hat)
        gpz = jnp.mean((jnp.sqrt(jnp.sum(grad_z**2, axis=1)) - 1.0) ** 2)
        grad_x = jax.grad(lambda xh: jnp.sum(nn.critic_apply(dx, xh)))(x_hat)
        gpx = jnp.mean((jnp.sqrt(jnp.sum(grad_x**2, axis=1)) - 1.0) ** 2)

        d_loss = dx_loss + dz_loss + cfg.gamma * (gpz + gpx)
        return d_loss, (dz_loss, dx_loss)

    sub = {"dz": nets["dz"], "dx": nets["dx"]}
    (d_loss, (dz_loss, dx_loss)), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(sub)
    new_sub, opt_d = optim.adam_update(grads, opt_d, sub, cfg.lr, b1=0.5, b2=0.9)
    return {**nets, **new_sub}, opt_d, dict(dz_loss=dz_loss, dx_loss=dx_loss, d_loss=d_loss)


def _egm_gen_step(cfg: BGMConfig, nets, g_state, opt_ge, z, x, key):
    k_g, k_rep, k_g2, k_rep2 = jax.random.split(key, 4)

    def ge_loss_fn(sub):
        g, e = sub["g"], sub["e"]
        mu, sigma_sq, new_state = _g_apply(cfg, g, g_state, z, k_g, train=True)
        x_fake = nn.reparameterize(k_rep, mu, sigma_sq)
        reg_loss = jnp.mean(sigma_sq**2)
        z_fake = nn.mlp_apply(e, x)

        z_rec = nn.mlp_apply(e, x_fake)
        mu2, sigma_sq2, new_state = _g_apply(cfg, g, new_state, z_fake, k_g2, train=True)
        x_rec = nn.reparameterize(k_rep2, mu2, sigma_sq2)

        d_x_fake = nn.critic_apply(nets["dx"], x_fake)
        d_z_fake = nn.critic_apply(nets["dz"], z_fake)

        l2_loss_x = jnp.mean((x - x_rec) ** 2)
        l2_loss_z = jnp.mean((z - z_rec) ** 2)
        g_loss_adv = jnp.mean((0.9 - d_x_fake) ** 2)
        e_loss_adv = jnp.mean((0.9 - d_z_fake) ** 2)
        g_e_loss = g_loss_adv + e_loss_adv + 10.0 * (l2_loss_x + l2_loss_z) + cfg.alpha * reg_loss
        aux = dict(g_loss_adv=g_loss_adv, e_loss_adv=e_loss_adv, l2_loss_z=l2_loss_z,
                   l2_loss_x=l2_loss_x, reg_loss=reg_loss, g_e_loss=g_e_loss,
                   _g_state=new_state)
        return g_e_loss, aux

    sub = {"g": nets["g"], "e": nets["e"]}
    (_, aux), grads = jax.value_and_grad(ge_loss_fn, has_aux=True)(sub)
    new_sub, opt_ge = optim.adam_update(grads, opt_ge, sub, cfg.lr, b1=0.5, b2=0.9)
    new_g_state = aux.pop("_g_state")
    return {**nets, **new_sub}, new_g_state, opt_ge, aux


def _egm_iter(cfg: BGMConfig, carry, key, data_x, batch_size):
    nets, g_state, opt_d, opt_ge = carry
    n = data_x.shape[0]
    keys = jax.random.split(key, cfg.g_d_freq + 1)

    d_losses = None
    for i in range(cfg.g_d_freq):
        k_idx, k_z, k_step = jax.random.split(keys[i], 3)
        idx = jax.random.randint(k_idx, (batch_size,), 0, n)
        batch_z = jax.random.normal(k_z, (batch_size, cfg.z_dim))
        nets, opt_d, d_losses = _egm_disc_step(cfg, nets, g_state, opt_d, batch_z, data_x[idx], k_step)

    k_idx, k_z, k_step = jax.random.split(keys[-1], 3)
    idx = jax.random.randint(k_idx, (batch_size,), 0, n)
    batch_z = jax.random.normal(k_z, (batch_size, cfg.z_dim))
    nets, g_state, opt_ge, g_losses = _egm_gen_step(cfg, nets, g_state, opt_ge, batch_z, data_x[idx], k_step)
    return (nets, g_state, opt_d, opt_ge), {**d_losses, **g_losses}


# ---------------------------------------------------------------------------
# Model class
# ---------------------------------------------------------------------------


class BGM:
    """Bayesian Generative Model for tabular data.

    Parameters
    ----------
    params : dict
        Required keys: ``'x_dim'``, ``'z_dim'``, ``'dataset'``,
        ``'output_dir'``.  Optional (defaults): ``'use_bnn'`` (False),
        ``'g_units'``/``'e_units'`` ([64]*5), ``'dz_units'``/``'dx_units'``
        ([64,32,8]), ``'lr'`` (1e-3), ``'lr_theta'`` (5e-3), ``'lr_z'`` (5e-3),
        ``'gamma'`` (0), ``'alpha'`` (0), ``'g_d_freq'`` (1), ``'save_model'``
        (False), ``'save_res'`` (True), ``'kl_weight'`` (5e-5),
        ``'lr_decay'`` (None | 'cosine' | 'linear' — iterative-phase lr
        schedule over the fit call's epoch horizon; the reference trains at a
        constant rate).
    """

    def __init__(self, params, timestamp=None, random_seed=None):
        merged = dict(DEFAULTS)
        merged.update(params)
        self.params = merged
        p = merged
        self.cfg = BGMConfig(
            x_dim=int(p["x_dim"]), z_dim=int(p["z_dim"]), use_bnn=bool(p["use_bnn"]),
            kl_weight=float(p["kl_weight"]), lr=float(p["lr"]), lr_theta=float(p["lr_theta"]),
            lr_z=float(p["lr_z"]), gamma=float(p["gamma"]), alpha=float(p["alpha"]),
            g_d_freq=int(p["g_d_freq"]))
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
        self.history_loss = []

        self.timestamp = timestamp
        if self.timestamp is None:
            self.timestamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        self.checkpoint_path = "{}/checkpoints/{}/{}".format(
            p["output_dir"], p["dataset"], self.timestamp)
        if p["save_model"] and not os.path.exists(self.checkpoint_path):
            os.makedirs(self.checkpoint_path)
        self.save_dir = "{}/results/{}/{}".format(p["output_dir"], p["dataset"], self.timestamp)
        if p["save_res"] and not os.path.exists(self.save_dir):
            os.makedirs(self.save_dir)

        self._resume_ckpt = ckpt_lib.latest_checkpoint(self.checkpoint_path)
        if self._resume_ckpt is not None:
            restored = ckpt_lib.restore_checkpoint(
                self._resume_ckpt, self._restore_template())
            self._apply_restore(restored)
            print("Latest checkpoint restored!!")

    def _next_key(self, num=1):
        self._key, *keys = jax.random.split(self._key, num + 1)
        return keys[0] if num == 1 else keys

    def _build_nets(self):
        cfg, p = self.cfg, self.params
        kg, ke, kdz, kdx = self._next_key(4)
        if cfg.use_bnn:
            g, g_state = nn.init_flipout_variational_mlp(kg, cfg.z_dim, cfg.x_dim, p["g_units"])
        else:
            g, g_state = nn.init_variational_mlp(kg, cfg.z_dim, cfg.x_dim, p["g_units"])
        self.nets = {
            "g": g,
            "e": nn.init_mlp(ke, cfg.x_dim, cfg.z_dim, p["e_units"]),
            "dz": nn.init_critic(kdz, cfg.z_dim, p["dz_units"]),
            "dx": nn.init_critic(kdx, cfg.x_dim, p["dx_units"]),
        }
        self.g_state = g_state
        self.opt_g = optim.adam_init(self.nets["g"])
        self._opt_d = optim.adam_init({"dz": self.nets["dz"], "dx": self.nets["dx"]})
        self._opt_ge = optim.adam_init({"g": self.nets["g"], "e": self.nets["e"]})

    # -- checkpointable training state --------------------------------------

    def _restore_template(self):
        return {"nets": self.nets, "g_state": self.g_state}

    def _apply_restore(self, restored):
        self.nets = restored["nets"]
        self.g_state = restored["g_state"]

    def _full_state_template(self, n):
        z = jnp.zeros((n, self.cfg.z_dim), jnp.float32)
        return {
            "nets": self.nets,
            "g_state": self.g_state,
            "opt_g": self.opt_g,
            "opt_d": self._opt_d,
            "opt_ge": self._opt_ge,
            "data_z": z,
            "z_opt": optim.table_adam_init(z),
            "key": self._key,
            "epoch": jnp.zeros((), jnp.int32),
        }

    def _full_state_bundle(self, z_opt, epoch):
        return {
            "nets": self.nets,
            "g_state": self.g_state,
            "opt_g": self.opt_g,
            "opt_d": self._opt_d,
            "opt_ge": self._opt_ge,
            "data_z": self.data_z,
            "z_opt": z_opt,
            "key": self._key,
            "epoch": jnp.asarray(epoch, jnp.int32),
        }

    def _apply_full_state(self, state):
        self.nets = state["nets"]
        self.g_state = state["g_state"]
        self.opt_g = state["opt_g"]
        self._opt_d = state["opt_d"]
        self._opt_ge = state["opt_ge"]
        self.data_z = state["data_z"]
        self._key = state["key"]
        return state["z_opt"], int(state["epoch"])

    def _try_resume(self, n):
        """Full-state resume from the latest checkpoint (see
        CausalBGM._try_resume); returns ``(z_opt, start_epoch)`` or None."""
        if getattr(self, "_resume_ckpt", None) is None:
            return None
        if not ckpt_lib.has_group(self._resume_ckpt, "data_z"):
            return None
        try:
            state = ckpt_lib.restore_checkpoint(self._resume_ckpt, self._full_state_template(n))
        except (KeyError, ValueError) as e:
            print(f"Full-state resume unavailable ({e}); continuing with restored weights only.")
            return None
        z_opt, epoch = self._apply_full_state(state)
        print(f"Resuming training from checkpoint at epoch {epoch}.")
        return z_opt, epoch + 1

    def get_config(self):
        """Return ``{"params": params}``."""
        return {"params": self.params}

    def save_weights(self, path: str):
        """Save networks + generator BN state (and latent table if fitted)."""
        bundle = {"nets": self.nets, "g_state": self.g_state}
        if self.data_z is not None:
            bundle["data_z"] = self.data_z
        return ckpt_lib.save_pytree(path, bundle)

    def load_weights(self, path: str):
        """Restore parameters saved by :meth:`save_weights`."""
        import numpy as _np

        self.nets = ckpt_lib.restore_checkpoint(path, {"nets": self.nets})["nets"]
        self.g_state = ckpt_lib.restore_checkpoint(path, {"nets": self.nets, "g_state": self.g_state})["g_state"]
        with _np.load(path) as d:
            if "['data_z']" in d:
                self.data_z = jnp.asarray(d["['data_z']"])
        return self

    def initialize_nets(self, print_summary: bool = False):
        if print_summary:
            n_params = sum(x.size for x in jax.tree.leaves(self.nets["g"]))
            print(f"g_net: {n_params} parameters")

    # -- EGM ------------------------------------------------------------------

    def egm_init(self, data, egm_n_iter=10000, batch_size=32, egm_batches_per_eval=500, verbose=1):
        """Dual-LSGAN warm-start of encoder + generator (reference egm_init,
        bgm/base.py:294-340)."""
        data = jnp.asarray(data, jnp.float32)
        cfg = self.cfg

        @partial(jax.jit, static_argnames=("batch_size", "n_iters"))
        def chunk(carry, key, batch_size, n_iters):
            keys = jax.random.split(key, n_iters)
            step = partial(_egm_iter, cfg, data_x=data, batch_size=batch_size)
            carry, losses = jax.lax.scan(step, carry, keys)
            return carry, {k: v[-1] for k, v in losses.items()}

        print("EGM Initialization Starts ...")
        carry = (self.nets, self.g_state, self._opt_d, self._opt_ge)
        done, total = 0, egm_n_iter + 1
        inner = 500  # fixed inner scan length -> stable compiled program
        while done < total:
            n_eval = min(egm_batches_per_eval, total - done)
            remaining = n_eval
            losses = None
            while remaining > 0:
                n_iters = min(inner, remaining)
                carry, losses = chunk(carry, self._next_key(), batch_size=batch_size, n_iters=n_iters)
                remaining -= n_iters
            done += n_eval
            self.nets, self.g_state, self._opt_d, self._opt_ge = carry
            if verbose:
                # float() blocks on chunk completion; convert only when
                # printing so chunks pipeline (see CausalBGM.egm_init).
                losses = {k: float(v) for k, v in losses.items()}
                print(
                    "EGM Initialization Iter [%d] : g_loss_adv[%.4f], e_loss_adv [%.4f], "
                    "l2_loss_z [%.4f], l2_loss_x [%.4f], sd^2_loss[%.4f], g_e_loss [%.4f], "
                    "dz_loss [%.4f], dx_loss[%.4f], d_loss [%.4f]"
                    % (done - 1, losses["g_loss_adv"], losses["e_loss_adv"], losses["l2_loss_z"],
                       losses["l2_loss_x"], losses["reg_loss"], losses["g_e_loss"],
                       losses["dz_loss"], losses["dx_loss"], losses["d_loss"]))
            # Logging-only evaluate: skip the compute when nothing consumes
            # it, but advance the chain keys unconditionally so streams stay
            # bit-identical (see CausalBGM.egm_init).
            k_eval = self._next_key(2)
            if verbose:
                mse = float(self.evaluate(data, use_x_sd=True, keys=k_eval))
                print("iter [%d/%d]: MSE_x: %.4f\n" % (done - 1, egm_n_iter, mse))
            if self.params["save_res"]:
                gen1, var1 = self.generate(nb_samples=5000)
                gen12, var12 = self.generate(nb_samples=5000, use_x_sd=False)
                z_enc = nn.mlp_apply(self.nets["e"], data)
                np.savez("%s/init_data_gen_at_%d.npz" % (self.save_dir, done - 1),
                         gen1=np.asarray(gen1), gen12=np.asarray(gen12),
                         z=np.asarray(z_enc), var1=np.asarray(var1), var12=np.asarray(var12))
        print("EGM Initialization Ends.")

    # -- Fit ---------------------------------------------------------------------

    def fit(self, data, batch_size=32, epochs=100, epochs_per_eval=5, use_egm_init=True,
            egm_n_iter=20000, egm_batches_per_eval=500, verbose=1, mesh=None,
            egm_batch_size=None):
        """Train the BGM (reference fit, bgm/base.py:343-442): optional EGM
        warm-start, then per-epoch jitted scans alternating generator and
        latent updates (incomplete last batch skipped, as in the reference).

        ``mesh`` row-shards the dataset, latent table, and latent Adam
        moments over a 1-D device mesh with parameters replicated (see
        CausalBGM.fit).  ``egm_batch_size`` sizes only the EGM warm-start
        batch (default: ``batch_size``); per-iteration cost is flat in
        batch size on TPU, so equal-sample-visit schedules with fewer
        serial steps run proportionally faster (RESULTS.md round 5).
        """
        data = jnp.asarray(data, jnp.float32)
        n = data.shape[0]
        cfg = self.cfg

        if self.params["save_res"]:
            with open(f"{self.save_dir}/params.txt", "w") as f:
                f.write(str(self.params))

        resume = self._try_resume(n)
        if resume is not None:
            z_opt, start_epoch = resume
        else:
            start_epoch = 0
            if use_egm_init:
                self.egm_init(data, egm_n_iter=egm_n_iter,
                              batch_size=egm_batch_size or batch_size,
                              egm_batches_per_eval=egm_batches_per_eval, verbose=verbose)
                print("Initialize latent variables Z with e(V)...")
                z_init = nn.mlp_apply(self.nets["e"], data)
            else:
                print("Random initialization of latent variables Z...")
                z_init = jax.random.normal(self._next_key(), (n, cfg.z_dim))
            self.data_z = z_init
            z_opt = optim.table_adam_init(self.data_z)

        if mesh is not None:
            from bayesgm_tpu.parallel import replicate, shard_rows

            data = shard_rows(data, mesh)
            self.data_z = shard_rows(self.data_z, mesh)
            z_opt = optim.TableAdamState(
                m=shard_rows(z_opt.m, mesh), v=shard_rows(z_opt.v, mesh),
                t=replicate(z_opt.t, mesh))
            self.nets = replicate(self.nets, mesh)
            self.g_state = replicate(self.g_state, mesh)
            self.opt_g = replicate(self.opt_g, mesh)

        n_full = n // batch_size
        if n_full == 0:
            raise ValueError(f"batch_size={batch_size} exceeds n={n}; the BGM fit "
                             "skips incomplete batches (as the reference does).")

        @jax.jit
        def epoch_fn(carry, idx_matrix, key, lr_scale):
            keys = jax.random.split(key, idx_matrix.shape[0])
            step = partial(_train_batch_step, cfg, data_x=data, lr_scale=lr_scale)
            carry, losses = jax.lax.scan(lambda c, xs: step(c, xs[0], xs[1]), carry,
                                         (idx_matrix, keys))
            return carry, {k: v[-1] for k, v in losses.items()}

        self.history_loss = []
        print("Iterative Updating Starts ...")
        from tqdm import tqdm

        # Optional lr schedule (params['lr_decay']) — same semantics as
        # CausalBGM.fit: traced scalar, horizon = this call's epochs.
        decay = self.params.get("lr_decay")

        carry = (self.nets["g"], self.g_state, self.opt_g, self.data_z, z_opt)
        for epoch in tqdm(range(start_epoch, epochs + 1), desc="Epochs", unit="epoch",
                          disable=not verbose):
            k_perm, k_epoch = self._next_key(2)
            perm = jax.random.permutation(k_perm, n)
            idx_matrix = perm[: n_full * batch_size].reshape(n_full, batch_size)
            carry, losses = epoch_fn(carry, idx_matrix, k_epoch,
                                     optim.lr_schedule_scale(decay, epoch, epochs))

            if epoch % epochs_per_eval == 0:
                g, g_state, opt_g, z_table, z_opt = carry
                self.nets = {**self.nets, "g": g}
                self.g_state, self.opt_g, self.data_z = g_state, opt_g, z_table
                mse_x = float(self.evaluate(data, data_z=self.data_z))
                self.history_loss.append(mse_x)
                if verbose:
                    print("Epoch [%d/%d]: MSE_x: %.4f\n" % (epoch, epochs, mse_x))
                if self._metrics is not None:
                    self._metrics.log("eval", epoch=epoch, mse_x=mse_x)
                if self.params["save_model"]:
                    path = ckpt_lib.save_checkpoint(
                        self.checkpoint_path, epoch,
                        self._full_state_bundle(z_opt, epoch), max_to_keep=100)
                    print(f"Saving checkpoint for epoch {epoch} at {path}")
                if self.params["save_res"]:
                    gen1, var1 = self.generate(nb_samples=5000)
                    gen12, var12 = self.generate(nb_samples=5000, use_x_sd=False)
                    np.savez("%s/data_gen_at_%d.npz" % (self.save_dir, epoch),
                             gen1=np.asarray(gen1), gen12=np.asarray(gen12),
                             z=np.asarray(self.data_z), var1=np.asarray(var1),
                             var12=np.asarray(var12))

        g, g_state, opt_g, z_table, z_opt = carry
        self.nets = {**self.nets, "g": g}
        self.g_state, self.opt_g, self.data_z = g_state, opt_g, z_table

    # -- Evaluation / generation ---------------------------------------------------

    def evaluate(self, data, data_z=None, use_x_sd=True, keys=None):
        """Reconstruction MSE through encoder + generator (reference
        bgm/base.py:444-476); eval-mode BatchNorm statistics.  ``keys``
        lets callers that already advanced the PRNG chain pass the two
        drawn keys in (egm_init's logging slot)."""
        data = jnp.asarray(data, jnp.float32)
        cfg = self.cfg
        if data_z is None:
            data_z = nn.mlp_apply(self.nets["e"], data)
        kg, kr = self._next_key(2) if keys is None else keys
        mu, sigma_sq, _ = _g_apply(cfg, self.nets["g"], self.g_state, data_z, kg, train=False)
        x_pred = nn.reparameterize(kr, mu, sigma_sq) if use_x_sd else mu
        return jnp.mean((data - x_pred) ** 2)

    def generate(self, nb_samples=1000, use_x_sd=True):
        """Sample synthetic data from the prior (reference bgm/base.py:478-509).

        Returns ``(data_x_gen, sigma_square_x)``.
        """
        kz, kg, kr = self._next_key(3)
        z = jax.random.normal(kz, (nb_samples, self.cfg.z_dim))
        mu, sigma_sq, _ = _g_apply(self.cfg, self.nets["g"], self.g_state, z, kg, train=False)
        x = nn.reparameterize(kr, mu, sigma_sq) if use_x_sd else mu
        return x, sigma_sq

    @staticmethod
    def _imputation_diagnostics(flat_draws, miss_flat, out_shape):
        """ESS / split-R-hat of the posterior-predictive draw series at
        every missing entry (NaN elsewhere), shaped like the data.  Shared
        by the tabular and MNIST imputation predicts."""
        ess = np.full(out_shape, np.nan, np.float64)
        rhat = np.full(out_shape, np.nan, np.float64)
        if miss_flat.any():
            series = flat_draws[:, miss_flat]  # (n_mcmc, n_missing)
            d = mcmc.chain_diagnostics(series)
            mask = miss_flat.reshape(out_shape)
            ess[mask] = d["ess"]
            rhat[mask] = d["rhat"]
        return dict(ess=ess, rhat=rhat)

    def predict_on_posteriors(self, data_posterior_z):
        """Reparameterized decodes of posterior Z draws (reference
        bgm/base.py:511-525).  Input (n_mcmc, n, z_dim) -> (n_mcmc, n, x_dim)."""
        z = jnp.asarray(data_posterior_z, jnp.float32)
        n_mcmc, n_samples = z.shape[0], z.shape[1]
        flat = z.reshape(-1, self.cfg.z_dim)
        kg, kr = self._next_key(2)
        mu, sigma_sq, _ = _g_apply(self.cfg, self.nets["g"], self.g_state, flat, kg, train=False)
        x = nn.reparameterize(kr, mu, sigma_sq)
        return x.reshape(n_mcmc, n_samples, self.cfg.x_dim)

    # -- Posterior inference -----------------------------------------------------

    def _jit_cache(self, key, build):
        """Per-instance cache of jitted callables / compiled-chain caches."""
        cache = getattr(self, "_jitted", None)
        if cache is None:
            cache = self._jitted = {}
        if key not in cache:
            cache[key] = build()
        return cache[key]

    def _prep_obs_indices(self, data_np, ind_x1):
        """Build padded (n, K_max) index + mask tensors from ragged observed
        index lists (reference bgm/base.py:741-775)."""
        n = data_np.shape[0]
        if ind_x1 is None:
            return None, None
        if isinstance(ind_x1, (list, tuple)) and len(ind_x1) > 0 and isinstance(ind_x1[0], (list, tuple, np.ndarray)):
            assert len(ind_x1) == n, f"len(ind_x1)={len(ind_x1)} != n_samples={n}"
            max_len = max(len(row) for row in ind_x1)
            assert max_len > 0, "No observed features"
            ind_mat = np.zeros((n, max_len), np.int32)
            mask_mat = np.zeros((n, max_len), np.float32)
            for i, row in enumerate(ind_x1):
                L = len(row)
                if L > 0:
                    ind_mat[i, :L] = np.asarray(row, np.int32)
                    mask_mat[i, :L] = 1.0
            return jnp.asarray(ind_mat), jnp.asarray(mask_mat)
        arr = np.asarray(ind_x1, np.int32)
        if arr.ndim == 1:
            arr = np.broadcast_to(arr[None, :], (n, arr.shape[0]))
        elif arr.ndim != 2:
            raise ValueError("ind_x1 must be rank 1 or 2 if tensor-like.")
        return jnp.asarray(arr), jnp.ones(arr.shape, jnp.float32)

    def _resolve_impute_bs(self, bs, n, n_mcmc, flat_dim,
                           budget_bytes=2 * 2**30):
        """Resolve the predict subject-batch size.

        Imputation chains are independent per subject, so batching is exact
        — and after the dense-mask rewrite the chain step is near-flat in
        rows (benchmarks/hmc_mask_ab.py), so FEWER, larger launches are
        strictly faster.  ``bs=None`` (default) auto-sizes to all subjects,
        bounded by a ~2 GiB device budget for the kept sample cube
        ``(n_mcmc, bs, flat_dim)`` f32.  An explicit ``bs`` (the reference
        contract uses 100, bgm/base.py:630) is honored as-is.
        """
        if bs is not None:
            return max(1, int(bs))
        by_budget = max(1, int(budget_bytes // max(1, n_mcmc * flat_dim * 4)))
        return max(1, min(n, by_budget))

    def _prep_obs_dense_mask(self, data_np, ind_x1, width):
        """(n, width) 0/1 observed mask from ragged/shared index lists.

        The HMC chain target multiplies the FULL per-dimension NLL by this
        mask instead of gathering observed columns: identical log-posterior
        for duplicate-free index lists (missing entries contribute exactly
        0), but gather-free forward and — critically — scatter-free
        backward, which is what the per-leapfrog `jax.grad` differentiates
        (benchmarks/hmc_mask_ab.py)."""
        n = data_np.shape[0]
        if ind_x1 is None:
            return None
        dense = np.zeros((n, width), np.float32)
        if (isinstance(ind_x1, (list, tuple)) and len(ind_x1) > 0
                and isinstance(ind_x1[0], (list, tuple, np.ndarray))):
            assert len(ind_x1) == n, f"len(ind_x1)={len(ind_x1)} != n={n}"
            for i, row in enumerate(ind_x1):
                if len(row):
                    dense[i, np.asarray(row, np.int64)] = 1.0
        else:
            arr = np.asarray(ind_x1, np.int64)
            if arr.ndim == 1:
                dense[:, arr] = 1.0
            elif arr.ndim == 2:
                dense[np.arange(n)[:, None], arr] = 1.0
            else:
                raise ValueError("ind_x1 must be rank 1 or 2 if tensor-like.")
        return jnp.asarray(dense)

    def get_log_posterior(self, data_z, data_x, ind_x1=None, obs_mask=None, key=None):
        """log p(z | x_obs) up to a constant, with optional per-sample
        observed-index gather (reference bgm/base.py:665-705)."""
        cfg = self.cfg
        data_z = jnp.asarray(data_z, jnp.float32)
        data_x = jnp.asarray(data_x, jnp.float32)
        if key is None:
            key = self._next_key()
        mu, sigma_sq, _ = _g_apply(cfg, self.nets["g"], self.g_state, data_z, key, train=False)
        if ind_x1 is None:
            loss_px = dist.gaussian_nll_diag(data_x, mu, sigma_sq)
        else:
            ind_x1 = jnp.asarray(ind_x1, jnp.int32)
            x_c = jnp.take_along_axis(data_x, ind_x1, axis=1)
            mu_c = jnp.take_along_axis(mu, ind_x1, axis=1)
            s_c = jnp.take_along_axis(sigma_sq, ind_x1, axis=1)
            ll = (x_c - mu_c) ** 2 / (2.0 * s_c) + 0.5 * jnp.log(s_c)
            if obs_mask is not None:
                ll = ll * obs_mask
            loss_px = jnp.sum(ll, axis=1)
        loss_prior = dist.standard_normal_neg_log_prior(data_z)
        return -(loss_prior + loss_px)

    def tfp_mcmc_sampler(self, data, ind_x1=None, n_mcmc=3000, burn_in=5000,
                         step_size=0.01, num_leapfrog_steps=10, seed=42, collect=None,
                         mesh=None, collect_p=None):
        """HMC over p(Z | X_obs): n independent chains, adaptive step size
        over the first 80% of burn-in toward 0.75 acceptance (reference
        bgm/base.py:709-830).  Returns (n_mcmc, n, z_dim) samples, or the
        collected statistics when ``collect`` is given.  ``mesh`` shards the
        chains (data rows + state) over the device mesh.

        The chain runs in explicit-params mode: weights/data are jit
        arguments, so same-shape calls (every ``bs`` batch of ``predict``)
        reuse ONE compiled program.  ``collect_p(params, state, key)`` is the
        params-mode collector used internally by ``predict``; a closure-mode
        ``collect`` still works but disables the cross-call program cache
        (its captured values would go stale)."""
        data_np = np.asarray(data, np.float32)
        data_dev = jnp.asarray(data_np)
        # Dense (n, x_dim) observed mask instead of gathered columns: same
        # log-posterior, but the per-leapfrog backward pass is scatter-free
        # (take_along_axis differentiates to a scatter, the dominant cost of
        # the gather form — benchmarks/hmc_mask_ab.py).
        dense_mask = self._prep_obs_dense_mask(data_np, ind_x1,
                                               data_np.shape[1])
        cfg, nets, g_state = self.cfg, self.nets, self.g_state
        if mesh is not None:
            from bayesgm_tpu.parallel import replicate, shard_rows

            data_dev = shard_rows(data_dev, mesh)
            if dense_mask is not None:
                dense_mask = shard_rows(dense_mask, mesh)
            nets = replicate(nets, mesh)
            g_state = replicate(g_state, mesh)

        has_ind = dense_mask is not None

        def log_prob(params, z, key):
            mu, sigma_sq, _ = _g_apply(cfg, params["nets"]["g"], params["g_state"],
                                       z, key, train=False)
            if not has_ind:
                loss_px = dist.gaussian_nll_diag(params["data"], mu, sigma_sq)
            else:
                ll = ((params["data"] - mu) ** 2 / (2.0 * sigma_sq)
                      + 0.5 * jnp.log(sigma_sq)) * params["mask"]
                loss_px = jnp.sum(ll, axis=1)
            return -(dist.standard_normal_neg_log_prior(z) + loss_px)

        params = {"nets": nets, "g_state": g_state, "data": data_dev,
                  "mask": dense_mask}
        if collect_p is not None:
            col = collect_p
            jit_cache = self._jit_cache(("hmc_chain_jit", has_ind), dict)
        elif collect is not None:
            col = lambda p, s, k: collect(s, k)
            jit_cache = None  # user closure: values are baked, don't cache
        else:
            col = None
            jit_cache = self._jit_cache(("hmc_chain_jit", has_ind), dict)

        init = jax.random.normal(jax.random.PRNGKey(seed), (data_np.shape[0], cfg.z_dim))
        if mesh is not None:
            from bayesgm_tpu.parallel import shard_rows

            init = shard_rows(init, mesh)
        res = mcmc.hmc(log_prob, init, self._next_key(), burn_in=burn_in, n_keep=n_mcmc,
                       step_size=step_size, num_leapfrog=num_leapfrog_steps,
                       collect=col, params=params, jit_cache=jit_cache)
        print(f"TPU HMC Acceptance Rate: {float(res.accept_rate):.4f}")
        return res.samples

    def predict(self, data, alpha=0.05, return_samples=False, bs=None, n_mcmc=5000,
                burn_in=5000, step_size=0.01, num_leapfrog_steps=10, seed=42,
                mesh=None, return_diagnostics=False):
        """Posterior prediction with NaN-encoded missing data (reference
        bgm/base.py:527-663).

        Returns imputed data + per-missing-dim intervals, or the full
        posterior-predictive cube when ``return_samples=True``.  The decode
        is fused into the HMC scan: each kept step directly emits a
        reparameterized x draw.  Per-sample posterior statistics are exact
        under subject batching (independent chains); ``bs=None`` auto-sizes
        to all subjects under a device sample-cube budget — the dense-mask
        chain step is near-flat in rows, so one large launch is fastest
        (``_resolve_impute_bs``; the reference contract's fixed ``bs=100``,
        bgm/base.py:630, is available explicitly).

        ``return_diagnostics=True`` appends a dict with effective sample
        size and split-R̂ of the posterior-predictive draw series at every
        MISSING entry ((n, x_dim) arrays, NaN at observed entries) —
        convergence evidence the reference never reports.
        """
        assert 0 < alpha < 1, "The significance level 'alpha' must be greater than 0 and less than 1."
        data_np = np.asarray(data, np.float32)
        n = data_np.shape[0]
        bs = self._resolve_impute_bs(bs, n, n_mcmc, data_np.shape[1])
        is_nan = np.isnan(data_np)
        data_clean = np.nan_to_num(data_np, nan=0.0)

        cfg = self.cfg

        def decode_p(params, z, key):
            # Params-mode decode: weights flow through the cached chain
            # program, so every same-shape subject batch reuses one compile.
            k1, k2 = jax.random.split(key)
            mu, sigma_sq, _ = _g_apply(cfg, params["nets"]["g"], params["g_state"],
                                       z, k1, train=False)
            return nn.reparameterize(k2, mu, sigma_sq)

        cubes = []
        for start in range(0, n, bs):
            end = min(start + bs, n)
            ind_x1_list = [np.where(~row)[0].tolist() for row in is_nan[start:end]]
            cubes.append(np.asarray(self.tfp_mcmc_sampler(
                data=data_clean[start:end], ind_x1=ind_x1_list, n_mcmc=n_mcmc,
                burn_in=burn_in, step_size=step_size,
                num_leapfrog_steps=num_leapfrog_steps, seed=seed,
                collect_p=decode_p, mesh=mesh)))
        data_x_pred_all = np.concatenate(cubes, axis=1)  # (n_mcmc, n, x_dim)

        miss_mask = is_nan
        same_pattern = bool(np.all(miss_mask == miss_mask[0]))
        if same_pattern:
            miss_idx = np.where(miss_mask[0])[0]
            if miss_idx.size == 0:
                pred_interval = np.zeros((n, 0, 2), np.float32)
            else:
                dim_samples = data_x_pred_all[:, :, miss_idx]
                lower = np.quantile(dim_samples, alpha / 2.0, axis=0)
                upper = np.quantile(dim_samples, 1.0 - alpha / 2.0, axis=0)
                pred_interval = np.stack([lower, upper], axis=-1)
        else:
            pred_interval = []
            for i in range(n):
                miss_idx_i = np.where(miss_mask[i])[0]
                if miss_idx_i.size == 0:
                    pred_interval.append(np.zeros((0, 2), np.float32))
                    continue
                dim_samples_i = data_x_pred_all[:, i, miss_idx_i]
                lower_i = np.quantile(dim_samples_i, alpha / 2.0, axis=0)
                upper_i = np.quantile(dim_samples_i, 1.0 - alpha / 2.0, axis=0)
                pred_interval.append(np.stack([lower_i, upper_i], axis=-1))

        diag = (self._imputation_diagnostics(
                    data_x_pred_all.reshape(data_x_pred_all.shape[0], -1),
                    miss_mask.reshape(-1), miss_mask.shape)
                if return_diagnostics else None)

        if return_samples:
            if return_diagnostics:
                return data_x_pred_all, pred_interval, diag
            return data_x_pred_all, pred_interval
        data_imputed = data_x_pred_all.mean(axis=0)
        data_imputed = np.where(miss_mask, data_imputed, data_clean)
        if return_diagnostics:
            return data_imputed, pred_interval, diag
        return data_imputed, pred_interval
