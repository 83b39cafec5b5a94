"""MNISTBGM: BGM for 28x28x1 image data with a Bernoulli pixel likelihood.

TPU-native re-design of src/bayesgm/models/bgm/mnist.py:19-657.  Conv
encoder/generator/critic (ops/conv.py), logits clipped to +-10 everywhere the
Bernoulli likelihood appears, image-space gradient penalties over the spatial
axes, and pixel-level NaN-mask imputation flowing through the same fused HMC
path as the tabular BGM.
"""

from __future__ import annotations

import datetime
import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bayesgm_tpu.models.bgm import BGM, DEFAULTS as BGM_DEFAULTS
from bayesgm_tpu.ops import conv as cnn
from bayesgm_tpu.ops import distributions as dist
from bayesgm_tpu.ops import mcmc, nn, optim
from bayesgm_tpu.utils import checkpoint as ckpt_lib


class MNISTConfig(NamedTuple):
    z_dim: int
    use_bnn: bool
    kl_weight: float
    lr: float
    lr_theta: float
    lr_z: float
    gamma: float
    alpha: float
    g_d_freq: int


def _gen_apply(cfg, g, z, key):
    """Generator forward; flipout needs a key when use_bnn."""
    return cnn.mnist_generator_apply(g, z, key if cfg.use_bnn else None)


def _bernoulli_ll(x, logits):
    """sum over pixels of x*logits - softplus(logits), logits clipped +-10
    (mnist.py:118-122)."""
    logits = jnp.clip(logits, -10.0, 10.0)
    return jnp.sum(x * logits - jax.nn.softplus(logits), axis=(1, 2, 3))


def _g_loss(cfg, g, z, x, key):
    k_g, k_rep = jax.random.split(key)
    mu, var = _gen_apply(cfg, g, z, k_g)
    logits = nn.reparameterize(k_rep, mu, var)
    probs = jax.nn.sigmoid(logits)
    loss_mse = jnp.mean((x - probs) ** 2)
    loss = -jnp.mean(_bernoulli_ll(x, logits))
    if cfg.use_bnn:
        loss = loss + cnn.mnist_generator_kl(g) * cfg.kl_weight
    return loss, loss_mse


def _latent_loss(cfg, g, z, x, key):
    k_g, k_rep = jax.random.split(key)
    mu, var = _gen_apply(cfg, g, z, k_g)
    logits = nn.reparameterize(k_rep, mu, var)
    loss_px = -jnp.mean(_bernoulli_ll(x, logits))
    loss_prior = jnp.mean(dist.standard_normal_neg_log_prior(z))
    return loss_px + loss_prior


def _train_batch_step(cfg, carry, idx, key, data_x, lr_scale=1.0):
    g, opt_g, z_table, z_opt = carry
    bx = data_x[idx]
    bz = z_table[idx]
    kg, kz = jax.random.split(key)

    (loss_x, loss_mse), grads = jax.value_and_grad(
        lambda gp: _g_loss(cfg, gp, bz, bx, kg), has_aux=True)(g)
    g, opt_g = optim.adam_update(grads, opt_g, g, cfg.lr_theta * lr_scale)

    loss_post, z_grads = jax.value_and_grad(
        lambda zr: _latent_loss(cfg, g, zr, bx, kz))(bz)
    z_table, z_opt = optim.table_adam_update_rows(z_grads, idx, z_opt, z_table,
                                                  cfg.lr_z * lr_scale)

    losses = dict(loss_x=loss_x, loss_mse_x=loss_mse, loss_postrior_z=loss_post)
    return (g, opt_g, z_table, z_opt), losses


def _egm_disc_step(cfg, nets, opt_d, z, x, key):
    k_ez, k_ex, k_g, k_rep, k_dx1, k_dx2, k_dx3 = jax.random.split(key, 7)
    eps_z = jax.random.uniform(k_ez, ())
    eps_x = jax.random.uniform(k_ex, ())

    z_fake = cnn.mnist_encoder_apply(nets["e"], x)
    mu, var = _gen_apply(cfg, nets["g"], z, k_g)
    x_fake = jax.nn.sigmoid(nn.reparameterize(k_rep, mu, var))
    z_hat = z * eps_z + z_fake * (1.0 - eps_z)
    x_hat = x * eps_x + x_fake * (1.0 - eps_x)

    def d_loss_fn(sub):
        dz, dx = sub["dz"], sub["dx"]
        d_z_fake = nn.critic_apply(dz, z_fake)
        d_z_real = nn.critic_apply(dz, z)
        d_x_fake = cnn.mnist_discriminator_apply(dx, x_fake, k_dx1)
        d_x_real = cnn.mnist_discriminator_apply(dx, x, k_dx2)
        dz_loss = (jnp.mean((0.9 - d_z_real) ** 2) + jnp.mean((0.1 - d_z_fake) ** 2)) / 2.0
        dx_loss = (jnp.mean((0.9 - d_x_real) ** 2) + jnp.mean((0.1 - d_x_fake) ** 2)) / 2.0

        grad_z = jax.grad(lambda zh: jnp.sum(nn.critic_apply(dz, zh)))(z_hat)
        gpz = jnp.mean((jnp.sqrt(jnp.sum(grad_z**2, axis=1)) - 1.0) ** 2)
        grad_x = jax.grad(
            lambda xh: jnp.sum(cnn.mnist_discriminator_apply(dx, xh, k_dx3)))(x_hat)
        gpx = jnp.mean((jnp.sqrt(jnp.sum(grad_x**2, axis=(1, 2, 3))) - 1.0) ** 2)

        d_loss = dx_loss + dz_loss + cfg.gamma * (gpz + gpx)
        return d_loss, (dz_loss, dx_loss)

    sub = {"dz": nets["dz"], "dx": nets["dx"]}
    (d_loss, (dz_loss, dx_loss)), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(sub)
    new_sub, opt_d = optim.adam_update(grads, opt_d, sub, cfg.lr, b1=0.5, b2=0.9)
    return {**nets, **new_sub}, opt_d, dict(dz_loss=dz_loss, dx_loss=dx_loss, d_loss=d_loss)


def _egm_gen_step(cfg, nets, opt_ge, z, x, key):
    k_g, k_rep, k_g2, k_rep2, k_dx = jax.random.split(key, 5)

    def ge_loss_fn(sub):
        g, e = sub["g"], sub["e"]
        mu, var = _gen_apply(cfg, g, z, k_g)
        x_fake = jax.nn.sigmoid(nn.reparameterize(k_rep, mu, var))
        reg_loss = jnp.mean(var**2)
        z_fake = cnn.mnist_encoder_apply(e, x)

        z_rec = cnn.mnist_encoder_apply(e, x_fake)
        mu2, var2 = _gen_apply(cfg, g, z_fake, k_g2)
        x_rec = jax.nn.sigmoid(nn.reparameterize(k_rep2, mu2, var2))

        d_x_fake = cnn.mnist_discriminator_apply(nets["dx"], x_fake, k_dx)
        d_z_fake = nn.critic_apply(nets["dz"], z_fake)

        l2_loss_x = jnp.mean((x - x_rec) ** 2)
        l2_loss_z = jnp.mean((z - z_rec) ** 2)
        g_loss_adv = jnp.mean((0.9 - d_x_fake) ** 2)
        e_loss_adv = jnp.mean((0.9 - d_z_fake) ** 2)
        g_e_loss = g_loss_adv + e_loss_adv + 10.0 * (l2_loss_x + l2_loss_z) + cfg.alpha * reg_loss
        aux = dict(g_loss_adv=g_loss_adv, e_loss_adv=e_loss_adv, l2_loss_z=l2_loss_z,
                   l2_loss_x=l2_loss_x, reg_loss=reg_loss, g_e_loss=g_e_loss)
        return g_e_loss, aux

    sub = {"g": nets["g"], "e": nets["e"]}
    (_, aux), grads = jax.value_and_grad(ge_loss_fn, has_aux=True)(sub)
    new_sub, opt_ge = optim.adam_update(grads, opt_ge, sub, cfg.lr, b1=0.5, b2=0.9)
    return {**nets, **new_sub}, opt_ge, aux


def _egm_iter(cfg, carry, key, data_x, batch_size):
    nets, opt_d, opt_ge = carry
    n = data_x.shape[0]
    keys = jax.random.split(key, cfg.g_d_freq + 1)
    d_losses = None
    for i in range(cfg.g_d_freq):
        k_idx, k_z, k_step = jax.random.split(keys[i], 3)
        idx = jax.random.randint(k_idx, (batch_size,), 0, n)
        batch_z = jax.random.normal(k_z, (batch_size, cfg.z_dim))
        nets, opt_d, d_losses = _egm_disc_step(cfg, nets, opt_d, batch_z, data_x[idx], k_step)
    k_idx, k_z, k_step = jax.random.split(keys[-1], 3)
    idx = jax.random.randint(k_idx, (batch_size,), 0, n)
    batch_z = jax.random.normal(k_z, (batch_size, cfg.z_dim))
    nets, opt_ge, g_losses = _egm_gen_step(cfg, nets, opt_ge, batch_z, data_x[idx], k_step)
    return (nets, opt_d, opt_ge), {**d_losses, **g_losses}


class MNISTBGM(BGM):
    """BGM for MNIST-shaped image data ``(n, 28, 28, 1)`` in [0, 1].

    Same params as :class:`BGM` (``x_dim`` = 784 for the flattened image).
    """

    def __init__(self, params, timestamp=None, random_seed=None):
        merged = dict(BGM_DEFAULTS)
        merged.update(params)
        merged.setdefault("x_dim", 784)
        self.params = merged
        p = merged
        self.cfg = MNISTConfig(
            z_dim=int(p["z_dim"]), use_bnn=bool(p["use_bnn"]),
            kl_weight=float(p.get("kl_weight", 1.0 / 60000)), lr=float(p["lr"]),
            lr_theta=float(p["lr_theta"]), lr_z=float(p["lr_z"]),
            gamma=float(p["gamma"]), alpha=float(p["alpha"]), g_d_freq=int(p["g_d_freq"]))
        from bayesgm_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        seed = 42 if random_seed is None else int(random_seed)
        self._key = jax.random.PRNGKey(seed)

        kg, ke, kdz, kdx = self._next_key(4)
        self.nets = {
            "g": cnn.init_mnist_generator(kg, cfg_z := self.cfg.z_dim, filters=32,
                                          use_bnn=self.cfg.use_bnn),
            "e": cnn.init_mnist_encoder(ke, cfg_z, filters=32),
            "dz": nn.init_critic(kdz, cfg_z, p["dz_units"]),
            "dx": cnn.init_mnist_discriminator(kdx, filters=64),
        }
        self.opt_g = optim.adam_init(self.nets["g"])
        self._opt_d = optim.adam_init({"dz": self.nets["dz"], "dx": self.nets["dx"]})
        self._opt_ge = optim.adam_init({"g": self.nets["g"], "e": self.nets["e"]})

        self.data_z = None
        self.history_loss = []
        self.timestamp = timestamp or datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        self.checkpoint_path = "{}/checkpoints/{}/{}".format(p["output_dir"], p["dataset"], self.timestamp)
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

    # -- checkpointable training state --------------------------------------

    def _restore_template(self):
        return {"nets": self.nets}

    def _apply_restore(self, restored):
        self.nets = restored["nets"]

    def _full_state_template(self, n):
        z = jnp.zeros((n, self.cfg.z_dim), jnp.float32)
        return {
            "nets": self.nets,
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
        self.opt_g = state["opt_g"]
        self._opt_d = state["opt_d"]
        self._opt_ge = state["opt_ge"]
        self.data_z = state["data_z"]
        self._key = state["key"]
        return state["z_opt"], int(state["epoch"])

    # -- EGM -------------------------------------------------------------------

    def egm_init(self, data, egm_n_iter=10000, batch_size=32, egm_batches_per_eval=500, verbose=1):
        data = jnp.asarray(data, jnp.float32)
        cfg = self.cfg

        @partial(jax.jit, static_argnames=("batch_size", "n_iters"))
        def chunk(carry, key, batch_size, n_iters):
            keys = jax.random.split(key, n_iters)
            step = partial(_egm_iter, cfg, data_x=data, batch_size=batch_size)
            carry, losses = jax.lax.scan(step, carry, keys)
            return carry, {k: v[-1] for k, v in losses.items()}

        print("EGM Initialization Starts ...")
        carry = (self.nets, self._opt_d, self._opt_ge)
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
            self.nets, self._opt_d, self._opt_ge = carry
            if verbose:
                # float() blocks on chunk completion; convert only when
                # printing so chunks pipeline (see CausalBGM.egm_init).
                losses = {k: float(v) for k, v in losses.items()}
                print("EGM Initialization Iter [%d] : g_loss_adv[%.4f], e_loss_adv [%.4f], "
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
                mse = float(self.evaluate(data, keys=k_eval))
                print("iter [%d/%d]: MSE_x: %.4f\n" % (done - 1, egm_n_iter, mse))
            if self.params["save_res"]:
                gen = self.generate(nb_samples=512)
                np.savez("%s/init_data_gen_at_%d.npz" % (self.save_dir, done - 1),
                         data_gen=np.asarray(gen))
        print("EGM Initialization Ends.")

    # -- Fit -------------------------------------------------------------------

    def fit(self, data, batch_size=32, epochs=100, epochs_per_eval=5, use_egm_init=True,
            egm_n_iter=10000, egm_batches_per_eval=500, verbose=1, mesh=None,
            egm_batch_size=None):
        """Train on images (n, 28, 28, 1) in [0, 1] (mnist.py:307-396).
        ``mesh`` row-shards images + latent table (see CausalBGM.fit);
        ``egm_batch_size`` sizes only the EGM warm-start batch (default:
        ``batch_size``)."""
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
                z_init = cnn.mnist_encoder_apply(self.nets["e"], data)
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
            self.opt_g = replicate(self.opt_g, mesh)

        n_full = n // batch_size
        if n_full == 0:
            raise ValueError(f"batch_size={batch_size} exceeds n={n}; the MNIST fit "
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

        carry = (self.nets["g"], self.opt_g, self.data_z, z_opt)
        for epoch in tqdm(range(start_epoch, epochs + 1), desc="Epochs", unit="epoch",
                          disable=not verbose):
            k_perm, k_epoch = self._next_key(2)
            perm = jax.random.permutation(k_perm, n)
            idx_matrix = perm[: n_full * batch_size].reshape(n_full, batch_size)
            carry, losses = epoch_fn(carry, idx_matrix, k_epoch,
                                     optim.lr_schedule_scale(decay, epoch, epochs))

            if epoch % epochs_per_eval == 0:
                g, opt_g, z_table, z_opt = carry
                self.nets = {**self.nets, "g": g}
                self.opt_g, self.data_z = opt_g, z_table
                mse_x = float(self.evaluate(data, data_z=self.data_z))
                self.history_loss.append(mse_x)
                if verbose:
                    print("Epoch [%d/%d]: MSE_x: %.4f\n" % (epoch, epochs, mse_x))
                if self.params["save_model"]:
                    path = ckpt_lib.save_checkpoint(
                        self.checkpoint_path, epoch,
                        self._full_state_bundle(z_opt, epoch), max_to_keep=100)
                    print(f"Saving checkpoint for epoch {epoch} at {path}")
                if self.params["save_res"]:
                    gen = self.generate(nb_samples=512)
                    np.savez("%s/data_gen_at_%d.npz" % (self.save_dir, epoch),
                             gen=np.asarray(gen), z=np.asarray(self.data_z))

        g, opt_g, z_table, z_opt = carry
        self.nets = {**self.nets, "g": g}
        self.opt_g, self.data_z = opt_g, z_table

    # -- Evaluation / generation -----------------------------------------------

    def evaluate(self, data, data_z=None, keys=None):
        """Pixel MSE through encoder + generator (mnist.py:398-423)."""
        data = jnp.asarray(data, jnp.float32)
        if data_z is None:
            data_z = cnn.mnist_encoder_apply(self.nets["e"], data)
        kg, kr = self._next_key(2) if keys is None else keys
        mu, var = _gen_apply(self.cfg, self.nets["g"], data_z, kg)
        probs = jax.nn.sigmoid(nn.reparameterize(kr, mu, var))
        return jnp.mean((data - probs) ** 2)

    def generate(self, nb_samples=1000):
        """Images (nb_samples, 28, 28, 1) with pixel values in [0, 1]."""
        kz, kg, kr = self._next_key(3)
        z = jax.random.normal(kz, (nb_samples, self.cfg.z_dim))
        mu, var = _gen_apply(self.cfg, self.nets["g"], z, kg)
        return jax.nn.sigmoid(nn.reparameterize(kr, mu, var))

    def predict_on_posteriors(self, data_posterior_z):
        z = jnp.asarray(data_posterior_z, jnp.float32)
        n_mcmc, n_samples = z.shape[0], z.shape[1]
        flat = z.reshape(-1, self.cfg.z_dim)
        kg, kr = self._next_key(2)
        mu, var = _gen_apply(self.cfg, self.nets["g"], flat, kg)
        probs = jax.nn.sigmoid(nn.reparameterize(kr, mu, var))
        return probs.reshape(n_mcmc, n_samples, 28, 28, 1)

    # -- Posterior inference ----------------------------------------------------

    def get_log_posterior(self, data_z, data_x, ind_x1=None, obs_mask=None, key=None):
        """Bernoulli log posterior with flattened-pixel gather
        (mnist.py:615-657)."""
        cfg = self.cfg
        data_z = jnp.asarray(data_z, jnp.float32)
        data_x = jnp.asarray(data_x, jnp.float32)
        if key is None:
            key = self._next_key()
        k_g, k_rep = jax.random.split(key)
        mu, var = _gen_apply(cfg, self.nets["g"], data_z, k_g)
        logits = jnp.clip(nn.reparameterize(k_rep, mu, var), -10.0, 10.0)
        n = data_x.shape[0]
        x_flat = data_x.reshape(n, -1)
        logits_flat = logits.reshape(n, -1)
        if ind_x1 is None:
            ll = jnp.sum(x_flat * logits_flat - jax.nn.softplus(logits_flat), axis=1)
        else:
            ind_x1 = jnp.asarray(ind_x1, jnp.int32)
            x_c = jnp.take_along_axis(x_flat, ind_x1, axis=1)
            l_c = jnp.take_along_axis(logits_flat, ind_x1, axis=1)
            term = x_c * l_c - jax.nn.softplus(l_c)
            if obs_mask is not None:
                term = term * obs_mask
            ll = jnp.sum(term, axis=1)
        return -dist.standard_normal_neg_log_prior(data_z) + ll

    def tfp_mcmc_sampler(self, data, ind_x1=None, n_mcmc=3000, burn_in=5000,
                         step_size=0.01, num_leapfrog_steps=10, seed=42, collect=None,
                         mesh=None, collect_p=None):
        """HMC over p(Z | X_obs) with the Bernoulli likelihood.  ``mesh``
        shards the per-image chains over the device mesh.  Explicit-params
        chain + per-model program cache as in :meth:`BGM.tfp_mcmc_sampler`."""
        data_np = np.asarray(data, np.float32)
        n = data_np.shape[0]
        flat_np = data_np.reshape(n, -1)
        data_dev = jnp.asarray(flat_np)
        # Dense pixel mask over the full 784-wide frame: scatter-free
        # leapfrog backward (see BGM.tfp_mcmc_sampler / hmc_mask_ab.py).
        dense_mask = self._prep_obs_dense_mask(flat_np, ind_x1,
                                               flat_np.shape[1])
        cfg, nets = self.cfg, self.nets
        if mesh is not None:
            from bayesgm_tpu.parallel import replicate, shard_rows

            data_dev = shard_rows(data_dev, mesh)
            if dense_mask is not None:
                dense_mask = shard_rows(dense_mask, mesh)
            nets = replicate(nets, mesh)

        has_ind = dense_mask is not None

        def log_prob(params, z, key):
            k_g, k_rep = jax.random.split(key)
            mu, var = _gen_apply(cfg, params["nets"]["g"], z, k_g)
            logits = jnp.clip(nn.reparameterize(k_rep, mu, var), -10.0, 10.0)
            logits_flat = logits.reshape(z.shape[0], -1)
            if not has_ind:
                ll = jnp.sum(params["data"] * logits_flat
                             - jax.nn.softplus(logits_flat), axis=1)
            else:
                ll = jnp.sum((params["data"] * logits_flat
                              - jax.nn.softplus(logits_flat))
                             * params["mask"], axis=1)
            return -dist.standard_normal_neg_log_prior(z) + ll

        params = {"nets": nets, "data": data_dev, "mask": dense_mask}
        if collect_p is not None:
            col = collect_p
            jit_cache = self._jit_cache(("hmc_chain_jit", has_ind), dict)
        elif collect is not None:
            col = lambda p, s, k: collect(s, k)
            jit_cache = None  # user closure: values are baked, don't cache
        else:
            col = None
            jit_cache = self._jit_cache(("hmc_chain_jit", has_ind), dict)

        init = jax.random.normal(jax.random.PRNGKey(seed), (n, cfg.z_dim))
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
        """Pixel-level inpainting with NaN-encoded missing pixels
        (mnist.py:467-613).  Each image's chain is independent, so subject
        batching is exact for per-pixel statistics; ``bs=None`` auto-sizes
        under a device budget for the (n_mcmc, bs, 784) sample cube
        (``BGM._resolve_impute_bs``; the reference's fixed ``bs=100`` is
        available explicitly).

        ``return_diagnostics=True`` appends a dict of ESS / split-R̂ arrays
        (image-shaped, NaN at observed pixels)."""
        assert 0 < alpha < 1, "The significance level 'alpha' must be greater than 0 and less than 1."
        data_np = np.asarray(data, np.float32)
        n = data_np.shape[0]
        bs = self._resolve_impute_bs(bs, n, n_mcmc, int(data_np[0].size))
        is_nan = np.isnan(data_np)
        data_clean = np.nan_to_num(data_np, nan=0.0)
        flat_obs = (~is_nan).reshape(n, -1)

        cfg = self.cfg

        def decode_p(params, z, key):
            k_g, k_rep = jax.random.split(key)
            mu, var = _gen_apply(cfg, params["nets"]["g"], z, k_g)
            return jax.nn.sigmoid(nn.reparameterize(k_rep, mu, var))

        cubes = []
        for start in range(0, n, bs):
            end = min(start + bs, n)
            ind_x1_list = [np.where(row)[0].tolist() for row in flat_obs[start:end]]
            cubes.append(np.asarray(self.tfp_mcmc_sampler(
                data=data_clean[start:end], ind_x1=ind_x1_list, n_mcmc=n_mcmc,
                burn_in=burn_in, step_size=step_size,
                num_leapfrog_steps=num_leapfrog_steps, seed=seed,
                collect_p=decode_p, mesh=mesh)))
        data_x_pred_all = np.concatenate(cubes, axis=1)  # (n_mcmc, n, 28, 28, 1)

        miss_flat = is_nan.reshape(n, -1)
        flat_pred = data_x_pred_all.reshape(data_x_pred_all.shape[0], n, -1)
        same_pattern = bool(np.all(miss_flat == miss_flat[0]))
        if same_pattern:
            miss_idx = np.where(miss_flat[0])[0]
            if miss_idx.size == 0:
                pred_interval = np.zeros((n, 0, 2), np.float32)
            else:
                pix = flat_pred[:, :, miss_idx]
                lower = np.quantile(pix, alpha / 2.0, axis=0)
                upper = np.quantile(pix, 1.0 - alpha / 2.0, axis=0)
                pred_interval = np.stack([lower, upper], axis=-1)
        else:
            pred_interval = []
            for i in range(n):
                miss_idx_i = np.where(miss_flat[i])[0]
                if miss_idx_i.size == 0:
                    pred_interval.append(np.zeros((0, 2), np.float32))
                    continue
                pix_i = flat_pred[:, i, miss_idx_i]
                lower_i = np.quantile(pix_i, alpha / 2.0, axis=0)
                upper_i = np.quantile(pix_i, 1.0 - alpha / 2.0, axis=0)
                pred_interval.append(np.stack([lower_i, upper_i], axis=-1))

        diag = (self._imputation_diagnostics(
                    flat_pred.reshape(flat_pred.shape[0], -1),
                    miss_flat.reshape(-1), is_nan.shape)
                if return_diagnostics else None)

        if return_samples:
            if return_diagnostics:
                return data_x_pred_all, pred_interval, diag
            return data_x_pred_all, pred_interval
        data_imputed = data_x_pred_all.mean(axis=0)
        data_imputed = np.where(is_nan, data_imputed, data_clean)
        if return_diagnostics:
            return data_imputed, pred_interval, diag
        return data_imputed, pred_interval
