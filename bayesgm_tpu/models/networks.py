"""Network facade: class-style wrappers over the functional cores.

The reference exposes network *classes* (src/bayesgm/models/networks/
__init__.py:1-38); the TPU-native building blocks live as pure functions over
pytrees in :mod:`bayesgm_tpu.ops.nn` / :mod:`bayesgm_tpu.ops.conv`.  These
thin wrappers bundle (params, apply) behind the familiar names for users
migrating from the reference; the model engines use the functional layer
directly.

Mapping:

- ``BaseFullyConnectedNet``        -> ops.nn.init_mlp / mlp_apply
- ``BaseVariationalNet``           -> ops.nn.init_variational_mlp / ..._apply
- ``BaseVariationalLowRankNet``    -> ops.nn.init_lowrank_variational_mlp
- ``Discriminator``                -> ops.nn.init_critic / critic_apply
- ``BayesianFullyConnectedNet``    -> ops.nn.init_flipout_mlp
- ``BayesianVariationalNet``       -> ops.nn.init_flipout_variational_mlp
- ``BayesianVariationalLowRankNet``-> ops.nn.init_flipout_lowrank_variational_mlp
- ``MCMCFullyConnectedNet``        -> a plain MLP + ravel_pytree flat-weight
                                      path (call_with_weights is just
                                      ``unravel`` + ``mlp_apply``)
- ``run_mcmc_for_net``             -> weight-space HMC via ops.mcmc.hmc
- ``MNISTEncoderConv/Generator/Discriminator`` -> ops.conv
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bayesgm_tpu.ops import conv as _conv
from bayesgm_tpu.ops import mcmc as _mcmc
from bayesgm_tpu.ops import nn as _nn


class _KeyedModule:
    """Base: owns params and a PRNG chain for stochastic forwards."""

    def __init__(self, seed: int = 0):
        self._key = jax.random.PRNGKey(seed)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _store_state(self, new_state):
        """Keep the BatchNorm running-stats side effect, but never capture
        tracers: calling a facade net inside ``jax.jit`` would otherwise
        store abstract values on the instance and poison later eager calls.
        Under tracing the stats update is a no-op (use the functional layer
        directly when you need state threading through jit)."""
        if not any(isinstance(leaf, jax.core.Tracer)
                   for leaf in jax.tree.leaves(new_state)):
            self.state = new_state


class BaseFullyConnectedNet(_KeyedModule):
    """Plain LeakyReLU MLP, linear final layer (networks/base.py:4-51)."""

    def __init__(self, input_dim, output_dim, model_name="net", nb_units=(256, 256, 256),
                 batchnorm=False, seed=0):
        super().__init__(seed)
        self.model_name = model_name
        self.params = _nn.init_mlp(self._next_key(), input_dim, output_dim,
                                   list(nb_units), batchnorm=batchnorm)

    def __call__(self, x, training=True):
        return _nn.mlp_apply(self.params, jnp.asarray(x, jnp.float32))


class Discriminator(_KeyedModule):
    """tanh critic with scalar logit (networks/base.py:338-385)."""

    def __init__(self, input_dim, model_name="critic", nb_units=(256, 256),
                 batchnorm=True, seed=0):
        super().__init__(seed)
        self.model_name = model_name
        self.params = _nn.init_critic(self._next_key(), input_dim, list(nb_units),
                                      batchnorm=batchnorm)

    def __call__(self, x, training=True):
        return _nn.critic_apply(self.params, jnp.asarray(x, jnp.float32))


class BaseVariationalNet(_KeyedModule):
    """Mean + softplus-variance heads (networks/base.py:53-117)."""

    def __init__(self, input_dim, output_dim, model_name="vnet", nb_units=(256, 256, 256), seed=0):
        super().__init__(seed)
        self.model_name = model_name
        self.params, self.state = _nn.init_variational_mlp(
            self._next_key(), input_dim, output_dim, list(nb_units))

    def __call__(self, x, training=True):
        mean, var, new_state = _nn.variational_mlp_apply(
            self.params, jnp.asarray(x, jnp.float32), self.state, train=training)
        if training:
            self._store_state(new_state)
        return mean, var

    def reparameterize(self, mean, var):
        return _nn.reparameterize(self._next_key(), mean, var)


class BaseVariationalLowRankNet(_KeyedModule):
    """Mean / diag-variance / low-rank-factor heads with Sigma = D + U U^T
    (networks/base.py:119-336)."""

    def __init__(self, input_dim, output_dim, model_name="lrnet", nb_units=(256, 256, 256),
                 rank=2, seed=0):
        super().__init__(seed)
        self.model_name = model_name
        self.params, self.state, self.meta = _nn.init_lowrank_variational_mlp(
            self._next_key(), input_dim, output_dim, list(nb_units), rank=rank)

    def __call__(self, x, training=True):
        mean, var_diag, u, new_state = _nn.lowrank_variational_mlp_apply(
            self.params, jnp.asarray(x, jnp.float32), self.meta, self.state, train=training)
        if training:
            self._store_state(new_state)
        return mean, var_diag, u

    def reparameterize(self, mean, var_diag, u):
        return _nn.lowrank_reparameterize(self._next_key(), mean, var_diag, u)

    def compute_covariance_inverse(self, var_diag, u):
        return _nn.lowrank_covariance_inverse(var_diag, u)

    def compute_log_det(self, var_diag, u):
        return _nn.lowrank_log_det(var_diag, u)

    def transfer_weights_from_bayesian(self, bayesian_model, method="mean"):
        if method not in ("mean", "sample"):
            raise ValueError(f"Invalid method '{method}'. Must be either 'mean' or 'sample'.")
        key = None if method == "mean" else self._next_key()
        self.params = _nn.lowrank_transfer_from_flipout(bayesian_model.params, key)


class BayesianFullyConnectedNet(_KeyedModule):
    """Flipout MLP with N(0,1) kernel priors (networks/bnn.py:4-38)."""

    def __init__(self, input_dim, output_dim, model_name="bnn", nb_units=(256, 256, 256), seed=0):
        super().__init__(seed)
        self.model_name = model_name
        self.params = _nn.init_flipout_mlp(self._next_key(), input_dim, output_dim, list(nb_units))

    def __call__(self, x, training=True):
        return _nn.flipout_mlp_apply(self.params, jnp.asarray(x, jnp.float32), self._next_key())

    def kl_divergence(self):
        return _nn.flipout_mlp_kl(self.params)


class BayesianVariationalNet(_KeyedModule):
    """Flipout variational MLP with N(0, 0.1) priors (networks/bnn.py:40-99)."""

    def __init__(self, input_dim, output_dim, model_name="bvn", nb_units=(256, 256, 256), seed=0):
        super().__init__(seed)
        self.model_name = model_name
        self.params, self.state = _nn.init_flipout_variational_mlp(
            self._next_key(), input_dim, output_dim, list(nb_units))

    def __call__(self, x, training=True):
        mean, var, new_state = _nn.flipout_variational_mlp_apply(
            self.params, jnp.asarray(x, jnp.float32), self._next_key(),
            state=self.state, train=training)
        if training:
            self._store_state(new_state)
        return mean, var

    def reparameterize(self, mean, var):
        return _nn.reparameterize(self._next_key(), mean, var)

    def kl_divergence(self):
        return _nn.flipout_variational_mlp_kl(self.params)


class BayesianVariationalLowRankNet(_KeyedModule):
    """Flipout low-rank variational MLP (networks/bnn.py:101-281)."""

    def __init__(self, input_dim, output_dim, model_name="blr", nb_units=(256, 256, 256),
                 rank=2, seed=0):
        super().__init__(seed)
        self.model_name = model_name
        self.params, self.state, self.meta = _nn.init_flipout_lowrank_variational_mlp(
            self._next_key(), input_dim, output_dim, list(nb_units), rank=rank)

    def __call__(self, x, training=True):
        mean, var_diag, u, new_state = _nn.flipout_lowrank_variational_mlp_apply(
            self.params, jnp.asarray(x, jnp.float32), self._next_key(), self.meta,
            state=self.state, train=training)
        if training:
            self._store_state(new_state)
        return mean, var_diag, u

    def reparameterize(self, mean, var_diag, u):
        return _nn.lowrank_reparameterize(self._next_key(), mean, var_diag, u)

    def compute_covariance_inverse(self, var_diag, u):
        return _nn.lowrank_covariance_inverse(var_diag, u)

    def compute_log_det(self, var_diag, u):
        return _nn.lowrank_log_det(var_diag, u)

    def kl_divergence(self):
        return _nn.flipout_lowrank_variational_mlp_kl(self.params)


class MCMCFullyConnectedNet(BaseFullyConnectedNet):
    """Plain MLP + flat-weight forward + standard-normal log prior
    (networks/base.py:387-442).  In a functional framework the stateless
    path is the default; ``call_with_weights`` is just unravel + apply.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._flat0, self._unravel = _nn.flatten_params(self.params)

    def get_weights(self):
        return self._flat0

    def call_with_weights(self, inputs, flattened_weights):
        net = self._unravel(jnp.asarray(flattened_weights, jnp.float32))
        return _nn.mlp_apply(net, jnp.asarray(inputs, jnp.float32))

    def log_prior(self, flattened_weights):
        return _nn.standard_normal_log_prior(jnp.asarray(flattened_weights, jnp.float32))


def run_mcmc_for_net(net: MCMCFullyConnectedNet, x_train, y_train, likelihood_fn,
                     initial_state=None, num_samples=1000, num_burnin_steps=500,
                     step_size=0.01, num_leapfrog_steps=3, seed=0):
    """Weight-space HMC for a network (networks/base.py:444-505).

    ``likelihood_fn(y_true, y_pred) -> scalar log-likelihood``.  Returns
    weight samples with shape (num_samples, n_weights).
    """
    x_train = jnp.asarray(x_train, jnp.float32)
    y_train = jnp.asarray(y_train, jnp.float32)
    if initial_state is None:
        flat0 = net.get_weights()
    else:
        flat0 = jnp.asarray(initial_state, jnp.float32)

    def log_prob(flat_batch, key):
        def single(flat):
            y_pred = net.call_with_weights(x_train, flat)
            return net.log_prior(flat) + likelihood_fn(y_train, y_pred)

        return jax.vmap(single)(flat_batch)

    print(f"Running HMC for {net.model_name}...")
    res = _mcmc.hmc(log_prob, flat0[None, :], jax.random.PRNGKey(seed),
                    burn_in=num_burnin_steps, n_keep=num_samples,
                    step_size=step_size, num_leapfrog=num_leapfrog_steps,
                    adapt_fraction=0.8)
    print(f"HMC for {net.model_name} finished. Acceptance rate: {float(res.accept_rate):.4f}")
    return np.asarray(res.samples)[:, 0, :]


class MNISTEncoderConv(_KeyedModule):
    """Conv encoder 28x28x1 -> z (conv.py:6-37)."""

    def __init__(self, z_dim=10, filters=32, name="mnist_encoder_conv", seed=0):
        super().__init__(seed)
        self.params = _conv.init_mnist_encoder(self._next_key(), z_dim, filters)

    def __call__(self, x, training=True):
        return _conv.mnist_encoder_apply(self.params, jnp.asarray(x, jnp.float32))


class MNISTGenerator(_KeyedModule):
    """Deconv generator z -> (mean_logits, var) (conv.py:40-167)."""

    def __init__(self, z_dim=10, filters=32, use_bnn=False, kl_weight=1.0 / 60000,
                 name="mnist_generator", seed=0):
        super().__init__(seed)
        self.kl_weight = kl_weight
        self.params = _conv.init_mnist_generator(self._next_key(), z_dim, filters, use_bnn)

    def __call__(self, z, training=True):
        key = self._next_key() if _conv.generator_is_bayesian(self.params) else None
        return _conv.mnist_generator_apply(self.params, jnp.asarray(z, jnp.float32), key)

    def reparameterize(self, mean, var):
        return _nn.reparameterize(self._next_key(), mean, var)

    def kl_divergence(self):
        return _conv.mnist_generator_kl(self.params) * self.kl_weight


class MNISTDiscriminator(_KeyedModule):
    """Conv critic for MNIST-sized inputs (conv.py:170-199)."""

    def __init__(self, filters=64, dropout=0.3, name="mnist_discriminator", seed=0):
        super().__init__(seed)
        self.dropout = dropout
        self.params = _conv.init_mnist_discriminator(self._next_key(), filters)

    def __call__(self, x, training=True):
        key = self._next_key() if training else None
        return _conv.mnist_discriminator_apply(self.params, jnp.asarray(x, jnp.float32),
                                               key, dropout=self.dropout)


__all__ = [
    "BaseFullyConnectedNet",
    "BayesianFullyConnectedNet",
    "BaseVariationalNet",
    "BayesianVariationalNet",
    "BaseVariationalLowRankNet",
    "BayesianVariationalLowRankNet",
    "Discriminator",
    "MCMCFullyConnectedNet",
    "run_mcmc_for_net",
    "MNISTEncoderConv",
    "MNISTGenerator",
    "MNISTDiscriminator",
]
