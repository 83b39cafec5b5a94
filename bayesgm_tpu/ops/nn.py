"""Pure-functional neural network building blocks.

TPU-native equivalents of the reference network layer
(``src/bayesgm/models/networks/base.py`` and ``bnn.py``): every network is a
pytree of arrays plus a pure ``apply`` function, so networks compose freely
with ``jit`` / ``vmap`` / ``grad`` / ``lax.scan`` and flatten trivially for
weight-space HMC (no Keras-style "call_with_weights" bridge needed — the
stateless path *is* the only path).

Conventions matched to the reference for numerical parity:

- LeakyReLU slope 0.2 between hidden layers, linear final layer
  (networks/base.py:45).
- Variance heads use ``softplus(raw) + 1e-6`` (networks/base.py:110).
- Dense kernels use Glorot-uniform init and zero bias (Keras ``Dense``
  defaults).
- BatchNorm uses gamma/beta with eps=1e-3 and, where running statistics are
  required, momentum 0.99 (Keras ``BatchNormalization`` defaults).
- Flipout layers use a mean-field Gaussian kernel posterior
  (loc ~ N(0, 0.1), scale = softplus(rho), rho ~ N(-3, 0.1)) with a
  deterministic bias — the same family as ``tfp.layers.DenseFlipout``.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

LEAKY_SLOPE = 0.2
BN_EPS = 1e-3
BN_MOMENTUM = 0.99


def leaky_relu(x):
    return jax.nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------


def init_dense(key, in_dim: int, out_dim: int):
    """Glorot-uniform kernel + zero bias (Keras Dense defaults)."""
    limit = math.sqrt(6.0 / (in_dim + out_dim))
    w = jax.random.uniform(key, (in_dim, out_dim), jnp.float32, -limit, limit)
    return {"w": w, "b": jnp.zeros((out_dim,), jnp.float32)}


def dense_apply(p, x):
    return jnp.dot(x, p["w"], preferred_element_type=jnp.float32) + p["b"]


# ---------------------------------------------------------------------------
# BatchNorm
# ---------------------------------------------------------------------------


def init_batchnorm(dim: int):
    params = {"gamma": jnp.ones((dim,), jnp.float32), "beta": jnp.zeros((dim,), jnp.float32)}
    state = {"mean": jnp.zeros((dim,), jnp.float32), "var": jnp.ones((dim,), jnp.float32)}
    return params, state


def batchnorm_apply(params, x, state=None, train: bool = True):
    """BatchNorm over axis 0.

    In ``train`` mode normalizes with batch statistics and (if ``state`` is
    given) returns updated running statistics; in eval mode normalizes with
    the running statistics.  Returns ``(y, new_state)``.
    """
    if train or state is None:
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)
        new_state = state
        if state is not None:
            new_state = {
                "mean": BN_MOMENTUM * state["mean"] + (1.0 - BN_MOMENTUM) * mean,
                "var": BN_MOMENTUM * state["var"] + (1.0 - BN_MOMENTUM) * var,
            }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + BN_EPS) * params["gamma"] + params["beta"]
    return y, new_state


def frozen_batchnorm_apply(params, x):
    """Inference-mode BatchNorm with frozen (0, 1) moving statistics — a
    learnable affine.  This reproduces the reference's
    ``BayesianFullyConnectedNet`` input norm, which is invoked without a
    training flag (bnn.py:27): Keras then uses the never-updated moving
    averages, so only gamma/beta act.  True batch statistics here would strip
    the absolute location/scale of the inputs per mini-batch, which destroys
    the latent signal the h/f nets condition on.
    """
    return x * params["gamma"] * jax.lax.rsqrt(jnp.asarray(1.0 + BN_EPS)) + params["beta"]


# ---------------------------------------------------------------------------
# Plain MLP (== BaseFullyConnectedNet, networks/base.py:4-51)
# ---------------------------------------------------------------------------


def init_mlp(key, input_dim: int, output_dim: int, hidden: Sequence[int], batchnorm: bool = False):
    dims = [input_dim, *hidden, output_dim]
    keys = jax.random.split(key, len(dims) - 1)
    layers = [init_dense(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)]
    net = {"layers": layers}
    if batchnorm:
        # per-hidden-layer BN (applied post-linear, pre-activation)
        net["bn"] = [init_batchnorm(h)[0] for h in hidden]
    return net


def mlp_apply(net, x):
    """LeakyReLU MLP; linear final layer.

    Optional per-layer norms run in frozen (inference) mode: the reference
    invokes BatchNorm without a training flag (networks/base.py:44), which in
    Keras resolves to the never-updated moving statistics — effectively a
    learnable affine."""
    layers = net["layers"]
    bns = net.get("bn")
    for i, p in enumerate(layers[:-1]):
        x = dense_apply(p, x)
        if bns is not None:
            x = frozen_batchnorm_apply(bns[i], x)
        x = leaky_relu(x)
    return dense_apply(layers[-1], x)


def mlp_l2_penalty(net, coef: float = 1e-4):
    """L2 kernel+bias regularizer matching ``tf.keras.regularizers.L2(1e-4)``
    on every Dense layer (networks/base.py:22-23)."""
    total = 0.0
    for p in net["layers"]:
        total = total + jnp.sum(p["w"] ** 2) + jnp.sum(p["b"] ** 2)
    return coef * total


# ---------------------------------------------------------------------------
# Critic / Discriminator (== Discriminator, networks/base.py:338-385)
# ---------------------------------------------------------------------------


def init_critic(key, input_dim: int, hidden: Sequence[int], batchnorm: bool = True):
    dims = [input_dim, *hidden, 1]
    keys = jax.random.split(key, len(dims) - 1)
    layers = [init_dense(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)]
    net = {"layers": layers}
    if batchnorm:
        net["bn"] = [init_batchnorm(h)[0] for h in hidden]
    return net


def critic_apply(net, x):
    """tanh-activated critic, scalar logit out.

    The optional norms run frozen (learnable affine): the reference
    Discriminator invokes BatchNorm without a training flag
    (networks/base.py:379), so moving stats stay at (0, 1)."""
    layers = net["layers"]
    bns = net.get("bn")
    for i, p in enumerate(layers[:-1]):
        x = dense_apply(p, x)
        if bns is not None:
            x = frozen_batchnorm_apply(bns[i], x)
        x = jnp.tanh(x)
    return dense_apply(layers[-1], x)


# ---------------------------------------------------------------------------
# Variational MLP (== BaseVariationalNet, networks/base.py:53-117)
# mean + softplus-variance heads, input BatchNorm with running stats.
# ---------------------------------------------------------------------------


def init_variational_mlp(key, input_dim: int, output_dim: int, hidden: Sequence[int]):
    dims = [input_dim, *hidden]
    keys = jax.random.split(key, len(hidden) + 2)
    layers = [init_dense(keys[i], dims[i], dims[i + 1]) for i in range(len(hidden))]
    bn_params, bn_state = init_batchnorm(input_dim)
    params = {
        "norm": bn_params,
        "layers": layers,
        "mean": init_dense(keys[-2], dims[-1], output_dim),
        "var": init_dense(keys[-1], dims[-1], output_dim),
    }
    return params, {"norm": bn_state}


def variational_mlp_apply(params, x, state=None, train: bool = True, eps: float = 1e-6):
    """Returns ``(mean, var, new_state)`` with per-dim variance."""
    bn_state = None if state is None else state["norm"]
    x, new_bn = batchnorm_apply(params["norm"], x, bn_state, train=train)
    for p in params["layers"]:
        x = leaky_relu(dense_apply(p, x))
    mean = dense_apply(params["mean"], x)
    var = jax.nn.softplus(dense_apply(params["var"], x)) + eps
    new_state = None if state is None else {"norm": new_bn}
    return mean, var, new_state


def reparameterize(key, mean, var):
    """mu + sqrt(var) * eps, eps ~ N(0, I) (networks/base.py:113-117)."""
    return mean + jnp.sqrt(var) * jax.random.normal(key, mean.shape, mean.dtype)


# ---------------------------------------------------------------------------
# Low-rank variational MLP (== BaseVariationalLowRankNet, networks/base.py:119-336)
# heads: mean, diag variance, low-rank factor U with Sigma = diag(var) + U U^T.
# ---------------------------------------------------------------------------


def init_lowrank_variational_mlp(key, input_dim: int, output_dim: int, hidden: Sequence[int], rank: int = 2):
    dims = [input_dim, *hidden]
    keys = jax.random.split(key, len(hidden) + 3)
    layers = [init_dense(keys[i], dims[i], dims[i + 1]) for i in range(len(hidden))]
    bn_params, bn_state = init_batchnorm(input_dim)
    params = {
        "norm": bn_params,
        "layers": layers,
        "mean": init_dense(keys[-3], dims[-1], output_dim),
        "var": init_dense(keys[-2], dims[-1], output_dim),
        "lowrank": init_dense(keys[-1], dims[-1], output_dim * rank),
    }
    meta = {"output_dim": output_dim, "rank": rank}
    return params, {"norm": bn_state}, meta


def lowrank_variational_mlp_apply(params, x, meta, state=None, train: bool = True, eps: float = 1e-6):
    """Returns ``(mean, var_diag, U, new_state)``; U has shape (batch, p, rank).

    The input norm runs in frozen (inference) mode — the reference invokes it
    without a training flag (networks/base.py:181), so only gamma/beta act.
    """
    x = frozen_batchnorm_apply(params["norm"], x)
    for p in params["layers"]:
        x = leaky_relu(dense_apply(p, x))
    mean = dense_apply(params["mean"], x)
    var_diag = jax.nn.softplus(dense_apply(params["var"], x)) + eps
    u_flat = dense_apply(params["lowrank"], x)
    u = u_flat.reshape(-1, meta["output_dim"], meta["rank"])
    return mean, var_diag, u, state


def lowrank_reparameterize(key, mean, var_diag, u):
    """z = mu + sqrt(D) eps1 + U eps2 (networks/base.py:201-223)."""
    k1, k2 = jax.random.split(key)
    eps1 = jax.random.normal(k1, mean.shape, mean.dtype)
    eps2 = jax.random.normal(k2, (mean.shape[0], u.shape[-1]), mean.dtype)
    return mean + jnp.sqrt(var_diag) * eps1 + jnp.einsum("bpr,br->bp", u, eps2)


def lowrank_covariance_inverse(var_diag, u):
    """Woodbury inverse of Sigma = diag(var) + U U^T (networks/base.py:225-248)."""
    rank = u.shape[-1]
    d_inv = 1.0 / var_diag  # (b, p)
    ut_dinv = jnp.swapaxes(u, -1, -2) * d_inv[:, None, :]  # (b, r, p)
    m = jnp.eye(rank) + jnp.einsum("brp,bps->brs", ut_dinv, u)  # (b, r, r)
    m_inv = jnp.linalg.inv(m)
    correction = jnp.einsum("bpr,brs,bsq->bpq", jnp.swapaxes(ut_dinv, -1, -2), m_inv, ut_dinv)
    return jnp.eye(var_diag.shape[-1]) * d_inv[:, :, None] - correction


def lowrank_log_det(var_diag, u):
    """Sylvester log-det of Sigma = diag(var) + U U^T (networks/base.py:250-275)."""
    rank = u.shape[-1]
    log_det_d = jnp.sum(jnp.log(var_diag), axis=-1)
    ut_dinv = jnp.swapaxes(u, -1, -2) / var_diag[:, None, :]
    m = jnp.eye(rank) + jnp.einsum("brp,bps->brs", ut_dinv, u)
    _, log_det_m = jnp.linalg.slogdet(m)
    return log_det_d + log_det_m


# ---------------------------------------------------------------------------
# Flipout Bayesian dense layers (== tfp.layers.DenseFlipout semantics)
# ---------------------------------------------------------------------------


def init_flipout_dense(key, in_dim: int, out_dim: int):
    k_loc, k_rho = jax.random.split(key)
    return {
        "loc": 0.1 * jax.random.normal(k_loc, (in_dim, out_dim), jnp.float32),
        "rho": -3.0 + 0.1 * jax.random.normal(k_rho, (in_dim, out_dim), jnp.float32),
        "b": jnp.zeros((out_dim,), jnp.float32),
    }


def _rademacher(key, shape):
    return jax.random.rademacher(key, shape, jnp.float32)


def flipout_dense_apply(p, x, key):
    """Flipout estimator: decorrelated per-example kernel perturbations.

    out = x @ loc + b + ((x * r_in) @ (scale * eps)) * r_out
    with r_in/r_out random signs and eps ~ N(0, I) shared across the batch.
    """
    k_eps, k_in, k_out = jax.random.split(key, 3)
    eps = jax.random.normal(k_eps, p["loc"].shape, jnp.float32)
    r_in = _rademacher(k_in, (x.shape[0], x.shape[1]))
    r_out = _rademacher(k_out, (x.shape[0], p["loc"].shape[1]))
    return _flipout_dense_pre(p, x, eps, r_in, r_out)


def _flipout_dense_pre(p, x, eps, r_in, r_out):
    """Flipout dense with the randomness passed in (see _fused_flipout_draws)."""
    scale = jax.nn.softplus(p["rho"])
    mean_out = jnp.dot(x, p["loc"], preferred_element_type=jnp.float32)
    pert_out = jnp.dot(x * r_in, scale * eps, preferred_element_type=jnp.float32) * r_out
    return mean_out + pert_out + p["b"]


def _fused_flipout_draws(key, layers, batch):
    """One eps draw + one sign draw for a whole flipout-MLP call.

    Per-layer draws cost 3 tiny threefry launches per layer; on TPU the
    launch + threefry overhead at training batch sizes (bs=32) dominates the
    normals themselves (same lesson as the predict path's fused host-eps
    draw, pallas_kernels.flipout_step_perturbations).  Drawing one flat
    normal for every layer's eps and one (batch, sum(in+out)) Rademacher
    block for every layer's signs is exactly distribution-preserving —
    independent standard normals / signs either way — and measured ~1.5x on
    the BNN training epoch (RESULTS.md round 4).  PRNG streams differ from
    the per-layer form, so per-draw values shift within the same law.

    Returns (eps_list, r_in_list, r_out_list) aligned with ``layers``.
    """
    dims = [(p["loc"].shape[0], p["loc"].shape[1]) for p in layers]
    k_eps, k_sign = jax.random.split(key)
    eps_flat = jax.random.normal(k_eps, (sum(i * o for i, o in dims),),
                                 jnp.float32)
    signs = _rademacher(k_sign, (batch, sum(i + o for i, o in dims)))
    eps_list, r_in_list, r_out_list = [], [], []
    eo = so = 0
    for i, o in dims:
        eps_list.append(eps_flat[eo:eo + i * o].reshape(i, o))
        eo += i * o
        r_in_list.append(signs[:, so:so + i])
        r_out_list.append(signs[:, so + i:so + i + o])
        so += i + o
    return eps_list, r_in_list, r_out_list


def flipout_dense_kl(p, prior_scale: float = 1.0, bias_prior_scale: float | None = None):
    """KL(q || p) for the kernel posterior N(loc, scale^2) vs prior N(0, s^2).

    The bias is a point mass; when a bias prior is specified the contribution
    is the cross-entropy -log N(b; 0, s^2) (the TFP convention for
    Deterministic-vs-Normal divergence).
    """
    scale = jax.nn.softplus(p["rho"])
    var_ratio = (scale / prior_scale) ** 2
    kl = 0.5 * jnp.sum(var_ratio + (p["loc"] / prior_scale) ** 2 - 1.0 - jnp.log(var_ratio))
    if bias_prior_scale is not None:
        s2 = bias_prior_scale**2
        kl = kl + 0.5 * jnp.sum(p["b"] ** 2 / s2 + math.log(2 * math.pi * s2))
    return kl


# ---------------------------------------------------------------------------
# Flipout MLP (== BayesianFullyConnectedNet, networks/bnn.py:4-38)
# input BatchNorm (batch-stat mode) + flipout hidden/final layers.
# ---------------------------------------------------------------------------


def init_flipout_mlp(key, input_dim: int, output_dim: int, hidden: Sequence[int]):
    dims = [input_dim, *hidden, output_dim]
    keys = jax.random.split(key, len(dims) - 1)
    layers = [init_flipout_dense(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)]
    bn_params, _ = init_batchnorm(input_dim)
    return {"norm": bn_params, "layers": layers}


def flipout_mlp_apply(net, x, key):
    x = frozen_batchnorm_apply(net["norm"], x)
    eps, r_in, r_out = _fused_flipout_draws(key, net["layers"], x.shape[0])
    for j, p in enumerate(net["layers"][:-1]):
        x = leaky_relu(_flipout_dense_pre(p, x, eps[j], r_in[j], r_out[j]))
    return _flipout_dense_pre(net["layers"][-1], x, eps[-1], r_in[-1], r_out[-1])


def flipout_mlp_kl(net, prior_scale: float = 1.0, bias_prior_scale: float | None = None):
    return sum(flipout_dense_kl(p, prior_scale, bias_prior_scale) for p in net["layers"])


def flipout_mlp_mean_apply(net, x):
    """Deterministic forward through the posterior means (no weight noise)."""
    x = frozen_batchnorm_apply(net["norm"], x)
    for p in net["layers"][:-1]:
        x = leaky_relu(jnp.dot(x, p["loc"], preferred_element_type=jnp.float32) + p["b"])
    p = net["layers"][-1]
    return jnp.dot(x, p["loc"], preferred_element_type=jnp.float32) + p["b"]


# ---------------------------------------------------------------------------
# Flipout variational MLP (== BayesianVariationalNet, networks/bnn.py:40-99)
# N(0, 0.1) kernel/bias priors, mean + softplus-variance heads.
# ---------------------------------------------------------------------------

BVN_PRIOR_SCALE = 0.1


def init_flipout_variational_mlp(key, input_dim: int, output_dim: int, hidden: Sequence[int]):
    dims = [input_dim, *hidden]
    keys = jax.random.split(key, len(hidden) + 2)
    layers = [init_flipout_dense(keys[i], dims[i], dims[i + 1]) for i in range(len(hidden))]
    bn_params, bn_state = init_batchnorm(input_dim)
    params = {
        "norm": bn_params,
        "layers": layers,
        "mean": init_flipout_dense(keys[-2], dims[-1], output_dim),
        "var": init_flipout_dense(keys[-1], dims[-1], output_dim),
    }
    return params, {"norm": bn_state}


def flipout_variational_mlp_apply(params, x, key, state=None, train: bool = True, eps: float = 1e-6):
    bn_state = None if state is None else state["norm"]
    x, new_bn = batchnorm_apply(params["norm"], x, bn_state, train=train)
    layers = [*params["layers"], params["mean"], params["var"]]
    e, ri, ro = _fused_flipout_draws(key, layers, x.shape[0])
    for j, p in enumerate(params["layers"]):
        x = leaky_relu(_flipout_dense_pre(p, x, e[j], ri[j], ro[j]))
    mean = _flipout_dense_pre(params["mean"], x, e[-2], ri[-2], ro[-2])
    var = jax.nn.softplus(_flipout_dense_pre(params["var"], x, e[-1], ri[-1], ro[-1])) + eps
    new_state = None if state is None else {"norm": new_bn}
    return mean, var, new_state


def flipout_variational_mlp_kl(params):
    layers = [*params["layers"], params["mean"], params["var"]]
    return sum(flipout_dense_kl(p, BVN_PRIOR_SCALE, BVN_PRIOR_SCALE) for p in layers)


# ---------------------------------------------------------------------------
# Flipout low-rank variational MLP (== BayesianVariationalLowRankNet,
# networks/bnn.py:101-281): N(0, 0.1) kernel priors, default bias.
# ---------------------------------------------------------------------------


def init_flipout_lowrank_variational_mlp(key, input_dim, output_dim, hidden, rank: int = 2):
    dims = [input_dim, *hidden]
    keys = jax.random.split(key, len(hidden) + 3)
    layers = [init_flipout_dense(keys[i], dims[i], dims[i + 1]) for i in range(len(hidden))]
    bn_params, bn_state = init_batchnorm(input_dim)
    params = {
        "norm": bn_params,
        "layers": layers,
        "mean": init_flipout_dense(keys[-3], dims[-1], output_dim),
        "var": init_flipout_dense(keys[-2], dims[-1], output_dim),
        "lowrank": init_flipout_dense(keys[-1], dims[-1], output_dim * rank),
    }
    meta = {"output_dim": output_dim, "rank": rank}
    return params, {"norm": bn_state}, meta


def flipout_lowrank_variational_mlp_apply(params, x, key, meta, state=None, train=True, eps=1e-6):
    # Frozen input norm: the reference invokes it without a training flag
    # (bnn.py:187), so only gamma/beta act.
    x = frozen_batchnorm_apply(params["norm"], x)
    layers = [*params["layers"], params["mean"], params["var"], params["lowrank"]]
    e, ri, ro = _fused_flipout_draws(key, layers, x.shape[0])
    for j, p in enumerate(params["layers"]):
        x = leaky_relu(_flipout_dense_pre(p, x, e[j], ri[j], ro[j]))
    mean = _flipout_dense_pre(params["mean"], x, e[-3], ri[-3], ro[-3])
    var_diag = jax.nn.softplus(_flipout_dense_pre(params["var"], x, e[-2], ri[-2], ro[-2])) + eps
    u_flat = _flipout_dense_pre(params["lowrank"], x, e[-1], ri[-1], ro[-1])
    u = u_flat.reshape(-1, meta["output_dim"], meta["rank"])
    return mean, var_diag, u, state


def flipout_lowrank_variational_mlp_kl(params):
    layers = [*params["layers"], params["mean"], params["var"], params["lowrank"]]
    return sum(flipout_dense_kl(p, BVN_PRIOR_SCALE) for p in layers)


def lowrank_transfer_from_flipout(flipout_params, key=None):
    """Build deterministic low-rank net params from a flipout twin.

    Equivalent of ``transfer_weights_from_bayesian`` (networks/base.py:277-336):
    with ``key=None`` takes the posterior mean; with a PRNG key draws one
    posterior weight sample per layer.
    """

    def collapse(p, k):
        if k is None:
            w = p["loc"]
        else:
            w = p["loc"] + jax.nn.softplus(p["rho"]) * jax.random.normal(k, p["loc"].shape)
        return {"w": w, "b": p["b"]}

    names = ["mean", "var", "lowrank"]
    n_layers = len(flipout_params["layers"])
    keys = [None] * (n_layers + 3) if key is None else list(jax.random.split(key, n_layers + 3))
    out = {
        "norm": flipout_params["norm"],
        "layers": [collapse(p, keys[i]) for i, p in enumerate(flipout_params["layers"])],
    }
    for j, name in enumerate(names):
        out[name] = collapse(flipout_params[name], keys[n_layers + j])
    return out


# ---------------------------------------------------------------------------
# Flat-weight helpers (weight-space HMC; replaces MCMCFullyConnectedNet's
# call_with_weights / log_prior, networks/base.py:387-442)
# ---------------------------------------------------------------------------


def flatten_params(params):
    """Flatten a network pytree to a single fp32 vector + unravel fn."""
    from jax.flatten_util import ravel_pytree

    flat, unravel = ravel_pytree(params)
    return flat, unravel


def standard_normal_log_prior(flat_weights):
    """sum log N(w; 0, 1) (networks/base.py:437-442)."""
    return -0.5 * jnp.sum(flat_weights**2) - 0.5 * flat_weights.size * math.log(2 * math.pi)
