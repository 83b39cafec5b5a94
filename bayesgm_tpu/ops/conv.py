"""Convolutional building blocks for the MNIST model family.

Functional equivalents of the reference conv nets
(src/bayesgm/models/networks/conv.py): NHWC layout, Keras-default
glorot-uniform kernels, LeakyReLU(0.2), batch-stat BatchNorm (per-channel over
batch+spatial axes), and an optional flipout-Bayesian generator with
channel-wise sign perturbations and KL scaled by ``kl_weight ~ 1/60000``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from bayesgm_tpu.ops.nn import leaky_relu

BN_EPS = 1e-3


def _glorot(key, shape):
    fan_in = shape[0] * shape[1] * shape[2]
    fan_out = shape[0] * shape[1] * shape[3]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def init_conv(key, kh, kw, cin, cout, use_bias=True):
    p = {"w": _glorot(key, (kh, kw, cin, cout))}
    if use_bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def conv_apply(p, x, stride=1, transpose=False):
    """SAME-padded conv / conv-transpose in NHWC."""
    if transpose:
        out = jax.lax.conv_transpose(
            x, p["w"], strides=(stride, stride), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    else:
        out = jax.lax.conv_general_dilated(
            x, p["w"], window_strides=(stride, stride), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        out = out + p["b"]
    return out


def init_channel_bn(c):
    return {"gamma": jnp.ones((c,), jnp.float32), "beta": jnp.zeros((c,), jnp.float32)}


def channel_bn_apply(p, x):
    """Batch-stat BatchNorm over (batch, H, W) per channel."""
    mean = jnp.mean(x, axis=(0, 1, 2))
    var = jnp.var(x, axis=(0, 1, 2))
    return (x - mean) * jax.lax.rsqrt(var + BN_EPS) * p["gamma"] + p["beta"]


def init_dense(key, din, dout):
    limit = math.sqrt(6.0 / (din + dout))
    return {"w": jax.random.uniform(key, (din, dout), jnp.float32, -limit, limit),
            "b": jnp.zeros((dout,), jnp.float32)}


def dense_apply(p, x):
    return jnp.dot(x, p["w"], preferred_element_type=jnp.float32) + p["b"]


# ---------------------------------------------------------------------------
# Flipout conv (Bayesian generator variant; conv.py:59-122)
# ---------------------------------------------------------------------------


def init_flipout_conv(key, kh, kw, cin, cout, use_bias=True):
    k1, k2 = jax.random.split(key)
    p = {
        "loc": _glorot(k1, (kh, kw, cin, cout)),
        "rho": -3.0 + 0.1 * jax.random.normal(k2, (kh, kw, cin, cout), jnp.float32),
    }
    if use_bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def flipout_conv_apply(p, x, key, stride=1):
    """Flipout conv: channel-wise sign perturbations per example."""
    k_eps, k_in, k_out = jax.random.split(key, 3)
    scale = jax.nn.softplus(p["rho"])
    eps = jax.random.normal(k_eps, p["loc"].shape, jnp.float32)
    r_in = jax.random.rademacher(k_in, (x.shape[0], 1, 1, x.shape[-1]), jnp.float32)
    r_out = jax.random.rademacher(k_out, (x.shape[0], 1, 1, p["loc"].shape[-1]), jnp.float32)
    mean_out = jax.lax.conv_general_dilated(
        x, p["loc"], window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    pert = jax.lax.conv_general_dilated(
        x * r_in, scale * eps, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) * r_out
    out = mean_out + pert
    if "b" in p:
        out = out + p["b"]
    return out


def flipout_conv_kl(p, prior_scale=1.0):
    scale = jax.nn.softplus(p["rho"])
    var_ratio = (scale / prior_scale) ** 2
    return 0.5 * jnp.sum(var_ratio + (p["loc"] / prior_scale) ** 2 - 1.0 - jnp.log(var_ratio))


# ---------------------------------------------------------------------------
# MNIST encoder (conv.py:6-37)
# ---------------------------------------------------------------------------


def init_mnist_encoder(key, z_dim=10, filters=32):
    ks = jax.random.split(key, 5)
    return {
        "c1": init_conv(ks[0], 3, 3, 1, filters, use_bias=False),
        "bn1": init_channel_bn(filters),
        "c2": init_conv(ks[1], 3, 3, filters, filters * 2, use_bias=False),
        "bn2": init_channel_bn(filters * 2),
        "c3": init_conv(ks[2], 3, 3, filters * 2, filters * 4, use_bias=False),
        "bn3": init_channel_bn(filters * 4),
        "d1": init_dense(ks[3], 7 * 7 * filters * 4, 256),
        "d2": init_dense(ks[4], 256, z_dim),
    }


def mnist_encoder_apply(p, x):
    """(n, 28, 28, 1) -> (n, z_dim); flat 784 input auto-reshaped."""
    if x.ndim == 2:
        x = x.reshape(-1, 28, 28, 1)
    h = leaky_relu(channel_bn_apply(p["bn1"], conv_apply(p["c1"], x, stride=2)))
    h = leaky_relu(channel_bn_apply(p["bn2"], conv_apply(p["c2"], h, stride=2)))
    h = leaky_relu(channel_bn_apply(p["bn3"], conv_apply(p["c3"], h, stride=1)))
    h = h.reshape(h.shape[0], -1)
    h = leaky_relu(dense_apply(p["d1"], h))
    return dense_apply(p["d2"], h)


# ---------------------------------------------------------------------------
# MNIST generator (conv.py:40-167)
# ---------------------------------------------------------------------------


def init_mnist_generator(key, z_dim=10, filters=32, use_bnn=False):
    ks = jax.random.split(key, 6)
    if use_bnn:
        # Upsample + flipout-conv blocks (matching the reference's Bayesian path).
        return {
            "fc": init_dense(ks[0], z_dim, 7 * 7 * filters * 4),
            "u1": init_flipout_conv(ks[1], 3, 3, filters * 4, filters * 2, use_bias=False),
            "bn1": init_channel_bn(filters * 2),
            "u2": init_flipout_conv(ks[2], 3, 3, filters * 2, filters, use_bias=False),
            "bn2": init_channel_bn(filters),
            "c3": init_flipout_conv(ks[3], 3, 3, filters, filters, use_bias=False),
            "bn3": init_channel_bn(filters),
            "mean": init_flipout_conv(ks[4], 1, 1, filters, 1),
            "var": init_flipout_conv(ks[5], 1, 1, filters, 1),
        }
    return {
        "fc": init_dense(ks[0], z_dim, 7 * 7 * filters * 4),
        "u1": init_conv(ks[1], 3, 3, filters * 4, filters * 2, use_bias=False),
        "bn1": init_channel_bn(filters * 2),
        "u2": init_conv(ks[2], 3, 3, filters * 2, filters, use_bias=False),
        "bn2": init_channel_bn(filters),
        "c3": init_conv(ks[3], 3, 3, filters, filters, use_bias=False),
        "bn3": init_channel_bn(filters),
        "mean": init_conv(ks[4], 1, 1, filters, 1),
        "var": init_conv(ks[5], 1, 1, filters, 1),
    }


def _upsample2(x):
    """Nearest-neighbor 2x upsampling (Keras UpSampling2D)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def generator_is_bayesian(p):
    """Structural check: flipout conv layers carry a 'rho' leaf."""
    return "rho" in p["u1"]


def mnist_generator_apply(p, z, key=None, eps=1e-6):
    """(n, z_dim) -> (x_mean_logits, x_var), both (n, 28, 28, 1)."""
    filters4 = p["fc"]["w"].shape[1] // 49
    h = leaky_relu(dense_apply(p["fc"], z)).reshape(-1, 7, 7, filters4)
    if generator_is_bayesian(p):
        ks = jax.random.split(key, 5)
        h = leaky_relu(channel_bn_apply(p["bn1"], flipout_conv_apply(p["u1"], _upsample2(h), ks[0])))
        h = leaky_relu(channel_bn_apply(p["bn2"], flipout_conv_apply(p["u2"], _upsample2(h), ks[1])))
        h = leaky_relu(channel_bn_apply(p["bn3"], flipout_conv_apply(p["c3"], h, ks[2])))
        x_mean = flipout_conv_apply(p["mean"], h, ks[3])
        x_var_raw = flipout_conv_apply(p["var"], h, ks[4])
    else:
        h = leaky_relu(channel_bn_apply(p["bn1"], conv_apply(p["u1"], h, stride=2, transpose=True)))
        h = leaky_relu(channel_bn_apply(p["bn2"], conv_apply(p["u2"], h, stride=2, transpose=True)))
        h = leaky_relu(channel_bn_apply(p["bn3"], conv_apply(p["c3"], h, stride=1)))
        x_mean = conv_apply(p["mean"], h)
        x_var_raw = conv_apply(p["var"], h)
    return x_mean, jax.nn.softplus(x_var_raw) + eps


def mnist_generator_kl(p):
    if not generator_is_bayesian(p):
        return 0.0
    layers = [p["u1"], p["u2"], p["c3"], p["mean"], p["var"]]
    return sum(flipout_conv_kl(q) for q in layers)


# ---------------------------------------------------------------------------
# MNIST discriminator (conv.py:170-199)
# ---------------------------------------------------------------------------


def init_mnist_discriminator(key, filters=64):
    ks = jax.random.split(key, 5)
    return {
        "c1": init_conv(ks[0], 5, 5, 1, filters),
        "c2": init_conv(ks[1], 5, 5, filters, filters * 2),
        "c3": init_conv(ks[2], 3, 3, filters * 2, filters * 4),
        "d1": init_dense(ks[3], 4 * 4 * filters * 4, 128),
        "logit": init_dense(ks[4], 128, 1),
    }


def mnist_discriminator_apply(p, x, key=None, dropout=0.3):
    """(n, 28, 28, 1) or (n, 784) -> (n, 1) logits; dropout active when a key
    is given (training mode)."""
    if x.ndim == 2:
        x = x.reshape(-1, 28, 28, 1)

    def drop(h, k):
        if k is None:
            return h
        keep = 1.0 - dropout
        mask = jax.random.bernoulli(k, keep, h.shape)
        return jnp.where(mask, h / keep, 0.0)

    ks = [None] * 3 if key is None else list(jax.random.split(key, 3))
    h = drop(leaky_relu(conv_apply(p["c1"], x, stride=2)), ks[0])
    h = drop(leaky_relu(conv_apply(p["c2"], h, stride=2)), ks[1])
    h = drop(leaky_relu(conv_apply(p["c3"], h, stride=2)), ks[2])
    h = h.reshape(h.shape[0], -1)
    h = leaky_relu(dense_apply(p["d1"], h))
    return dense_apply(p["logit"], h)
