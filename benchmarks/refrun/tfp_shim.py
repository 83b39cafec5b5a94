"""Minimal tensorflow_probability stand-in to execute the REFERENCE
``bayesgm`` package (read-only at /root/reference) in this image, which has
TensorFlow 2.21 but no tensorflow_probability wheel.

Purpose: measure the reference implementation's OWN multi-seed accuracy
distribution at the flagship protocol, head-to-head with this repo's
campaigns (RESULTS.md), without installing anything.  The reference's
published flagship number (ADRF RMSE 0.0188, tutorial_py.ipynb cell 18) is
a single run with ``random_seed=None``; this shim lets us ask how that
number distributes over seeds.

Scope: exactly the TFP surface the reference CausalBGM BNN path touches
(reference src/bayesgm/models: causalbgm/base.py:2,558-559 uses
``tfp.stats.percentile``; networks/bnn.py uses ``tfp.layers.DenseFlipout``
and Normal/Independent prior factories; networks/conv.py and bgm/base.py
only alias ``tfp.layers`` / ``tfp.mcmc`` / ``tfp.distributions`` at import
time).  Everything else raises on use.

DenseFlipout semantics follow TFP 0.18's documented defaults:

- kernel posterior: mean-field Normal; ``loc`` init N(0, 0.1); scale
  parametrized ``eps + softplus(rho)`` with ``rho`` init N(-3, 0.1)
  (tfp.layers.util.default_mean_field_normal_fn / default_loc_scale_fn;
  init scale ~= 0.0486 — the same convention as bayesgm_tpu's validated
  ops/nn.py flipout).
- kernel prior: N(0, 1) per weight unless a ``kernel_prior_fn`` is passed
  (the reference's variational nets pass Independent(Normal(0, 0.1))).
- bias posterior: Deterministic (``is_singular=True`` default), loc init
  N(0, 0.1); ``bias_prior_fn=None`` by default -> no bias KL.  When a bias
  prior IS passed, KL(Deterministic || Normal) = -log_prob(loc) (TFP's
  registered deterministic-KL).
- forward pass: flipout estimator — ``x @ loc`` plus
  ``((x * s_in) @ (scale * eps_w)) * s_out`` with Rademacher sign matrices
  per example and one shared Gaussian weight-noise draw per call.
- the exact analytic KL(posterior || prior) is registered via
  ``layer.add_loss`` on every call, matching how the reference consumes
  ``sum(model.losses)`` (causalbgm/base.py:170-180).

This file is a test harness for the reference, not part of bayesgm_tpu.
"""

import numpy as np
import tensorflow as tf

_LOG_2PI = float(np.log(2.0 * np.pi))
_EPS = float(np.finfo(np.float32).eps)


# ---------------------------------------------------------------------------
# distributions (just enough for prior factories and log_prob consumers)
# ---------------------------------------------------------------------------


class Normal:
    def __init__(self, loc=0.0, scale=1.0):
        self.loc = loc
        self.scale = scale

    def log_prob(self, x):
        x = tf.convert_to_tensor(x, tf.float32)
        loc = tf.cast(self.loc, tf.float32)
        scale = tf.cast(self.scale, tf.float32)
        z = (x - loc) / scale
        return -0.5 * (z * z + _LOG_2PI) - tf.math.log(scale)

    def sample(self, shape=()):
        shape = tuple(shape) if not np.isscalar(shape) else (shape,)
        loc = tf.cast(self.loc, tf.float32)
        scale = tf.cast(self.scale, tf.float32)
        return loc + scale * tf.random.normal(shape)


class Independent:
    """Wrapper marking batch dims as event dims; the shim only needs to
    recover the base distribution's scale for KL computation."""

    def __init__(self, distribution, reinterpreted_batch_ndims=None):
        self.distribution = distribution
        self.reinterpreted_batch_ndims = reinterpreted_batch_ndims


class Bernoulli:
    def __init__(self, logits=None, probs=None):
        self.logits = logits
        self.probs = probs

    def log_prob(self, x):
        x = tf.cast(x, tf.float32)
        logits = tf.cast(self.logits, tf.float32)
        return -tf.nn.sigmoid_cross_entropy_with_logits(labels=x,
                                                        logits=logits)


class _Missing:
    """Attribute namespace that fails loudly on first real use."""

    def __init__(self, name):
        self._name = name

    def __getattr__(self, item):
        raise NotImplementedError(
            f"tfp shim: {self._name}.{item} is not implemented "
            "(only the CausalBGM BNN surface is shimmed)")


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------


def _prior_scale(prior_fn, shape, default):
    """Resolve a reference-supplied ``*_prior_fn`` to a scalar Normal scale.

    The reference only ever passes ``Independent(Normal(0, scale))``
    factories (networks/bnn.py:53-56); TFP's own default is N(0, 1).
    Returns None when there is no prior (-> no KL term)."""
    if prior_fn is None:
        return None
    if prior_fn is _DEFAULT_PRIOR:
        return default
    dist = prior_fn(tf.float32, shape, "prior", True, None)
    base = getattr(dist, "distribution", dist)
    scale = base.scale
    val = float(np.asarray(scale if np.isscalar(scale)
                           else tf.reduce_mean(tf.cast(scale, tf.float32))))
    return val


_DEFAULT_PRIOR = object()  # sentinel: TFP's default_multivariate_normal_fn


def _rademacher(shape):
    return tf.where(tf.random.uniform(shape) < 0.5, -1.0, 1.0)


class DenseFlipout(tf.keras.layers.Layer):
    def __init__(self, units, activation=None,
                 kernel_prior_fn=_DEFAULT_PRIOR,
                 bias_prior_fn=None, **kwargs):
        if kwargs:
            raise NotImplementedError(
                f"tfp shim: DenseFlipout kwargs {sorted(kwargs)} not "
                "implemented")
        super().__init__()
        self.units = int(units)
        self.activation = tf.keras.activations.get(activation)
        self._kernel_prior_fn = kernel_prior_fn
        self._bias_prior_fn = bias_prior_fn

    def build(self, input_shape):
        d = int(input_shape[-1])
        u = self.units
        init_loc = tf.keras.initializers.RandomNormal(stddev=0.1)
        init_rho = tf.keras.initializers.RandomNormal(mean=-3.0, stddev=0.1)
        self.kernel_loc = self.add_weight(
            name="kernel_loc", shape=(d, u), initializer=init_loc,
            trainable=True)
        self.kernel_rho = self.add_weight(
            name="kernel_rho", shape=(d, u), initializer=init_rho,
            trainable=True)
        self.bias_loc = self.add_weight(
            name="bias_loc", shape=(u,), initializer=init_loc, trainable=True)
        self._kernel_prior_scale = _prior_scale(self._kernel_prior_fn,
                                                (d, u), default=1.0)
        self._bias_prior_scale = _prior_scale(self._bias_prior_fn,
                                              (u,), default=None)
        super().build(input_shape)

    def _posterior_scale(self):
        return _EPS + tf.nn.softplus(self.kernel_rho)

    def _kl(self):
        s = self._posterior_scale()
        m = self.kernel_loc
        p = self._kernel_prior_scale
        kl = tf.reduce_sum(
            tf.math.log(p / s) + (s * s + m * m) / (2.0 * p * p) - 0.5)
        if self._bias_prior_scale is not None:
            pb = self._bias_prior_scale
            b = self.bias_loc
            # KL(Deterministic(b) || N(0, pb)) = -log N(b; 0, pb)
            kl += tf.reduce_sum(
                0.5 * (b / pb) ** 2 + tf.math.log(pb) + 0.5 * _LOG_2PI)
        return kl

    def call(self, inputs, training=None):
        x = tf.convert_to_tensor(inputs, tf.float32)
        outputs = tf.matmul(x, self.kernel_loc)
        w_noise = self._posterior_scale() * tf.random.normal(
            tf.shape(self.kernel_loc))
        batch = tf.shape(x)[0]
        s_in = _rademacher((batch, tf.shape(x)[1]))
        s_out = _rademacher((batch, self.units))
        outputs += tf.matmul(x * s_in, w_noise) * s_out
        outputs = tf.nn.bias_add(outputs, self.bias_loc)
        self.add_loss(self._kl())
        if self.activation is not None:
            outputs = self.activation(outputs)
        return outputs


class Convolution2DFlipout:
    def __init__(self, *a, **k):
        raise NotImplementedError(
            "tfp shim: Convolution2DFlipout not implemented (MNIST conv "
            "nets are out of scope)")


# ---------------------------------------------------------------------------
# stats
# ---------------------------------------------------------------------------


def percentile(x, q, axis=None, interpolation="nearest"):
    """tfp.stats.percentile with the 0.18 default 'nearest' interpolation
    (reference uses it only for the p5/p95 ADRF grid ends,
    causalbgm/base.py:558-559)."""
    x = tf.convert_to_tensor(x, tf.float32)
    flat = tf.reshape(x, [-1]) if axis is None else x
    n = tf.shape(flat)[0]
    srt = tf.sort(flat)
    frac = tf.cast(q, tf.float32) / 100.0 * tf.cast(n - 1, tf.float32)
    if interpolation == "nearest":
        idx = tf.cast(tf.round(frac), tf.int32)
        return srt[idx]
    lo = tf.cast(tf.floor(frac), tf.int32)
    hi = tf.minimum(lo + 1, n - 1)
    w = frac - tf.floor(frac)
    return srt[lo] * (1.0 - w) + srt[hi] * w


# ---------------------------------------------------------------------------
# module namespaces
# ---------------------------------------------------------------------------


class _Namespace:
    def __init__(self, **entries):
        self.__dict__.update(entries)


distributions = _Namespace(Normal=Normal, Independent=Independent,
                           Bernoulli=Bernoulli)
layers = _Namespace(DenseFlipout=DenseFlipout,
                    Convolution2DFlipout=Convolution2DFlipout)
stats = _Namespace(percentile=percentile)
mcmc = _Missing("tfp.mcmc")
__version__ = "0.18-shim"
