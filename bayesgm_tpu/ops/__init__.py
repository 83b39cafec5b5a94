"""Core numerical ops: functional networks, distributions, MCMC kernels."""

from bayesgm_tpu.ops import distributions, nn  # noqa: F401
