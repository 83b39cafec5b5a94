"""MCMC kernels as jitted ``lax.scan`` programs.

TPU-native replacements for the reference samplers:

- :func:`adaptive_mh` replaces the host-side Metropolis–Hastings loop
  (causalbgm/base.py:820-904), which ping-pongs numpy proposals and TF
  log-posterior calls twice per step.  Here the whole chain — proposal,
  accept/reject, sliding-window acceptance tracking, and the adaptive
  proposal-sd schedule — runs on device in one scan; all ``n`` subjects are
  independent chains vectorized along axis 0.

- :func:`hmc` replaces ``tfp.mcmc.HamiltonianMonteCarlo`` +
  ``SimpleStepSizeAdaptation`` (bgm/base.py:798-824, networks/base.py:476-498):
  leapfrog integration under ``lax.scan`` with a scalar step size adapted
  toward a target acceptance probability during burn-in.

Both support a ``collect`` function so that posterior *functionals* (e.g. ITE
draws or ADRF grid means) can be accumulated per kept step instead of
materializing the full ``(n_keep, n, z_dim)`` sample cube in HBM.

Adaptation schedules intentionally reproduce the reference's:
MH multiplies q_sd by 0.9/1.1 every ``adjustment_interval`` burn-in steps when
the windowed acceptance rate leaves ``target ± tolerance``
(causalbgm/base.py:880-892); HMC scales step size by (1 ± 0.01) toward
``target_accept`` for the first 80% of burn-in.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class MHResult(NamedTuple):
    samples: jax.Array  # collected values, leading axis n_keep
    q_sd: jax.Array  # final proposal sd (scalar)
    accept_rate: jax.Array  # windowed acceptance rate at the end (scalar)


def _mh_step(carry, key, log_prob_fn, q_sd_is_adaptive, burn_in,
             target_rate, tolerance, adjustment_interval, window_size,
             recompute_current):
    state, logp, q_sd, window, t = carry
    k_prop, k_unif, k_lp1, k_lp2 = jax.random.split(key, 4)

    proposed = state + q_sd * jax.random.normal(k_prop, state.shape, state.dtype)
    logp_prop = log_prob_fn(proposed, k_lp1)
    if recompute_current:
        # Stochastic targets (flipout BNNs) re-evaluate the current state with
        # fresh weight noise each step, exactly as the reference does by
        # calling get_log_posterior twice (causalbgm/base.py:865-866).
        logp = log_prob_fn(state, k_lp2)

    log_ratio = jnp.minimum(logp_prop - logp, 0.0)
    accept = jax.random.uniform(k_unif, logp.shape) < jnp.exp(log_ratio)
    new_state = jnp.where(accept[:, None], proposed, state)
    new_logp = jnp.where(accept, logp_prop, logp)

    # Sliding-window acceptance tracking: ring buffer of per-step acceptance
    # fractions (equivalent to the reference's window of (n,) indicator rows).
    accept_frac = jnp.mean(accept.astype(jnp.float32))
    window = window.at[t % window_size].set(accept_frac)
    n_valid = jnp.minimum(t + 1, window_size).astype(jnp.float32)
    rate = jnp.sum(window) / n_valid

    def adjust(q):
        q = jnp.where(rate < target_rate - tolerance, q * 0.9, q)
        q = jnp.where(rate > target_rate + tolerance, q * 1.1, q)
        return q

    do_adjust = q_sd_is_adaptive & (t < burn_in) & (t % adjustment_interval == 0) & (t > 0)
    q_sd = jnp.where(do_adjust, adjust(q_sd), q_sd)

    return (new_state, new_logp, q_sd, window, t + 1), (new_state, rate)


@partial(jax.jit, static_argnames=(
    "log_prob_fn", "burn_in", "n_keep", "adaptive", "target_rate", "tolerance",
    "adjustment_interval", "window_size", "recompute_current", "collect"))
def adaptive_mh(log_prob_fn: Callable, init_state, key, *, burn_in: int = 5000,
                n_keep: int = 3000, q_sd: float = 1.0, adaptive: bool = True,
                target_rate: float = 0.25, tolerance: float = 0.05,
                adjustment_interval: int = 50, window_size: int = 100,
                recompute_current: bool = False,
                collect: Optional[Callable] = None) -> MHResult:
    """Vectorized adaptive random-walk Metropolis–Hastings.

    Parameters
    ----------
    log_prob_fn : callable ``(state, key) -> (n,)``
        Batched log target over ``n`` independent chains.
    init_state : (n, d) array
        Initial chain states.
    collect : callable ``(state, key) -> pytree`` or None
        Per-kept-step statistic; defaults to the raw state.  Using a small
        statistic keeps HBM usage at ``n_keep × |stat|``.

    Returns
    -------
    MHResult with ``samples`` stacked along the leading (n_keep) axis.
    """
    k_init, k_scan = jax.random.split(key)
    logp0 = log_prob_fn(init_state, k_init)

    step = partial(
        _mh_step, log_prob_fn=log_prob_fn, q_sd_is_adaptive=jnp.asarray(adaptive),
        burn_in=burn_in, target_rate=target_rate, tolerance=tolerance,
        adjustment_interval=adjustment_interval, window_size=window_size,
        recompute_current=recompute_current)

    window = jnp.zeros((window_size,), jnp.float32)
    carry = (init_state, logp0, jnp.asarray(q_sd, jnp.float32), window, jnp.asarray(0, jnp.int32))

    # Phase 1: burn-in (adaptation active, nothing collected).
    keys_burn = jax.random.split(k_scan, burn_in + 1)
    carry, _ = jax.lax.scan(lambda c, k: (step(c, k)[0], None), carry, keys_burn[:-1])

    # Phase 2: sampling (no adaptation fires since t >= burn_in).
    collect_fn = (lambda s, k: s) if collect is None else collect
    keys_keep = jax.random.split(keys_burn[-1], n_keep)

    def keep_step(c, k):
        k_mh, k_col = jax.random.split(k)
        new_c, (state, rate) = step(c, k_mh)
        return new_c, (collect_fn(state, k_col), rate)

    carry, (samples, rates) = jax.lax.scan(keep_step, carry, keys_keep)
    return MHResult(samples=samples, q_sd=carry[2], accept_rate=rates[-1])


# ---------------------------------------------------------------------------
# Hamiltonian Monte Carlo
# ---------------------------------------------------------------------------


class HMCResult(NamedTuple):
    samples: jax.Array
    step_size: jax.Array
    accept_rate: jax.Array  # mean acceptance over kept steps


def _leapfrog(grad_fn, state, momentum, step_size, num_steps, key):
    """Standard leapfrog; ``state``/``momentum`` shaped (n, d)."""

    def body(_, sm):
        s, m = sm
        m = m + 0.5 * step_size * grad_fn(s, key)
        s = s + step_size * m
        m = m + 0.5 * step_size * grad_fn(s, key)
        return s, m

    return jax.lax.fori_loop(0, num_steps, body, (state, momentum))


def _hmc_step(carry, key, log_prob_fn, grad_fn, num_leapfrog, target_accept,
              adapt, adaptation_rate=0.01):
    state, logp, step_size, t = carry
    k_mom, k_unif, k_lp, k_grad = jax.random.split(key, 4)

    momentum = jax.random.normal(k_mom, state.shape, state.dtype)
    new_state, new_momentum = _leapfrog(grad_fn, state, momentum, step_size, num_leapfrog, k_grad)
    new_logp = log_prob_fn(new_state, k_lp)

    ke_old = 0.5 * jnp.sum(momentum**2, axis=-1)
    ke_new = 0.5 * jnp.sum(new_momentum**2, axis=-1)
    log_accept_ratio = (new_logp - ke_new) - (logp - ke_old)
    accept = jnp.log(jax.random.uniform(k_unif, logp.shape)) < log_accept_ratio

    state = jnp.where(accept[..., None], new_state, state)
    logp = jnp.where(accept, new_logp, logp)

    # Scalar step-size adaptation toward target acceptance (the
    # SimpleStepSizeAdaptation recipe): one multiplicative nudge per step.
    accept_prob = jnp.mean(jnp.exp(jnp.minimum(log_accept_ratio, 0.0)))
    new_step = jnp.where(
        accept_prob > target_accept,
        step_size * (1.0 + adaptation_rate),
        step_size / (1.0 + adaptation_rate),
    )
    step_size = jnp.where(adapt(t), new_step, step_size)

    return (state, logp, step_size, t + 1), (state, jnp.mean(accept.astype(jnp.float32)))


@partial(jax.jit, static_argnames=(
    "log_prob_fn", "burn_in", "n_keep", "num_leapfrog", "target_accept",
    "adapt_fraction", "collect"))
def hmc(log_prob_fn: Callable, init_state, key, *, burn_in: int = 5000,
        n_keep: int = 3000, step_size: float = 0.01, num_leapfrog: int = 10,
        target_accept: float = 0.75, adapt_fraction: float = 0.8,
        collect: Optional[Callable] = None) -> HMCResult:
    """HMC over ``n`` independent chains (axis 0) with burn-in step-size
    adaptation for the first ``adapt_fraction`` of burn-in steps.

    ``log_prob_fn(state, key) -> (n,)`` must be differentiable in ``state``.
    """
    grad_fn = jax.grad(lambda s, k: jnp.sum(log_prob_fn(s, k)))
    n_adapt = int(burn_in * adapt_fraction)
    k_init, k_scan = jax.random.split(key)
    logp0 = log_prob_fn(init_state, k_init)

    step = partial(_hmc_step, log_prob_fn=log_prob_fn, grad_fn=grad_fn,
                   num_leapfrog=num_leapfrog, target_accept=target_accept,
                   adapt=lambda t: t < n_adapt)

    carry = (init_state, logp0, jnp.asarray(step_size, jnp.float32), jnp.asarray(0, jnp.int32))
    keys_burn = jax.random.split(k_scan, burn_in + 1)
    carry, _ = jax.lax.scan(lambda c, k: (step(c, k)[0], None), carry, keys_burn[:-1])

    collect_fn = (lambda s, k: s) if collect is None else collect
    keys_keep = jax.random.split(keys_burn[-1], n_keep)

    def keep_step(c, k):
        k_hmc, k_col = jax.random.split(k)
        new_c, (state, acc) = step(c, k_hmc)
        return new_c, (collect_fn(state, k_col), acc)

    carry, (samples, accs) = jax.lax.scan(keep_step, carry, keys_keep)
    return HMCResult(samples=samples, step_size=carry[2], accept_rate=jnp.mean(accs))
