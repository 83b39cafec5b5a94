"""MCMC kernels as jitted ``lax.scan`` programs.

TPU-native replacements for the reference samplers:

- :func:`adaptive_mh` replaces the host-side Metropolis–Hastings loop
  (causalbgm/base.py:820-904), which ping-pongs numpy proposals and TF
  log-posterior calls twice per step.  Here the chain — proposal,
  accept/reject, sliding-window acceptance tracking, and the adaptive
  proposal-sd schedule — runs on device; all ``n`` subjects are independent
  chains vectorized along axis 0.

- :func:`hmc` replaces ``tfp.mcmc.HamiltonianMonteCarlo`` +
  ``SimpleStepSizeAdaptation`` (bgm/base.py:798-824, networks/base.py:476-498):
  leapfrog integration with a scalar step size adapted toward a target
  acceptance probability during burn-in.

Both support a ``collect`` function so that posterior *functionals* (e.g. ITE
draws or ADRF grid means) can be accumulated per kept step instead of
materializing the full ``(n_keep, n, z_dim)`` sample cube in HBM.

Execution model: the chain is driven as a host loop over fixed-length jitted
scan chunks (default 500 steps).  One compiled program is reused for every
chunk; the host overhead is microseconds per chunk.  Bounding the duration of
a single XLA program matters on TPU runtimes with program watchdogs — a
monolithic multi-thousand-step jitted chain can run long enough that the
worker is killed mid-program (observed on the v5e "axon" runtime).

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
import numpy as np

CHUNK = 500  # steps per jitted scan segment


class MHResult(NamedTuple):
    samples: jax.Array  # collected values, leading axis n_keep
    q_sd: jax.Array  # final proposal sd (scalar)
    accept_rate: jax.Array  # windowed acceptance rate at the end (scalar)


def _mh_step(carry, key, log_prob_fn, q_sd_is_adaptive, burn_in,
             target_rate, tolerance, adjustment_interval, window_size,
             recompute_current, shared_eval_key, paired_log_prob_fn=None):
    state, logp, q_sd, window, t = carry
    k_prop, k_unif, k_lp1, k_lp2 = jax.random.split(key, 4)
    if shared_eval_key:
        # One evaluation key per step: targets that derive auxiliary
        # randomness from the key (e.g. FullMCMC's per-step weight-sample
        # index) then compare proposed vs current under the SAME draw, as
        # the reference does with one rand_idx per step (fullmcmc.py:443-452).
        k_lp2 = k_lp1

    proposed = state + q_sd * jax.random.normal(k_prop, state.shape, state.dtype)
    if recompute_current and paired_log_prob_fn is not None:
        # Single-launch paired evaluation: proposed and current states are
        # stacked into one 2n-row kernel call (stochastic targets draw
        # independent noise per row block, so the halves still get distinct
        # weight perturbations — see CausalBGM._make_param_log_prob).
        logp_prop, logp = paired_log_prob_fn(proposed, state, k_lp1, k_lp2)
    else:
        logp_prop = log_prob_fn(proposed, k_lp1)
        if recompute_current:
            # Stochastic targets (flipout BNNs) re-evaluate the current state
            # with fresh weight noise each step, exactly as the reference does
            # by calling get_log_posterior twice (causalbgm/base.py:865-866).
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

    return (new_state, new_logp, q_sd, window, t + 1), rate


def adaptive_mh(log_prob_fn: Callable, init_state, key, *, burn_in: int = 5000,
                n_keep: int = 3000, q_sd: float = 1.0, adaptive: bool = True,
                target_rate: float = 0.25, tolerance: float = 0.05,
                adjustment_interval: int = 50, window_size: int = 100,
                recompute_current: bool = False, shared_eval_key: bool = False,
                collect: Optional[Callable] = None,
                paired_log_prob_fn: Optional[Callable] = None,
                multi_step_fn: Optional[Callable] = None,
                params=None, jit_cache: Optional[dict] = None,
                early_stop: Optional[dict] = None) -> MHResult:
    """Vectorized adaptive random-walk Metropolis–Hastings.

    Parameters
    ----------
    log_prob_fn : callable ``(state, key) -> (n,)``
        Batched log target over ``n`` independent chains.  With ``params``
        given, the signature is ``(params, state, key)`` instead (see below).
    init_state : (n, d) array
        Initial chain states.
    shared_eval_key : bool
        With ``recompute_current``, evaluate proposed and current state with
        the SAME key within a step — required when the target's auxiliary
        randomness (e.g. a weight-sample index) must be common to both sides
        of the accept ratio.
    collect : callable ``(state, key) -> pytree`` or None
        Per-kept-step statistic; defaults to the raw state.  Using a small
        statistic keeps HBM usage at ``n_keep × |stat|``.  With ``params``
        given, the signature is ``(params, state, key)``.
    paired_log_prob_fn : callable or None
        Optional ``(proposed, current, k1, k2) -> (logp_prop, logp_cur)``
        (``(params, proposed, current, k1, k2) -> ...`` in params mode) that
        evaluates BOTH states of a ``recompute_current`` step in one launch —
        on TPU this stacks the two states into a single 2n-row fused-kernel
        call, halving kernel launches on the default BNN predict path.
    multi_step_fn : callable or None
        Params-mode-only ``(params, state, q_sd, key) ->
        (state, logp, accept_counts)`` advancing every chain
        ``adjustment_interval`` steps in ONE fused launch (see
        pallas_kernels.make_fused_mh_steps_bnn).  Used for the burn-in phase
        when ``recompute_current`` and the cadences align (``burn_in`` and
        ``window_size`` multiples of ``adjustment_interval``); q_sd is frozen
        within each window, which is exactly the reference's adaptation
        cadence (q_sd only changes at interval boundaries) — the boundary
        adjustment here fires at the START of a window from the rates of the
        preceding window, a one-step offset from the reference's in-step
        check.  The sampling phase (``collect``) stays per-step.
    params : pytree or None
        Explicit-parameters mode: all arrays the target/collector close over
        (network weights, conditioning data) are passed through the jitted
        chain programs as arguments instead of being baked into the trace as
        closure constants.  Required for ``jit_cache`` to be sound.
    jit_cache : dict or None
        Cross-call compiled-program cache.  Repeated chains with the same
        shapes/statics (e.g. every ``predict`` on a model) then skip the
        ~10 s per-call retrace entirely.  The dict MUST be dedicated to one
        fixed (log_prob_fn, paired_log_prob_fn, collect) semantic triple —
        entries are additionally keyed on shapes, dtypes, and the adaptation
        statics, but function *values* are the caller's contract.
    early_stop : dict or None
        Opt-in ESS-adaptive chain length (beyond-reference; the reference
        always runs the full fixed schedule, causalbgm/base.py:860-898).
        Keys: ``min_ess`` (required) — stop once the minimum effective
        sample size over every collected series reaches this; ``max_rhat``
        (default 1.01) — AND split-R̂ is at most this everywhere;
        ``min_keep`` (default ``2 * CHUNK``) — never judge on fewer draws;
        ``check_every`` (default ``CHUNK``) — diagnostic cadence in kept
        steps; ``gate_cols`` (default 2048) — for WIDE collected leaves
        (e.g. per-subject ITE series shaped (steps, n)), the gate judges a
        fixed random subsample of at most this many columns instead of all
        of them.  The FFT-based ESS over every subject series was measured
        to cost more wall-clock than the steps it saved at n=10000
        (RESULTS.md round 5); the subsampled minimum is a stopping
        HEURISTIC (the true min over all subjects can be lower), while the
        returned statistics stay exact for whatever draws were kept.
        Checks run host-side on incrementally accumulated copies of the
        gate columns (each chunk is sliced on device and transferred once
        when it lands; the chain state never leaves the device), so total
        transfer is linear in the run length and bounded by ``gate_cols``
        per step.  On stop, ``samples`` simply has fewer than ``n_keep``
        rows — callers size off the returned array.

    Returns
    -------
    MHResult with ``samples`` stacked along the leading (n_keep) axis
    (fewer rows if ``early_stop`` triggered).
    """
    if params is None:
        _lp_outer, _plp_outer, _col_outer = log_prob_fn, paired_log_prob_fn, collect
        lp = lambda p, s, k: _lp_outer(s, k)
        plp = None if _plp_outer is None else (
            lambda p, a, b, k1, k2: _plp_outer(a, b, k1, k2))
        col = None if _col_outer is None else (lambda p, s, k: _col_outer(s, k))
        params = ()
    else:
        lp, plp, col = log_prob_fn, paired_log_prob_fn, collect
    collect_fn = (lambda p, s, k: s) if col is None else col

    k_init, key = jax.random.split(key)
    logp0 = lp(params, init_state, k_init)

    statics = dict(
        q_sd_is_adaptive=bool(adaptive), burn_in=burn_in,
        target_rate=target_rate, tolerance=tolerance,
        adjustment_interval=adjustment_interval, window_size=window_size,
        recompute_current=recompute_current, shared_eval_key=shared_eval_key)

    if jit_cache is None:
        jit_cache = {}  # per-call: chunks of equal n_steps still share one program
    cache_tag = (
        tuple(sorted(statics.items())), plp is not None, col is not None,
        init_state.shape, str(init_state.dtype),
        jax.tree.structure(params),
        tuple((l.shape, str(l.dtype)) for l in jax.tree.leaves(params)))

    def bind_step(params):
        return partial(
            _mh_step,
            log_prob_fn=lambda s, k: lp(params, s, k),
            paired_log_prob_fn=None if plp is None else (
                lambda a, b, k1, k2: plp(params, a, b, k1, k2)),
            **statics)

    def get_chunk(kind, n_steps):
        cache_key = (kind, n_steps, cache_tag)
        if cache_key in jit_cache:
            return jit_cache[cache_key]

        if kind == "burn":
            @jax.jit
            def chunk(carry, chunk_key, params):
                step = bind_step(params)
                keys = jax.random.split(chunk_key, n_steps)
                carry, rates = jax.lax.scan(lambda c, k: step(c, k), carry, keys)
                return carry, rates[-1]
        else:
            @jax.jit
            def chunk(carry, chunk_key, params):
                step = bind_step(params)
                keys = jax.random.split(chunk_key, n_steps)

                def body(c, k):
                    k_mh, k_col = jax.random.split(k)
                    new_c, rate = step(c, k_mh)
                    return new_c, (collect_fn(params, new_c[0], k_col), rate)

                carry, (samples, rates) = jax.lax.scan(body, carry, keys)
                return carry, samples, rates[-1]

        jit_cache[cache_key] = chunk
        return chunk

    window = jnp.zeros((window_size,), jnp.float32)
    carry = (init_state, logp0, jnp.asarray(q_sd, jnp.float32), window,
             jnp.asarray(0, jnp.int32))

    use_mega = (
        multi_step_fn is not None and recompute_current and burn_in > 0
        and adjustment_interval > 0
        and burn_in % adjustment_interval == 0
        and window_size % adjustment_interval == 0)
    K = adjustment_interval
    n_real = init_state.shape[0]

    def get_mega_chunk(n_windows):
        cache_key = ("mega", n_windows, cache_tag)
        if cache_key in jit_cache:
            return jit_cache[cache_key]

        @jax.jit
        def chunk(carry, chunk_key, params):
            keys = jax.random.split(chunk_key, n_windows)

            def body(c, k):
                state, logp, q_sd_c, win, t = c
                # Boundary adaptation from the preceding window's rates.
                n_valid = jnp.minimum(jnp.maximum(t, 1), window_size).astype(jnp.float32)
                rate_now = jnp.sum(win) / n_valid

                def adjust(q):
                    q = jnp.where(rate_now < target_rate - tolerance, q * 0.9, q)
                    q = jnp.where(rate_now > target_rate + tolerance, q * 1.1, q)
                    return q

                do_adjust = bool(adaptive) & (t > 0) & (t < burn_in)
                q_sd_c = jnp.where(do_adjust, adjust(q_sd_c), q_sd_c)

                state, logp, counts = multi_step_fn(params, state, q_sd_c, k)
                rates = counts / jnp.float32(n_real)
                win = jax.lax.dynamic_update_slice(win, rates, (t % window_size,))
                return (state, logp, q_sd_c, win, t + K), rates[-1]

            carry, rates = jax.lax.scan(body, carry, keys)
            return carry, rates[-1]

        jit_cache[cache_key] = chunk
        return chunk

    # Phase 1: burn-in (adaptation active, nothing collected).
    rate = jnp.asarray(0.0)
    done = 0
    windows_per_chunk = max(1, CHUNK // K)
    while done < burn_in:
        key, k_chunk = jax.random.split(key)
        if use_mega:
            n_windows = min(windows_per_chunk, (burn_in - done) // K)
            carry, rate = get_mega_chunk(n_windows)(carry, k_chunk, params)
            done += n_windows * K
        else:
            n_steps = min(CHUNK, burn_in - done)
            carry, rate = get_chunk("burn", n_steps)(carry, k_chunk, params)
            done += n_steps

    # Phase 2: sampling (no adaptation fires since t >= burn_in).
    if early_stop is not None:
        es_min_ess = float(early_stop["min_ess"])
        es_max_rhat = float(early_stop.get("max_rhat", 1.01))
        es_min_keep = int(early_stop.get("min_keep", 2 * CHUNK))
        es_check_every = max(1, int(early_stop.get("check_every", CHUNK)))
        es_gate_cols = int(early_stop.get("gate_cols", 2048))
        gate_cols_idx = None  # per-leaf column subsample, fixed on first chunk

    def _gate_slice(leaves):
        # Judge wide leaves on a fixed column subsample (seeded, chosen
        # once): the full-width FFT ESS costs more than the steps it saves.
        nonlocal gate_cols_idx
        if gate_cols_idx is None:
            rng = np.random.RandomState(0)
            gate_cols_idx = [
                (jnp.asarray(np.sort(rng.choice(l.shape[1], es_gate_cols,
                                                replace=False)))
                 if l.ndim >= 2 and l.shape[1] > es_gate_cols else None)
                for l in leaves]
        return [l if idx is None else jnp.take(l, idx, axis=1)
                for l, idx in zip(leaves, gate_cols_idx)]

    chunks = []
    host_leaves = None  # incremental host-side copies (early_stop only)
    done = 0
    last_check = 0
    while done < n_keep:
        n_steps = min(CHUNK, n_keep - done)
        key, k_chunk = jax.random.split(key)
        carry, samples, rate = get_chunk("keep", n_steps)(carry, k_chunk, params)
        chunks.append(samples)
        done += n_steps
        if early_stop is not None:
            # Slice the gate columns ON DEVICE, then transfer only the
            # newest chunk's slice (O(chunk x gate_cols) per chunk, linear
            # over the run); checks run on the accumulated numpy buffers
            # with no further device transfer.
            new_leaves = [np.asarray(l)
                          for l in _gate_slice(jax.tree.leaves(samples))]
            if host_leaves is None:
                host_leaves = [[l] for l in new_leaves]
            else:
                for buf, l in zip(host_leaves, new_leaves):
                    buf.append(l)
        if (early_stop is not None and done < n_keep and done >= es_min_keep
                and done - last_check >= es_check_every):
            last_check = done
            converged = True
            for buf in host_leaves:
                arr = np.concatenate(buf, axis=0) if len(buf) > 1 else buf[0]
                ess = effective_sample_size(arr)
                rhat = split_rhat(arr)
                if (not np.all(np.isfinite(ess)) or np.min(ess) < es_min_ess
                        or not np.all(np.isfinite(rhat))
                        or np.max(rhat) > es_max_rhat):
                    converged = False
                    break
            if converged:
                break

    if not chunks:  # n_keep=0: burn-in only (throughput benchmarking)
        stacked = None
    elif len(chunks) > 1:
        stacked = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *chunks)
    else:
        stacked = chunks[0]
    return MHResult(samples=stacked, q_sd=carry[2], accept_rate=rate)


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
              n_adapt, adaptation_rate):
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
    step_size = jnp.where(t < n_adapt, new_step, step_size)

    return (state, logp, step_size, t + 1), (accept, jnp.mean(accept.astype(jnp.float32)))


def hmc(log_prob_fn: Callable, init_state, key, *, burn_in: int = 5000,
        n_keep: int = 3000, step_size: float = 0.01, num_leapfrog: int = 10,
        target_accept: float = 0.75, adapt_fraction: float = 0.8,
        adaptation_rate: float = 0.01, collect: Optional[Callable] = None,
        params=None, jit_cache: Optional[dict] = None) -> HMCResult:
    """HMC over ``n`` independent chains (axis 0) with burn-in step-size
    adaptation for the first ``adapt_fraction`` of burn-in steps.

    ``log_prob_fn(state, key) -> (n,)`` must be differentiable in ``state``.

    ``params``/``jit_cache`` mirror :func:`adaptive_mh`: with ``params``
    given, ``log_prob_fn``/``collect`` take ``(params, state, key)`` and all
    closed-over arrays flow through the jitted chain programs as arguments,
    so a caller-owned ``jit_cache`` makes repeated same-shape chains (e.g.
    every ``bs``-sized batch of ``BGM.predict``) reuse one compiled program
    instead of retracing per call.
    """
    if params is None:
        _lp_outer, _col_outer = log_prob_fn, collect
        lp = lambda p, s, k: _lp_outer(s, k)
        col = None if _col_outer is None else (lambda p, s, k: _col_outer(s, k))
        params = ()
    else:
        lp, col = log_prob_fn, collect
    collect_fn = (lambda p, s, k: s) if col is None else col

    n_adapt = int(burn_in * adapt_fraction)
    k_init, key = jax.random.split(key)
    logp0 = lp(params, init_state, k_init)

    # HMC does num_leapfrog gradient evals per step; keep chunks shorter so a
    # single program stays well under TPU watchdog territory.
    chunk = max(1, CHUNK // max(1, num_leapfrog // 2))

    if jit_cache is None:
        jit_cache = {}
    cache_tag = (
        num_leapfrog, float(target_accept), n_adapt, float(adaptation_rate),
        col is not None, init_state.shape, str(init_state.dtype),
        jax.tree.structure(params),
        tuple((l.shape, str(l.dtype)) for l in jax.tree.leaves(params)))

    def bind_step(params):
        lp_p = lambda s, k: lp(params, s, k)
        grad_fn = jax.grad(lambda s, k: jnp.sum(lp_p(s, k)))
        return partial(_hmc_step, log_prob_fn=lp_p, grad_fn=grad_fn,
                       num_leapfrog=num_leapfrog, target_accept=target_accept,
                       n_adapt=n_adapt, adaptation_rate=adaptation_rate)

    def get_chunk(kind, n_steps):
        cache_key = (kind, n_steps, cache_tag)
        if cache_key in jit_cache:
            return jit_cache[cache_key]

        if kind == "burn":
            @jax.jit
            def chunk_fn(carry, chunk_key, params):
                step = bind_step(params)
                keys = jax.random.split(chunk_key, n_steps)
                carry, _ = jax.lax.scan(lambda c, k: (step(c, k)[0], None), carry, keys)
                return carry
        else:
            @jax.jit
            def chunk_fn(carry, chunk_key, params):
                step = bind_step(params)
                keys = jax.random.split(chunk_key, n_steps)

                def body(c, k):
                    k_hmc, k_col = jax.random.split(k)
                    new_c, (_, acc_frac) = step(c, k_hmc)
                    return new_c, (collect_fn(params, new_c[0], k_col), acc_frac)

                carry, (samples, accs) = jax.lax.scan(body, carry, keys)
                return carry, samples, jnp.sum(accs)

        jit_cache[cache_key] = chunk_fn
        return chunk_fn

    carry = (init_state, logp0, jnp.asarray(step_size, jnp.float32),
             jnp.asarray(0, jnp.int32))

    done = 0
    while done < burn_in:
        n_steps = min(chunk, burn_in - done)
        key, k_chunk = jax.random.split(key)
        carry = get_chunk("burn", n_steps)(carry, k_chunk, params)
        done += n_steps

    chunks = []
    acc_sum = jnp.asarray(0.0)
    done = 0
    while done < n_keep:
        n_steps = min(chunk, n_keep - done)
        key, k_chunk = jax.random.split(key)
        carry, samples, acc = get_chunk("keep", n_steps)(carry, k_chunk, params)
        chunks.append(samples)
        acc_sum = acc_sum + acc
        done += n_steps

    stacked = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *chunks) \
        if len(chunks) > 1 else chunks[0]
    return HMCResult(samples=stacked, step_size=carry[2],
                     accept_rate=acc_sum / max(n_keep, 1))


# ---------------------------------------------------------------------------
# Metropolis-adjusted Langevin (MALA) — beyond-reference sampler
# ---------------------------------------------------------------------------


def _mala_step(carry, key, value_and_grad_fn, adaptive, burn_in, target_rate,
               tolerance, adjustment_interval, window_size):
    state, logp, grad, eps, window, t = carry
    k_noise, k_unif, k_lp = jax.random.split(key, 3)

    drift = 0.5 * eps**2 * grad
    noise = eps * jax.random.normal(k_noise, state.shape, state.dtype)
    proposed = state + drift + noise
    logp_prop, grad_prop = value_and_grad_fn(proposed, k_lp)

    # Asymmetric proposal correction: log q(x|x') - log q(x'|x).
    fwd = proposed - state - drift
    bwd = state - proposed - 0.5 * eps**2 * grad_prop
    log_q_fwd = -jnp.sum(fwd**2, axis=-1) / (2.0 * eps**2)
    log_q_bwd = -jnp.sum(bwd**2, axis=-1) / (2.0 * eps**2)
    log_ratio = jnp.minimum(logp_prop - logp + log_q_bwd - log_q_fwd, 0.0)

    accept = jnp.log(jax.random.uniform(k_unif, logp.shape)) < log_ratio
    state = jnp.where(accept[:, None], proposed, state)
    logp = jnp.where(accept, logp_prop, logp)
    grad = jnp.where(accept[:, None], grad_prop, grad)

    accept_frac = jnp.mean(accept.astype(jnp.float32))
    window = window.at[t % window_size].set(accept_frac)
    n_valid = jnp.minimum(t + 1, window_size).astype(jnp.float32)
    rate = jnp.sum(window) / n_valid

    def adjust(e):
        e = jnp.where(rate < target_rate - tolerance, e * 0.9, e)
        e = jnp.where(rate > target_rate + tolerance, e * 1.1, e)
        return e

    do_adjust = adaptive & (t < burn_in) & (t % adjustment_interval == 0) & (t > 0)
    eps = jnp.where(do_adjust, adjust(eps), eps)
    return (state, logp, grad, eps, window, t + 1), rate


def _mala_step_fresh(carry, key, value_and_grad_fn, adaptive, burn_in,
                     target_rate, tolerance, adjustment_interval, window_size):
    """MALA step for STOCHASTIC targets (e.g. the flipout BNN posterior):
    both the current state and the proposal are re-evaluated every step with
    fresh, independent noise keys — nothing is cached across steps, mirroring
    what ``adaptive_mh(recompute_current=True)`` does for random-walk MH.
    Caching the current log-density (as :func:`_mala_step` does) would make
    the chain sticky at lucky noise draws and bias the stationary law."""
    state, eps, window, t = carry
    k_cur, k_noise, k_unif, k_prop = jax.random.split(key, 4)

    logp, grad = value_and_grad_fn(state, k_cur)
    drift = 0.5 * eps**2 * grad
    noise = eps * jax.random.normal(k_noise, state.shape, state.dtype)
    proposed = state + drift + noise
    logp_prop, grad_prop = value_and_grad_fn(proposed, k_prop)

    fwd = proposed - state - drift
    bwd = state - proposed - 0.5 * eps**2 * grad_prop
    log_q_fwd = -jnp.sum(fwd**2, axis=-1) / (2.0 * eps**2)
    log_q_bwd = -jnp.sum(bwd**2, axis=-1) / (2.0 * eps**2)
    log_ratio = jnp.minimum(logp_prop - logp + log_q_bwd - log_q_fwd, 0.0)

    accept = jnp.log(jax.random.uniform(k_unif, logp.shape)) < log_ratio
    state = jnp.where(accept[:, None], proposed, state)

    accept_frac = jnp.mean(accept.astype(jnp.float32))
    window = window.at[t % window_size].set(accept_frac)
    n_valid = jnp.minimum(t + 1, window_size).astype(jnp.float32)
    rate = jnp.sum(window) / n_valid

    def adjust(e):
        e = jnp.where(rate < target_rate - tolerance, e * 0.9, e)
        e = jnp.where(rate > target_rate + tolerance, e * 1.1, e)
        return e

    do_adjust = adaptive & (t < burn_in) & (t % adjustment_interval == 0) & (t > 0)
    eps = jnp.where(do_adjust, adjust(eps), eps)
    return (state, eps, window, t + 1), rate


def adaptive_mala(log_prob_fn: Callable, init_state, key, *, burn_in: int = 5000,
                  n_keep: int = 3000, step_size: float = 0.1,
                  target_rate: float = 0.574, tolerance: float = 0.05,
                  adjustment_interval: int = 50, window_size: int = 100,
                  adaptive: bool = True, recompute_current: bool = False,
                  collect: Optional[Callable] = None) -> MHResult:
    """Metropolis-adjusted Langevin over ``n`` independent chains.

    Gradient-informed proposals mix far better than the reference's
    random-walk MH on concentrated posteriors: the step size adapts toward
    the MALA-optimal ~0.574 acceptance rate during burn-in.  Requires a
    differentiable ``log_prob_fn(state, key) -> (n,)``.

    ``recompute_current=True`` re-evaluates BOTH sides of the accept ratio
    with fresh keys every step (two value-and-grad calls per step) instead of
    caching the accepted state's log-density/gradient — required when the
    target itself is stochastic in ``key`` (the flipout BNN posterior), where
    the cached variant's chain would stick at favorable noise draws.
    """
    def value_and_grad_fn(s, k):
        # One forward + one backward gives per-row values AND the gradient
        # (the target is row-separable, so a ones cotangent is exact).
        logp, vjp = jax.vjp(lambda s_: log_prob_fn(s_, k), s)
        (g,) = vjp(jnp.ones_like(logp))
        return logp, g

    k_init, key = jax.random.split(key)

    if recompute_current:
        step = partial(_mala_step_fresh, value_and_grad_fn=value_and_grad_fn,
                       adaptive=jnp.asarray(adaptive), burn_in=burn_in,
                       target_rate=target_rate, tolerance=tolerance,
                       adjustment_interval=adjustment_interval,
                       window_size=window_size)
    else:
        logp0, grad0 = value_and_grad_fn(init_state, k_init)
        step = partial(_mala_step, value_and_grad_fn=value_and_grad_fn,
                       adaptive=jnp.asarray(adaptive), burn_in=burn_in,
                       target_rate=target_rate, tolerance=tolerance,
                       adjustment_interval=adjustment_interval,
                       window_size=window_size)

    @partial(jax.jit, static_argnames=("n_steps",))
    def burn_chunk(carry, chunk_key, n_steps):
        keys = jax.random.split(chunk_key, n_steps)
        carry, rates = jax.lax.scan(lambda c, k: step(c, k), carry, keys)
        return carry, rates[-1]

    collect_fn = (lambda s, k: s) if collect is None else collect

    @partial(jax.jit, static_argnames=("n_steps",))
    def keep_chunk(carry, chunk_key, n_steps):
        keys = jax.random.split(chunk_key, n_steps)

        def body(c, k):
            k_step, k_col = jax.random.split(k)
            new_c, rate = step(c, k_step)
            return new_c, (collect_fn(new_c[0], k_col), rate)

        carry, (samples, rates) = jax.lax.scan(body, carry, keys)
        return carry, samples, rates[-1]

    window = jnp.zeros((window_size,), jnp.float32)
    if recompute_current:
        carry = (init_state, jnp.asarray(step_size, jnp.float32),
                 window, jnp.asarray(0, jnp.int32))
        eps_idx = 1
    else:
        carry = (init_state, logp0, grad0, jnp.asarray(step_size, jnp.float32),
                 window, jnp.asarray(0, jnp.int32))
        eps_idx = 3

    rate = jnp.asarray(0.0)
    done = 0
    while done < burn_in:
        n_steps = min(CHUNK, burn_in - done)
        key, k_chunk = jax.random.split(key)
        carry, rate = burn_chunk(carry, k_chunk, n_steps=n_steps)
        done += n_steps

    chunks = []
    done = 0
    while done < n_keep:
        n_steps = min(CHUNK, n_keep - done)
        key, k_chunk = jax.random.split(key)
        carry, samples, rate = keep_chunk(carry, k_chunk, n_steps=n_steps)
        chunks.append(samples)
        done += n_steps

    stacked = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *chunks) \
        if len(chunks) > 1 else chunks[0]
    return MHResult(samples=stacked, q_sd=carry[eps_idx], accept_rate=rate)


# ---------------------------------------------------------------------------
# Convergence diagnostics (beyond-reference: the reference reports only the
# final acceptance rate, causalbgm/base.py:897-904).  Host-side numpy over
# the collected draws — n_keep x dims arrays are small next to the chains.
# ---------------------------------------------------------------------------


def _fft_len(n):
    """FFT length used by :func:`_autocovariance` for an n-draw series —
    shared with the ESS chunk-size bound so the two never desync."""
    return 1 << int(2 * n - 1).bit_length()


def _autocovariance(x):
    """Per-column biased autocovariance of ``x (n, m)`` via FFT."""
    n = x.shape[0]
    xc = x - x.mean(axis=0)
    nfft = _fft_len(n)
    f = np.fft.rfft(xc, n=nfft, axis=0)
    acov = np.fft.irfft(f * np.conj(f), n=nfft, axis=0)[:n].real
    return acov / n


def effective_sample_size(draws, axis=0):
    """Effective sample size per series (Geyer initial positive sequence).

    ``draws`` has the MCMC draw axis at ``axis``; every other axis indexes an
    independent series (e.g. per-subject effect draws).  The integrated
    autocorrelation time sums paired autocorrelations Γ_k = ρ_{2k} + ρ_{2k+1}
    while the pairs stay positive and monotonically decreasing (the standard
    single-chain estimator).  Returns an array shaped like ``draws`` without
    the draw axis; constant series report the full draw count.
    """
    x = np.moveaxis(np.asarray(draws, np.float64), axis, 0)
    n = x.shape[0]
    shape = x.shape[1:]
    x = x.reshape(n, -1)
    if n < 4:
        return np.where(np.isfinite(x).all(axis=0), float(n), np.nan).reshape(shape)
    out = np.empty(x.shape[1])
    # Bound the FFT workspace: the dominant transient is the complex128
    # rfft output (nfft/2+1, cols) x 16 B; cap it near 256 MB per chunk.
    chunk = int(np.clip((1 << 28) // (_fft_len(n) * 16), 128, 8192))
    for c0 in range(0, x.shape[1], chunk):
        xb = x[:, c0 : c0 + chunk]
        acov = _autocovariance(xb)
        var = acov[0]
        ok = var > 0  # False for constant AND for NaN-contaminated series
        rho = acov / np.where(ok, var, 1.0)
        n_pairs = (n - 2) // 2
        gamma = rho[1 : 1 + 2 * n_pairs : 2] + rho[2 : 2 + 2 * n_pairs : 2]
        alive = np.logical_and.accumulate(gamma > 0, axis=0)
        gamma = np.minimum.accumulate(np.where(alive, gamma, np.inf), axis=0)
        gamma = np.where(alive, gamma, 0.0)
        tau = 1.0 + 2.0 * gamma.sum(axis=0)  # includes lag-0 (rho_0 = 1)
        ess = np.where(ok, n / np.maximum(tau, 1.0 / n), float(n))
        ess = np.clip(ess, 1.0, float(n))
        # A diverged chain (NaN/inf draws) must not masquerade as perfectly
        # mixed: propagate NaN instead of the constant-series fast path.
        out[c0 : c0 + chunk] = np.where(np.isfinite(xb).all(axis=0), ess, np.nan)
    return out.reshape(shape)


def split_rhat(draws, axis=0):
    """Split-R̂ (Gelman–Rubin on the two halves of each chain).

    Values near 1 indicate the first and second half of the chain agree in
    mean and variance; > ~1.01 flags non-convergence.  Same shape contract
    as :func:`effective_sample_size`; constant series report 1.0.
    """
    x = np.moveaxis(np.asarray(draws, np.float64), axis, 0)
    n = x.shape[0]
    shape = x.shape[1:]
    x = x.reshape(n, -1)
    half = n // 2
    if half < 2:
        return np.where(np.isfinite(x).all(axis=0), 1.0, np.nan).reshape(shape)
    chains = np.stack([x[:half], x[n - half :]])  # (2, half, m)
    W = chains.var(axis=1, ddof=1).mean(axis=0)
    B = half * chains.mean(axis=1).var(axis=0, ddof=1)
    var_plus = (half - 1) / half * W + B / half
    ok = W > 0
    rhat = np.sqrt(var_plus / np.where(ok, W, 1.0))
    # W == 0 with B > 0 is the WORST non-convergence (each half stuck at a
    # different value, e.g. a saturated decode that jumps) -> inf, not 1.0;
    # W == B == 0 is a genuinely constant chain -> 1.0; NaN draws -> NaN.
    stuck_diverged = (~ok) & (B > 0)
    rhat = np.where(ok, rhat, np.where(stuck_diverged, np.inf, 1.0))
    rhat = np.where(np.isfinite(x).all(axis=0), rhat, np.nan)
    return rhat.reshape(shape)


def chain_diagnostics(draws, axis=0, accept_rate=None):
    """Bundle ESS + split-R̂ (+ acceptance) for a block of chain draws."""
    out = {
        "ess": effective_sample_size(draws, axis=axis),
        "rhat": split_rhat(draws, axis=axis),
    }
    if accept_rate is not None:
        out["accept_rate"] = float(accept_rate)
    return out
