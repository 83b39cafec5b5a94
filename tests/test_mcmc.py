"""Statistical tests for the MCMC kernels (sampling from known targets)."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesgm_tpu.ops import mcmc


def _std_normal_logp(z, key):
    return -0.5 * jnp.sum(z**2, axis=-1)


def test_adaptive_mh_recovers_standard_normal():
    n_chains, dim = 64, 3
    init = jnp.zeros((n_chains, dim))
    res = mcmc.adaptive_mh(_std_normal_logp, init, jax.random.PRNGKey(0),
                           burn_in=500, n_keep=2000, q_sd=1.0, adaptive=True)
    samples = np.asarray(res.samples).reshape(-1, dim)
    np.testing.assert_allclose(samples.mean(axis=0), 0.0, atol=0.1)
    np.testing.assert_allclose(samples.std(axis=0), 1.0, atol=0.1)
    # adaptation pushed acceptance into the target band
    assert 0.10 < float(res.accept_rate) < 0.45


def test_adaptive_mh_adapts_q_sd_down_for_tight_target():
    # Very tight target: initial q_sd=1.0 must shrink during burn-in.
    def logp(z, key):
        return -0.5 * jnp.sum((z / 0.01) ** 2, axis=-1)

    init = jnp.zeros((16, 2))
    res = mcmc.adaptive_mh(logp, init, jax.random.PRNGKey(1),
                           burn_in=1000, n_keep=100, q_sd=1.0, adaptive=True)
    assert float(res.q_sd) < 0.5


def test_adaptive_mh_fixed_q_sd_unchanged():
    init = jnp.zeros((8, 2))
    res = mcmc.adaptive_mh(_std_normal_logp, init, jax.random.PRNGKey(2),
                           burn_in=200, n_keep=50, q_sd=0.7, adaptive=False)
    np.testing.assert_allclose(float(res.q_sd), 0.7, rtol=1e-6)


def test_adaptive_mh_collect_statistic():
    init = jnp.zeros((32, 2))
    res = mcmc.adaptive_mh(
        _std_normal_logp, init, jax.random.PRNGKey(3), burn_in=100, n_keep=200,
        collect=lambda s, k: jnp.mean(s**2))
    assert res.samples.shape == (200,)
    np.testing.assert_allclose(float(np.mean(np.asarray(res.samples))), 1.0, atol=0.25)


def test_adaptive_mh_early_stop_triggers_on_fast_mixing_chain():
    """ESS-adaptive chain length (VERDICT r3 item 4): a well-mixing target
    reaches the ESS/R-hat gate at the first chunk boundary and the chain
    stops early — samples has fewer than n_keep rows."""
    init = jnp.zeros((64, 2))
    res = mcmc.adaptive_mh(
        _std_normal_logp, init, jax.random.PRNGKey(4), burn_in=300,
        n_keep=3000, q_sd=1.0, adaptive=True,
        collect=lambda s, k: jnp.mean(s, axis=0),  # (2,) series per step
        early_stop=dict(min_ess=50.0, max_rhat=1.2, min_keep=500,
                        check_every=500))
    kept = np.asarray(res.samples).shape[0]
    assert kept < 3000 and kept % mcmc.CHUNK == 0, kept
    d = mcmc.chain_diagnostics(np.asarray(res.samples))
    assert np.min(d["ess"]) >= 50.0
    assert np.max(d["rhat"]) <= 1.2


def test_adaptive_mh_early_stop_unreachable_runs_full_schedule():
    init = jnp.zeros((16, 2))
    res = mcmc.adaptive_mh(
        _std_normal_logp, init, jax.random.PRNGKey(5), burn_in=100,
        n_keep=1000, q_sd=1.0,
        collect=lambda s, k: jnp.mean(s, axis=0),
        early_stop=dict(min_ess=1e9, min_keep=500, check_every=500))
    assert np.asarray(res.samples).shape[0] == 1000


def test_hmc_recovers_shifted_normal():
    mu = jnp.array([1.5, -0.5])

    def logp(z, key):
        return -0.5 * jnp.sum((z - mu) ** 2, axis=-1)

    init = jnp.zeros((32, 2))
    res = mcmc.hmc(logp, init, jax.random.PRNGKey(0), burn_in=300, n_keep=1000,
                   step_size=0.2, num_leapfrog=5)
    samples = np.asarray(res.samples).reshape(-1, 2)
    np.testing.assert_allclose(samples.mean(axis=0), np.asarray(mu), atol=0.12)
    np.testing.assert_allclose(samples.std(axis=0), 1.0, atol=0.12)
    assert float(res.accept_rate) > 0.5


def test_hmc_step_size_adapts_up():
    init = jnp.zeros((8, 2))
    res = mcmc.hmc(_std_normal_logp, init, jax.random.PRNGKey(1), burn_in=500,
                   n_keep=50, step_size=0.001, num_leapfrog=3)
    # tiny initial step + high acceptance -> adaptation grows the step size
    assert float(res.step_size) > 0.001


def test_adaptive_mala_recovers_standard_normal():
    samples_res = mcmc.adaptive_mala(
        _std_normal_logp, jnp.zeros((64, 3)), jax.random.PRNGKey(5),
        burn_in=300, n_keep=1500, step_size=0.5)
    samples = np.asarray(samples_res.samples).reshape(-1, 3)
    np.testing.assert_allclose(samples.mean(axis=0), 0.0, atol=0.1)
    np.testing.assert_allclose(samples.std(axis=0), 1.0, atol=0.1)
    # adaptation toward the MALA-optimal band
    assert 0.4 < float(samples_res.accept_rate) <= 1.0


def test_adaptive_mala_recompute_recovers_standard_normal():
    """Fresh-noise MALA (recompute_current=True, the stochastic-target mode)
    still targets the right stationary law: on a NOISY unbiased estimate of a
    standard-normal log-density (a pseudo-marginal-style target) the draws
    recover the prior moments, and on the deterministic target it matches the
    cached variant's law."""
    def noisy_logp(s, k):
        # Unbiased-in-expectation jitter on a standard normal log-density.
        return _std_normal_logp(s, k) + 0.05 * jax.random.normal(k, (s.shape[0],))

    res = mcmc.adaptive_mala(
        noisy_logp, jnp.zeros((64, 3)), jax.random.PRNGKey(7),
        burn_in=300, n_keep=1500, step_size=0.5, recompute_current=True)
    samples = np.asarray(res.samples).reshape(-1, 3)
    np.testing.assert_allclose(samples.mean(axis=0), 0.0, atol=0.1)
    np.testing.assert_allclose(samples.std(axis=0), 1.0, atol=0.12)
    assert 0.3 < float(res.accept_rate) <= 1.0

    res_det = mcmc.adaptive_mala(
        _std_normal_logp, jnp.zeros((64, 3)), jax.random.PRNGKey(8),
        burn_in=300, n_keep=1500, step_size=0.5, recompute_current=True)
    det = np.asarray(res_det.samples).reshape(-1, 3)
    np.testing.assert_allclose(det.mean(axis=0), 0.0, atol=0.1)
    np.testing.assert_allclose(det.std(axis=0), 1.0, atol=0.1)


def test_adaptive_mh_params_mode_matches_closure_mode():
    """Explicit-params mode (jit-cacheable chains) is bit-identical to the
    closure mode given the same key chain."""
    def lp(params, s, k):
        return -0.5 * jnp.sum((s - params["mu"]) ** 2, axis=-1)

    init = jax.random.normal(jax.random.PRNGKey(3), (16, 3))
    params = {"mu": jnp.ones((3,))}
    key = jax.random.PRNGKey(4)
    r_params = mcmc.adaptive_mh(lp, init, key, burn_in=200, n_keep=50,
                                recompute_current=True, params=params)
    r_closure = mcmc.adaptive_mh(lambda s, k: lp(params, s, k), init, key,
                                 burn_in=200, n_keep=50, recompute_current=True)
    np.testing.assert_array_equal(np.asarray(r_params.samples),
                                  np.asarray(r_closure.samples))


def test_adaptive_mh_paired_eval_matches_sequential():
    """The single-launch paired (proposed, current) evaluation reproduces the
    two-call path exactly for deterministic targets."""
    def lp(params, s, k):
        return -0.5 * jnp.sum((s - params["mu"]) ** 2, axis=-1)

    def plp(params, prop, cur, k1, k2):
        stacked = jnp.concatenate([prop, cur], axis=0)
        vals = lp(params, stacked, k1)
        n = prop.shape[0]
        return vals[:n], vals[n:]

    init = jax.random.normal(jax.random.PRNGKey(5), (16, 3))
    params = {"mu": jnp.ones((3,))}
    key = jax.random.PRNGKey(6)
    r_seq = mcmc.adaptive_mh(lp, init, key, burn_in=300, n_keep=50,
                             recompute_current=True, params=params)
    r_pair = mcmc.adaptive_mh(lp, init, key, burn_in=300, n_keep=50,
                              recompute_current=True, params=params,
                              paired_log_prob_fn=plp)
    np.testing.assert_array_equal(np.asarray(r_seq.samples),
                                  np.asarray(r_pair.samples))


def test_adaptive_mh_jit_cache_reused_across_calls():
    """A shared jit_cache compiles each chunk program once; later chains with
    different param VALUES (same shapes) hit the cache and still produce
    value-dependent results."""
    def lp(params, s, k):
        return -0.5 * jnp.sum((s - params["mu"]) ** 2, axis=-1)

    init = jnp.zeros((8, 2))
    key = jax.random.PRNGKey(7)
    cache = {}
    r1 = mcmc.adaptive_mh(lp, init, key, burn_in=200, n_keep=100,
                          params={"mu": jnp.zeros((2,))}, jit_cache=cache)
    n_entries = len(cache)
    assert n_entries > 0
    r2 = mcmc.adaptive_mh(lp, init, key, burn_in=200, n_keep=100,
                          params={"mu": 5.0 * jnp.ones((2,))}, jit_cache=cache)
    assert len(cache) == n_entries  # no new programs compiled
    # The cached program really used the new values, not stale constants.
    m1 = float(np.asarray(r1.samples).mean())
    m2 = float(np.asarray(r2.samples).mean())
    assert abs(m1) < 1.0 and abs(m2 - 5.0) < 1.0


def test_hmc_params_mode_matches_closure_mode_and_caches():
    """hmc's explicit-params mode is bit-identical to closure mode, and a
    shared jit_cache is reused across same-shape calls."""
    def lp(params, s, k):
        return -0.5 * jnp.sum((s - params["mu"]) ** 2, axis=-1)

    init = jax.random.normal(jax.random.PRNGKey(8), (8, 2))
    params = {"mu": jnp.ones((2,))}
    key = jax.random.PRNGKey(9)
    cache = {}
    r_p = mcmc.hmc(lp, init, key, burn_in=100, n_keep=50, step_size=0.2,
                   num_leapfrog=3, params=params, jit_cache=cache)
    r_c = mcmc.hmc(lambda s, k: lp(params, s, k), init, key, burn_in=100,
                   n_keep=50, step_size=0.2, num_leapfrog=3)
    np.testing.assert_array_equal(np.asarray(r_p.samples), np.asarray(r_c.samples))
    n_entries = len(cache)
    assert n_entries > 0
    r2 = mcmc.hmc(lp, init, key, burn_in=100, n_keep=50, step_size=0.2,
                  num_leapfrog=3, params={"mu": 4.0 * jnp.ones((2,))},
                  jit_cache=cache)
    assert len(cache) == n_entries
    assert abs(float(np.asarray(r2.samples).mean()) - 4.0) < 1.0


def _plain_multi_step(lp_fn, K):
    """Pure-JAX stand-in for the fused K-step MH window (same contract)."""
    def mega(params, state, q_sd, key):
        def body(s, k):
            kp, ku = jax.random.split(k)
            prop = s + q_sd * jax.random.normal(kp, s.shape)
            lp_p = lp_fn(params, prop, k)
            lp_c = lp_fn(params, s, k)
            acc = jnp.log(jax.random.uniform(ku, lp_p.shape)) < lp_p - lp_c
            s = jnp.where(acc[:, None], prop, s)
            return s, jnp.sum(acc.astype(jnp.float32))
        keys = jax.random.split(key, K)
        state, counts = jax.lax.scan(body, state, keys)
        return state, lp_fn(params, state, key), counts
    return mega


def test_adaptive_mh_multi_step_burn_recovers_target():
    """Mega-window burn-in + per-step sampling recovers the target and the
    window/adaptation bookkeeping stays sound."""
    def lp(params, s, k):
        return -0.5 * jnp.sum(s**2, axis=-1)

    init = jnp.zeros((64, 3))
    res = mcmc.adaptive_mh(lp, init, jax.random.PRNGKey(10), burn_in=500,
                           n_keep=1500, q_sd=1.0, adaptive=True,
                           recompute_current=True, params={},
                           multi_step_fn=_plain_multi_step(lp, 50))
    samples = np.asarray(res.samples).reshape(-1, 3)
    np.testing.assert_allclose(samples.mean(axis=0), 0.0, atol=0.12)
    np.testing.assert_allclose(samples.std(axis=0), 1.0, atol=0.12)


def test_adaptive_mh_multi_step_adapts_q_sd():
    """Boundary adaptation fires between mega windows: a tight target must
    shrink q_sd during burn-in."""
    def lp(params, s, k):
        return -0.5 * jnp.sum((s / 0.01) ** 2, axis=-1)

    init = jnp.zeros((16, 2))
    res = mcmc.adaptive_mh(lp, init, jax.random.PRNGKey(11), burn_in=1000,
                           n_keep=50, q_sd=1.0, adaptive=True,
                           recompute_current=True, params={},
                           multi_step_fn=_plain_multi_step(lp, 50))
    assert float(res.q_sd) < 0.5


def test_effective_sample_size_iid_and_correlated():
    rng = np.random.RandomState(0)
    n, m = 3000, 6
    iid = rng.randn(n, m)
    ess = mcmc.effective_sample_size(iid)
    assert ess.shape == (m,)
    assert np.all(ess > 0.7 * n)
    # AR(1) rho=0.9: ESS/n ~ (1-rho)/(1+rho) = 0.053
    ar = np.zeros((n, m))
    eps = rng.randn(n, m) * np.sqrt(1 - 0.81)
    for t in range(1, n):
        ar[t] = 0.9 * ar[t - 1] + eps[t]
    ess_ar = mcmc.effective_sample_size(ar)
    assert np.all(ess_ar / n < 0.15) and np.all(ess_ar / n > 0.02)
    # constant series: full draw count, no NaNs
    assert np.all(mcmc.effective_sample_size(np.ones((n, 2))) == n)
    # axis contract
    assert mcmc.effective_sample_size(np.moveaxis(iid, 0, 1), axis=1).shape == (m,)


def test_split_rhat_flags_nonstationary_chain():
    rng = np.random.RandomState(1)
    n, m = 2000, 4
    good = rng.randn(n, m)
    assert np.all(np.abs(mcmc.split_rhat(good) - 1.0) < 0.01)
    drifted = np.concatenate([good[: n // 2], 5.0 + good[n // 2 :]])
    assert np.all(mcmc.split_rhat(drifted) > 1.5)
    assert np.all(mcmc.split_rhat(np.ones((n, 2))) == 1.0)
    # worst non-convergence: each half stuck at a DIFFERENT constant
    stuck = np.concatenate([np.zeros((n // 2, 2)), np.ones((n // 2, 2))])
    assert np.all(np.isinf(mcmc.split_rhat(stuck)))
    # diverged chains (NaN draws) must not report healthy diagnostics
    bad = np.full((n, 2), np.nan)
    assert np.all(np.isnan(mcmc.split_rhat(bad)))
    assert np.all(np.isnan(mcmc.effective_sample_size(bad)))


def test_chain_diagnostics_bundle():
    x = np.random.RandomState(2).randn(500, 3)
    d = mcmc.chain_diagnostics(x, accept_rate=0.25)
    assert set(d) == {"ess", "rhat", "accept_rate"} and d["accept_rate"] == 0.25


def test_effective_sample_size_chunk_boundary():
    """Column-chunked FFT path (>8192 series) matches the single-chunk path."""
    rng = np.random.RandomState(3)
    x = rng.randn(200, 9000)
    ess = mcmc.effective_sample_size(x)
    assert ess.shape == (9000,)
    # same values whether a column lands in chunk 1 or 2
    ref = mcmc.effective_sample_size(x[:, 8190:8194])
    np.testing.assert_allclose(ess[8190:8194], ref, rtol=1e-10)


def test_adaptive_mh_early_stop_gate_column_subsample():
    """Wide per-subject collects are judged on a fixed gate_cols subsample
    (RESULTS.md round 5: full-width FFT ESS cost more than it saved); the
    returned draw matrix keeps FULL width and the gate still fires."""
    n = 64
    init = jnp.zeros((n, 2))
    res = mcmc.adaptive_mh(
        _std_normal_logp, init, jax.random.PRNGKey(6), burn_in=300,
        n_keep=3000, q_sd=1.0, adaptive=True,
        collect=lambda s, k: jnp.sum(s, axis=1),  # (n,) per-subject series
        early_stop=dict(min_ess=50.0, max_rhat=1.2, min_keep=500,
                        check_every=500, gate_cols=8))
    arr = np.asarray(res.samples)
    assert arr.shape[1] == n          # full width returned
    assert arr.shape[0] < 3000        # gate fired on the subsample
