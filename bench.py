"""Headline benchmark: CausalBGM training + posterior-inference throughput.

Workload matches the reference tutorial's Sim_Hirano_Imbens configuration
(n=20000, v_dim=200, batch_size=32 -> 625 batches/epoch).  The reference
sustains ~55 batches/s on CPU (SURVEY.md §6, tutorial_py.ipynb cell 14);
that is the ``vs_baseline`` denominator for the training line.

Two JSON lines:
1. predict-phase: adaptive-MH chain throughput on the n=20000 HI posterior
   (the BASELINE.md north-star metric, log-posterior evals/sec/chip).  The
   reference's MH loop round-trips numpy <-> TF twice per step
   (causalbgm/base.py:860-898); a faithful host-loop re-creation (numpy
   proposals/accepts + jitted XLA-CPU BNN log-posterior called twice per
   step) measures 0.98 steps/s at n=20000 chains on this image's CPU
   -> 3.9e4 evals/s, the vs_baseline denominator.
2. training-phase batches/s (the round-1 headline, kept last for the
   driver's parser).

Variance robustness (VERDICT r3 item 3): the tunneled chip's absolute
throughput swings ~5x across processes on identical code, so a single
process's number cannot distinguish a code regression from chip state.
The predict metric therefore reports
  (a) ``ratio_vs_xla`` — the fused-Pallas chain vs the XLA-composite chain
      measured back-to-back IN THE SAME PROCESS (same chip state; a code
      regression moves this, chip state largely cancels), and
  (b) ``process_band`` — the median rate of >=3 FRESH child processes
      (``--child-predict``), run sequentially on the one chip, whose spread
      IS the chip-state variance.
Both are persisted in the JSON the driver records.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_BATCHES_PER_SEC = 55.0
# Within-process repeated measurements per metric; the headline value is the
# median and the JSON carries a [min, max] "band" field (VERDICT r2 item 3).
N_REPEATS = 5
# Fresh processes for the predict metric (cross-process chip-state band).
N_PROCESSES = 3
CHILD_TIMEOUT_S = 2400  # cold kernel recompiles via the remote compiler
# Reference-style host-loop MH on CPU: 0.98 steps/s at n=20000 chains with
# two full-batch log-posterior evals per step (measured with the XLA-CPU
# composite standing in for the TF graph; see RESULTS.md).
BASELINE_LOGP_EVALS_PER_SEC = 2 * 20000 * 0.98


def _measure_chain(model, data, prefer_xla, n_long, n_short, n_repeats,
                   seed_base):
    """Median adaptive-MH steady-state rate (steps/s) for one target flavor.

    Measured as the MARGINAL cost (t(n_long) - t(n_short)) / (n_long -
    n_short): every adaptive_mh call pays a fixed ~10 s re-trace +
    program-load cost that the difference cancels, leaving the per-step
    chain cost a long predict actually pays.  Returns (median, lo, hi,
    method, n_valid)."""
    import jax
    import jax.numpy as jnp

    from bayesgm_tpu.ops import mcmc

    x, y, v = (jnp.asarray(a) for a in data)
    n = x.shape[0]

    # The exact predict() path: params-mode target (compiled chain reused
    # across calls) and — on the fused path — the paired 2n-row kernel
    # evaluation for recompute_current steps.
    lp, plp, make_params, _ = model._make_param_log_prob(prefer_xla=prefer_xla)
    paired = model.cfg.use_bnn and plp is not None
    params = make_params(model.nets, (x, y, v), paired)
    jit_cache = {}
    z_dim = sum(model.cfg.z_dims)

    # Two tunneled-backend hazards make naive repeat-timing lie: (a) repeated
    # executions with identical inputs can return in RPC-overhead time
    # (~0.2 s) regardless of chain length, so every measurement call gets a
    # FRESH init and chain key; (b) only a host fetch of a value that depends
    # on the whole chain guarantees full synchronization, so each call ends
    # with a scalar readback.
    seed_counter = [seed_base]

    def run(steps):
        seed_counter[0] += 1
        s = seed_counter[0]
        init = jax.random.normal(jax.random.PRNGKey(s), (n, z_dim))
        float(jnp.sum(init))  # materialize outside the timed region
        t0 = time.perf_counter()
        res = mcmc.adaptive_mh(lp, init, jax.random.PRNGKey(s),
                               burn_in=steps, n_keep=0,
                               q_sd=1.0, recompute_current=model.cfg.use_bnn,
                               paired_log_prob_fn=plp if paired else None,
                               params=params, jit_cache=jit_cache)
        float(res.q_sd)  # host fetch = full drain of the chunk chain
        return time.perf_counter() - t0

    run(mcmc.CHUNK)  # compile warmup
    # Chip throughput varies run-to-run and can shift BETWEEN the short and
    # long call of one marginal pair, inverting the difference.  Keep only
    # pairs whose marginal difference is meaningfully positive; if drift
    # invalidates most pairs, fall back to whole-run throughput on the long
    # runs — a conservative lower bound that can never be inverted.
    t_shorts, t_longs = [], []
    for _ in range(n_repeats):
        t_shorts.append(run(n_short))
        t_longs.append(run(n_long))
    rates = [(n_long - n_short) / (tl - ts)
             for ts, tl in zip(t_shorts, t_longs) if tl > ts * 1.05]
    method = "marginal"
    if len(rates) < 2:
        rates = [n_long / tl for tl in t_longs]
        method = "whole-run lower bound"
    return (float(np.median(rates)), float(min(rates)), float(max(rates)),
            method, len(rates))


def _build_predict_model():
    from bayesgm_tpu.datasets import Sim_Hirano_Imbens_sampler
    from bayesgm_tpu.models.causalbgm import CausalBGM

    n, v_dim = 20000, 200
    ds = Sim_Hirano_Imbens_sampler(batch_size=32, N=n, v_dim=v_dim, seed=0)
    data = ds.load_all()
    bnn_params = dict(
        v_dim=v_dim, z_dims=[1, 1, 1, 7], binary_treatment=False,
        dataset="bench_HI_predict", output_dir="/tmp/bench_out", use_bnn=True,
        save_res=False, save_model=False)
    return CausalBGM(bnn_params, random_seed=123), data


def child_predict():
    """One fresh-process sample of the predict metric: fused-Pallas rate,
    then the XLA-composite rate back-to-back (same process = same chip
    state), and their ratio.  Prints ONE JSON line."""
    model, data = _build_predict_model()
    med, lo, hi, method, n_valid = _measure_chain(
        model, data, prefer_xla=False, n_long=8000, n_short=500,
        n_repeats=N_REPEATS, seed_base=9000)
    # The composite is several times slower; shorter chains bound child time
    # while the marginal method still cancels fixed costs.
    xmed, _, _, xmethod, _ = _measure_chain(
        model, data, prefer_xla=True, n_long=2000, n_short=200,
        n_repeats=3, seed_base=19000)
    # Roofline/MFU (VERDICT r4 #5): speed-of-light anchors measured in THIS
    # process (same chip state as the chain above), so achieved/peak is a
    # like-for-like ratio even though absolute chip throughput swings.
    from bayesgm_tpu.utils import roofline

    n = 20000
    peak = roofline.measure_matmul_peak()
    bw = roofline.measure_hbm_bandwidth()
    fl, by = roofline.bnn_eval_cost(model.nets, v_dim=200)
    roof = roofline.roofline_report(med * n * 2, fl, by, peak, bw)
    print(json.dumps({
        "steps_per_sec": med, "band": [lo, hi], "method": method,
        "n_valid": n_valid, "xla_steps_per_sec": xmed,
        "xla_method": xmethod, "ratio_vs_xla": med / xmed,
        "roofline": roof,
    }), flush=True)


def bench_predict_multiprocess():
    """Predict metric over N_PROCESSES fresh children run sequentially on
    the one chip.  Falls back to a single in-process measurement if fewer
    than two children succeed."""
    samples = []
    for i in range(N_PROCESSES):
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child-predict"],
                capture_output=True, text=True, timeout=CHILD_TIMEOUT_S)
            line = out.stdout.strip().splitlines()[-1]
            samples.append(json.loads(line))
        except Exception as e:  # noqa: BLE001 — a wedged child must not kill the bench
            print(f"# child {i} failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
    if len(samples) < 2:
        model, data = _build_predict_model()
        med, lo, hi, method, n_valid = _measure_chain(
            model, data, prefer_xla=False, n_long=8000, n_short=500,
            n_repeats=N_REPEATS, seed_base=9000)
        samples = [{"steps_per_sec": med, "band": [lo, hi], "method": method,
                    "n_valid": n_valid, "ratio_vs_xla": None}]

    n, evals_per_step = 20000, 2
    rates = [s["steps_per_sec"] for s in samples]
    med = float(np.median(rates))
    lo = min(s["band"][0] for s in samples)
    hi = max(s["band"][1] for s in samples)
    ratios = [s["ratio_vs_xla"] for s in samples
              if s.get("ratio_vs_xla") is not None]
    evals_per_sec = med * n * evals_per_step
    print(json.dumps({
        "metric": "causalbgm_posterior_logp_evals_per_sec",
        "value": round(evals_per_sec, 0),
        "unit": f"logp evals/s/chip (n=20000 chains, BNN, median of "
                f"{len(samples)} fresh processes; {med:.0f} MH steps/s)",
        "vs_baseline": round(evals_per_sec / BASELINE_LOGP_EVALS_PER_SEC, 2),
        "band": [round(lo * n * evals_per_step, 0),
                 round(hi * n * evals_per_step, 0)],
        "process_band": [round(min(rates) * n * evals_per_step, 0),
                         round(max(rates) * n * evals_per_step, 0)],
        "n_processes": len(samples),
        # Chip-state-robust regression signal: fused Pallas chain vs the
        # XLA-composite chain in the SAME process.  Compare THIS across
        # rounds; absolute evals/s swings ~5x with chip state.
        "ratio_vs_xla": round(float(np.median(ratios)), 3) if ratios else None,
        "ratio_vs_xla_per_process": [round(r, 3) for r in ratios],
        # Efficiency context (VERDICT r4 #5): matmul-only MFU vs the SAME
        # process's measured large-GEMM peak, plus the roofline position.
        # The kernel is VPU/PRNG-bound (uncounted non-matmul work), so a
        # small pct_peak_mxu is the honest reading, not a measurement gap.
        "roofline": next((s["roofline"] for s in samples
                          if s.get("roofline")), None),
    }))


def main():
    import jax

    from bayesgm_tpu.datasets import Sim_Hirano_Imbens_sampler
    from bayesgm_tpu.models.causalbgm import CausalBGM

    # --- predict-phase metric (default BNN configuration) ---
    bench_predict_multiprocess()

    n, v_dim, bs = 20000, 200, 32
    ds = Sim_Hirano_Imbens_sampler(batch_size=bs, N=n, v_dim=v_dim, seed=0)
    x, y, v = ds.load_all()

    params = dict(
        v_dim=v_dim, z_dims=[1, 1, 1, 7], binary_treatment=False,
        dataset="bench_HI", output_dir="/tmp/bench_out", use_bnn=False,
        save_res=False, save_model=False)
    model = CausalBGM(params, random_seed=123)

    # Warmup (compiles the epoch scan) + measured epochs.
    n_batches = n // bs
    model.fit((x, y, v), epochs=1, epochs_per_eval=10**9, batch_size=bs,
              use_egm_init=False, verbose=0)

    import jax.numpy as jnp

    data = tuple(jnp.asarray(a) for a in (x, y, v))
    from functools import partial

    # Training-path measurement mirrors fit(): the latent update runs as one
    # fused Pallas kernel per batch on TPU.
    fused_vg = model._build_fused_latent_vg(bs, None)
    epoch_fn = jax.jit(partial(model._train_epoch, model.cfg, fused_latent_vg=fused_vg))
    from bayesgm_tpu.ops import optim

    carry = (model.nets, model.opts, model.data_z,
             optim.table_adam_init(model.data_z))
    perm = np.random.permutation(n)[: n_batches * bs].reshape(n_batches, bs)
    idx = jnp.asarray(perm)
    k_epoch = jax.random.PRNGKey(7)
    carry, _ = epoch_fn(carry, idx, k_epoch, data)  # compile
    jax.block_until_ready(carry[2])

    n_epochs = 5
    rates = []
    for _ in range(N_REPEATS):
        t0 = time.perf_counter()
        for _ in range(n_epochs):
            carry, _ = epoch_fn(carry, idx, k_epoch, data)
        jax.block_until_ready(carry[2])
        rates.append(n_epochs * n_batches / (time.perf_counter() - t0))

    batches_per_sec = float(np.median(rates))
    print(json.dumps({
        "metric": "causalbgm_train_batches_per_sec",
        "value": round(batches_per_sec, 2),
        "unit": f"batches/s (n=20000, v_dim=200, bs=32, iterative phase, median of {N_REPEATS})",
        "vs_baseline": round(batches_per_sec / BASELINE_BATCHES_PER_SEC, 2),
        "band": [round(min(rates), 2), round(max(rates), 2)],
        "repeats": N_REPEATS,
    }))


if __name__ == "__main__":
    if "--child-predict" in sys.argv:
        child_predict()
    else:
        main()
