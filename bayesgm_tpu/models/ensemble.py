"""EnsembleCausalBGM: deep-ensemble Bayesian model averaging over CausalBGM.

Beyond-reference variant (no counterpart in /root/reference): K CausalBGM
members are trained independently from different initializations (split off
the ensemble's PRNG chain) and their posterior causal effects are averaged —
the deep-ensembles approximation to the full Bayesian posterior over network
weights, complementing the flipout (within-mode) uncertainty each member
already carries.

The flagship motivation is variance: single-fit ADRF error on
Sim_Hirano_Imbens is dominated by seed-to-seed training noise (RESULTS.md);
averaging K independent fits cuts the independent component by ~sqrt(K).

Members are plain :class:`CausalBGM` instances, so every feature (fused
Pallas kernels, full-state checkpointing with exact resume, mesh sharding,
lr schedules) applies per member.
"""

from __future__ import annotations

import numpy as np

from bayesgm_tpu.models.causalbgm import CausalBGM


class EnsembleCausalBGM:
    """Average of ``n_members`` independently trained CausalBGM models.

    Parameters
    ----------
    params : dict
        CausalBGM params (see :class:`CausalBGM`).  Optional
        ``'n_members'`` (default 3) sets the ensemble size.
    """

    def __init__(self, params, timestamp=None, random_seed=None):
        params = dict(params)
        self.n_members = int(params.pop("n_members", 3))
        base_seed = 42 if random_seed is None else int(random_seed)
        self.params = params
        self.members = []
        for i in range(self.n_members):
            mp = dict(params)
            mp["dataset"] = f"{params['dataset']}_member{i}"
            self.members.append(
                CausalBGM(mp, timestamp=timestamp,
                          random_seed=base_seed + 7919 * (i + 1)))
        self.cfg = self.members[0].cfg

    def get_config(self):
        return {"params": {**self.params, "n_members": self.n_members}}

    def fit(self, data, **kwargs):
        """Fit every member (independent initializations and key chains)."""
        for i, m in enumerate(self.members):
            print(f"=== Ensemble member {i + 1}/{self.n_members} ===")
            m.fit(data, **kwargs)

    def evaluate(self, data, data_z=None, nb_intervals=200):
        """Member-averaged in-sample causal estimate + mean MSEs."""
        outs = [m.evaluate(data, m.data_z if data_z is None else data_z,
                           nb_intervals=nb_intervals) for m in self.members]
        causal = np.mean([np.asarray(o[0]) for o in outs], axis=0)
        mses = [float(np.mean([float(o[j]) for o in outs])) for j in (1, 2, 3)]
        return (causal, *mses)

    def predict(self, data, alpha=0.01, n_mcmc=3000, burn_in=5000, x_values=None,
                q_sd=1.0, sample_y=True, bs=None, return_diagnostics=False,
                return_draws=False, **kwargs):
        """Causal effects under the uniform model-average posterior.

        The ensemble posterior is the equal-weight MIXTURE of the member
        posteriors: member effect draws are pooled into one
        ``K x n_mcmc``-draw set, and the point estimate and the
        ``[alpha/2, 1-alpha/2]`` interval are the mean and quantiles of that
        pooled set — exact mixture quantiles, not an average of per-member
        interval bounds.

        ``return_diagnostics=True`` appends a dict with the elementwise
        minimum ESS and maximum split-R̂ across members (each member's chain
        judged on its own) plus the member-mean acceptance rate.
        ``return_draws=True`` appends the pooled mixture draw matrix itself
        (same layout as :meth:`CausalBGM.predict`'s, with ``K * n_mcmc``
        draws along the draw axis).
        """
        draws_k, diags = [], []
        for i, m in enumerate(self.members):
            print(f"=== Ensemble member {i + 1}/{self.n_members} predict ===")
            out = m.predict(data, alpha=alpha, n_mcmc=n_mcmc, burn_in=burn_in,
                            x_values=x_values, q_sd=q_sd, sample_y=sample_y,
                            bs=bs, return_diagnostics=return_diagnostics,
                            return_draws=True, **kwargs)
            draws_k.append(np.asarray(out[-1]))
            if return_diagnostics:
                diags.append(out[2])
        draw_axis = 0 if self.cfg.binary_treatment else 1
        pooled = np.concatenate(draws_k, axis=draw_axis)  # mixture draws
        point = pooled.mean(axis=draw_axis)
        lower = np.quantile(pooled, alpha / 2, axis=draw_axis)
        upper = np.quantile(pooled, 1 - alpha / 2, axis=draw_axis)
        intervals = np.stack([lower, upper], axis=1)
        out = [point, intervals]
        if return_diagnostics:
            out.append(dict(
                ess=np.min([d["ess"] for d in diags], axis=0),
                rhat=np.max([d["rhat"] for d in diags], axis=0),
                accept_rate=float(np.mean([d["accept_rate"] for d in diags]))))
        if return_draws:
            out.append(pooled)
        return tuple(out)
