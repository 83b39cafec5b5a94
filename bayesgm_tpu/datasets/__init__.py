"""Data layer: mini-batch samplers, causal benchmark loaders, simulators.

Mirrors the reference surface (``src/bayesgm/datasets/__init__.py:1-31``).
"""

from bayesgm_tpu.datasets.base_sampler import Base_sampler
from bayesgm_tpu.datasets.causal_samplers import (
    Semi_acic_sampler,
    Semi_Twins_sampler,
    Sim_Colangelo_sampler,
    Sim_Hirano_Imbens_sampler,
    Sim_Sun_sampler,
)
from bayesgm_tpu.datasets.prior_samplers import (
    Gaussian_sampler,
    GMM_indep_sampler,
    Swiss_roll_sampler,
)
from bayesgm_tpu.datasets.simulators import (
    simulate_heteroskedastic_data,
    simulate_low_rank_data,
    simulate_regression,
    simulate_z_hetero,
)

__all__ = [
    "Base_sampler",
    "Semi_acic_sampler",
    "Sim_Hirano_Imbens_sampler",
    "Sim_Sun_sampler",
    "Sim_Colangelo_sampler",
    "Semi_Twins_sampler",
    "Gaussian_sampler",
    "GMM_indep_sampler",
    "Swiss_roll_sampler",
    "simulate_regression",
    "simulate_low_rank_data",
    "simulate_heteroskedastic_data",
    "simulate_z_hetero",
]
