"""bayesgm_tpu — a TPU-native JAX framework for AI-driven Bayesian Generative Modeling.

A from-scratch re-design of the capabilities of ``liuq-lab/bayesgm`` (reference:
``src/bayesgm/__init__.py``) for TPU hardware: pure-functional networks over
pytrees, jitted ``lax.scan`` training loops, fused Pallas kernels for the hot
log-posterior evaluations, and ``jax.sharding`` meshes for multi-chip scaling.

Top-level symbols are resolved lazily (mirroring the reference facade at
``src/bayesgm/__init__.py:18-56``) so that importing :mod:`bayesgm_tpu` stays
cheap and importing a model does not pull in the CLI or dataset loaders.
"""

__version__ = "1.0.2"

_SYMBOL_TO_MODULE = {
    # models
    "BGM": "bayesgm_tpu.models.bgm",
    "MNISTBGM": "bayesgm_tpu.models.mnist",
    "CausalBGM": "bayesgm_tpu.models.causalbgm",
    "IdentifiableCausalBGM": "bayesgm_tpu.models.identifiable",
    "FullMCMCCausalBGM": "bayesgm_tpu.models.fullmcmc",
    "EnsembleCausalBGM": "bayesgm_tpu.models.ensemble",
    # datasets
    "Base_sampler": "bayesgm_tpu.datasets.base_sampler",
    "Semi_acic_sampler": "bayesgm_tpu.datasets.causal_samplers",
    "Sim_Hirano_Imbens_sampler": "bayesgm_tpu.datasets.causal_samplers",
    "Sim_Sun_sampler": "bayesgm_tpu.datasets.causal_samplers",
    "Sim_Colangelo_sampler": "bayesgm_tpu.datasets.causal_samplers",
    "Semi_Twins_sampler": "bayesgm_tpu.datasets.causal_samplers",
    "Gaussian_sampler": "bayesgm_tpu.datasets.prior_samplers",
    "GMM_indep_sampler": "bayesgm_tpu.datasets.prior_samplers",
    "Swiss_roll_sampler": "bayesgm_tpu.datasets.prior_samplers",
    "simulate_regression": "bayesgm_tpu.datasets.simulators",
    "simulate_low_rank_data": "bayesgm_tpu.datasets.simulators",
    "simulate_heteroskedastic_data": "bayesgm_tpu.datasets.simulators",
    "simulate_z_hetero": "bayesgm_tpu.datasets.simulators",
    # utils
    "save_data": "bayesgm_tpu.utils.data_io",
    "parse_file": "bayesgm_tpu.utils.data_io",
    "parse_file_triplet": "bayesgm_tpu.utils.data_io",
    "get_ADRF": "bayesgm_tpu.utils.helpers",
    "estimate_latent_dims": "bayesgm_tpu.utils.helpers",
    "mnist_mask_indices": "bayesgm_tpu.utils.helpers",
}

__all__ = sorted(_SYMBOL_TO_MODULE) + ["__version__"]


def __getattr__(name):
    module_path = _SYMBOL_TO_MODULE.get(name)
    if module_path is None:
        raise AttributeError(f"module 'bayesgm_tpu' has no attribute {name!r}")
    import importlib

    module = importlib.import_module(module_path)
    value = getattr(module, name)
    globals()[name] = value  # cache for subsequent lookups
    return value


def __dir__():
    return __all__
