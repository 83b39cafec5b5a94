"""Model engines (reference src/bayesgm/models/__init__.py:1-5).

Symbols resolve lazily so importing one family doesn't pull in the others.
"""

_SYMBOL_TO_MODULE = {
    "BGM": "bayesgm_tpu.models.bgm",
    "MNISTBGM": "bayesgm_tpu.models.mnist",
    "CausalBGM": "bayesgm_tpu.models.causalbgm",
    "IdentifiableCausalBGM": "bayesgm_tpu.models.identifiable",
    "FullMCMCCausalBGM": "bayesgm_tpu.models.fullmcmc",
}

__all__ = sorted(_SYMBOL_TO_MODULE)


def __getattr__(name):
    module_path = _SYMBOL_TO_MODULE.get(name)
    if module_path is None:
        raise AttributeError(f"module 'bayesgm_tpu.models' has no attribute {name!r}")
    import importlib

    value = getattr(importlib.import_module(module_path), name)
    globals()[name] = value
    return value
