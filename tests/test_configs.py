"""Every shipped YAML recipe parses, dispatches, and constructs its model."""

import glob
import os

import pytest
import yaml

CONFIGS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                        "configs", "*.yaml")))

CAUSAL_SETS = {"Sim_Hirano_Imbens", "Sim_Sun", "Sim_Colangelo",
               "Semi_Twins", "Semi_acic"}
BGM_SETS = {"Sim_heteroskedastic", "Sim_low_rank"}


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_constructs_model(path, tmp_path):
    params = yaml.safe_load(open(path))
    params["output_dir"] = str(tmp_path)
    params["save_res"] = False
    params["save_model"] = False
    name = params["dataset"]

    if name in CAUSAL_SETS:
        from bayesgm_tpu.models.causalbgm import CausalBGM
        from bayesgm_tpu.models.ensemble import EnsembleCausalBGM
        from bayesgm_tpu.models.fullmcmc import FullMCMCCausalBGM
        from bayesgm_tpu.models.identifiable import IdentifiableCausalBGM

        # same dispatch map as main.py run_causal
        engines = {"causalbgm": CausalBGM, "identifiable": IdentifiableCausalBGM,
                   "fullmcmc": FullMCMCCausalBGM, "ensemble": EnsembleCausalBGM}
        engine = params.pop("model", "causalbgm")
        assert engine in engines, f"config uses unknown model '{engine}'"
        cls = engines[engine]
        m = cls(params, random_seed=0)
        assert len(m.cfg.z_dims) == 4
    elif name in BGM_SETS:
        from bayesgm_tpu.models.bgm import BGM

        m = BGM(params, random_seed=0)
        assert m.cfg.z_dim >= 1
    elif name == "MNIST":
        from bayesgm_tpu.models.mnist import MNISTBGM

        m = MNISTBGM(params, random_seed=0)
        assert m.cfg.z_dim >= 1
    else:  # pragma: no cover - new config without a branch
        pytest.fail(f"config {path} has unrouted dataset {name}")
