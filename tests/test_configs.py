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
        # main.py pops + validates the optional predict: block before
        # constructing the model — mirror it so fast-recipe configs route.
        import main as driver
        driver._predict_overrides(params)
        engine = params.pop("model", "causalbgm")
        assert engine in engines, f"config uses unknown model '{engine}'"
        cls = engines[engine]
        driver._fit_overrides(params, cls, engine)
        m = cls(params, random_seed=0)
        assert len(m.cfg.z_dims) == 4
    elif name in BGM_SETS:
        import main as driver
        from bayesgm_tpu.models.bgm import BGM

        driver._fit_overrides(params, BGM, "bgm")
        m = BGM(params, random_seed=0)
        assert m.cfg.z_dim >= 1
    elif name == "MNIST":
        import main as driver
        from bayesgm_tpu.models.mnist import MNISTBGM

        driver._fit_overrides(params, MNISTBGM, "mnist")
        m = MNISTBGM(params, random_seed=0)
        assert m.cfg.z_dim >= 1
    else:  # pragma: no cover - new config without a branch
        pytest.fail(f"config {path} has unrouted dataset {name}")


def test_predict_overrides_block():
    """main._predict_overrides pops the block, validates keys, tolerates absence."""
    import main as driver

    params = {"dataset": "Sim_Hirano_Imbens", "predict": {"burn_in": 1000, "ess_target": 400}}
    ov = driver._predict_overrides(params)
    assert ov == {"burn_in": 1000, "ess_target": 400}
    assert "predict" not in params

    assert driver._predict_overrides({"dataset": "x"}) == {}

    with pytest.raises(ValueError, match="Unknown predict override"):
        driver._predict_overrides({"predict": {"burnin": 1}})


def test_run_causal_rejects_unsupported_predict_override(tmp_path):
    """A predict override the SELECTED engine's predict() does not accept
    (fullmcmc takes no ess_target) must fail fast — before model
    construction and the expensive fit (advisor finding, round 4)."""
    import main as driver

    params = yaml.safe_load(open(os.path.join(
        os.path.dirname(__file__), "..", "configs", "Sim_Hirano_Imbens.yaml")))
    params["model"] = "fullmcmc"
    params["predict"] = {"ess_target": 400}
    params["output_dir"] = str(tmp_path)
    with pytest.raises(ValueError, match="not supported by model 'fullmcmc'"):
        driver.run_causal(params, epochs=0, egm_iters=0)


def test_override_check_accepts_kwargs_forwarding_engine():
    """EnsembleCausalBGM.predict forwards **kwargs to its member
    CausalBGMs (which do take ess_target), so the fail-fast check must NOT
    reject the fast-predict overrides for 'model: ensemble' — while still
    rejecting them for fullmcmc, whose predict takes no **kwargs."""
    import main as driver
    from bayesgm_tpu.models.ensemble import EnsembleCausalBGM
    from bayesgm_tpu.models.fullmcmc import FullMCMCCausalBGM

    driver._check_overrides_against_engine(
        EnsembleCausalBGM, "ensemble", {"ess_target": 400, "burn_in": 1000})
    with pytest.raises(ValueError, match="not supported by model 'fullmcmc'"):
        driver._check_overrides_against_engine(
            FullMCMCCausalBGM, "fullmcmc", {"ess_target": 400})


def test_fit_overrides_block():
    """main._fit_overrides pops the ``fit:`` block, validates keys against
    the allowed set AND the selected engine's fit signature, tolerates
    absence (mirrors the predict: override plumbing)."""
    import main as driver
    from bayesgm_tpu.models.bgm import BGM
    from bayesgm_tpu.models.causalbgm import CausalBGM
    from bayesgm_tpu.models.ensemble import EnsembleCausalBGM

    params = {"dataset": "x", "fit": {"egm_batch_size": 128, "egm_n_iter": 7500}}
    ov = driver._fit_overrides(params, CausalBGM, "causalbgm")
    assert ov == {"egm_batch_size": 128, "egm_n_iter": 7500}
    assert "fit" not in params

    assert driver._fit_overrides({"dataset": "x"}, CausalBGM, "causalbgm") == {}
    # BGM.fit also takes egm_batch_size (uniform surface)
    assert driver._fit_overrides(
        {"fit": {"egm_batch_size": 256}}, BGM, "bgm") == {"egm_batch_size": 256}
    # kwargs-forwarding engines (Ensemble) accept anything in the allowed set
    assert driver._fit_overrides(
        {"fit": {"egm_batch_size": 128}}, EnsembleCausalBGM, "ensemble") \
        == {"egm_batch_size": 128}

    with pytest.raises(ValueError, match="Unknown fit override"):
        driver._fit_overrides({"fit": {"egm_bs": 1}}, CausalBGM, "causalbgm")


def test_fast_config_merge_matches_shipped_recipe():
    """The shipped fast config carries exactly the measured recipe and the
    merge produces the kwargs main.py passes to predict()."""
    path = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "Sim_Hirano_Imbens_fast.yaml")
    params = yaml.safe_load(open(path))
    import main as driver

    ov = driver._predict_overrides(params)
    kwargs = dict(alpha=0.01, n_mcmc=3000, burn_in=5000, q_sd=1.0)
    kwargs.update(ov)
    assert kwargs == {"alpha": 0.01, "n_mcmc": 3000, "burn_in": 1000,
                      "q_sd": 1.0, "ess_target": 400}
