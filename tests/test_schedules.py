import math

from splat_trainer_tpu.config import (
    Between, Constant, Linear, LogDecay, LogLinear, Piecewise, Progress,
    SmoothStep, eval_varying, eval_varyings,
)


def test_progress_t():
    p = Progress(step=250, total_steps=1000)
    assert p.t == 0.25
    assert float(Progress(step=2000, total_steps=1000)) == 1.0


def test_constant_linear():
    assert Constant(5.0)(0.7) == 5.0
    lin = Linear(0.0, 10.0)
    assert lin(0.5) == 5.0
    assert (lin * 2)(0.5) == 10.0


def test_log_decay_linear():
    ld = LogDecay(100.0, 0.01)
    assert ld(0.0) == 100.0
    assert abs(ld(1.0) - 1.0) < 1e-9
    ll = LogLinear(1.0, 100.0)
    assert abs(ll(0.5) - 10.0) < 1e-9


def test_piecewise():
    # reference densify interval: 50 -> 100 (t=0.1) -> 200 (t=0.5)
    pw = Piecewise(50, [(0.1, 100), (0.5, 200)])
    assert pw(0.0) == 50
    assert pw(0.09) == 50
    assert pw(0.1) == 100
    assert pw(0.49) == 100
    assert pw(0.9) == 200
    assert isinstance(pw(0.9), int)


def test_smoothstep_between():
    ss = SmoothStep(0.0, 1.0)
    assert ss(0.0) == 0.0 and ss(1.0) == 1.0 and ss(0.5) == 0.5
    b = Between(0.5, 1.0, Linear(0.0, 1.0))
    assert b(0.25) == 0.0
    assert b(0.75) == 0.5


def test_eval_varyings_nested():
    params = {
        "position": {"lr": LogDecay(0.3, 0.1), "type": "local_vector"},
        "feature": {"lr": 5.0},
    }
    out = eval_varyings(params, 1.0)
    assert math.isclose(out["position"]["lr"], 0.03)
    assert out["position"]["type"] == "local_vector"
    assert out["feature"]["lr"] == 5.0
    assert eval_varying(3, 0.5) == 3


def test_cli_flag_swap_before_dotted_overrides():
    """`--mcmc trainer.controller.relocate_stop_t=0.7` must yield an
    MCMCConfig WITH the override: flag-derived component swaps run before
    apply_overrides (regression: the swap used to run after and silently
    wiped controller overrides — round-5 mcmc_m2_v2)."""
    from splat_trainer_tpu.config.loader import instantiate
    from splat_trainer_tpu.scripts.train import build_tree, cfg_from_args

    args, overrides = cfg_from_args(
        ["--dataset-kind", "synthetic", "--mcmc",
         "trainer.controller.relocate_stop_t=0.7",
         "trainer.controller.max_noise_sigma=2.0"])
    tree = build_tree(args, overrides)
    config = instantiate(tree["trainer"])
    assert type(config.controller).__name__ == "MCMCConfig"
    assert config.controller.relocate_stop_t == 0.7
    assert config.controller.max_noise_sigma == 2.0
