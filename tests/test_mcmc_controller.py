"""MCMC controller schedule knobs (controller/mcmc.py).

The at-scale run (RESULTS.md round 4, runs/mcmc_m2) showed relocation
churn degrading the late schedule; relocate_stop_t / max_noise_sigma are
the tuning surface. Reference semantics (relocate + noise to the end,
uncapped LogDecay noise): /root/reference/splat_trainer/controller/
mcmc_controller.py:76-100.
"""

from splat_trainer_tpu.config import Progress
from splat_trainer_tpu.controller.mcmc import MCMCConfig


def P(step, total=100):
    return Progress(step=step, total_steps=total)


def test_default_keeps_reference_semantics():
    c = MCMCConfig().make_controller(0, 0, P(0))
    # relocates on every interval multiple to the very end
    assert c.should_densify(P(50))
    assert c.should_densify(P(100))
    assert not c.should_densify(P(0))      # never at step 0
    assert not c.should_densify(P(51))     # only on the interval
    # LogDecay(100, 0.01): 100 at t=0 down to 1 at t=1, uncapped
    assert abs(c.noise_level(P(0)) - 100.0) < 1e-6
    assert abs(c.noise_level(P(100)) - 1.0) < 1e-6


def test_relocate_stop_t_gates_both_churn_sources():
    c = MCMCConfig(relocate_stop_t=0.7).make_controller(0, 0, P(0))
    assert c.should_densify(P(700, 1000))  # interval multiple at t=0.7
    assert not c.should_densify(P(750, 1000))  # past the cutoff
    assert c.noise_level(P(600, 1000)) > 0.0
    assert c.noise_level(P(750, 1000)) == 0.0  # and no noise either


def test_max_noise_sigma_caps_schedule():
    c = MCMCConfig(max_noise_sigma=1.5).make_controller(0, 0, P(0))
    assert c.noise_level(P(0)) == 1.5      # early schedule capped
    assert abs(c.noise_level(P(100)) - 1.0) < 1e-6  # tail under the cap
