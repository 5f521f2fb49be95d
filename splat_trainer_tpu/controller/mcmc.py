"""MCMC-style densification controller (3DGS-MCMC).

Capability equivalent of the reference MCMCController
(/root/reference/splat_trainer/controller/mcmc_controller.py:24-106):
every `prune_interval` steps, prune low-opacity / oversized points and
split an equal number by split score (keeping the count constant); on all
other steps, inject position noise proportional to a soft low-opacity
threshold, sampled in each gaussian's covariance basis.
"""

from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp

from splat_trainer_tpu.config import LogDecay, Progress, VaryingFloat, eval_varying
from splat_trainer_tpu.controller.point_state import PointState, take_n_mask
from splat_trainer_tpu.models import gaussians as G
from splat_trainer_tpu.models.mlp_scene import SceneState
from splat_trainer_tpu.optim.vis_laprop import reset_slots
from splat_trainer_tpu.utils.misc import soft_lt


@dataclass(frozen=True)
class MCMCConfig:
    opacity_threshold: float = 0.1
    prune_interval: int = 50
    min_views: int = 5
    max_scale_px: float = 200.0
    min_split_px: float = 0.0
    noise_level: VaryingFloat = field(default_factory=lambda: LogDecay(100.0, 0.01))
    max_prune_rate: float = 0.05
    # Stop relocating after this normalized progress (1.0 = never stop, the
    # reference behavior). The runs/mcmc_m2 at-scale run (RESULTS.md round
    # 4) peaked +4.0 dB over the equal-count baseline at mid-training and
    # then fell ~6 dB below its own peak: relocations every 50 steps to the
    # END of the schedule keep resetting converged optimizer slots — the
    # same ending-below-peak failure the Target controller's
    # target_count_t=0.7 cutoff fixed. Tune <1.0 to give MCMC a refinement
    # tail too (round-5 pass; default keeps the reference semantics).
    relocate_stop_t: float = 1.0
    # Hard cap on the noise amplitude in sigma units (the LogDecay default
    # is still ~3.8 sigma at t=0.7 on low-opacity points).
    max_noise_sigma: float = float("inf")

    def make_controller(self, start_points: int, target_points: int,
                        progress: Progress) -> "MCMCController":
        return MCMCController(self, progress)


def mcmc_prune_split(
    scene: SceneState,
    pstate: PointState,
    key: jax.Array,
    *,
    opacity_threshold: float,
    max_scale_px: float,
    min_split_px: float,
) -> Tuple[SceneState, PointState, dict]:
    """Prune low-opacity/oversize, split an equal number (count-preserving)."""
    active = scene.active
    opacity = jax.nn.sigmoid(scene.points["alpha_logit"][:, 0])

    prune_mask = ((pstate.max_scale_px > max_scale_px)
                  | (opacity < opacity_threshold)) & active
    n_prune = prune_mask.sum()

    split_score = jnp.where(prune_mask | ~active, 0.0, pstate.split_score)
    if min_split_px > 0:
        split_score = jnp.where(
            pstate.max_scale_px < min_split_px, 0.0, split_score)
    split_mask = take_n_mask(split_score, n_prune, descending=True)
    split_mask = split_mask & (split_score > 0.0)

    new_points, new_active, touched, dropped = G.apply_split_prune(
        scene.points, active, split_mask, prune_mask, key)

    refreshed = touched | (active & ~new_active)
    scene = scene.replace(
        points=new_points,
        active=new_active,
        point_opt=reset_slots(scene.point_opt, refreshed),
        visible_acc=jnp.where(refreshed, 0.0, scene.visible_acc),
    )
    pstate = PointState.new_zeros(active.shape[0])
    metrics = {"n": new_active.sum(), "prune": n_prune,
               "split": split_mask.sum(), "dropped_children": dropped}
    return scene, pstate, metrics


def mcmc_noise_step(
    scene: SceneState,
    pstate: PointState,
    key: jax.Array,
    *,
    noise_level: jax.Array,       # traced (schedule-evaluated)
    opacity_threshold: float,
    min_views: int,
) -> SceneState:
    """Covariance-shaped position noise on low-opacity, well-observed points
    (reference mcmc_controller.py:91-100)."""
    enough_views = (pstate.points_in_view > min_views) & scene.active
    opacity = jax.nn.sigmoid(scene.points["alpha_logit"][:, 0])
    target = soft_lt(opacity, opacity_threshold / 2, margin=16.0)

    amp = jnp.where(enough_views, target * noise_level, 0.0)
    noise = jax.random.normal(key, scene.points["position"].shape) * amp[:, None]
    offset = G.sample_gaussians(scene.points, noise)

    position = scene.points["position"] + offset
    return scene.replace(points={**scene.points, "position": position})


class MCMCController:
    """Host-side schedule: prune/split every prune_interval, noise otherwise."""

    def __init__(self, config: MCMCConfig, progress: Progress):
        self.config = config

    def should_densify(self, progress: Progress) -> bool:
        return (progress.step % self.config.prune_interval == 0
                and progress.step > 0
                and progress.t <= self.config.relocate_stop_t)

    def noise_level(self, progress: Progress) -> float:
        lvl = float(eval_varying(self.config.noise_level, progress.t))
        if progress.t > self.config.relocate_stop_t:
            return 0.0  # refinement tail: no churn at all
        return min(lvl, self.config.max_noise_sigma)

    def state_dict(self) -> dict:
        return {}

    def load_state_dict(self, state: dict):
        pass
