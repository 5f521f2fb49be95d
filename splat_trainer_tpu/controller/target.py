"""Target-count densification controller.

Capability equivalent of the reference TargetController
(/root/reference/splat_trainer/controller/target_controller.py:20-160):
ramps the active point count from the initial count to `target_points` by
smoothstep (reaching the target at t = target_count_t), pruning the
cheapest `prune_rate * n * (1 - t)` points (plus oversized floaters) and
splitting the top-scored points to hit the schedule.

Split: host-side schedule bookkeeping (when to densify, target counts) +
one jitted device function (`densify_device`) operating on capacity slots
with traced counts, so no step-dependent recompilation.
"""

import math
from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp

from splat_trainer_tpu.config import (
    Piecewise, Progress, VaryingInt, eval_varying, smoothstep,
)
from splat_trainer_tpu.controller.point_state import PointState, take_n_mask
from splat_trainer_tpu.models import gaussians as G
from splat_trainer_tpu.models.mlp_scene import SceneState
from splat_trainer_tpu.optim.vis_laprop import reset_slots


def default_densify_interval():
    return Piecewise(50, [(0.1, 100), (0.5, 200)])


@dataclass(frozen=True)
class TargetConfig:
    prune_rate: float = 0.025
    target_count_t: float = 0.8
    min_views: int = 5
    max_scale_px: float = 200.0
    min_split_px: float = 0.0
    densify_prune_interval: VaryingInt = field(default_factory=default_densify_interval)
    # instance-overflow guard: unlike the reference's CUDA rasterizer
    # (dynamic per-tile lists), the TPU binning has a STATIC instance budget
    # (RasterConfig.max_instances) and drops+counts the overflow. Overflow
    # corrupts the training signal — observed as a full quality collapse on
    # the garden-class milestone when densification pushed demand past the
    # budget. When the dropped fraction exceeds `clip_tolerance`, the
    # controller freezes the count target, and ratchets it down by
    # `clip_backoff` per densify while overflow persists.
    clip_tolerance: float = 1e-3
    clip_backoff: float = 0.95
    # periodic opacity resets (canonical 3DGS floater control; BASELINE
    # config[2] names them as part of the garden recipe — neither the
    # reference's controllers nor round 1 implemented them): every
    # `opacity_reset_interval` steps clamp all active alpha to
    # `opacity_reset_alpha` and zero the opacity optimizer moments, so
    # accumulated floaters must re-earn their opacity. 0 = disabled.
    # Resets stop at `opacity_reset_stop_t` so the final refinement phase
    # converges undisturbed.
    opacity_reset_interval: int = 0
    opacity_reset_alpha: float = 0.01
    opacity_reset_stop_t: float = 0.75

    def make_controller(self, start_points: int, target_points: int,
                        progress: Progress) -> "TargetController":
        return TargetController(self, start_points, target_points, progress)


def densify_device(
    scene: SceneState,
    pstate: PointState,
    key: jax.Array,
    *,
    t: jax.Array,                 # traced progress
    target_points: jax.Array,     # traced schedule target
    prune_rate: float,
    min_views: int,
    max_scale_px: float,
    min_split_px: float,
) -> Tuple[SceneState, PointState, dict]:
    """One split/prune pass over capacity slots (jitted; traced counts)."""
    active = scene.active
    n = active.sum()

    exceeds_scale = (pstate.max_scale_px > max_scale_px) & active
    prune_schedule = jnp.ceil(prune_rate * n.astype(jnp.float32) * (1.0 - t)
                              ).astype(jnp.int32)

    prune_cost, split_score = pstate.masked_heuristics(min_views, active)
    prune_mask = take_n_mask(prune_cost, prune_schedule) | exceeds_scale
    prune_mask = prune_mask & active

    target_split = (target_points - n) + prune_mask.sum()
    split_score = jnp.where(prune_mask, 0.0, pstate.split_score)
    split_score = jnp.where(active, split_score, 0.0)
    if min_split_px > 0:
        split_score = jnp.where(
            pstate.max_scale_px < min_split_px, 0.0, split_score)

    split_mask = take_n_mask(split_score, target_split, descending=True)
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
    metrics = {
        "n": new_active.sum(),
        "prune": prune_mask.sum(),
        "split": split_mask.sum(),
        "dropped_children": dropped,
        # points that accumulated no prune_cost this interval (pre-reset stats)
        "unseen": (active & (pstate.prune_cost == 0)).sum(),
    }
    # reference resets ALL stats after densify (target_controller.py:122)
    pstate = PointState.new_zeros(active.shape[0])
    return scene, pstate, metrics


def opacity_reset_device(
    scene: SceneState,
    *,
    reset_alpha: float,
) -> Tuple[SceneState, jax.Array]:
    """Clamp every active point's opacity to `reset_alpha` and zero the
    opacity optimizer moments (canonical 3DGS reset_opacity). Returns the
    updated scene and the number of points actually clamped. Other
    parameters' moments are untouched — only opacity must re-converge."""
    logit = math.log(reset_alpha) - math.log1p(-reset_alpha)
    al = scene.points["alpha_logit"]
    clamped = (al[:, 0] > logit) & scene.active
    new_al = jnp.where(scene.active[:, None], jnp.minimum(al, logit), al)

    opt = scene.point_opt
    zero_alpha = lambda d: {
        k: (jnp.zeros_like(v) if k == "alpha_logit" else v)
        for k, v in d.items()}
    opt = opt.replace(mu=zero_alpha(opt.mu), nu=zero_alpha(opt.nu))

    points = dict(scene.points)
    points["alpha_logit"] = new_al
    return scene.replace(points=points, point_opt=opt), clamped.sum()


class TargetController:
    """Host-side schedule bookkeeping (when to densify + target counts)."""

    def __init__(self, config: TargetConfig, start_points: int,
                 target_points: int, progress: Progress):
        self.config = config
        self.start_points = start_points
        self.max_points = target_points
        self.next_densify = self.find_next_densify(progress)
        self.target_cap = None    # set by the instance-overflow guard
        self._cap_ratcheted = False
        self.next_opacity_reset = (
            progress.step + config.opacity_reset_interval
            if config.opacity_reset_interval else None)

    def find_next_densify(self, progress: Progress):
        interval = int(eval_varying(self.config.densify_prune_interval, progress.t))
        nxt = progress.step + interval
        return nxt if (nxt + interval < progress.total_steps) else None

    def target_points(self, progress: Progress) -> int:
        target_step = self.config.target_count_t * progress.total_steps
        t = min(max(progress.step / max(target_step, 1), 0.0), 1.0)
        target = int(smoothstep(t, self.start_points, self.max_points))
        if self.target_cap is not None:
            target = min(target, self.target_cap)
        return target

    def note_clipping(self, clipped: int, max_instances: int,
                      progress: Progress, can_grow: bool = False):
        """Instance-overflow guard (see TargetConfig.clip_tolerance): freeze
        the count target when the rasterizer drops instances; ratchet it
        down while overflow persists.

        `can_grow=True` means the caller's instance capacity is below its
        config ceiling and will be enlarged (Trainer bucketing grows the
        compiled step on the next logging step) — transient bucket-lag
        clipping must NOT permanently cap the point schedule, so the guard
        stands down. Only clipping at the true ceiling engages it, and a
        clean step at the ceiling releases a freeze that never ratcheted
        (a ratcheted cap persists — repeated overflow there is real
        pressure)."""
        if clipped <= self.config.clip_tolerance * max_instances:
            if self.target_cap is not None and not self._cap_ratcheted:
                self.target_cap = None   # transient spike at the ceiling
            return
        if can_grow:
            return
        scheduled = self.target_points(progress)
        if self.target_cap is None:
            self.target_cap = scheduled
            self._cap_ratcheted = False
        else:
            self.target_cap = int(min(self.target_cap, scheduled)
                                  * self.config.clip_backoff)
            self._cap_ratcheted = True

    def should_densify(self, progress: Progress) -> bool:
        return self.next_densify is not None and progress.step >= self.next_densify

    def should_reset_opacity(self, progress: Progress) -> bool:
        if (self.next_opacity_reset is None
                or progress.step < self.next_opacity_reset):
            return False
        interval = self.config.opacity_reset_interval
        stop = self.config.opacity_reset_stop_t * progress.total_steps
        if progress.step > stop:
            # the stop point protects the final refinement phase — it gates
            # EVERY reset, including the first (interval > stop would
            # otherwise fire one reset inside the refinement tail)
            self.next_opacity_reset = None
            return False
        nxt = progress.step + interval
        self.next_opacity_reset = nxt if nxt <= stop else None
        return True

    def densify_args(self, progress: Progress) -> dict:
        """Traced args for densify_device; advances the schedule."""
        self.next_densify = self.find_next_densify(progress)
        return dict(t=progress.t, target_points=self.target_points(progress))

    def state_dict(self) -> dict:
        return dict(start_points=self.start_points,
                    next_densify=self.next_densify,
                    target_cap=self.target_cap,
                    cap_ratcheted=self._cap_ratcheted,
                    next_opacity_reset=self.next_opacity_reset)

    def load_state_dict(self, state: dict):
        self.start_points = state["start_points"]
        self.next_densify = state["next_densify"]
        self.target_cap = state.get("target_cap")
        self._cap_ratcheted = state.get("cap_ratcheted",
                                        self.target_cap is not None)
        self.next_opacity_reset = state.get("next_opacity_reset",
                                            self.next_opacity_reset)
