"""Training-diagnostics histograms.

Capability equivalent of the reference's per-checkpoint logging suite
(/root/reference/splat_trainer/scene/mlp_scene.py:163-207 log_gradients /
log_optimizer_state / log_params, trainer.py:518-528
log_rendering_histograms): log10 gradient and visibility-normalized
gradient distributions per point parameter, optimizer moment distributions,
opacity/scale/aspect/stable-rank parameter distributions, and the
controller's prune/split heuristic distributions. These are the panels that
make a diverging large-scene run debuggable.

All functions take host-side numpy views (one device fetch per array) and
emit through the Logger ABC, so they work with tensorboard and wandb alike.
"""

import numpy as np

from splat_trainer_tpu.logger.logger import Logger


def _log10_nonzero(logger: Logger, name: str, values, min_value: float = 1e-16):
    v = np.asarray(values).reshape(-1)
    v = v[np.isfinite(v) & (v > min_value)]
    if v.size:
        logger.log_histogram(name, np.log10(v))


def log_param_histograms(logger: Logger, scene):
    """Parameter distributions over active points (reference log_params)."""
    active = np.asarray(scene.active)
    pts = {k: np.asarray(v)[active] for k, v in scene.points.items()}

    opacity = 1.0 / (1.0 + np.exp(-pts["alpha_logit"][:, 0]))
    logger.log_histogram("params/opacity", opacity)
    logger.log_histogram("params/log_scale", pts["log_scaling"])
    logger.log_histogram("params/feature", pts["feature"])
    logger.log_histogram("params/glo_feature", np.asarray(scene.glo_table))

    scale = np.exp(pts["log_scaling"])
    stable_rank = scale.sum(1) / np.maximum(scale.max(1), 1e-12)
    aspect = scale.max(1) / (scale.min(1) + 1e-4)
    logger.log_histogram("params/stable_rank", stable_rank)
    logger.log_histogram("params/aspect", aspect)


def log_gradient_histograms(logger: Logger, grads, visibility,
                            vis_smooth: float = 0.01, min_vis: float = 0.1):
    """log10 |grad| and visibility-normalized |grad| per point parameter,
    over points visible in the batch (reference log_gradients)."""
    vis = np.asarray(visibility)
    mask = vis > min_vis
    if not mask.any():
        return
    v = vis[mask][:, None]
    for key, g in grads.items():
        g = np.asarray(g)[mask].reshape(mask.sum(), -1)
        _log10_nonzero(logger, f"log10_grad/{key}", np.abs(g))
        _log10_nonzero(logger, f"log10_norm_grad/{key}",
                       np.abs(g) / (vis_smooth + v))


def log_optimizer_histograms(logger: Logger, point_opt, active,
                             name: str = "optimizer"):
    """Moment distributions over active points (reference log_optimizer_state)."""
    active = np.asarray(active)
    for family, tensors in (("mu", point_opt.mu), ("nu", point_opt.nu)):
        for key, v in tensors.items():
            _log10_nonzero(logger, f"{name}/{key}/{family}",
                           np.abs(np.asarray(v)[active]))
    _log10_nonzero(logger, f"{name}/vis_ema",
                   np.asarray(point_opt.vis_ema)[active])


def log_rendering_histograms(logger: Logger, pstate, active):
    """Controller heuristic distributions (reference log_rendering_histograms)."""
    active = np.asarray(active)
    _log10_nonzero(logger, "rendering/log10_prune_cost",
                   np.asarray(pstate.prune_cost)[active], 1e-20)
    _log10_nonzero(logger, "rendering/log10_split_score",
                   np.asarray(pstate.split_score)[active], 1e-10)
    _log10_nonzero(logger, "rendering/log10_max_scale_px",
                   np.asarray(pstate.max_scale_px)[active], 1e-6)
    _log10_nonzero(logger, "rendering/log10_visibility",
                   np.asarray(pstate.visibility)[active], 1e-10)


def log_checkpoint_diagnostics(logger: Logger, scene, pstate):
    """The full per-checkpoint suite (cheap host-side panels)."""
    log_param_histograms(logger, scene)
    log_optimizer_histograms(logger, scene.point_opt, scene.active)
    log_rendering_histograms(logger, pstate, scene.active)
