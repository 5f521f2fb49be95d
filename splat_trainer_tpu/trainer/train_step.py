"""The jitted training step: render -> loss -> backward -> optimizer -> stats.

This is the TPU-native restructuring of the reference's hot loop
(trainer.py:531-545 `training_step` + `evaluate_backward_with` +
`compute_losses` + scene/controller `add_rendering` + `scene.step`): one
pure function `train_step(scene, pstate, batch, hyper, key)` compiled once
and donated, instead of a Python object graph orchestrating kernel calls
(SURVEY.md §7.1 decision 1).

Batch semantics match the reference: per-image gradients are *accumulated*
(loss.backward() per image, one optimizer step per batch —
trainer.py:500-514). Here the batch loop is unrolled inside jit (B is
static and small); each image contributes its render's visibility and
heuristics to the scene/controller statistics.

All schedule-dependent scalars (learning rates, loss weights, reg weights)
arrive in `hyper` as traced values — changing them never recompiles.
"""

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from splat_trainer_tpu.controller.point_state import PointState
from splat_trainer_tpu.core.types import CameraParams, RasterConfig
from splat_trainer_tpu.models import color_model as cm
from splat_trainer_tpu.models import mlp_scene as ms
from splat_trainer_tpu.ops import renderer
from splat_trainer_tpu.ops.ssim import multiscale_ssim_loss


class TrainBatch(NamedTuple):
    """One gradient-step batch of images (B static).

    Images may be uint8 (cheap host->device transfer; converted to [0,1]
    f32 on device, mirroring reference load_data trainer.py:548-556).
    """
    images: jax.Array           # (B, H, W, 3) uint8 or float in [0, 1]
    image_idx: jax.Array        # (B,) int32 — index into the camera table / GLO
    T_camera_world: jax.Array   # (B, 4, 4)
    projection: jax.Array       # (B, 4)
    near: jax.Array             # (B,)
    far: jax.Array              # (B,)


@struct.dataclass
class StepMetrics:
    l1: jax.Array
    mse: jax.Array
    ssim: jax.Array
    psnr: jax.Array
    reg: Dict[str, jax.Array]
    total: jax.Array
    num_visible: jax.Array
    clipped_instances: jax.Array
    # capacity-bucketing signals (max over the batch's images)
    num_instances: jax.Array
    instance_demand: jax.Array
    sat_demand: jax.Array


def camera_from_batch(batch: TrainBatch, i: int, image_size) -> CameraParams:
    return CameraParams(
        T_camera_world=batch.T_camera_world[i],
        projection=batch.projection[i],
        near_plane=batch.near[i],
        far_plane=batch.far[i],
        image_size=image_size,
    )


def compute_losses(image, ref, hyper, ssim_levels: int):
    """l1 + mse + multi-scale ssim (reference compute_losses, trainer.py:465-498)."""
    l1 = jnp.abs(image - ref).mean()
    mse = ((image - ref) ** 2).mean()
    ssim_loss, ssim_metric = multiscale_ssim_loss(image, ref, ssim_levels)
    total = (hyper["l1_weight"] * l1 + hyper["mse_weight"] * mse
             + hyper["ssim_weight"] * ssim_loss)
    psnr = 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-10))
    return total, dict(l1=l1, mse=mse, ssim=ssim_metric, psnr=psnr)


@struct.dataclass
class GradBundle:
    """Everything produced by the differentiated phase — additive across
    images/devices (psum'd by the data-parallel path before apply_updates)."""
    grads: ms.SceneGrads
    heur: jax.Array             # (C, 2) [split_score, prune_cost]
    vis_acc: jax.Array          # (C,)
    in_view_any: jax.Array      # (C,) bool (max-combined)
    scale_max: jax.Array        # (C, 2) (max-combined)
    glo_rows: jax.Array         # (num_images,) bool (or-combined)
    metrics: Dict


def batch_gradients(
    scene: ms.SceneState,
    batch: TrainBatch,
    hyper: Dict,
    *,
    scene_config: ms.MLPSceneConfig,
    raster_config: RasterConfig,
    image_size: Optional[Tuple[int, int]] = None,
    ssim_levels: int = 3,
) -> GradBundle:
    """Differentiated phase: renders + losses + grads for a (sub)batch.

    `image_size` defaults to the batch's own (static) image shape, so
    mixed-sensor datasets bucket by size through jit's shape-keyed cache —
    one compilation per distinct size, no config plumbing.
    """
    B = batch.images.shape[0]
    cap = scene.capacity
    if image_size is None:
        image_size = (batch.images.shape[2], batch.images.shape[1])

    if batch.images.dtype == jnp.uint8:
        batch = batch._replace(
            images=batch.images.astype(jnp.float32) / 255.0)

    def loss_fn(params: ms.SceneGrads, heur_sink):
        scene_p = ms.with_params(scene, params)
        total = jnp.float32(0.0)
        metrics_acc = None
        vis_acc = jnp.zeros((cap,), jnp.float32)
        aux_renders = []

        for i in range(B):
            camera = camera_from_batch(batch, i, image_size)
            image_idx = batch.image_idx[i]
            # pose refinement: compose the learnable per-image delta so pose
            # gradients flow through the (autodiff) projection
            camera = ms.refined_camera(scene_p, camera, image_idx)

            diffuse, specular = scene_config.eval_colors(
                scene_p, camera, image_idx)
            colors = cm.total_color(diffuse, specular)

            rendering = renderer.render_gaussians(
                scene_p.gaussians(), colors, camera, raster_config,
                active=scene_p.active, heur_sink=heur_sink)
            image = scene_config.post_activation(rendering.image)

            # optional bilateral color correction: the corrector absorbs
            # per-image exposure/white balance inside the loss (SURVEY.md
            # #32 — wired in, unlike the reference)
            if scene_p.corrector_grids is not None:
                from splat_trainer_tpu.color_corrector.bilateral import (
                    color_affine_transform, slice_grid, total_variation_loss,
                )
                affine = slice_grid(scene_p.corrector_grids[image_idx], image)
                image = color_affine_transform(affine, image)
                total = total + hyper["corrector_tv"] * total_variation_loss(
                    scene_p.corrector_grids[image_idx][None])

            loss_i, m = compute_losses(image, batch.images[i], hyper, ssim_levels)
            reg_total, reg_parts = ms.reg_loss(
                scene_p, scene_config, rendering, specular, hyper["reg"])
            total = total + loss_i + reg_total

            vis_acc = vis_acc + rendering.points.visibility
            m["reg"] = reg_parts
            m["num_visible"] = rendering.points.num_visible
            m["clipped"] = (rendering.clipped_instances
                            if rendering.clipped_instances is not None
                            else jnp.int32(0))
            # track the batch MAX (not sum) — bucketing sizes for the worst
            # view; carried outside metrics_acc's mean-reduction
            m_inst = (rendering.num_instances
                      if rendering.num_instances is not None else jnp.int32(0))
            m_dem = (rendering.instance_demand
                     if rendering.instance_demand is not None else jnp.int32(0))
            m_sat = (rendering.sat_demand
                     if rendering.sat_demand is not None else jnp.int32(0))
            if metrics_acc is None:
                occupancy = (m_inst, m_dem, m_sat)
            else:
                occupancy = (jnp.maximum(occupancy[0], m_inst),
                             jnp.maximum(occupancy[1], m_dem),
                             jnp.maximum(occupancy[2], m_sat))
            metrics_acc = m if metrics_acc is None else jax.tree_util.tree_map(
                lambda a, b: a + b, metrics_acc, m)
            aux_renders.append(dict(
                in_view=rendering.points.in_view,
                visibility=rendering.points.visibility,
                screen_scale=rendering.points.screen_scale,
            ))

        metrics_acc = jax.tree_util.tree_map(lambda x: x / B, metrics_acc)
        metrics_acc["num_instances"] = occupancy[0]
        metrics_acc["instance_demand"] = occupancy[1]
        metrics_acc["sat_demand"] = occupancy[2]
        return total, (vis_acc, metrics_acc, aux_renders)

    params = ms.trainable_params(scene)
    heur_sink = jnp.zeros((cap, 2), jnp.float32)

    grad_fn = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)
    (grads, heur), (vis_acc, metrics, aux_renders) = grad_fn(params, heur_sink)

    # controller statistics (reference scene/controller add_rendering)
    in_view_any = jnp.zeros((cap,), bool)
    scale_max = jnp.zeros((cap, 2), jnp.float32)
    for r in aux_renders:
        in_view_any = in_view_any | r["in_view"]
        scale_max = jnp.maximum(scale_max, jnp.where(
            r["in_view"][:, None], r["screen_scale"], 0.0))

    glo_rows = jnp.zeros((scene.glo_table.shape[0],), bool
                         ).at[batch.image_idx].set(True)

    return GradBundle(grads=grads, heur=heur, vis_acc=vis_acc,
                      in_view_any=in_view_any, scale_max=scale_max,
                      glo_rows=glo_rows, metrics=metrics)


def apply_updates(
    scene: ms.SceneState,
    pstate: PointState,
    bundle: GradBundle,
    hyper: Dict,
    scene_config: ms.MLPSceneConfig,
) -> Tuple[ms.SceneState, PointState, StepMetrics]:
    """Non-differentiated phase: statistics + one optimizer step."""
    metrics = bundle.metrics

    pstate = pstate.add_rendering(
        in_view=bundle.in_view_any,
        visibility=bundle.vis_acc,
        screen_scale=bundle.scale_max,
        split_score=bundle.heur[:, 0],
        prune_cost=bundle.heur[:, 1],
    )

    scene = scene.replace(visible_acc=bundle.vis_acc)
    scene = ms.scene_step(scene, bundle.grads, scene_config, hyper["lrs"],
                          bundle.glo_rows)

    total = (hyper["l1_weight"] * metrics["l1"]
             + hyper["mse_weight"] * metrics["mse"]
             + hyper["ssim_weight"] * (1 - metrics["ssim"])
             + sum(metrics["reg"].values()))
    step_metrics = StepMetrics(
        l1=metrics["l1"], mse=metrics["mse"], ssim=metrics["ssim"],
        psnr=metrics["psnr"], reg=metrics["reg"], total=total,
        num_visible=metrics["num_visible"],
        clipped_instances=metrics["clipped"],
        num_instances=metrics["num_instances"],
        instance_demand=metrics["instance_demand"],
        sat_demand=metrics["sat_demand"],
    )
    return scene, pstate, step_metrics


def train_step(
    scene: ms.SceneState,
    pstate: PointState,
    batch: TrainBatch,
    hyper: Dict,
    key: jax.Array,
    *,
    scene_config: ms.MLPSceneConfig,
    raster_config: RasterConfig,
    image_size: Optional[Tuple[int, int]] = None,
    ssim_levels: int = 3,
) -> Tuple[ms.SceneState, PointState, StepMetrics]:
    """One full training step. jit with donate_argnums=(0, 1)."""
    del key  # reserved for stochastic variants
    bundle = batch_gradients(
        scene, batch, hyper, scene_config=scene_config,
        raster_config=raster_config, image_size=image_size,
        ssim_levels=ssim_levels)
    return apply_updates(scene, pstate, bundle, hyper, scene_config)


def make_hyper(scene_config: ms.MLPSceneConfig, train_cfg, t: float) -> Dict:
    """Host-side: evaluate all schedules at progress t into a flat pytree of
    python floats (traced leaves of the jitted step)."""
    from splat_trainer_tpu.config import eval_varyings
    lrs = scene_config.learning_rates(t)
    corrector = getattr(train_cfg, "color_corrector", None)
    lrs["corrector"] = getattr(corrector, "lr", 0.0) if corrector else 0.0
    return {
        "lrs": lrs,
        "reg": eval_varyings(scene_config.reg_weight, t),
        "l1_weight": float(train_cfg.l1_weight),
        "mse_weight": float(train_cfg.mse_weight),
        "ssim_weight": float(train_cfg.ssim_weight),
        "corrector_tv": (float(getattr(corrector, "tv_weight", 0.0))
                         if corrector else 0.0),
    }
