"""MLPScene: gaussian cloud + MLP color model + GLO, as a pure pytree + fns.

The flagship scene model, capability-equivalent to the reference MLPScene
(/root/reference/splat_trainer/scene/mlp_scene.py:97-427) but restructured
for XLA (SURVEY.md §7.1 decision 1): instead of a stateful object graph,
`SceneState` is one pytree and every operation is a pure function suitable
for jit/donation:

- fixed capacity with an `active` mask (densification reuses slots),
- per-point params optimized by the visibility-aware LaProp
  (optim/vis_laprop.py) with the position group in the local point basis,
- colors evaluated densely over capacity in bf16 (models/color_model.py),
- per-image GLO embeddings with row-sparse Adam,
- regularization losses (scale / opacity / aspect / specular) matching
  compute_reg (mlp_scene.py:247-265),
- post-step rotation renormalization + log_scaling clamp
  (mlp_scene.py:236-237).
"""

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from splat_trainer_tpu.config import VaryingFloat, eval_varyings
from splat_trainer_tpu.core.types import CameraParams, Gaussians3D, RasterConfig, Rendering
from splat_trainer_tpu.models import color_model as cm
from splat_trainer_tpu.optim import (
    AdamState, ParamGroup, PointOptimizerState, RowAdamState,
    adam_init, adam_update, point_optimizer_init, point_optimizer_update,
    row_adam_init, row_adam_update,
)
from splat_trainer_tpu.ops import renderer
from splat_trainer_tpu.utils.misc import next_multiple, saturate


def default_parameters() -> Dict[str, Dict[str, Any]]:
    """Per-tensor lr/type settings (reference config/scene/mlp.yaml)."""
    return {
        "position": {"lr": 0.3, "type": "local_vector"},
        "log_scaling": {"lr": 0.08},
        "rotation": {"lr": 0.01, "type": "vector"},
        "alpha_logit": {"lr": 0.1},
        "feature": {"lr": 5.0, "type": "vector"},
    }


def default_reg_weight() -> Dict[str, VaryingFloat]:
    from splat_trainer_tpu.config import LogDecay
    return {
        "scale": LogDecay(0.01, 0.01),
        "opacity": LogDecay(1.0, 100.0),
        "aspect": 0.0001,
        "specular": 1e-5,
    }


from splat_trainer_tpu.models.scene import GaussianSceneConfig


@dataclass(frozen=True)
class MLPSceneConfig(GaussianSceneConfig):
    """Mirrors reference MLPSceneConfig (mlp_scene.py:34-60) + mlp.yaml."""
    parameters: Dict[str, Dict[str, Any]] = field(default_factory=default_parameters)
    reg_weight: Dict[str, VaryingFloat] = field(default_factory=default_reg_weight)
    color_model: cm.ColorModelConfig = field(default_factory=cm.ColorModelConfig)

    lr_glo_feature: VaryingFloat = 2.0
    image_features: int = 32
    point_features: int = 16

    # camera pose refinement: learning rate for per-image pose deltas
    # (0 = frozen; completes the reference's pose_table scaffolding,
    # camera_table/pose_table.py:70-80 + SURVEY.md §7.2 stage 8)
    lr_pose: VaryingFloat = 0.0

    beta1: float = 0.8
    beta2: float = 0.95
    vis_beta: float = 0.999
    vis_smooth: float = 0.01
    per_image: bool = True
    grad_clip: Optional[float] = 2.0

    def param_groups(self) -> Dict[str, ParamGroup]:
        return {k: ParamGroup(type=v.get("type", "scalar"))
                for k, v in self.parameters.items()}

    def lr_schedules(self) -> Dict[str, VaryingFloat]:
        return {k: v["lr"] for k, v in self.parameters.items()}

    # -- GaussianSceneConfig contract ---------------------------------------

    def init_scene(self, key, gaussians, num_images, capacity=None):
        return init_scene(key, self, gaussians, num_images, capacity)

    def eval_colors(self, scene, camera, image_idx):
        return eval_scene_colors(scene, self, camera, image_idx)

    def learning_rates(self, t: float) -> Dict[str, float]:
        return eval_learning_rates(self, t)

    def post_activation(self, image):
        return cm.post_activation(image, self.color_model)

    def to_sh_gaussians(self, scene, camera_table, raster_config,
                        sh_degree: int = 2):
        from splat_trainer_tpu.models.transfer_sh import scene_to_sh_gaussians
        return scene_to_sh_gaussians(scene, self, camera_table,
                                     sh_degree=sh_degree,
                                     raster_config=raster_config)


@struct.dataclass
class SceneState:
    """All trainable state of the scene (one pytree, donated into train_step)."""
    points: Dict[str, jax.Array]   # capacity-shaped param dict
    active: jax.Array              # (C,) bool
    visible_acc: jax.Array         # (C,) visibility accumulated this step
    point_opt: PointOptimizerState
    color_params: Dict[str, Any]
    color_opt: AdamState
    glo_table: jax.Array           # (num_images, image_features)
    glo_opt: RowAdamState
    # per-image pose-refinement deltas: quaternion (xyzw, identity init) +
    # translation applied on top of the dataset pose
    pose_dq: jax.Array             # (num_images, 4)
    pose_dt: jax.Array             # (num_images, 3)
    pose_opt: RowAdamState
    # optional per-image bilateral color-correction grids (None = disabled)
    corrector_grids: Optional[jax.Array] = None
    corrector_opt: Optional[RowAdamState] = None

    @property
    def capacity(self) -> int:
        return self.points["position"].shape[0]

    @property
    def num_points(self) -> jax.Array:
        return self.active.sum()

    def gaussians(self) -> Gaussians3D:
        p = self.points
        return Gaussians3D(
            position=p["position"], rotation=p["rotation"],
            log_scaling=p["log_scaling"], alpha_logit=p["alpha_logit"],
            feature=p["feature"])


def init_scene(
    key: jax.Array,
    config: MLPSceneConfig,
    gaussians: Gaussians3D,
    num_images: int,
    capacity: Optional[int] = None,
) -> SceneState:
    """Build a SceneState from initial color gaussians
    (reference from_color_gaussians, mlp_scene.py:64-80)."""
    n0 = gaussians.num_points
    cap = next_multiple(capacity or n0, 256)
    assert cap >= n0, f"capacity {cap} < initial points {n0}"

    kf, kc = jax.random.split(key)

    def to_cap(x, fill=0.0):
        pad = jnp.full((cap - n0,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, pad], axis=0)

    feature = jax.random.normal(kf, (n0, config.point_features)) * 5.0
    points = {
        "position": to_cap(gaussians.position),
        # inactive slots get identity quaternions to keep basis math finite
        "rotation": jnp.concatenate([
            gaussians.rotation,
            jnp.tile(jnp.array([[0.0, 0.0, 0.0, 1.0]]), (cap - n0, 1))], axis=0),
        "log_scaling": to_cap(gaussians.log_scaling),
        "alpha_logit": to_cap(gaussians.alpha_logit, fill=-10.0),
        "feature": to_cap(feature),
    }
    active = jnp.arange(cap) < n0

    color_params = cm.init_color_model(
        kc, config.color_model, config.image_features, config.point_features)
    glo_table = cm.init_glo_table(num_images, config.image_features)

    pose_dq = jnp.tile(jnp.array([[0.0, 0.0, 0.0, 1.0]]), (num_images, 1))
    pose_dt = jnp.zeros((num_images, 3))
    pose_stacked = jnp.concatenate([pose_dq, pose_dt], axis=-1)

    return SceneState(
        points=points,
        active=active,
        visible_acc=jnp.zeros((cap,), jnp.float32),
        point_opt=point_optimizer_init(points),
        color_params=color_params,
        color_opt=adam_init(color_params),
        glo_table=glo_table,
        glo_opt=row_adam_init(glo_table),
        pose_dq=pose_dq,
        pose_dt=pose_dt,
        pose_opt=row_adam_init(pose_stacked),
    )


def refined_camera(scene: SceneState, camera: CameraParams,
                   image_idx) -> CameraParams:
    """Compose the per-image pose delta onto a dataset camera pose."""
    from splat_trainer_tpu.utils import transforms
    dq = transforms.normalize(scene.pose_dq[image_idx])
    dt = scene.pose_dt[image_idx]
    delta = transforms.join_rt(transforms.quat_to_rotmat(dq), dt)
    return camera.replace(T_camera_world=delta @ camera.T_camera_world)


def lookup_glo(scene: SceneState, config: MLPSceneConfig,
               image_idx: Optional[jax.Array]) -> jax.Array:
    """Per-image GLO feature, or zeros for non-training cameras
    (reference eval_colors, mlp_scene.py:352-360)."""
    if image_idx is None:
        return jnp.zeros((config.image_features,), jnp.float32)
    return scene.glo_table[image_idx]


def eval_scene_colors(scene: SceneState, config: MLPSceneConfig,
                      camera: CameraParams, image_idx: Optional[jax.Array]):
    glo = lookup_glo(scene, config, image_idx)
    diffuse, specular = cm.eval_colors(
        scene.color_params, config.color_model,
        scene.points["feature"], scene.points["position"],
        camera.camera_position, glo)
    return diffuse, specular


def render(
    scene: SceneState,
    config: MLPSceneConfig,
    camera: CameraParams,
    image_idx: Optional[jax.Array] = None,
    raster_config: RasterConfig = RasterConfig(),
    heur_sink: Optional[jax.Array] = None,
    specular_weight: float = 1.0,
) -> Rendering:
    """Full scene render (reference MLPScene.render, mlp_scene.py:410-427).

    `config` is any GaussianSceneConfig — color evaluation and the final
    activation go through the scene contract.
    """
    if image_idx is not None:
        camera = refined_camera(scene, camera, image_idx)
    diffuse, specular = config.eval_colors(scene, camera, image_idx)
    colors = cm.total_color(diffuse, specular, specular_weight)

    rendering = renderer.render_gaussians(
        scene.gaussians(), colors, camera, raster_config,
        active=scene.active, heur_sink=heur_sink)

    # attach the evaluated per-point colors as the settable attributes
    # payload (reference mlp_scene.py:423)
    return rendering.replace(
        image=config.post_activation(rendering.image),
        points=rendering.points.replace(attributes=colors))


def reg_loss(
    scene: SceneState,
    config: MLPSceneConfig,
    rendering: Rendering,
    specular: jax.Array,
    reg_weights: Dict[str, jax.Array],
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Visibility-weighted regularizers (reference compute_reg + reg_loss,
    mlp_scene.py:247-288). `reg_weights` are schedule-evaluated scalars."""
    vis = rendering.points.visibility
    visible = vis > 0.0
    n_vis = jnp.maximum(visible.sum(), 1).astype(jnp.float32)
    w = jnp.where(visible, vis, 0.0)

    opacity = jax.nn.sigmoid(scene.points["alpha_logit"][:, 0])
    scale = jnp.exp(scene.points["log_scaling"])
    depths = jnp.maximum(jnp.abs(rendering.points.depths), 1e-6)

    norm_scale = (scale ** 2).sum(-1) / depths ** 2
    aspect = scale.max(-1) / jnp.maximum(scale.min(-1), 1e-12)
    opacity_term = saturate(opacity, gain=4.0, k=2.0) * norm_scale
    spec_term = jnp.abs(specular).sum(-1)

    def wmean(term):
        return (term * w).sum() / n_vis

    regs = {
        "scale": wmean(norm_scale),
        "opacity": wmean(opacity_term),
        "aspect": wmean(aspect),
        "specular": wmean(spec_term),
    }
    weighted = {k: regs[k] * reg_weights[k] for k in regs if k in reg_weights}
    total = sum(weighted.values())
    return total, weighted


def scene_step(
    scene: SceneState,
    grads: "SceneGrads",
    config: MLPSceneConfig,
    lrs: Dict[str, jax.Array],
    glo_rows: jax.Array,
) -> SceneState:
    """Apply one optimizer step to all parameter families
    (reference MLPScene.step, mlp_scene.py:216-239)."""
    visibility = scene.visible_acc

    new_points, point_opt = point_optimizer_update(
        scene.points, grads.points, scene.point_opt, visibility,
        {k: lrs[k] for k in scene.points}, config.param_groups(),
        beta1=config.beta1, beta2=config.beta2, vis_beta=config.vis_beta,
        vis_smooth=config.vis_smooth, grad_clip=config.grad_clip)

    # rotation renormalize + log_scaling clamp (mlp_scene.py:236-237)
    new_points["rotation"] = new_points["rotation"] / jnp.maximum(
        jnp.linalg.norm(new_points["rotation"], axis=-1, keepdims=True), 1e-12)
    new_points["log_scaling"] = jnp.clip(new_points["log_scaling"], -8.0, 8.0)

    color_params, color_opt = adam_update(
        scene.color_params, grads.color_params, scene.color_opt, lrs["color"])

    glo_table, glo_opt = row_adam_update(
        scene.glo_table, grads.glo_table, scene.glo_opt, glo_rows,
        lrs["glo"])

    # pose refinement (row-masked Adam on stacked [dq | dt]); lr 0 = frozen
    pose = jnp.concatenate([scene.pose_dq, scene.pose_dt], axis=-1)
    pose_grads = jnp.concatenate([grads.pose_dq, grads.pose_dt], axis=-1)
    pose, pose_opt = row_adam_update(
        pose, pose_grads, scene.pose_opt, glo_rows, lrs["pose"],
        weight_decay=0.0)
    pose_dq = pose[:, :4] / jnp.maximum(
        jnp.linalg.norm(pose[:, :4], axis=-1, keepdims=True), 1e-12)

    corrector_grids, corrector_opt = scene.corrector_grids, scene.corrector_opt
    if corrector_grids is not None:
        flat = corrector_grids.reshape(corrector_grids.shape[0], -1)
        gflat = grads.corrector_grids.reshape(flat.shape)
        flat, corrector_opt = row_adam_update(
            flat, gflat, corrector_opt, glo_rows, lrs["corrector"],
            weight_decay=0.0)
        corrector_grids = flat.reshape(corrector_grids.shape)

    return scene.replace(
        corrector_grids=corrector_grids,
        corrector_opt=corrector_opt,
        points=new_points,
        point_opt=point_opt,
        color_params=color_params,
        color_opt=color_opt,
        glo_table=glo_table,
        glo_opt=glo_opt,
        pose_dq=pose_dq,
        pose_dt=pose[:, 4:],
        pose_opt=pose_opt,
        visible_acc=jnp.zeros_like(scene.visible_acc),
    )


@struct.dataclass
class SceneGrads:
    points: Dict[str, jax.Array]
    color_params: Dict[str, Any]
    glo_table: jax.Array
    pose_dq: jax.Array
    pose_dt: jax.Array
    corrector_grids: Optional[jax.Array] = None


def trainable_params(scene: SceneState) -> SceneGrads:
    return SceneGrads(points=scene.points, color_params=scene.color_params,
                      glo_table=scene.glo_table, pose_dq=scene.pose_dq,
                      pose_dt=scene.pose_dt,
                      corrector_grids=scene.corrector_grids)


def with_params(scene: SceneState, p: SceneGrads) -> SceneState:
    return scene.replace(points=p.points, color_params=p.color_params,
                         glo_table=p.glo_table, pose_dq=p.pose_dq,
                         pose_dt=p.pose_dt,
                         corrector_grids=p.corrector_grids)


def eval_learning_rates(config: MLPSceneConfig, t: float) -> Dict[str, float]:
    """Host-side: evaluate all lr schedules at progress t; the result feeds
    the jitted step as traced scalars (reference update_learning_rate,
    mlp_scene.py:142-153)."""
    from splat_trainer_tpu.config import eval_varying
    lrs = {k: eval_varying(v, t) for k, v in config.lr_schedules().items()}
    lrs["color"] = eval_varying(config.color_model.lr_diffuse, t)
    lrs["glo"] = eval_varying(config.lr_glo_feature, t)
    lrs["pose"] = eval_varying(config.lr_pose, t)
    return lrs
