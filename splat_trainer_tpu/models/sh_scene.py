"""Classic 3DGS scene: per-point spherical-harmonics colors, no neural nets.

An alternate GaussianSceneConfig implementation (models/scene.py) proving
the scene contract the reference establishes with its GaussianScene ABC
(/root/reference/splat_trainer/scene/scene.py:17-94): the trainer,
controllers, optimizer and checkpointing run unchanged against it.

The SH coefficients live in `points["feature"]` shaped (N, 3*K) so the
capacity/densify/optimizer machinery (which treats point tensors
generically) applies as-is. Color eval is a single basis contraction on the
VPU — cheaper than the MLP path, at the cost of no GLO appearance modeling.
"""

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from splat_trainer_tpu.config import VaryingFloat, eval_varying
from splat_trainer_tpu.models import color_model as cm
from splat_trainer_tpu.models import mlp_scene as ms
from splat_trainer_tpu.models.scene import GaussianSceneConfig
from splat_trainer_tpu.ops.sh import num_sh_coeffs, rgb_to_sh_dc, sh_basis
from splat_trainer_tpu.optim import adam_init, row_adam_init
from splat_trainer_tpu.optim.vis_laprop import ParamGroup, point_optimizer_init
from splat_trainer_tpu.utils.misc import next_multiple


def default_sh_parameters() -> Dict[str, Dict[str, Any]]:
    """3DGS-convention lrs, adapted to the visibility-aware LaProp."""
    return {
        "position": {"lr": 0.3, "type": "local_vector"},
        "log_scaling": {"lr": 0.08},
        "rotation": {"lr": 0.01, "type": "vector"},
        "alpha_logit": {"lr": 0.1},
        "feature": {"lr": 0.35, "type": "vector"},
    }


@dataclass(frozen=True)
class SHSceneConfig(GaussianSceneConfig):
    sh_degree: int = 3
    parameters: Dict[str, Dict[str, Any]] = field(
        default_factory=default_sh_parameters)
    reg_weight: Dict[str, VaryingFloat] = field(
        default_factory=ms.default_reg_weight)

    beta1: float = 0.8
    beta2: float = 0.95
    vis_beta: float = 0.999
    vis_smooth: float = 0.01
    grad_clip: Optional[float] = 2.0
    hdr: bool = False

    # unused neural knobs kept so shared trainer code can read them
    lr_pose: VaryingFloat = 0.0
    image_features: int = 0

    @property
    def num_coeffs(self) -> int:
        return num_sh_coeffs(self.sh_degree)

    def param_groups(self) -> Dict[str, ParamGroup]:
        return {k: ParamGroup(type=v.get("type", "scalar"))
                for k, v in self.parameters.items()}

    def lr_schedules(self) -> Dict[str, VaryingFloat]:
        return {k: v["lr"] for k, v in self.parameters.items()}

    # -- GaussianSceneConfig contract ---------------------------------------

    def init_scene(self, key, gaussians, num_images, capacity=None):
        del key  # SH init is deterministic from the cloud colors
        n0 = gaussians.num_points
        cap = next_multiple(capacity or n0, 256)
        assert cap >= n0, f"capacity {cap} < initial points {n0}"
        k = self.num_coeffs

        def to_cap(x, fill=0.0):
            pad = jnp.full((cap - n0,) + x.shape[1:], fill, x.dtype)
            return jnp.concatenate([x, pad], axis=0)

        # DC from the cloud color, higher bands zero (standard 3DGS init)
        feature = jnp.zeros((n0, 3, k)).at[:, :, 0].set(
            rgb_to_sh_dc(gaussians.feature[:, :3])).reshape(n0, 3 * k)
        points = {
            "position": to_cap(gaussians.position),
            "rotation": jnp.concatenate([
                gaussians.rotation,
                jnp.tile(jnp.array([[0.0, 0.0, 0.0, 1.0]]), (cap - n0, 1))],
                axis=0),
            "log_scaling": to_cap(gaussians.log_scaling),
            "alpha_logit": to_cap(gaussians.alpha_logit, fill=-10.0),
            "feature": to_cap(feature),
        }
        active = jnp.arange(cap) < n0

        glo_table = jnp.zeros((num_images, 1))
        pose_dq = jnp.tile(jnp.array([[0.0, 0.0, 0.0, 1.0]]), (num_images, 1))
        pose_dt = jnp.zeros((num_images, 3))
        pose_stacked = jnp.concatenate([pose_dq, pose_dt], axis=-1)
        return ms.SceneState(
            points=points, active=active,
            visible_acc=jnp.zeros((cap,), jnp.float32),
            point_opt=point_optimizer_init(points),
            color_params={}, color_opt=adam_init({}),
            glo_table=glo_table, glo_opt=row_adam_init(glo_table),
            pose_dq=pose_dq, pose_dt=pose_dt,
            pose_opt=row_adam_init(pose_stacked),
        )

    def eval_colors(self, scene, camera, image_idx):
        del image_idx  # no per-image appearance model
        pos = scene.points["position"]
        d = pos - camera.camera_position[None, :]
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        basis = sh_basis(d, self.sh_degree)                       # (N, K)
        coeffs = scene.points["feature"].reshape(
            pos.shape[0], 3, self.num_coeffs)
        diffuse = jnp.einsum("nck,nk->nc", coeffs, basis)
        return diffuse, jnp.zeros_like(diffuse)

    def learning_rates(self, t: float) -> Dict[str, float]:
        lrs = {k: eval_varying(v, t) for k, v in self.lr_schedules().items()}
        lrs.update(color=0.0, glo=0.0, pose=eval_varying(self.lr_pose, t))
        return lrs

    def post_activation(self, image):
        return image if self.hdr else jnp.clip(image, 0.0, 1.0)

    def to_sh_gaussians(self, scene, camera_table, raster_config,
                        sh_degree: int = 2):
        """Direct export — the features already ARE SH coefficients."""
        import numpy as np
        del camera_table, raster_config, sh_degree
        keep = np.asarray(scene.active)
        p = scene.points
        g = ms.Gaussians3D(
            position=p["position"], rotation=p["rotation"],
            log_scaling=p["log_scaling"], alpha_logit=p["alpha_logit"],
            feature=p["feature"].reshape(-1, 3, self.num_coeffs))
        return jax.tree_util.tree_map(lambda x: x[keep], g)
