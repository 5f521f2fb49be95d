"""Scene pluggability contract.

Capability equivalent of the reference's GaussianScene/GaussianSceneConfig
ABCs (/root/reference/splat_trainer/scene/scene.py:17-94), restructured for
the functional design (SURVEY.md §7.1 decision 1): a scene *model* is a
frozen config dataclass implementing this contract's pure methods over the
shared `SceneState` pytree. The trainer, train step, controllers and
checkpointing only touch the contract + the generic state fields
(`points["position"/"rotation"/"log_scaling"/"alpha_logit"]`, `active`,
`point_opt`), so alternate scene models plug in without trainer changes.

Two concrete models:
- `MLPSceneConfig` (models/mlp_scene.py) — the flagship: per-point features,
  GLU color MLP with SH-encoded view direction, GLO embeddings.
- `SHSceneConfig` (models/sh_scene.py) — classic 3DGS: per-point spherical-
  harmonics colors, no neural nets. Faster, and proves the contract.
"""

from abc import ABC, abstractmethod
from typing import Dict, Optional, Tuple

import jax


class GaussianSceneConfig(ABC):
    """Contract every scene model's config implements (pure functions over
    SceneState; the config instance is static inside jit)."""

    @abstractmethod
    def init_scene(self, key: jax.Array, gaussians, num_images: int,
                   capacity: Optional[int] = None):
        """Build the initial SceneState from color gaussians."""

    @abstractmethod
    def eval_colors(self, scene, camera, image_idx) -> Tuple[jax.Array, jax.Array]:
        """(diffuse, specular) premultiplied colors per capacity slot."""

    @abstractmethod
    def learning_rates(self, t: float) -> Dict[str, float]:
        """Schedule-evaluated lrs: one per point tensor + color/glo/pose."""

    @abstractmethod
    def param_groups(self) -> Dict[str, object]:
        """Optimizer group settings per point tensor (ParamGroup)."""

    @abstractmethod
    def post_activation(self, image: jax.Array) -> jax.Array:
        """Final image activation (clamp unless HDR)."""

    @abstractmethod
    def to_sh_gaussians(self, scene, camera_table, raster_config,
                        sh_degree: int = 2):
        """Export as standard SH gaussians (ply-compatible)."""
