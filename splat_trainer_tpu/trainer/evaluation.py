"""Per-image evaluation: render + metrics (psnr / l1 / ssim), with an
affine color-corrected variant.

Capability equivalent of /root/reference/splat_trainer/trainer/
evaluation.py:16-52, plus `eval_image_device` — the whole per-view eval
(render, metrics, cluster features, visibility mask) as ONE jittable
program so an eval sweep is one XLA call per view instead of thousands of
op-by-op dispatches (the reference renders each view eagerly,
trainer.py:315-371; that does not scale past tiny scenes on TPU).
"""

from dataclasses import dataclass, field
from functools import cached_property
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from splat_trainer_tpu.core.types import CameraParams, RasterConfig, Rendering
from splat_trainer_tpu.ops.ssim import ssim
from splat_trainer_tpu.utils.colors import compute_psnr, fit_colors


def eval_image_device(
    scene,
    T_camera_world: jax.Array,     # (4, 4)
    projection: jax.Array,         # (4,)
    near: jax.Array,
    far: jax.Array,
    image_idx: jax.Array,          # () int32
    source: jax.Array,             # (H, W, 3) uint8
    point_labels: jax.Array,       # (C,) int32 — k-means labels for features
    *,
    scene_config,
    raster_config: RasterConfig,
    image_size: Tuple[int, int],
    num_clusters: int,
    vis_threshold: float = 0.01,
) -> Tuple[Rendering, Dict[str, jax.Array], jax.Array, jax.Array]:
    """One view's full evaluation on device.

    Returns (rendering, metric scalars, cluster features (K,), vis mask (C,)).
    """
    from splat_trainer_tpu.models import mlp_scene as ms

    camera = CameraParams(
        T_camera_world=T_camera_world, projection=projection,
        near_plane=near, far_plane=far, image_size=image_size)
    rendering = ms.render(scene, scene_config, camera, image_idx, raster_config)

    ref = source.astype(jnp.float32) / 255.0
    image = rendering.image
    l1 = jnp.abs(image - ref).mean()
    mse = ((image - ref) ** 2).mean()
    metrics = dict(
        psnr=10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-10)),
        l1=l1,
        ssim=ssim(image, ref),
    )

    vis = rendering.points.visibility
    thresholded = jnp.where(vis > vis_threshold, vis, 0.0)
    features = jax.ops.segment_sum(thresholded, point_labels,
                                   num_segments=num_clusters)
    return rendering, metrics, features, vis > 0


@dataclass
class Evaluation:
    filename: str
    rendering: Rendering
    source_image: jnp.ndarray  # (H, W, 3) float [0,1]
    # device-computed metrics (from eval_image_device); lazily computed
    # on host when absent (interactive / viewer paths)
    precomputed: Optional[Dict[str, jnp.ndarray]] = field(default=None)

    @property
    def image_id(self) -> str:
        return self.filename.replace("/", "_").rsplit(".", 1)[0]

    @cached_property
    def psnr(self) -> float:
        if self.precomputed is not None:
            return float(self.precomputed["psnr"])
        return float(compute_psnr(self.rendering.image, self.source_image))

    @cached_property
    def l1(self) -> float:
        if self.precomputed is not None:
            return float(self.precomputed["l1"])
        return float(jnp.abs(self.rendering.image - self.source_image).mean())

    @cached_property
    def ssim(self) -> float:
        if self.precomputed is not None:
            return float(self.precomputed["ssim"])
        return float(ssim(self.rendering.image, self.source_image))

    @property
    def metrics(self) -> dict:
        return dict(psnr=self.psnr, l1=self.l1, ssim=self.ssim)

    def color_corrected(self) -> "Evaluation":
        """Quadratic color-warp corrected copy (evaluation.py:48-50)."""
        corrected = fit_colors(self.rendering.image, self.source_image)
        return Evaluation(
            filename=self.filename,
            rendering=self.rendering.replace(image=corrected),
            source_image=self.source_image)
