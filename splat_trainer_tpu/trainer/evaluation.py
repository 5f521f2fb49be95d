"""Per-image evaluation: render + metrics (psnr / l1 / ssim), with an
affine color-corrected variant.

Capability equivalent of /root/reference/splat_trainer/trainer/
evaluation.py:16-52.
"""

from dataclasses import dataclass
from functools import cached_property
from typing import Optional

import jax.numpy as jnp
import numpy as np

from splat_trainer_tpu.core.types import Rendering
from splat_trainer_tpu.ops.ssim import ssim
from splat_trainer_tpu.utils.colors import compute_psnr, fit_colors


@dataclass
class Evaluation:
    filename: str
    rendering: Rendering
    source_image: jnp.ndarray  # (H, W, 3) float [0,1]

    @property
    def image_id(self) -> str:
        return self.filename.replace("/", "_").rsplit(".", 1)[0]

    @cached_property
    def psnr(self) -> float:
        return float(compute_psnr(self.rendering.image, self.source_image))

    @cached_property
    def l1(self) -> float:
        return float(jnp.abs(self.rendering.image - self.source_image).mean())

    @cached_property
    def ssim(self) -> float:
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
