"""Per-image 3D bilateral grid color correction, pure jnp.

Capability equivalent of /root/reference/splat_trainer/color_corrector/
bilateral_corrector.py:20-86 + the vendored lib_bilagrid (BilateralGrid,
color_affine_transform, total_variation_loss): a (W x H x L) grid of 3x4
affine color transforms per image, sliced by pixel position + gray-scale
luminance with trilinear interpolation, regularized by total variation.

The reference defines but never wires this into its Trainer (SURVEY.md
#32); here `BilateralCorrector.correct` is differentiable and intended to
run inside the loss on the rendered image.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from splat_trainer_tpu.color_corrector.corrector import CorrectorConfig

_GRAY = jnp.array([0.299, 0.587, 0.114])


@dataclass(frozen=True)
class BilateralCorrectorConfig(CorrectorConfig):
    grid_width: int = 16
    grid_height: int = 16
    grid_luma: int = 8
    tv_weight: float = 10.0
    lr: float = 2e-3

    def create(self, num_images: int):
        return BilateralCorrector(self, num_images)


def identity_grids(num_images: int, gw: int, gh: int, gl: int) -> jnp.ndarray:
    """(num_images, gl, gh, gw, 12) grids initialized to identity affine."""
    ident = jnp.concatenate(
        [jnp.eye(3).reshape(-1), jnp.zeros(3)])  # row-major 3x3 | bias
    return jnp.tile(ident, (num_images, gl, gh, gw, 1))


def slice_grid(grid: jnp.ndarray, image: jnp.ndarray) -> jnp.ndarray:
    """Trilinearly sample per-pixel 3x4 affines from one image's grid.

    grid: (gl, gh, gw, 12); image: (H, W, 3) -> (H, W, 12).
    """
    gl, gh, gw, _ = grid.shape
    h, w, _ = image.shape

    ys = (jnp.arange(h) + 0.5) / h * (gh - 1)
    xs = (jnp.arange(w) + 0.5) / w * (gw - 1)
    luma = jnp.clip(image @ _GRAY, 0.0, 1.0) * (gl - 1)   # (H, W)

    x = jnp.broadcast_to(xs[None, :], (h, w))
    y = jnp.broadcast_to(ys[:, None], (h, w))

    def corners(v, vmax):
        v0 = jnp.clip(jnp.floor(v), 0, vmax - 1).astype(jnp.int32)
        v1 = jnp.minimum(v0 + 1, vmax - 1)
        f = v - v0
        return v0, v1, f[..., None]

    x0, x1, fx = corners(x, gw)
    y0, y1, fy = corners(y, gh)
    l0, l1, fl = corners(luma, gl)

    def g(l, yy, xx):
        return grid[l, yy, xx]

    out = (
        g(l0, y0, x0) * (1 - fl) * (1 - fy) * (1 - fx)
        + g(l0, y0, x1) * (1 - fl) * (1 - fy) * fx
        + g(l0, y1, x0) * (1 - fl) * fy * (1 - fx)
        + g(l0, y1, x1) * (1 - fl) * fy * fx
        + g(l1, y0, x0) * fl * (1 - fy) * (1 - fx)
        + g(l1, y0, x1) * fl * (1 - fy) * fx
        + g(l1, y1, x0) * fl * fy * (1 - fx)
        + g(l1, y1, x1) * fl * fy * fx
    )
    return out


def color_affine_transform(affine: jnp.ndarray, image: jnp.ndarray) -> jnp.ndarray:
    """Apply per-pixel 3x4 affines: (H, W, 12) x (H, W, 3) -> (H, W, 3)."""
    m = affine[..., :9].reshape(*image.shape[:2], 3, 3)
    b = affine[..., 9:12]
    return jnp.einsum("hwij,hwj->hwi", m, image) + b


def total_variation_loss(grids: jnp.ndarray) -> jnp.ndarray:
    """Mean squared difference between neighboring grid cells."""
    tv = 0.0
    for axis in (1, 2, 3):
        d = jnp.diff(grids, axis=axis)
        tv = tv + (d * d).mean()
    return tv


class BilateralCorrector:
    """Holds per-image grids + an Adam state; methods are pure."""

    def __init__(self, config: BilateralCorrectorConfig, num_images: int):
        from splat_trainer_tpu.optim import adam_init
        self.config = config
        self.params = identity_grids(
            num_images, config.grid_width, config.grid_height, config.grid_luma)
        self.opt_state = adam_init(self.params)

    def correct(self, params, image: jnp.ndarray, image_idx) -> jnp.ndarray:
        affine = slice_grid(params[image_idx], image)
        return color_affine_transform(affine, image)

    def reg_loss(self, params) -> jnp.ndarray:
        return self.config.tv_weight * total_variation_loss(params)

    def step(self, grads, rows):
        from splat_trainer_tpu.optim import adam_update
        self.params, self.opt_state = adam_update(
            self.params, grads, self.opt_state, self.config.lr)
