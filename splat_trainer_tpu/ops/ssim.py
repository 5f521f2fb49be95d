"""SSIM and multi-scale SSIM loss in jnp.

TPU-native replacement for the `fused-ssim` CUDA extension (SURVEY.md N10;
usage /root/reference/splat_trainer/trainer/trainer.py:450-462). The11x11
gaussian window (sigma=1.5) is applied as two separable depthwise
convolutions; XLA fuses the elementwise SSIM map computation. Differentiable
by construction — no custom backward required.

Matches fused_ssim(padding="valid") semantics: statistics are only computed
where the window fully overlaps the image.
"""

from functools import partial

import jax
import jax.numpy as jnp


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _blur_valid(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Separable valid-padding blur over (H, W, C)."""
    k = kernel.shape[0]
    c = x.shape[-1]
    # depthwise separable: rhs (kh, kw, 1, C) with feature_group_count=C
    xh = jax.lax.conv_general_dilated(
        x[None], jnp.tile(kernel.reshape(1, k, 1, 1), (1, 1, 1, c)),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)[0]
    xv = jax.lax.conv_general_dilated(
        xh[None], jnp.tile(kernel.reshape(k, 1, 1, 1), (1, 1, 1, c)),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)[0]
    return xv


@partial(jax.jit, static_argnames=("window_size",))
def ssim(pred: jnp.ndarray, ref: jnp.ndarray, window_size: int = 11,
         c1: float = 0.01 ** 2, c2: float = 0.03 ** 2) -> jnp.ndarray:
    """Mean SSIM over an (H, W, C) image pair in [0, 1]."""
    kernel = _gaussian_kernel(window_size)
    blur = partial(_blur_valid, kernel=kernel)

    mu_p, mu_r = blur(pred), blur(ref)
    mu_pp, mu_rr, mu_pr = mu_p * mu_p, mu_r * mu_r, mu_p * mu_r

    sigma_p = blur(pred * pred) - mu_pp
    sigma_r = blur(ref * ref) - mu_rr
    sigma_pr = blur(pred * ref) - mu_pr

    ssim_map = ((2 * mu_pr + c1) * (2 * sigma_pr + c2)) / (
        (mu_pp + mu_rr + c1) * (sigma_p + sigma_r + c2))
    return ssim_map.mean()


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pooling over (H, W, C) (reference F.avg_pool2d)."""
    h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    return x[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2, c).mean(axis=(1, 3))


def multiscale_ssim_loss(pred: jnp.ndarray, ref: jnp.ndarray, levels: int = 3):
    """Multi-scale SSIM loss: mean over pyramid levels of (1 - ssim).

    Mirrors Trainer.compute_ssim_loss (trainer.py:450-462). Returns
    (loss, full-resolution ssim metric).
    """
    ssim0 = ssim(pred, ref)
    loss = 1.0 - ssim0
    for _ in range(1, levels):
        pred, ref = _avg_pool2(pred), _avg_pool2(ref)
        loss = loss + (1.0 - ssim(pred, ref))
    return loss / levels, ssim0
