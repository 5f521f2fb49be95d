"""SSIM and multi-scale SSIM loss in jnp, MXU-formulated.

TPU-native replacement for the `fused-ssim` CUDA extension (SURVEY.md N10;
usage /root/reference/splat_trainer/trainer/trainer.py:450-462). The 11x11
gaussian window is applied as two *banded-matrix contractions* — XLA's
depthwise convolution with 3 channels maps terribly onto the TPU (measured
34 ms at 1536x1024), while (C*H, W) @ (W, W') matmuls ride the MXU (~2 ms).
Differentiable by construction — no custom backward required.

Matches fused_ssim(padding="valid") semantics: statistics only where the
window fully overlaps the image.

`precision` is HIGHEST (f32) everywhere, including the loss path. The
variance/covariance terms are differences of squares of O(1) values with
O(1e-3) magnitude — in bf16 contractions they cancel catastrophically, and
while the SSIM *value* still looks plausible, its *gradient* is structured
garbage. On a real TPU chip this silently stalled full-scene training at
~9 dB PSNR (round-2 debugging); MSE-only training converged. f32 banded
matmuls cost ~3x the bf16 path but SSIM remains a small fraction of the
step.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _band_matrix(n: int, kernel: jnp.ndarray) -> jnp.ndarray:
    """(n, n-k+1) banded matrix B with B[j+d, j] = kernel[d]."""
    k = kernel.shape[0]
    rows = jnp.arange(n)[:, None]
    cols = jnp.arange(n - k + 1)[None, :]
    d = rows - cols
    valid = (d >= 0) & (d < k)
    return jnp.where(valid, kernel[jnp.clip(d, 0, k - 1)], 0.0)


def _blur_valid(x: jnp.ndarray, kernel: jnp.ndarray, precision) -> jnp.ndarray:
    """Separable valid-padding blur over (H, W, C) via two contractions."""
    h, w, c = x.shape
    bw = _band_matrix(w, kernel)
    bh = _band_matrix(h, kernel)

    xc = x.transpose(2, 0, 1)                                  # (C, H, W)
    xh = jnp.einsum("chw,wv->chv", xc, bw, precision=precision)
    xv = jnp.einsum("chv,hu->cuv", xh, bh, precision=precision)
    return xv.transpose(1, 2, 0)                               # (H', W', C)


@partial(jax.jit, static_argnames=("window_size", "precision"))
def ssim(pred: jnp.ndarray, ref: jnp.ndarray, window_size: int = 11,
         c1: float = 0.01 ** 2, c2: float = 0.03 ** 2,
         precision=lax.Precision.HIGHEST) -> jnp.ndarray:
    """Mean SSIM over an (H, W, C) image pair in [0, 1]."""
    kernel = _gaussian_kernel(window_size)
    blur = partial(_blur_valid, kernel=kernel, precision=precision)

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


def multiscale_ssim_loss(pred: jnp.ndarray, ref: jnp.ndarray, levels: int = 3,
                         precision=lax.Precision.HIGHEST):
    """Multi-scale SSIM loss: mean over pyramid levels of (1 - ssim).

    Mirrors Trainer.compute_ssim_loss (trainer.py:450-462). Returns
    (loss, full-resolution ssim metric). HIGHEST precision — bf16
    contractions corrupt the gradient (see module docstring).
    """
    ssim0 = ssim(pred, ref, precision=precision)
    loss = 1.0 - ssim0
    for _ in range(1, levels):
        pred, ref = _avg_pool2(pred), _avg_pool2(ref)
        loss = loss + (1.0 - ssim(pred, ref, precision=precision))
    return loss / levels, ssim0
