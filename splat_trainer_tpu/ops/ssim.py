"""SSIM and multi-scale SSIM loss in jnp, MXU-formulated.

TPU-native replacement for the `fused-ssim` CUDA extension (SURVEY.md N10;
usage /root/reference/splat_trainer/trainer/trainer.py:450-462). The 11x11
gaussian window is applied as two *banded-matrix contractions* — XLA's
depthwise convolution with 3 channels maps terribly onto the TPU (measured
34 ms at 1536x1024), while (C*H, W) @ (W, W') matmuls ride the MXU (~2 ms).
Differentiable by construction — no custom backward required.

Layout and fusion choices (round-2 profiling):
- Everything runs channel-major (C, H, W): the lane dimension stays the
  image width through every contraction, so no relayout transposes appear
  between pyramid levels (the HWC<->CHW transposes cost real milliseconds
  at 1536x1024 when repeated per blur).
- All five blurred fields per level (mu_p, mu_r, E[p^2], E[r^2], E[pr])
  ride ONE contraction pair with the fields stacked on the C axis — one
  (5C*H, W) @ (W, W') matmul instead of five small ones.
- The 2x2 pyramid pooling is a pair of banded matmuls too (pool matrix
  with two 0.5 entries per column) — the naive reshape(h2,2,w2,2,c).mean
  is a strided relayout the TPU pays ~10 ms/step for at garden size.

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


def _pool2_matrix(n: int) -> jnp.ndarray:
    """(n, n//2) banded matrix averaging adjacent pairs (odd tail cropped)."""
    n2 = n // 2
    rows = jnp.arange(n)[:, None]
    cols = jnp.arange(n2)[None, :]
    return jnp.where((rows == 2 * cols) | (rows == 2 * cols + 1), 0.5, 0.0)


def _contract_hw(xc: jnp.ndarray, bw: jnp.ndarray, bh: jnp.ndarray,
                 precision) -> jnp.ndarray:
    """Apply (W, W') then (H, H') banded matrices to a (C, H, W) stack."""
    xh = jnp.einsum("chw,wv->chv", xc, bw, precision=precision)
    return jnp.einsum("chv,hu->cuv", xh, bh, precision=precision)


def _blur_valid(xc: jnp.ndarray, kernel: jnp.ndarray, precision) -> jnp.ndarray:
    """Separable valid-padding blur over (C, H, W)."""
    _, h, w = xc.shape
    return _contract_hw(xc, _band_matrix(w, kernel), _band_matrix(h, kernel),
                        precision)


def _avg_pool2(xc: jnp.ndarray, precision) -> jnp.ndarray:
    """2x2 average pooling over (C, H, W) as two banded matmuls
    (reference F.avg_pool2d)."""
    _, h, w = xc.shape
    return _contract_hw(xc, _pool2_matrix(w), _pool2_matrix(h), precision)


def _ssim_chw(pred: jnp.ndarray, ref: jnp.ndarray, window_size: int,
              c1: float, c2: float, precision) -> jnp.ndarray:
    """Mean SSIM over a (C, H, W) image pair in [0, 1]."""
    kernel = _gaussian_kernel(window_size)
    c = pred.shape[0]
    fields = jnp.concatenate(
        [pred, ref, pred * pred, ref * ref, pred * ref], axis=0)
    b = _blur_valid(fields, kernel, precision)
    mu_p, mu_r = b[0:c], b[c:2 * c]
    mu_pp, mu_rr, mu_pr = mu_p * mu_p, mu_r * mu_r, mu_p * mu_r

    sigma_p = b[2 * c:3 * c] - mu_pp
    sigma_r = b[3 * c:4 * c] - mu_rr
    sigma_pr = b[4 * c:5 * c] - mu_pr

    ssim_map = ((2 * mu_pr + c1) * (2 * sigma_pr + c2)) / (
        (mu_pp + mu_rr + c1) * (sigma_p + sigma_r + c2))
    return ssim_map.mean()


@partial(jax.jit, static_argnames=("window_size", "precision"))
def ssim(pred: jnp.ndarray, ref: jnp.ndarray, window_size: int = 11,
         c1: float = 0.01 ** 2, c2: float = 0.03 ** 2,
         precision=lax.Precision.HIGHEST) -> jnp.ndarray:
    """Mean SSIM over an (H, W, C) image pair in [0, 1]."""
    return _ssim_chw(pred.transpose(2, 0, 1), ref.transpose(2, 0, 1),
                     window_size, c1, c2, precision)


def multiscale_ssim_loss(pred: jnp.ndarray, ref: jnp.ndarray, levels: int = 3,
                         precision=lax.Precision.HIGHEST):
    """Multi-scale SSIM loss: mean over pyramid levels of (1 - ssim).

    Mirrors Trainer.compute_ssim_loss (trainer.py:450-462). Returns
    (loss, full-resolution ssim metric). HIGHEST precision — bf16
    contractions corrupt the gradient (see module docstring).
    """
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    pc, rc = pred.transpose(2, 0, 1), ref.transpose(2, 0, 1)
    ssim0 = _ssim_chw(pc, rc, 11, c1, c2, precision)
    loss = 1.0 - ssim0
    for _ in range(1, levels):
        pc, rc = _avg_pool2(pc, precision), _avg_pool2(rc, precision)
        loss = loss + (1.0 - _ssim_chw(pc, rc, 11, c1, c2, precision))
    return loss / levels, ssim0
