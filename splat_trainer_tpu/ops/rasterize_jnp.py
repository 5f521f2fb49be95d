"""Dense jnp reference rasterizer — the correctness oracle.

Composites *all* gaussians for every pixel (O(H*W*N) memory/compute), with
the exact same semantics as the Pallas tile kernel:

- contributions are culled by the gaussian's 3-sigma *tile rectangle*
  (matching the tile binning — this is part of 3DGS semantics, not an
  approximation),
- alpha = min(opacity * exp(power), alpha_clamp), zeroed when power > 0 or
  alpha < alpha_threshold,
- front-to-back `over` compositing in depth order,
- median depth = NDC depth at which accumulated alpha crosses 0.5.

Replaces taichi-splatting's renderer as the CPU/test path (SURVEY.md N1,
§7.1 decision 3). `dense_backward` implements the analytic VJP (the same
formulation the Pallas backward kernel uses) so the hand-written kernel can
be validated in layers: autodiff(dense_forward) == dense_backward == pallas.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from splat_trainer_tpu.core.types import RasterConfig
from splat_trainer_tpu.ops.tiling import TileGrid


class DenseInputs(NamedTuple):
    """Depth-ordered per-gaussian raster inputs (N,...)."""

    mean: jax.Array       # (N, 2)
    conic: jax.Array      # (N, 3)
    opacity: jax.Array    # (N,)
    color: jax.Array      # (N, C)
    depth_ndc: jax.Array  # (N,)
    rect: jax.Array       # (N, 4) tile rect x0, y0, x1, y1
    visible: jax.Array    # (N,) bool


def pixel_centers(image_size) -> jax.Array:
    w, h = image_size
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    return jnp.stack([xs + 0.5, ys + 0.5], axis=-1).reshape(-1, 2).astype(jnp.float32)


def compute_alpha(px: jax.Array, inputs: DenseInputs, grid: TileGrid, config: RasterConfig):
    """Per (pixel, gaussian) compositing alpha, (P, N)."""
    d = px[:, None, :] - inputs.mean[None, :, :]
    dx, dy = d[..., 0], d[..., 1]
    a, b, c = inputs.conic[:, 0], inputs.conic[:, 1], inputs.conic[:, 2]
    power = -0.5 * (a[None] * dx * dx + c[None] * dy * dy) - b[None] * dx * dy

    alpha = jnp.minimum(inputs.opacity[None] * jnp.exp(power), config.alpha_clamp)

    # tile-rectangle culling: match the binned kernel exactly
    tx = (px[:, 0] // grid.tile_size).astype(jnp.int32)
    ty = (px[:, 1] // grid.tile_size).astype(jnp.int32)
    x0, y0, x1, y1 = (inputs.rect[:, i] for i in range(4))
    in_rect = (
        (tx[:, None] >= x0[None]) & (tx[:, None] < x1[None])
        & (ty[:, None] >= y0[None]) & (ty[:, None] < y1[None])
    )

    keep = (power <= 0) & (alpha >= config.alpha_threshold) & in_rect & inputs.visible[None]
    return jnp.where(keep, alpha, 0.0)


def dense_forward(inputs: DenseInputs, image_size, grid: TileGrid, config: RasterConfig):
    """Returns (image (H,W,C), alpha_img (H,W), median_ndc (H,W), visibility (N,)).

    `inputs` must already be sorted front-to-back by depth.
    """
    w_img, h_img = image_size
    px = pixel_centers(image_size)

    alpha = compute_alpha(px, inputs, grid, config)      # (P, N)
    one_minus = 1.0 - alpha
    T_incl = jnp.cumprod(one_minus, axis=1)
    T_excl = jnp.concatenate([jnp.ones_like(T_incl[:, :1]), T_incl[:, :-1]], axis=1)
    weight = alpha * T_excl                              # (P, N)

    image = (weight @ inputs.color).reshape(h_img, w_img, -1)
    alpha_img = weight.sum(axis=1).reshape(h_img, w_img)

    A_incl = 1.0 - T_incl
    A_excl = 1.0 - T_excl
    crossed = (A_incl >= 0.5) & (A_excl < 0.5)
    median_ndc = (crossed * inputs.depth_ndc[None]).sum(axis=1)
    median_ndc = jnp.where(A_incl[:, -1] >= 0.5, median_ndc, 1.0).reshape(h_img, w_img)

    visibility = weight.sum(axis=0)
    return image, alpha_img, median_ndc, visibility


def dense_backward(inputs: DenseInputs, image_size, grid: TileGrid, config: RasterConfig,
                   ct_image: jax.Array, ct_alpha: jax.Array):
    """Analytic VJP of `dense_forward` w.r.t. (mean, conic, opacity, color).

    This is the *formulation oracle* for the Pallas backward kernel:

      C_px        = sum_k c_k a_k T_k,    T_k = prod_{j<k} (1 - a_j)
      dL/dc_k     = sum_px g_px a_k T_k
      dL/da_k     = sum_px [ T_k (c_k . g_px) - Sg_k / (1 - a_k) ]
                    + ct_alpha term:  T_final / (1 - a_k) * ct_alpha_px
      Sg_k        = (C_final . g_px) - prefix_{j<=k} (w_j (c_j . g_px))

    Also returns the gradient-derived per-point heuristics:
      split_score = || dL/d mean ||  (view-space positional gradient, the
                    3DGS densification signal)
      prune_cost  = sum_px w |g|_1   (contribution weighted by loss gradient)
    """
    px = pixel_centers(image_size)
    g = ct_image.reshape(-1, ct_image.shape[-1])         # (P, C)
    ct_alpha = ct_alpha.reshape(-1)                      # (P,)

    alpha = compute_alpha(px, inputs, grid, config)
    one_minus = 1.0 - alpha
    T_incl = jnp.cumprod(one_minus, axis=1)
    T_excl = jnp.concatenate([jnp.ones_like(T_incl[:, :1]), T_incl[:, :-1]], axis=1)
    weight = alpha * T_excl
    T_final = T_incl[:, -1]

    d_color = weight.T @ g                                # (N, C)

    cg = g @ inputs.color.T                               # (P, N): c_k . g_px
    F = (cg * weight).sum(axis=1, keepdims=True)          # C_final . g per pixel
    Sg = F - jnp.cumsum(weight * cg, axis=1)              # strictly-behind sum
    safe = jnp.maximum(one_minus, 1e-6)

    d_alpha = T_excl * cg - Sg / safe
    # accumulated-alpha output gradient: alpha_img = 1 - T_final
    d_alpha = d_alpha + (ct_alpha * T_final)[:, None] / safe
    d_alpha = jnp.where(alpha > 0, d_alpha, 0.0)

    # chain through alpha = opacity * exp(power) (clamp region has zero grad)
    unclamped = alpha < config.alpha_clamp
    G = jnp.where(
        inputs.opacity[None] > 0, alpha / jnp.maximum(inputs.opacity[None], 1e-12), 0.0)
    d_opacity = (jnp.where(unclamped, d_alpha, 0.0) * G).sum(axis=0)
    d_power = jnp.where(unclamped, d_alpha * alpha, 0.0)  # (P, N)

    d = px[:, None, :] - inputs.mean[None, :, :]
    dx, dy = d[..., 0], d[..., 1]
    a, b, c = inputs.conic[:, 0], inputs.conic[:, 1], inputs.conic[:, 2]

    d_mx = (d_power * (a[None] * dx + b[None] * dy)).sum(axis=0)
    d_my = (d_power * (c[None] * dy + b[None] * dx)).sum(axis=0)
    d_mean = jnp.stack([d_mx, d_my], axis=-1)

    d_ca = (-0.5 * d_power * dx * dx).sum(axis=0)
    d_cb = (-d_power * dx * dy).sum(axis=0)
    d_cc = (-0.5 * d_power * dy * dy).sum(axis=0)
    d_conic = jnp.stack([d_ca, d_cb, d_cc], axis=-1)

    g_mag = jnp.abs(g).sum(axis=1)                        # (P,)
    prune_cost = (weight * g_mag[:, None]).sum(axis=0)
    split_score = jnp.linalg.norm(d_mean, axis=-1)

    return d_mean, d_conic, d_opacity, d_color, split_score, prune_cost
