"""EWA perspective projection of 3D gaussians to screen space, in pure jnp.

TPU-native replacement for taichi-splatting's `project_to_image` CUDA kernel
(SURVEY.md N1; usage /root/reference/splat_trainer/scene/mlp_scene.py:415).
Pure elementwise math over the capacity axis — XLA fuses this into a handful
of VPU loops; no Pallas needed. Differentiable by construction (autodiff),
so the renderer's custom VJP only needs to cover the compositing kernel.

Math (standard 3DGS / EWA splatting):
  Sigma3 = R S S^T R^T           (R from unit quaternion, S = diag(exp(log_s)))
  t      = W p + c               (camera-space position)
  J      = perspective Jacobian at t (with clamped t_x/t_z, t_y/t_z)
  Sigma2 = (J W) Sigma3 (J W)^T + blur_cov * I
  conic  = Sigma2^{-1}, radius = 3 * sqrt(max eigenvalue)
"""

import jax
import jax.numpy as jnp

from splat_trainer_tpu.core.types import CameraParams, Gaussians2D, Gaussians3D, RasterConfig
from splat_trainer_tpu.utils import transforms


def project_to_image(
    gaussians: Gaussians3D,
    camera: CameraParams,
    config: RasterConfig,
    active: jax.Array | None = None,
) -> Gaussians2D:
    """Project capacity-shaped gaussians into a camera. Returns Gaussians2D.

    `active` optionally masks out unused capacity slots.
    """
    w_img, h_img = camera.image_size
    fx, fy, cx, cy = (camera.projection[i] for i in range(4))

    R_cw, t_cw = transforms.split_rt(camera.T_camera_world)

    # camera-space positions: (N, 3)
    t = gaussians.position @ R_cw.T + t_cw

    tz = t[:, 2]
    safe_z = jnp.maximum(tz, 1e-6)

    # image-plane means
    u = fx * t[:, 0] / safe_z + cx
    v = fy * t[:, 1] / safe_z + cy
    mean = jnp.stack([u, v], axis=-1)

    # 3D covariance: R S S^T R^T
    Rg = transforms.quat_to_rotmat(transforms.normalize(gaussians.rotation))
    scale = jnp.exp(gaussians.log_scaling)            # (N, 3)
    M = Rg * scale[:, None, :]                        # R @ diag(s) -> (N, 3, 3)
    cov3 = M @ jnp.swapaxes(M, -1, -2)

    # perspective Jacobian with clamped offsets (3DGS-style frustum guard)
    lim_x = config.clip_margin * (0.5 * w_img / fx)
    lim_y = config.clip_margin * (0.5 * h_img / fy)
    tx = jnp.clip(t[:, 0] / safe_z, -lim_x, lim_x) * safe_z
    ty = jnp.clip(t[:, 1] / safe_z, -lim_y, lim_y) * safe_z

    inv_z = 1.0 / safe_z
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(inv_z)
    J = jnp.stack([
        jnp.stack([fx * inv_z, zeros, -fx * tx * inv_z2], axis=-1),
        jnp.stack([zeros, fy * inv_z, -fy * ty * inv_z2], axis=-1),
    ], axis=-2)                                       # (N, 2, 3)

    T = J @ R_cw                                      # (N, 2, 3)
    cov2 = T @ cov3 @ jnp.swapaxes(T, -1, -2)         # (N, 2, 2)

    a_nb = cov2[:, 0, 0]
    b = cov2[:, 0, 1]
    c_nb = cov2[:, 1, 1]

    # low-pass filter (reference blur_cov=0.3; trainer.py:310)
    a = a_nb + config.blur_cov
    c = c_nb + config.blur_cov

    det_nb = a_nb * c_nb - b * b
    det = a * c - b * b
    det_safe = jnp.maximum(det, 1e-12)

    # Mip-style antialias: compensate opacity for the extra blur
    compensation = jnp.sqrt(jnp.maximum(det_nb, 0.0) / det_safe)
    opacity = jax.nn.sigmoid(gaussians.alpha_logit[:, 0])
    if config.antialias:
        opacity = opacity * compensation

    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    # eigenvalues of [[a, b], [b, c]]
    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, 1e-12))
    lam1 = jnp.maximum(mid + disc, 0.0)
    lam2 = jnp.maximum(mid - disc, 0.0)
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))
    screen_scale = jnp.sqrt(jnp.stack([lam1, lam2], axis=-1))

    in_depth = (tz > camera.near_plane) & (tz < camera.far_plane)
    on_screen = (
        (u + radius > 0) & (u - radius < w_img)
        & (v + radius > 0) & (v - radius < h_img)
    )
    visible = in_depth & on_screen & (det > 1e-12) & (radius >= 1.0)
    if active is not None:
        visible = visible & active

    return Gaussians2D(
        mean=mean,
        conic=conic,
        depth=tz,
        opacity=opacity,
        radius=radius,
        screen_scale=screen_scale,
        visible=visible,
    )


def ndc_depth(depth: jax.Array, near: jax.Array, far: jax.Array) -> jax.Array:
    """Inverse-depth NDC in [0, 1]: 0 at near plane, 1 at far plane."""
    inv_near, inv_far = 1.0 / near, 1.0 / far
    z = jnp.clip(depth, near, far)
    return (inv_near - 1.0 / z) / (inv_near - inv_far)


def inverse_ndc_depth(ndc: jax.Array, near: jax.Array, far: jax.Array) -> jax.Array:
    """Inverse of `ndc_depth` (reference visibility/query_points.py:45-47)."""
    inv_near, inv_far = 1.0 / near, 1.0 / far
    return 1.0 / (inv_near - ndc * (inv_near - inv_far))
