"""EWA perspective projection of 3D gaussians to screen space, in pure jnp.

TPU-native replacement for taichi-splatting's `project_to_image` CUDA kernel
(SURVEY.md N1; usage /root/reference/splat_trainer/scene/mlp_scene.py:415).
Differentiable by construction (autodiff), so the renderer's custom VJP only
needs to cover the compositing kernel.

Performance note: everything here is written as *elementwise* (N,)-vector
arithmetic — no batched 3x3 matmuls. XLA lowers batched tiny matmuls to the
128x128 MXU at ~0.05% utilization (measured 10.5 ms for 100k points);
the expanded scalar form runs on the VPU in a fused loop (<1 ms).

Math (standard 3DGS / EWA splatting):
  Sigma3 = M M^T,  M = R(q) diag(exp(log_s))
  t      = W p + c                   (camera-space position)
  T      = J W                       (J = clamped perspective Jacobian)
  Sigma2 = T Sigma3 T^T + blur_cov * I
  conic  = Sigma2^{-1}, radius = 3 sqrt(max eigenvalue)
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

    R = camera.T_camera_world[:3, :3]
    tc = camera.T_camera_world[:3, 3]
    r = [[R[i, j] for j in range(3)] for i in range(3)]

    px, py, pz = (gaussians.position[:, i] for i in range(3))
    # camera-space position t = R p + tc, expanded elementwise
    t0 = r[0][0] * px + r[0][1] * py + r[0][2] * pz + tc[0]
    t1 = r[1][0] * px + r[1][1] * py + r[1][2] * pz + tc[1]
    tz = r[2][0] * px + r[2][1] * py + r[2][2] * pz + tc[2]
    # Points at/behind the near plane are culled below, but the covariance
    # chain still evaluates for them — with z -> 0 it OVERFLOWS f32
    # (det -> inf -> conic NaN), and although the forward is masked, the
    # backward drags NaN into every geometry gradient (the where-mask
    # NaN-grad trap; observed as a whole-scene NaN mid-run on the garden-
    # class milestone). Substitute a harmless depth for culled points so
    # the masked branch stays finite in both directions.
    in_front = tz > camera.near_plane
    safe_z = jnp.where(in_front, jnp.maximum(tz, 1e-6), camera.far_plane)
    inv_z = 1.0 / safe_z

    u = fx * t0 * inv_z + cx
    v = fy * t1 * inv_z + cy
    mean = jnp.stack([u, v], axis=-1)

    # M = R(q) diag(s): rotation matrix entries from the quaternion,
    # scaled per column
    q = transforms.normalize(gaussians.rotation)
    qx, qy, qz, qw = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    sx, sy, sz = (jnp.exp(gaussians.log_scaling[:, i]) for i in range(3))

    m00 = (1 - 2 * (qy * qy + qz * qz)) * sx
    m01 = (2 * (qx * qy - qw * qz)) * sy
    m02 = (2 * (qx * qz + qw * qy)) * sz
    m10 = (2 * (qx * qy + qw * qz)) * sx
    m11 = (1 - 2 * (qx * qx + qz * qz)) * sy
    m12 = (2 * (qy * qz - qw * qx)) * sz
    m20 = (2 * (qx * qz - qw * qy)) * sx
    m21 = (2 * (qy * qz + qw * qx)) * sy
    m22 = (1 - 2 * (qx * qx + qy * qy)) * sz

    # Sigma3 = M M^T (6 unique entries)
    c00 = m00 * m00 + m01 * m01 + m02 * m02
    c11 = m10 * m10 + m11 * m11 + m12 * m12
    c22 = m20 * m20 + m21 * m21 + m22 * m22
    c01 = m00 * m10 + m01 * m11 + m02 * m12
    c02 = m00 * m20 + m01 * m21 + m02 * m22
    c12 = m10 * m20 + m11 * m21 + m12 * m22

    # perspective Jacobian with clamped offsets (3DGS-style frustum guard).
    # Crop/slab cameras clamp against the FULL frame extent (clip_size):
    # t*inv_z is principal-point independent, and a crop-height clamp would
    # distort covariances (see CameraParams.clip_size).
    w_clip, h_clip = camera.clip_size or camera.image_size
    lim_x = config.clip_margin * (0.5 * w_clip / fx)
    lim_y = config.clip_margin * (0.5 * h_clip / fy)
    txz = jnp.clip(t0 * inv_z, -lim_x, lim_x)
    tyz = jnp.clip(t1 * inv_z, -lim_y, lim_y)

    # T = J W rows: T0k = (fx/z) r0k - (fx tx/z^2) r2k, similarly T1k
    j00 = fx * inv_z
    j02 = -fx * txz * inv_z
    j11 = fy * inv_z
    j12 = -fy * tyz * inv_z

    T00 = j00 * r[0][0] + j02 * r[2][0]
    T01 = j00 * r[0][1] + j02 * r[2][1]
    T02 = j00 * r[0][2] + j02 * r[2][2]
    T10 = j11 * r[1][0] + j12 * r[2][0]
    T11 = j11 * r[1][1] + j12 * r[2][1]
    T12 = j11 * r[1][2] + j12 * r[2][2]

    # Sigma2 = T Sigma3 T^T (symmetric 2x2)
    # row_i = T_i . Sigma3 (3-vector), then a = row_0 . T_0, etc.
    s00 = T00 * c00 + T01 * c01 + T02 * c02
    s01 = T00 * c01 + T01 * c11 + T02 * c12
    s02 = T00 * c02 + T01 * c12 + T02 * c22
    s10 = T10 * c00 + T11 * c01 + T12 * c02
    s11 = T10 * c01 + T11 * c11 + T12 * c12
    s12 = T10 * c02 + T11 * c12 + T12 * c22

    # The 1e12-px^2 cap keeps det products far from f32 overflow for
    # extreme (but culled) geometry while passing gradients unchanged for
    # every splat that can actually appear on screen.
    cov_cap = 1e12
    a_nb = jnp.clip(s00 * T00 + s01 * T01 + s02 * T02, -cov_cap, cov_cap)
    b = jnp.clip(s00 * T10 + s01 * T11 + s02 * T12, -cov_cap, cov_cap)
    c_nb = jnp.clip(s10 * T10 + s11 * T11 + s12 * T12, -cov_cap, cov_cap)

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
    # Opacity-aware extent (exact, not an approximation): the compositing
    # kernel drops alpha = op*exp(-0.5 q) below alpha_threshold, so pixels
    # beyond sqrt(2 ln(op/thr)) sigma contribute nothing. Capping the factor
    # at the classic 3DGS 3-sigma keeps high-opacity splats byte-identical
    # while low-opacity splats cover quadratically fewer tiles — this feeds
    # straight into binning demand (ops/tiling.py), the dominant
    # instance-count term at garden scale (VERDICT weak #1c).
    sigma_factor = jnp.sqrt(2.0 * jnp.log(
        jnp.maximum(opacity / config.alpha_threshold, 1.0)))
    sigma_factor = jnp.minimum(sigma_factor, 3.0)
    radius = jnp.ceil(
        jax.lax.stop_gradient(sigma_factor) * jnp.sqrt(lam1))
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
