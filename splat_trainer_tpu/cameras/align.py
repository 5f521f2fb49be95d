"""Correspondence-based camera alignment: NCC patch matching + Gauss-Newton
PnP on SE(3).

Pose recovery by photometric SGD on the rendering loss fails when the
injected pose error exceeds the photometric basin (three recorded negatives
in RESULTS.md: lr-based protocols v1-v3 all diverge at ~1 degree of rotation
noise). This module implements the round-4 protocol: instead of descending
the rendering loss, each camera is re-aligned by *explicit correspondences*

  1. render the consensus scene from the camera's current (wrong) pose,
     with the median-depth channel;
  2. pick keypoints on a cell grid at the strongest image gradients of the
     RENDER (texture the consensus actually has — matching where the render
     is blank would be noise);
  3. back-project each keypoint to 3D through the rendered median depth;
  4. find each keypoint's true pixel in the OBSERVED image by normalized
     cross-correlation over a search window (capture range = window radius,
     independent of any photometric basin);
  5. solve the 6-DoF pose by Gauss-Newton on the Huber-robustified
     reprojection error (exact solve per camera — no learning rate).

Beyond-parity: the reference's pose gradients are permanently disabled
(/root/reference/splat_trainer/camera_table/pose_table.py:70-80); it has no
pose recovery mechanism at all. Everything here is jittable (static keypoint
counts / window sizes) and runs on CPU or TPU.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from splat_trainer_tpu.utils import transforms


# ---------------------------------------------------------------------------
# keypoint selection
# ---------------------------------------------------------------------------


def select_keypoints(gray: jax.Array, cells: tuple[int, int],
                     border: int) -> tuple[jax.Array, jax.Array]:
    """Strongest-gradient pixel per cell of a (cy, cx) grid.

    Returns ((S, 2) float [x, y] pixel coords, (S,) gradient magnitudes)
    with S = cells[0] * cells[1] static. Non-max suppression comes free
    from the one-per-cell rule; weak cells (flat sky) carry a near-zero
    magnitude the caller can threshold on.
    """
    h, w = gray.shape
    gx = jnp.zeros_like(gray).at[:, 1:-1].set(gray[:, 2:] - gray[:, :-2])
    gy = jnp.zeros_like(gray).at[1:-1, :].set(gray[2:, :] - gray[:-2, :])
    mag = gx * gx + gy * gy
    # keep the NCC window inside the image
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    inb = ((yy >= border) & (yy < h - border)
           & (xx >= border) & (xx < w - border))
    mag = jnp.where(inb, mag, -1.0)

    ncy, ncx = cells
    ch, cw = h // ncy, w // ncx
    m = mag[:ncy * ch, :ncx * cw].reshape(ncy, ch, ncx, cw)
    m = m.transpose(0, 2, 1, 3).reshape(ncy * ncx, ch * cw)
    flat_idx = jnp.argmax(m, axis=1)
    best = jnp.take_along_axis(m, flat_idx[:, None], axis=1)[:, 0]
    cell = jnp.arange(ncy * ncx)
    cy0 = (cell // ncx) * ch
    cx0 = (cell % ncx) * cw
    py = cy0 + flat_idx // cw
    px = cx0 + flat_idx % cw
    pts = jnp.stack([px, py], axis=-1).astype(jnp.float32)
    return pts, best


# ---------------------------------------------------------------------------
# NCC matching
# ---------------------------------------------------------------------------


def _extract_patch(img: jax.Array, x: jax.Array, y: jax.Array, size: int):
    """(size, size) patch centered at integer (x, y); caller keeps it
    in-bounds."""
    half = size // 2
    return lax.dynamic_slice(
        img, (y.astype(jnp.int32) - half, x.astype(jnp.int32) - half),
        (size, size))


def ncc_match(ref: jax.Array, obs: jax.Array, pts: jax.Array,
              patch: int = 9, radius: int = 8):
    """Match keypoints from `ref` into `obs` by windowed NCC.

    For each keypoint p (pixel coords in ref), scores the normalized cross
    correlation between ref's patch at p and obs's patch at p + d for every
    integer offset d in [-radius, radius]^2, returning the best offset's
    target pixel and its NCC score in [-1, 1].

    Returns ((S, 2) matched [x, y] in obs, (S,) best NCC).
    """
    span = 2 * radius + 1

    def one(pt):
        x, y = pt[0], pt[1]
        rp = _extract_patch(ref, x, y, patch)
        rp = rp - rp.mean()
        rn = jnp.sqrt((rp * rp).sum() + 1e-8)
        # one (patch + 2r)^2 window read, then all offsets are slices of it
        win = _extract_patch(obs, x, y, patch + 2 * radius)

        def score(d):
            dy, dx = d // span, d % span
            op = lax.dynamic_slice(win, (dy, dx), (patch, patch))
            op = op - op.mean()
            on = jnp.sqrt((op * op).sum() + 1e-8)
            return (rp * op).sum() / (rn * on)

        sc = jax.vmap(score)(jnp.arange(span * span))
        b = jnp.argmax(sc)
        off = jnp.stack([b % span - radius, b // span - radius]
                        ).astype(jnp.float32)
        return pt + off, sc[b]

    return jax.vmap(one)(pts)


# ---------------------------------------------------------------------------
# Gauss-Newton PnP on SE(3)
# ---------------------------------------------------------------------------


class PnPResult(NamedTuple):
    T_camera_world: jax.Array   # (4, 4) refined pose
    rms_px: jax.Array           # robust RMS reprojection error, pixels
    inlier_frac: jax.Array      # fraction of points inside the Huber band


def _exp_se3(nu: jax.Array, omega: jax.Array) -> jax.Array:
    """SE(3) retraction [R(omega) | nu] (Rodrigues rotation, plain
    translation — a valid GN retraction; the V-matrix correction is
    unnecessary when iterating)."""
    th = jnp.linalg.norm(omega) + 1e-12
    k = omega / th
    K = jnp.array([[0.0, -k[2], k[1]],
                   [k[2], 0.0, -k[0]],
                   [-k[1], k[0], 0.0]])
    R = (jnp.eye(3) + jnp.sin(th) * K + (1.0 - jnp.cos(th)) * (K @ K))
    return transforms.join_rt(R, nu)


def solve_pnp_gn(X: jax.Array, q: jax.Array, intrinsics: jax.Array,
                 T_init: jax.Array, weights: jax.Array | None = None,
                 iters: int = 10, huber_px: float = 2.0,
                 damping: float = 1e-4) -> PnPResult:
    """Gauss-Newton PnP: refine T_camera_world so that projecting world
    points X lands on observed pixels q.

    X: (S, 3) world points; q: (S, 2) observed pixels;
    intrinsics: (4,) [fx, fy, cx, cy]; weights: optional (S,) confidence
    multipliers (e.g. NCC scores); huber_px: robust-loss transition.

    Left-multiplicative updates T <- exp([nu, omega]) @ T with the standard
    point Jacobian d(x_cam)/d(nu, omega) = [I | -[x_cam]_x].
    """
    fx, fy = intrinsics[0], intrinsics[1]
    w_conf = jnp.ones(X.shape[0]) if weights is None else weights

    def step(T, _):
        R, t = transforms.split_rt(T)
        xc = X @ R.T + t                                    # (S, 3)
        z = jnp.maximum(xc[:, 2], 1e-6)
        u = fx * xc[:, 0] / z + intrinsics[2]
        v = fy * xc[:, 1] / z + intrinsics[3]
        r = jnp.stack([u, v], axis=-1) - q                  # (S, 2)

        rn = jnp.linalg.norm(r, axis=-1)
        huber = jnp.where(rn <= huber_px, 1.0, huber_px / jnp.maximum(
            rn, 1e-9))
        # points at/behind the camera plane have no valid projection —
        # zero them out instead of letting the clamped-z residual steer GN
        wgt = w_conf * huber * (xc[:, 2] > 1e-3)            # (S,)

        # J_pix (S, 2, 3) then chain with [I | -[xc]_x] -> (S, 2, 6)
        zinv = 1.0 / z
        zer = jnp.zeros_like(z)
        Jp = jnp.stack([
            jnp.stack([fx * zinv, zer, -fx * xc[:, 0] * zinv * zinv], -1),
            jnp.stack([zer, fy * zinv, -fy * xc[:, 1] * zinv * zinv], -1),
        ], axis=1)
        hat = jnp.stack([
            jnp.stack([zer, xc[:, 2], -xc[:, 1]], -1),
            jnp.stack([-xc[:, 2], zer, xc[:, 0]], -1),
            jnp.stack([xc[:, 1], -xc[:, 0], zer], -1),
        ], axis=1)                                          # (S,3,3) -[x]_x
        Jx = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3), hat.shape), hat], axis=-1)
        J = jnp.einsum("sij,sjk->sik", Jp, Jx)              # (S, 2, 6)

        H = jnp.einsum("sik,s,sil->kl", J, wgt, J)
        g = jnp.einsum("sik,s,si->k", J, wgt, r)
        xi = jnp.linalg.solve(H + damping * jnp.eye(6), -g)
        T_new = _exp_se3(xi[:3], xi[3:]) @ T
        return T_new, None

    T, _ = lax.scan(step, T_init, None, length=iters)

    # diagnostics at the solution
    R, t = transforms.split_rt(T)
    xc = X @ R.T + t
    z = jnp.maximum(xc[:, 2], 1e-6)
    u = fx * xc[:, 0] / z + intrinsics[2]
    v = fy * xc[:, 1] / z + intrinsics[3]
    rn = jnp.linalg.norm(jnp.stack([u, v], -1) - q, axis=-1)
    wsum = jnp.maximum(w_conf.sum(), 1e-9)
    rms = jnp.sqrt((w_conf * jnp.minimum(rn, huber_px) ** 2).sum() / wsum)
    inlier = (w_conf * (rn <= huber_px)).sum() / wsum
    return PnPResult(T, rms, inlier)


# ---------------------------------------------------------------------------
# high-level: one camera alignment from render + depth
# ---------------------------------------------------------------------------


def backproject(pts: jax.Array, depth: jax.Array, intrinsics: jax.Array,
                T_camera_world: jax.Array) -> jax.Array:
    """Pixels (S, 2) + per-pixel depth (S,) -> world points (S, 3) through
    the pose used to render the depth."""
    fx, fy, cx, cy = (intrinsics[i] for i in range(4))
    x = (pts[:, 0] - cx) / fx * depth
    y = (pts[:, 1] - cy) / fy * depth
    xc = jnp.stack([x, y, depth], axis=-1)
    T_wc = transforms.invert_rt(T_camera_world)
    return xc @ T_wc[:3, :3].T + T_wc[:3, 3]


def align_camera(render_gray: jax.Array, render_depth: jax.Array,
                 observed_gray: jax.Array, intrinsics: jax.Array,
                 T_camera_world: jax.Array,
                 cells: tuple[int, int] = (12, 16), patch: int = 9,
                 radius: int = 10, min_grad: float = 1e-4,
                 min_ncc: float = 0.5, iters: int = 10,
                 huber_px: float = 2.0,
                 max_depth: float | None = None) -> PnPResult:
    """One correspondence-based alignment round for one camera.

    render_gray/render_depth: consensus render + median depth from the
    CURRENT pose; observed_gray: the captured image; both (H, W) float.
    Weak keypoints (flat gradient), weak matches (NCC below min_ncc), and
    sky pixels (median depth saturated at the far plane — their true
    geometry is unknown, and a far-plane 3D point with a matched 2D offset
    injects a large spurious translation constraint) are soft-rejected
    through the PnP confidence weights; pass `max_depth` (e.g. 0.9 * far)
    to enable the sky rejection.
    """
    border = patch // 2 + radius + 1
    pts, grad = select_keypoints(render_gray, cells, border)
    matched, ncc = ncc_match(render_gray, observed_gray, pts,
                             patch=patch, radius=radius)
    d = jax.vmap(lambda p: render_depth[p[1].astype(jnp.int32),
                                        p[0].astype(jnp.int32)])(pts)
    X = backproject(pts, d, intrinsics, T_camera_world)
    keep = (grad > min_grad) & (ncc > min_ncc)
    if max_depth is not None:
        keep = keep & (d < max_depth)
    w = keep.astype(jnp.float32) * jnp.maximum(ncc, 0.0)
    return solve_pnp_gn(X, matched, intrinsics, T_camera_world,
                        weights=w, iters=iters, huber_px=huber_px)
