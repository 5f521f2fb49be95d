"""Diagnostic: align_camera against GROUND-TRUTH renders of the procedural
scene — isolates the correspondence/PnP machinery from splat-consensus
quality.

For each test camera: ray-trace the procedural scene (numpy tracer from
data/procedural.py) at the camera's WRONG pose (true pose + injected
noise) to get `render_gray` + exact `render_depth`; ray-trace at the TRUE
pose for `observed_gray`; run align_camera from the wrong pose. If the
machinery is sound the solved pose lands near truth (rot error shrinks
>5x); if it fails here the bug is in align/backproject/PnP conventions,
not in consensus quality.

Usage: python -m scripts_dev.align_gt_diag [n_cams]
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp

from splat_trainer_tpu.cameras import align as A
from splat_trainer_tpu.data import procedural as P

jax.config.update("jax_platforms", "cpu")

LUM = np.array([0.299, 0.587, 0.114], np.float32)


def trace_gray_depth(ds, T_cw, intr, size):
    """Ray-trace gray image + depth map at pose T_cw (camera_t_world)."""
    w, h = size
    fx, fy, cx, cy = intr
    R_wc = T_cw[:3, :3].T
    eye = -R_wc @ T_cw[:3, 3]
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    dirs_cam = np.stack([(xs + 0.5 - cx) / fx, (ys + 0.5 - cy) / fy,
                         np.ones_like(xs)], axis=-1).reshape(-1, 3)
    d = dirs_cam @ R_wc.T
    norm = np.linalg.norm(d, axis=-1, keepdims=True)
    d = d / norm
    o = np.broadcast_to(eye.astype(np.float32), d.shape)

    rgb = P._trace(o, d, ds.spheres, ds.seed).reshape(h, w, 3)
    gray = (np.clip(rgb, 0, 1) ** (1 / 2.2) @ LUM).astype(np.float32)

    ts, _hit = P._intersect_spheres(o, d, ds.spheres)
    tg = np.where(d[:, 1] > 1e-6, -o[:, 1] / np.maximum(d[:, 1], 1e-9),
                  np.inf)
    pg = o + tg[:, None] * d
    on_disc = (pg[:, 0] ** 2 + pg[:, 2] ** 2) < P._GROUND_R ** 2
    tg = np.where(on_disc, tg, np.inf)
    t = np.minimum(ts, tg)
    # align_camera expects CAMERA-Z depth (backproject multiplies the
    # normalized pinhole ray by it); ray param t is along the unit ray, so
    # z = t * d_cam_z / |d_cam| -> t / norm_factor of the pinhole ray
    z = t / norm[:, 0] * 1.0  # t is along unit dir; z = t * (unit dir).z_cam
    # recompute properly: camera-space z of the hit point
    hit_w = o + t[:, None] * d
    hit_c = (hit_w - eye) @ R_wc  # world -> camera rotation
    z = hit_c[:, 2]
    z = np.where(np.isfinite(t), z, 100.0).astype(np.float32)
    return gray, z.reshape(h, w)


def main():
    n_cams = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    size = (384, 256)
    ds = P.ProceduralDataset(num_images=16, image_size=size, split_every=8,
                             pose_noise=0.016, verbose=False)
    true_poses = ds.true_poses
    table = np.asarray(ds.camera_table.cameras.camera_t_world, np.float64)
    intr = np.asarray(ds.camera_table.cameras.intrinsics, np.float64)

    def rot_err(Ta, Tb):
        E = Ta[:3, :3] @ Tb[:3, :3].T
        return np.degrees(np.arccos(np.clip((np.trace(E) - 1) / 2, -1, 1)))

    for i in range(n_cams):
        T_wrong = table[i]
        T_true = true_poses[i].astype(np.float64)
        e0 = rot_err(T_wrong, T_true)
        gray_r, depth = trace_gray_depth(ds, T_wrong, intr[i], size)
        gray_o, _ = trace_gray_depth(ds, T_true, intr[i], size)
        res = A.align_camera(
            jnp.asarray(gray_r), jnp.asarray(depth), jnp.asarray(gray_o),
            jnp.asarray(intr[i], jnp.float32),
            jnp.asarray(T_wrong, jnp.float32),
            cells=(12, 16), radius=10, min_ncc=0.45, huber_px=3.0,
            max_depth=90.0)
        T_new = np.asarray(res.T_camera_world, np.float64)
        e1 = rot_err(T_new, T_true)
        c_new = -T_new[:3, :3].T @ T_new[:3, 3]
        c_true = -T_true[:3, :3].T @ T_true[:3, 3]
        c_wrong = -T_wrong[:3, :3].T @ T_wrong[:3, 3]
        print(f"cam {i}: rot {e0:.3f} -> {e1:.3f} deg   "
              f"center {np.linalg.norm(c_wrong - c_true):.4f} -> "
              f"{np.linalg.norm(c_new - c_true):.4f}   "
              f"rms {float(res.rms_px):.2f}px inl {float(res.inlier_frac):.2f}",
              flush=True)


if __name__ == "__main__":
    main()
