"""Unit tests for correspondence-based camera alignment (cameras/align.py).

Covers the three stages independently (keypoints, NCC matching, PnP) and
their composition against a synthetic textured plane — the controlled
analog of the pose-recovery milestone (BASELINE config 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splat_trainer_tpu.cameras import align
from splat_trainer_tpu.utils import transforms


def _texture(h, w, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.rand(h // 8 + 2, w // 8 + 2)
    ys = np.linspace(0, base.shape[0] - 1.001, h)
    xs = np.linspace(0, base.shape[1] - 1.001, w)
    yi, xi = np.floor(ys).astype(int), np.floor(xs).astype(int)
    fy, fx = (ys - yi)[:, None], (xs - xi)[None, :]
    img = (base[yi][:, xi] * (1 - fy) * (1 - fx)
           + base[yi + 1][:, xi] * fy * (1 - fx)
           + base[yi][:, xi + 1] * (1 - fy) * fx
           + base[yi + 1][:, xi + 1] * fy * fx)
    img = img + 0.2 * rng.rand(h, w)          # fine detail for gradients
    return jnp.asarray(img, jnp.float32)


def test_select_keypoints_grid():
    img = _texture(96, 128)
    pts, grad = align.select_keypoints(img, cells=(6, 8), border=12)
    assert pts.shape == (48, 2) and grad.shape == (48,)
    # all inside the border
    assert (pts[:, 0] >= 12).all() and (pts[:, 0] < 128 - 12).all()
    assert (pts[:, 1] >= 12).all() and (pts[:, 1] < 96 - 12).all()
    # one per cell: x coords fall in distinct 16-wide columns per cell col
    assert (grad > 0).all()


def test_ncc_match_recovers_known_shift():
    img = _texture(96, 128)
    dx, dy = 5, -3
    obs = jnp.roll(img, (dy, dx), axis=(0, 1))
    pts, _ = align.select_keypoints(img, cells=(5, 6), border=16)
    matched, ncc = align.ncc_match(img, obs, pts, patch=9, radius=8)
    off = np.asarray(matched - pts)
    # every strong match recovers (dx, dy) exactly (integer shift)
    good = np.asarray(ncc) > 0.8
    assert good.mean() > 0.8
    assert np.abs(off[good] - np.array([dx, dy])).max() == 0


def _random_pose(rng):
    ax = rng.randn(3)
    ax /= np.linalg.norm(ax)
    th = 0.3 * rng.rand()
    q = np.concatenate([np.sin(th / 2) * ax, [np.cos(th / 2)]])
    t = 0.5 * rng.randn(3) + np.array([0, 0, 4.0])
    R = np.asarray(transforms.quat_to_rotmat(jnp.asarray(q, jnp.float32)))
    return np.asarray(transforms.join_rt(jnp.asarray(R, jnp.float32),
                                         jnp.asarray(t, jnp.float32)))


def _perturb(T, rot_rad, trans, rng):
    ax = rng.randn(3)
    ax /= np.linalg.norm(ax)
    dq = np.concatenate([np.sin(rot_rad / 2) * ax, [np.cos(rot_rad / 2)]])
    dR = np.asarray(transforms.quat_to_rotmat(jnp.asarray(dq, jnp.float32)))
    dT = np.asarray(transforms.join_rt(
        jnp.asarray(dR, jnp.float32),
        jnp.asarray(trans * rng.randn(3), jnp.float32)))
    return dT @ T


def _rot_err_deg(A, B):
    Rd = A[:3, :3] @ B[:3, :3].T
    c = np.clip((np.trace(Rd) - 1) / 2, -1, 1)
    return np.degrees(np.arccos(c))


def _front_points(T_cw, n, rng):
    """World points that project in front of the camera at depth 2-6."""
    z = 2.0 + 4.0 * rng.rand(n).astype(np.float32)
    x = (rng.rand(n).astype(np.float32) - 0.5) * z * 1.2
    y = (rng.rand(n).astype(np.float32) - 0.5) * z * 0.9
    xc = np.stack([x, y, z], axis=-1)
    T_wc = np.asarray(transforms.invert_rt(jnp.asarray(T_cw, jnp.float32)))
    return xc @ T_wc[:3, :3].T + T_wc[:3, 3]


def test_solve_pnp_recovers_pose():
    rng = np.random.RandomState(3)
    T_true = _random_pose(rng)
    X = _front_points(T_true, 128, rng)
    intr = jnp.asarray([400.0, 400.0, 320.0, 240.0])
    xc = X @ T_true[:3, :3].T + T_true[:3, 3]
    q = np.stack([400 * xc[:, 0] / xc[:, 2] + 320,
                  400 * xc[:, 1] / xc[:, 2] + 240], axis=-1)

    T0 = _perturb(T_true, np.radians(3.0), 0.1, rng)
    res = align.solve_pnp_gn(jnp.asarray(X), jnp.asarray(q), intr,
                             jnp.asarray(T0, jnp.float32), iters=12)
    T_sol = np.asarray(res.T_camera_world)
    assert _rot_err_deg(T_sol, T_true) < 0.01
    assert np.abs(T_sol[:3, 3] - T_true[:3, 3]).max() < 1e-3
    assert float(res.rms_px) < 0.1
    assert float(res.inlier_frac) > 0.99


def test_solve_pnp_robust_to_outliers():
    rng = np.random.RandomState(7)
    T_true = _random_pose(rng)
    X = _front_points(T_true, 128, rng)
    intr = jnp.asarray([400.0, 400.0, 320.0, 240.0])
    xc = X @ T_true[:3, :3].T + T_true[:3, 3]
    q = np.stack([400 * xc[:, 0] / xc[:, 2] + 320,
                  400 * xc[:, 1] / xc[:, 2] + 240], axis=-1)
    # corrupt 20% of matches by up to 80 px
    bad = rng.rand(128) < 0.2
    q[bad] += rng.randn(bad.sum(), 2) * 40

    T0 = _perturb(T_true, np.radians(2.0), 0.08, rng)
    res = align.solve_pnp_gn(jnp.asarray(X), jnp.asarray(q), intr,
                             jnp.asarray(T0, jnp.float32), iters=15,
                             huber_px=2.0)
    assert _rot_err_deg(np.asarray(res.T_camera_world), T_true) < 0.1


def test_align_camera_textured_plane():
    """Full pipeline on a synthetic fronto-parallel textured plane: the
    'render' is the plane seen from the wrong pose, the 'observation' from
    the true pose; alignment must recover most of a ~1.5 degree error."""
    rng = np.random.RandomState(11)
    h, w = 192, 256
    intr = jnp.asarray([200.0, 200.0, w / 2, h / 2])
    tex = _texture(512, 512, seed=4)

    # plane z=0 in world, textured by world (x, y); camera looks down +z
    def render_plane(T_cw):
        T_wc = np.asarray(transforms.invert_rt(
            jnp.asarray(T_cw, jnp.float32)))
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        dirs = np.stack([(xs - w / 2) / 200.0, (ys - h / 2) / 200.0,
                         np.ones_like(xs)], -1).reshape(-1, 3)
        o = T_wc[:3, 3]
        d = dirs @ T_wc[:3, :3].T
        tz = -o[2] / d[:, 2]
        pw = o + tz[:, None] * d
        u = np.clip((pw[:, 0] * 0.25 + 0.5) * 511, 0, 511)
        v = np.clip((pw[:, 1] * 0.25 + 0.5) * 511, 0, 511)
        img = np.asarray(tex)[v.astype(int), u.astype(int)]
        return (jnp.asarray(img.reshape(h, w), jnp.float32),
                jnp.asarray(tz.reshape(h, w), jnp.float32))

    T_true = np.asarray(transforms.join_rt(
        jnp.eye(3, dtype=jnp.float32), jnp.asarray([0.05, -0.1, 2.0],
                                                   jnp.float32)))
    T_bad = _perturb(T_true, np.radians(1.5), 0.02, rng)

    obs, _ = render_plane(T_true)
    ren, depth = render_plane(T_bad)

    res = align.align_camera(ren, depth, obs, intr,
                             jnp.asarray(T_bad, jnp.float32),
                             cells=(8, 10), patch=9, radius=12,
                             min_ncc=0.4, iters=12, huber_px=3.0)
    err0 = _rot_err_deg(T_bad, T_true)
    err1 = _rot_err_deg(np.asarray(res.T_camera_world), T_true)
    # recover at least 80% of the rotation error in ONE round
    assert err1 < 0.2 * err0, (err0, err1)
    assert float(res.inlier_frac) > 0.5
