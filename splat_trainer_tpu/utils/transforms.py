"""Rigid-transform and quaternion math in pure jnp.

Replaces the reference's use of `roma` (quat<->rotmat) and
util/transforms.py (join_rt/split_rt/expand_proj) — see
/root/reference/splat_trainer/util/transforms.py:9-79 and
camera_table/pose_table.py:62-79.

Convention: quaternions are stored **xyzw** (matching taichi-splatting's
internal convention; ply files use wxyz and are rolled on IO).
"""

import jax.numpy as jnp


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) xyzw -> rotation matrix (..., 3, 3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z

    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) xyzw.

    Branch-free Shepperd-style construction (safe under jit): computes all
    four candidate quaternions and selects the one with the largest pivot.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22

    # candidate 0: pivot w
    q0 = jnp.stack([m21 - m12, m02 - m20, m10 - m01, 1 + tr], axis=-1)
    # candidate 1: pivot x
    q1 = jnp.stack([1 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12], axis=-1)
    # candidate 2: pivot y
    q2 = jnp.stack([m01 + m10, 1 - m00 + m11 - m22, m12 + m21, m02 - m20], axis=-1)
    # candidate 3: pivot z
    q3 = jnp.stack([m02 + m20, m12 + m21, 1 - m00 - m11 + m22, m10 - m01], axis=-1)

    pivots = jnp.stack([1 + tr, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22,
                        1 - m00 - m11 + m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)

    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4 cands, 4)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2).squeeze(-2)
    return normalize(q)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of xyzw quaternions."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], axis=-1)


def join_rt(r: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Rotation (...,3,3) + translation (...,3) -> homogeneous (...,4,4)."""
    batch = r.shape[:-2]
    m = jnp.zeros(batch + (4, 4), dtype=r.dtype)
    m = m.at[..., :3, :3].set(r)
    m = m.at[..., :3, 3].set(t)
    m = m.at[..., 3, 3].set(1.0)
    return m


def split_rt(m: jnp.ndarray):
    """Homogeneous (...,4,4) -> rotation (...,3,3), translation (...,3)."""
    return m[..., :3, :3], m[..., :3, 3]


def invert_rt(m: jnp.ndarray) -> jnp.ndarray:
    """Invert a rigid 4x4 transform."""
    r, t = split_rt(m)
    rt = jnp.swapaxes(r, -1, -2)
    return join_rt(rt, -jnp.einsum("...ij,...j->...i", rt, t))


def transform_points(m: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply rigid 4x4 (...,4,4) to points (...,N,3)."""
    r, t = split_rt(m)
    return jnp.einsum("...ij,...nj->...ni", r, p) + t[..., None, :]


def expand_proj(intrinsics: jnp.ndarray) -> jnp.ndarray:
    """[fx, fy, cx, cy] -> 3x3 K matrix."""
    fx, fy, cx, cy = intrinsics
    return jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype=intrinsics.dtype)
