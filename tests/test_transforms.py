import jax
import jax.numpy as jnp
import numpy as np

from splat_trainer_tpu.utils import transforms


def random_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return transforms.normalize(q)


def test_quat_rotmat_roundtrip():
    # mirrors the reference's inline self-test (pose_table.py:96-104)
    q = random_quats(jax.random.PRNGKey(0), 64)
    m = transforms.quat_to_rotmat(q)
    q2 = transforms.rotmat_to_quat(m)
    m2 = transforms.quat_to_rotmat(q2)
    np.testing.assert_allclose(m, m2, atol=1e-5)


def test_rotmat_orthonormal():
    q = random_quats(jax.random.PRNGKey(1), 16)
    m = transforms.quat_to_rotmat(q)
    eye = jnp.eye(3)[None].repeat(16, axis=0)
    np.testing.assert_allclose(m @ jnp.swapaxes(m, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(m)), 1.0, atol=1e-5)


def test_rigid_invert():
    key = jax.random.PRNGKey(2)
    q = random_quats(key, 1)[0]
    r = transforms.quat_to_rotmat(q)
    t = jnp.array([1.0, -2.0, 3.0])
    m = transforms.join_rt(r, t)
    np.testing.assert_allclose(m @ transforms.invert_rt(m), jnp.eye(4), atol=1e-5)


def test_transform_points():
    m = transforms.join_rt(jnp.eye(3), jnp.array([1.0, 0.0, 0.0]))
    p = jnp.zeros((5, 3))
    out = transforms.transform_points(m, p)
    np.testing.assert_allclose(out[:, 0], 1.0)


def test_quat_mul_identity():
    q = random_quats(jax.random.PRNGKey(3), 8)
    ident = jnp.array([0.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(transforms.quat_mul(q, ident[None]), q, atol=1e-6)
