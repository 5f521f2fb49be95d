"""Gaussian ply IO in the standard 3DGS attribute layout.

Capability equivalent of /root/reference/splat_trainer/scene/io.py:13-171:
x/y/z, nx/ny/nz, f_dc_*/f_rest_* (SH) or raw feature columns, opacity,
scale_0-2, rot_0-3 (wxyz in the file; xyzw internally — rolled on IO).
"""

import numpy as np

from splat_trainer_tpu.core.types import Gaussians3D
from splat_trainer_tpu.utils.pointcloud import read_ply_elements, write_ply_elements


def write_gaussians(path, gaussians: Gaussians3D, with_sh: bool = True):
    g = gaussians
    n = g.num_points
    pos = np.asarray(g.position, np.float32)
    logs = np.asarray(g.log_scaling, np.float32)
    alpha = np.asarray(g.alpha_logit, np.float32)
    # xyzw -> wxyz for the file (reference io.py:104-117)
    rot = np.roll(np.asarray(g.rotation, np.float32), 1, axis=-1)
    feat = np.asarray(g.feature, np.float32)

    fields = [("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
              ("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4")]
    if with_sh:
        assert feat.ndim == 3, "with_sh expects (N, 3, K) SH features"
        k = feat.shape[2]
        fields += [(f"f_dc_{i}", "<f4") for i in range(3)]
        fields += [(f"f_rest_{i}", "<f4") for i in range(3 * (k - 1))]
    else:
        feat2 = feat.reshape(n, -1)
        fields += [(f"feature_{i}", "<f4") for i in range(feat2.shape[1])]
    fields += [("opacity", "<f4")]
    fields += [(f"scale_{i}", "<f4") for i in range(3)]
    fields += [(f"rot_{i}", "<f4") for i in range(4)]

    data = np.zeros(n, dtype=fields)
    data["x"], data["y"], data["z"] = pos.T
    if with_sh:
        for i in range(3):
            data[f"f_dc_{i}"] = feat[:, i, 0]
        # channel-major f_rest: index = c * (k-1) + j (standard 3DGS layout)
        k = feat.shape[2]
        for c in range(3):
            for j in range(k - 1):
                data[f"f_rest_{c * (k - 1) + j}"] = feat[:, c, j + 1]
    else:
        feat2 = feat.reshape(n, -1)
        for i in range(feat2.shape[1]):
            data[f"feature_{i}"] = feat2[:, i]
    data["opacity"] = alpha[:, 0]
    for i in range(3):
        data[f"scale_{i}"] = logs[:, i]
    for i in range(4):
        data[f"rot_{i}"] = rot[:, i]

    write_ply_elements(path, "vertex", data)


def read_gaussians(path, with_sh: bool = True) -> Gaussians3D:
    import jax.numpy as jnp

    _, data = read_ply_elements(path)
    names = data.dtype.names
    n = data.shape[0]

    pos = np.stack([data["x"], data["y"], data["z"]], -1)
    logs = np.stack([data[f"scale_{i}"] for i in range(3)], -1)
    alpha = data["opacity"][:, None]
    rot = np.stack([data[f"rot_{i}"] for i in range(4)], -1)
    rot = np.roll(rot, -1, axis=-1)  # wxyz -> xyzw

    if with_sh and "f_dc_0" in names:
        n_rest = len([x for x in names if x.startswith("f_rest_")])
        k = n_rest // 3 + 1
        feat = np.zeros((n, 3, k), np.float32)
        for i in range(3):
            feat[:, i, 0] = data[f"f_dc_{i}"]
        for c in range(3):
            for j in range(k - 1):
                feat[:, c, j + 1] = data[f"f_rest_{c * (k - 1) + j}"]
    else:
        cols = sorted([x for x in names if x.startswith("feature_")],
                      key=lambda s: int(s.split("_")[-1]))
        feat = np.stack([data[c] for c in cols], -1)

    return Gaussians3D(
        position=jnp.asarray(pos), rotation=jnp.asarray(rot),
        log_scaling=jnp.asarray(logs), alpha_logit=jnp.asarray(alpha),
        feature=jnp.asarray(feat))


def random_gaussians_np(n: int, sh_degree: int = 2, seed: int = 0) -> Gaussians3D:
    """Fixture generator (reference io.py:136-147)."""
    import jax
    import jax.numpy as jnp
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 5)
    k = (sh_degree + 1) ** 2
    q = jax.random.normal(ks[1], (n, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return Gaussians3D(
        position=jax.random.normal(ks[0], (n, 3)),
        rotation=q,
        log_scaling=jax.random.normal(ks[2], (n, 3)) * 0.3 - 3,
        alpha_logit=jax.random.normal(ks[3], (n, 1)),
        feature=jax.random.normal(ks[4], (n, 3, k)) * 0.3)
