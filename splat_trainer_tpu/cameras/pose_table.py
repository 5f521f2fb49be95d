"""Pose parameterization: (quaternion, translation) pairs as optimizable leaves.

Capability equivalent of the reference PoseTable/RigPoseTable
(/root/reference/splat_trainer/camera_table/pose_table.py:12-104). Poses are
stored as raw (q, t) arrays — normalized on read — so camera pose refinement
is just including these leaves in the differentiated pytree (the reference
keeps the same scaffolding with requires_grad toggled off by default).
"""

import jax
import jax.numpy as jnp
from flax import struct

from splat_trainer_tpu.utils import transforms


@struct.dataclass
class PoseTable:
    """N rigid world->camera (or camera->world) transforms as (q, t)."""
    q: jax.Array  # (N, 4) xyzw, normalized on read
    t: jax.Array  # (N, 3)

    @staticmethod
    def from_matrices(m: jax.Array) -> "PoseTable":
        r, t = transforms.split_rt(m)
        return PoseTable(q=transforms.rotmat_to_quat(r), t=t)

    def matrices(self) -> jax.Array:
        r = transforms.quat_to_rotmat(transforms.normalize(self.q))
        return transforms.join_rt(r, self.t)

    def __len__(self):
        return self.q.shape[0]


@struct.dataclass
class RigPoseTable:
    """Composed rig poses: camera_t_rig[c] @ rig_t_world[f] for every
    (frame, camera) pair (reference pose_table.py:12-51)."""
    rig_t_world: PoseTable    # (F,) frame poses
    camera_t_rig: PoseTable   # (C,) rig offsets

    def matrices(self) -> jax.Array:
        """(F*C, 4, 4), frame-major ordering."""
        rig = self.rig_t_world.matrices()       # (F, 4, 4)
        cam = self.camera_t_rig.matrices()      # (C, 4, 4)
        m = jnp.einsum("cij,fjk->fcik", cam, rig)
        return m.reshape(-1, 4, 4)

    def __len__(self):
        return len(self.rig_t_world) * len(self.camera_t_rig)
