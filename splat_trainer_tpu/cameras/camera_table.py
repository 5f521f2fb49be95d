"""Camera tables: batched camera storage, pose algebra, rig composition.

Capability equivalent of /root/reference/splat_trainer/camera_table/
camera_table.py:22-571 (Label flags, Cameras tensorclass, MultiCameraTable,
CameraRigTable, camera_scene_extents, camera_similarity, camera_json),
restructured as a device pytree (`Cameras`) + a host wrapper
(`CameraTable`) that the trainer uses for batch gathers.
"""

from dataclasses import dataclass
from enum import Flag
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from splat_trainer_tpu.core.types import CameraParams
from splat_trainer_tpu.cameras.pose_table import PoseTable, RigPoseTable
from splat_trainer_tpu.utils import transforms


class Label(Flag):
    """Bitmask camera labels (reference camera_table.py:22-26)."""
    Validation = 1 << 0
    Training = 1 << 1


@struct.dataclass
class Cameras:
    """Batched cameras (device pytree).

    camera_t_world: (N, 4, 4) world->camera
    intrinsics:     (N, 4) [fx, fy, cx, cy]
    depth_range:    (N, 2) [near, far]
    labels:         (N,) int32 bitmask
    camera_idx:     (N,) int32 — projection/rig-camera index per image
    """
    camera_t_world: jax.Array
    intrinsics: jax.Array
    depth_range: jax.Array
    labels: jax.Array
    camera_idx: jax.Array

    @property
    def num_images(self) -> int:
        return self.camera_t_world.shape[0]

    @property
    def positions(self) -> jax.Array:
        r = self.camera_t_world[:, :3, :3]
        t = self.camera_t_world[:, :3, 3]
        return -jnp.einsum("nij,ni->nj", r, t)

    @property
    def forwards(self) -> jax.Array:
        """Camera forward (+z) axes in world space."""
        return self.camera_t_world[:, 2, :3]

    def has_label(self, label: Label) -> jax.Array:
        return (self.labels & label.value) != 0

    def count_label(self, label: Label) -> jax.Array:
        return self.has_label(label).sum()


def camera_scene_extents(cameras: Cameras) -> Tuple[jax.Array, jax.Array]:
    """Centroid and max camera distance from it (reference :340-352)."""
    pos = cameras.positions
    centroid = pos.mean(axis=0)
    extent = jnp.linalg.norm(pos - centroid, axis=-1).max()
    return centroid, extent


def camera_similarity(cameras: Cameras, camera_t_world: jax.Array) -> jax.Array:
    """Similarity of each table camera to a query pose: forward-vector
    alignment x distance kernel (reference :355-393). Used for GLO feature
    interpolation at novel views."""
    q_fwd = camera_t_world[2, :3]
    r, t = transforms.split_rt(camera_t_world)
    q_pos = -r.T @ t

    fwd_sim = jnp.clip(cameras.forwards @ q_fwd, 0.0, 1.0)
    d = jnp.linalg.norm(cameras.positions - q_pos[None], axis=-1)
    scale = jnp.maximum(jnp.median(d), 1e-6)
    return fwd_sim * jnp.exp(-d / scale)


@dataclass
class CameraTable:
    """Host wrapper: image sizes + names live on host; poses on device.

    One image size per table (datasets resize to a common size) keeps the
    rendered shapes static for XLA.
    """
    cameras: Cameras
    image_size: Tuple[int, int]
    image_names: Optional[list] = None
    rig: Optional[RigPoseTable] = None        # pose-refinement parameterization
    pose_table: Optional[PoseTable] = None

    @property
    def num_images(self) -> int:
        return self.cameras.num_images

    @property
    def num_projections(self) -> int:
        return int(np.asarray(self.cameras.camera_idx).max()) + 1

    def camera_params(self, idx: int) -> CameraParams:
        c = self.cameras
        return CameraParams(
            T_camera_world=c.camera_t_world[idx],
            projection=c.intrinsics[idx],
            near_plane=c.depth_range[idx, 0],
            far_plane=c.depth_range[idx, 1],
            image_size=self.image_size,
        )

    def gather_batch(self, idx: jax.Array):
        """(T_camera_world, projection, near, far) arrays for TrainBatch."""
        c = self.cameras
        return (c.camera_t_world[idx], c.intrinsics[idx],
                c.depth_range[idx, 0], c.depth_range[idx, 1])

    def train_indices(self) -> np.ndarray:
        mask = np.asarray(self.cameras.has_label(Label.Training))
        return np.nonzero(mask)[0]

    def val_indices(self) -> np.ndarray:
        mask = np.asarray(self.cameras.has_label(Label.Validation))
        return np.nonzero(mask)[0]


def MultiCameraTable(camera_t_world, intrinsics, camera_idx, labels,
                     image_size, depth_range=(0.1, 100.0),
                     image_names=None) -> CameraTable:
    """Per-image pose + shared projections (reference :471-543)."""
    n = camera_t_world.shape[0]
    dr = jnp.tile(jnp.asarray(depth_range, jnp.float32)[None], (n, 1))
    cams = Cameras(
        camera_t_world=jnp.asarray(camera_t_world, jnp.float32),
        intrinsics=jnp.asarray(intrinsics, jnp.float32),
        depth_range=dr,
        labels=jnp.asarray(labels, jnp.int32),
        camera_idx=jnp.asarray(camera_idx, jnp.int32),
    )
    pose = PoseTable.from_matrices(cams.camera_t_world)
    return CameraTable(cameras=cams, image_size=image_size,
                       image_names=image_names, pose_table=pose)


def CameraRigTable(rig_t_world, camera_t_rig, intrinsics, labels,
                   image_size, depth_range=(0.1, 100.0),
                   image_names=None) -> CameraTable:
    """Frame-level rig pose x per-camera offsets (reference :395-468).

    rig_t_world: (F, 4, 4); camera_t_rig: (C, 4, 4); intrinsics: (C, 4).
    Images are frame-major: image (f, c) -> index f * C + c.
    """
    rig = RigPoseTable(
        rig_t_world=PoseTable.from_matrices(jnp.asarray(rig_t_world, jnp.float32)),
        camera_t_rig=PoseTable.from_matrices(jnp.asarray(camera_t_rig, jnp.float32)),
    )
    f = rig_t_world.shape[0]
    c = camera_t_rig.shape[0]
    cam_idx = jnp.tile(jnp.arange(c, dtype=jnp.int32), f)
    n = f * c
    dr = jnp.tile(jnp.asarray(depth_range, jnp.float32)[None], (n, 1))
    cams = Cameras(
        camera_t_world=rig.matrices(),
        intrinsics=jnp.asarray(intrinsics, jnp.float32)[cam_idx],
        depth_range=dr,
        labels=jnp.asarray(labels, jnp.int32),
        camera_idx=cam_idx,
    )
    return CameraTable(cameras=cams, image_size=image_size,
                       image_names=image_names, rig=rig)


def camera_json(table: CameraTable) -> list:
    """3DGS-compatible cameras.json rows (reference :546-571)."""
    cams = table.cameras
    w, h = table.image_size
    pos = np.asarray(cams.positions)
    rot = np.asarray(
        jnp.swapaxes(cams.camera_t_world[:, :3, :3], -1, -2))  # camera->world
    intr = np.asarray(cams.intrinsics)
    names = table.image_names or [f"{i:05d}" for i in range(cams.num_images)]
    return [
        {
            "id": i,
            "img_name": str(names[i]),
            "width": int(w),
            "height": int(h),
            "position": pos[i].tolist(),
            "rotation": rot[i].tolist(),
            "fx": float(intr[i, 0]),
            "fy": float(intr[i, 1]),
        }
        for i in range(cams.num_images)
    ]
