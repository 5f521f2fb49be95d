"""Mesh-sharded rendering of one giant image (pixel/tile parallelism).

The third scaling axis from SURVEY.md §5.7 (after cameras — data_parallel,
and points — points_parallel): compositing decomposes exactly over pixel
crops (utils/render_image.py proves it host-side with principal-point
shifting), so one huge frame can be rendered across the mesh — each chip
renders a horizontal slab of rows against the replicated scene and the
slabs concatenate into the full image. Used for interactive/offline
rendering of wall-sized outputs (the reference renders 2048^2 crops
sequentially on one GPU, scripts/render_image.py:44-62); gradients are not
needed on this path.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from splat_trainer_tpu.core.types import CameraParams, RasterConfig
from splat_trainer_tpu.models import mlp_scene as ms

SLAB_AXIS = "slabs"


def make_slab_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (SLAB_AXIS,))


def make_sharded_render(
    mesh: Mesh,
    *,
    scene_config,
    raster_config: RasterConfig,
    image_size: Tuple[int, int],
):
    """Build a jitted function (scene, camera) -> (H, W, 3) image rendered
    as `mesh.size` horizontal slabs, one per chip."""
    D = mesh.size
    w, h = image_size
    slab_h = -(-h // D)

    def local_render(scene: ms.SceneState, camera: CameraParams):
        my = jax.lax.axis_index(SLAB_AXIS)
        fx = camera.projection[0]
        fy = camera.projection[1]
        cx = camera.projection[2]
        cy = camera.projection[3] - (my * slab_h).astype(jnp.float32)
        slab_cam = CameraParams(
            T_camera_world=camera.T_camera_world,
            projection=jnp.stack([fx, fy, cx, cy]),
            near_plane=camera.near_plane,
            far_plane=camera.far_plane,
            image_size=(w, slab_h),
            clip_size=(w, h))
        rendering = ms.render(scene, scene_config, slab_cam,
                              image_idx=None, raster_config=raster_config)
        return rendering.image

    # scene + camera fully replicated (prefix specs); output rows sharded
    fn = shard_map(
        local_render, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(SLAB_AXIS),
        check_rep=False)

    def render(scene: ms.SceneState, camera: CameraParams) -> jax.Array:
        img = fn(scene, camera)          # (slab_h * D, w, 3)
        return img[:h]

    return jax.jit(render)
