"""Multi-chip data parallelism over cameras (GSPMD / shard_map).

The reference is strictly single-GPU (SURVEY.md §2.4); scaling here is
designed TPU-native per §2.4's consequence list: a device mesh with a
`cameras` axis, each chip rendering different views of the *replicated*
point cloud, gradients and per-point statistics combined over ICI with one
`psum`/`pmax` per step, followed by a replicated optimizer update.

The per-image render/backward runs unchanged inside `shard_map` — every
kernel in ops/ is written per-shard (SURVEY.md §7.1 decision 7).

Scaling axes beyond DP (sharded points for city-scale, sharded tiles for
giant images) plug into the same mesh later; see SURVEY.md §5.7.
"""

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from splat_trainer_tpu.controller.point_state import PointState
from splat_trainer_tpu.core.types import RasterConfig
from splat_trainer_tpu.models import mlp_scene as ms
from splat_trainer_tpu.trainer.train_step import (
    GradBundle, TrainBatch, apply_updates, batch_gradients,
)

CAMERA_AXIS = "cameras"


def make_camera_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (CAMERA_AXIS,))


def make_dp_train_step(
    mesh: Mesh,
    *,
    scene_config: ms.MLPSceneConfig,
    raster_config: RasterConfig,
    image_size: Tuple[int, int],
    ssim_levels: int = 3,
):
    """Build a jitted data-parallel train step.

    The global batch size must be a multiple of the mesh size; each device
    computes gradients for its camera shard, then grads/statistics are
    combined over ICI (psum for additive terms, max for running maxima) and
    a replicated optimizer update is applied.
    """
    grad_fn = functools.partial(
        batch_gradients, scene_config=scene_config,
        raster_config=raster_config, image_size=image_size,
        ssim_levels=ssim_levels)

    def shard_grads(scene: ms.SceneState, batch: TrainBatch, hyper: Dict):
        bundle = grad_fn(scene, batch, hyper)
        n = jax.lax.psum(1, CAMERA_AXIS)

        summed = jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, CAMERA_AXIS),
            GradBundle(grads=bundle.grads, heur=bundle.heur,
                       vis_acc=bundle.vis_acc,
                       in_view_any=bundle.in_view_any.astype(jnp.int32),
                       scale_max=bundle.scale_max * 0,  # replaced below
                       glo_rows=bundle.glo_rows.astype(jnp.int32),
                       metrics=jax.tree_util.tree_map(
                           lambda m: m / n, bundle.metrics)))
        scale_max = jax.lax.pmax(bundle.scale_max, CAMERA_AXIS)
        # occupancy metrics are worst-view maxima (they size the instance
        # bucketing): pmax across camera shards, not a mean of maxima
        metrics = dict(summed.metrics)
        for k in ("num_instances", "instance_demand", "sat_demand"):
            if k in metrics:
                metrics[k] = jax.lax.pmax(bundle.metrics[k], CAMERA_AXIS)
        return summed.replace(
            in_view_any=summed.in_view_any > 0,
            scale_max=scale_max,
            glo_rows=summed.glo_rows > 0,
            metrics=metrics)

    replicated = P()
    batch_spec = TrainBatch(
        images=P(CAMERA_AXIS), image_idx=P(CAMERA_AXIS),
        T_camera_world=P(CAMERA_AXIS), projection=P(CAMERA_AXIS),
        near=P(CAMERA_AXIS), far=P(CAMERA_AXIS))

    sharded_grads = shard_map(
        shard_grads, mesh=mesh,
        in_specs=(replicated, batch_spec, replicated),
        out_specs=replicated,
        check_rep=False)

    def dp_train_step(scene: ms.SceneState, pstate: PointState,
                      batch: TrainBatch, hyper: Dict, key: jax.Array):
        del key
        bundle = sharded_grads(scene, batch, hyper)
        return apply_updates(scene, pstate, bundle, hyper, scene_config)

    rep_sharding = NamedSharding(mesh, P())
    batch_sharding = TrainBatch(
        images=NamedSharding(mesh, P(CAMERA_AXIS)),
        image_idx=NamedSharding(mesh, P(CAMERA_AXIS)),
        T_camera_world=NamedSharding(mesh, P(CAMERA_AXIS)),
        projection=NamedSharding(mesh, P(CAMERA_AXIS)),
        near=NamedSharding(mesh, P(CAMERA_AXIS)),
        far=NamedSharding(mesh, P(CAMERA_AXIS)))

    return jax.jit(dp_train_step, donate_argnums=(0, 1)), batch_sharding, rep_sharding
