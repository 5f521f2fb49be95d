"""Pose refinement: a perturbed camera pose should be recovered through
the photometric loss (the delta converges toward the inverse perturbation)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from splat_trainer_tpu.controller.point_state import PointState
from splat_trainer_tpu.core.types import RasterConfig
from splat_trainer_tpu.models import mlp_scene as ms
from splat_trainer_tpu.trainer import train_step as ts
from tests.fixtures import look_at_camera, random_gaussians

IMAGE_SIZE = (48, 48)


class Cfg:
    l1_weight, mse_weight, ssim_weight = 1.0, 10.0, 0.0


def test_pose_delta_reduces_loss():
    key = jax.random.PRNGKey(0)
    g = random_gaussians(key, 200)
    config = ms.MLPSceneConfig(point_features=8, image_features=8, lr_pose=3e-3)
    scene = ms.init_scene(jax.random.PRNGKey(1), config, g, 2, capacity=256)
    rcfg = RasterConfig(backend="dense", max_instances=1 << 13, chunk_size=16)

    cam = look_at_camera(IMAGE_SIZE)
    # ground truth from the TRUE pose
    target = jnp.clip(ms.render(scene, config, cam, None, rcfg).image, 0, 1)

    # training pose: slightly rotated/translated
    jitter = np.eye(4, dtype=np.float32)
    th = 0.02
    jitter[:3, :3] = np.array([[np.cos(th), -np.sin(th), 0],
                               [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    jitter[:3, 3] = [0.03, -0.02, 0.0]
    bad_cam = cam.replace(T_camera_world=jnp.asarray(jitter) @ cam.T_camera_world)

    batch = ts.TrainBatch(
        images=target[None],
        image_idx=jnp.array([0]),
        T_camera_world=bad_cam.T_camera_world[None],
        projection=bad_cam.projection[None],
        near=bad_cam.near_plane[None], far=bad_cam.far_plane[None])

    hyper = ts.make_hyper(config, Cfg, 0.0)
    hyper["reg"] = {k: 0.0 for k in hyper["reg"]}
    # freeze everything except the pose
    for k in hyper["lrs"]:
        if k != "pose":
            hyper["lrs"][k] = 0.0

    step = jax.jit(functools.partial(
        ts.train_step, scene_config=config, raster_config=rcfg,
        image_size=IMAGE_SIZE, ssim_levels=2), donate_argnums=(0, 1))

    pstate = PointState.new_zeros(scene.capacity)
    losses = []
    for i in range(150):
        scene, pstate, metrics = step(scene, pstate, batch, hyper,
                                      jax.random.PRNGKey(i))
        losses.append(float(metrics.mse))

    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    # pose delta moved away from identity
    dq = np.asarray(scene.pose_dq[0])
    dt = np.asarray(scene.pose_dt[0])
    assert np.abs(dt).max() > 1e-4 or abs(dq[3] - 1) > 1e-6

    # untouched image's pose unchanged
    np.testing.assert_allclose(np.asarray(scene.pose_dt[1]), 0.0)


def test_pose_frozen_by_default():
    key = jax.random.PRNGKey(0)
    g = random_gaussians(key, 100)
    config = ms.MLPSceneConfig(point_features=8, image_features=8)  # lr_pose=0
    scene = ms.init_scene(jax.random.PRNGKey(1), config, g, 1, capacity=128)
    rcfg = RasterConfig(backend="dense", max_instances=1 << 12, chunk_size=16)

    cam = look_at_camera(IMAGE_SIZE)
    target = jnp.clip(ms.render(scene, config, cam, None, rcfg).image, 0, 1)
    batch = ts.TrainBatch(
        images=target[None], image_idx=jnp.array([0]),
        T_camera_world=cam.T_camera_world[None],
        projection=cam.projection[None],
        near=cam.near_plane[None], far=cam.far_plane[None])
    hyper = ts.make_hyper(config, Cfg, 0.0)

    scene2, _, _ = ts.train_step(
        scene, PointState.new_zeros(scene.capacity), batch, hyper,
        jax.random.PRNGKey(0), scene_config=config, raster_config=rcfg,
        image_size=IMAGE_SIZE, ssim_levels=2)
    np.testing.assert_allclose(np.asarray(scene2.pose_dt), 0.0)
    np.testing.assert_allclose(np.asarray(scene2.pose_dq),
                               np.asarray(scene.pose_dq))
