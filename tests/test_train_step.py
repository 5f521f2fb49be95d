"""End-to-end smoke: the jitted train step optimizes a tiny scene."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from splat_trainer_tpu.controller.point_state import PointState
from splat_trainer_tpu.core.types import RasterConfig
from splat_trainer_tpu.models import mlp_scene as ms
from splat_trainer_tpu.trainer import train_step as ts
from tests.fixtures import look_at_camera, random_gaussians

IMAGE_SIZE = (32, 32)
N_IMAGES = 3


class DummyTrainCfg:
    l1_weight = 0.0
    mse_weight = 10.0
    ssim_weight = 1.0


def make_setup(n=128, capacity=256):
    key = jax.random.PRNGKey(0)
    g = random_gaussians(key, n)
    config = ms.MLPSceneConfig(point_features=8, image_features=8)
    scene = ms.init_scene(jax.random.PRNGKey(1), config, g, N_IMAGES, capacity)
    pstate = PointState.new_zeros(scene.capacity)

    cams = [look_at_camera(IMAGE_SIZE, eye=e) for e in
            [(0, 0, -4), (1.5, 0.5, -3.5), (-1.5, -0.5, -3.5)]]
    batchify = lambda i: ts.TrainBatch(
        images=None,
        image_idx=jnp.array([i]),
        T_camera_world=cams[i].T_camera_world[None],
        projection=cams[i].projection[None],
        near=cams[i].near_plane[None],
        far=cams[i].far_plane[None],
    )
    return scene, pstate, config, cams, batchify


def render_target(scene, config, cams, rcfg):
    """Ground truth: render a perturbed copy of the scene."""
    targets = []
    for i, cam in enumerate(cams):
        r = ms.render(scene, config, cam, image_idx=None, raster_config=rcfg)
        targets.append(jnp.clip(r.image, 0, 1))
    return targets


def test_train_step_improves_psnr():
    scene, pstate, config, cams, batchify = make_setup()
    rcfg = RasterConfig(backend="dense", tile_size=16)

    # targets rendered from a scrambled-color copy of the same geometry
    key = jax.random.PRNGKey(7)
    target_scene = scene.replace(points={
        **scene.points,
        "feature": scene.points["feature"]
        + jax.random.normal(key, scene.points["feature"].shape) * 2.0})
    targets = render_target(target_scene, config, cams, rcfg)

    step_fn = jax.jit(functools.partial(
        ts.train_step, scene_config=config, raster_config=rcfg,
        image_size=IMAGE_SIZE, ssim_levels=2), donate_argnums=(0, 1))

    def psnr_now(scene):
        vals = []
        for i, cam in enumerate(cams):
            img = ms.render(scene, config, cam, image_idx=None,
                            raster_config=rcfg).image
            mse = float(((img - targets[i]) ** 2).mean())
            vals.append(10 * np.log10(1 / max(mse, 1e-10)))
        return np.mean(vals)

    psnr0 = psnr_now(scene)

    hyper = ts.make_hyper(config, DummyTrainCfg, 0.0)
    # reg weights off for the overfit test
    hyper["reg"] = {k: 0.0 for k in hyper["reg"]}

    metrics = None
    for step in range(60):
        i = step % len(cams)
        batch = batchify(i)._replace(images=targets[i][None])
        scene, pstate, metrics = step_fn(
            scene, pstate, batch, hyper, jax.random.PRNGKey(step))

    psnr1 = psnr_now(scene)
    assert np.isfinite(psnr1)
    assert psnr1 > psnr0 + 2.0, f"psnr {psnr0:.2f} -> {psnr1:.2f}"

    # statistics got accumulated
    assert float(pstate.visibility.sum()) > 0
    assert int(pstate.points_in_view.max()) > 0
    assert float(pstate.split_score.max()) > 0
    assert float(metrics.num_visible) > 0
    # inactive capacity slots must stay untouched
    assert float(scene.visible_acc.sum()) == 0  # cleared by scene_step
    inactive = ~np.asarray(scene.active)
    assert np.asarray(pstate.visibility)[inactive].sum() == 0


def test_glo_rows_update_only_batch_image():
    scene, pstate, config, cams, batchify = make_setup()
    rcfg = RasterConfig(backend="dense")
    targets = render_target(scene, config, cams, rcfg)

    hyper = ts.make_hyper(config, DummyTrainCfg, 0.0)
    batch = batchify(1)._replace(images=targets[1][None])
    scene2, _, _ = ts.train_step(
        scene, pstate, batch, hyper, jax.random.PRNGKey(0),
        scene_config=config, raster_config=rcfg, image_size=IMAGE_SIZE,
        ssim_levels=2)
    # glo optimizer stepped only the batch row
    assert int(scene2.glo_opt.steps[1]) == 1
    assert int(scene2.glo_opt.steps[0]) == 0
