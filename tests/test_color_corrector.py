"""Bilateral color corrector: identity init, gradient flow, trainer wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from splat_trainer_tpu.color_corrector.bilateral import (
    color_affine_transform, identity_grids, slice_grid, total_variation_loss,
)


def test_identity_grid_is_identity():
    grids = identity_grids(2, 8, 8, 4)
    img = jax.random.uniform(jax.random.PRNGKey(0), (16, 16, 3))
    affine = slice_grid(grids[0], img)
    out = color_affine_transform(affine, img)
    np.testing.assert_allclose(out, img, atol=1e-5)
    assert float(total_variation_loss(grids)) == 0.0


def test_corrector_fits_color_shift():
    """The grid should learn a global color shift via gradient descent."""
    grids = identity_grids(1, 4, 4, 2)
    img = jax.random.uniform(jax.random.PRNGKey(0), (24, 24, 3)) * 0.5 + 0.2
    target = jnp.clip(img * 1.3 + 0.05, 0, 1)

    def loss(g):
        out = color_affine_transform(slice_grid(g[0], img), img)
        return ((out - target) ** 2).mean()

    g = grids
    for _ in range(200):
        g = g - 0.5 * jax.grad(loss)(g)
    assert float(loss(g)) < float(loss(grids)) * 0.05


def test_trainer_integration():
    """TrainConfig with bilateral corrector trains and updates the grids."""
    import functools

    from splat_trainer_tpu.color_corrector import BilateralCorrectorConfig
    from splat_trainer_tpu.controller.point_state import PointState
    from splat_trainer_tpu.core.types import RasterConfig
    from splat_trainer_tpu.models import mlp_scene as ms
    from splat_trainer_tpu.optim import row_adam_init
    from splat_trainer_tpu.color_corrector.bilateral import identity_grids
    from splat_trainer_tpu.trainer import train_step as ts
    from tests.fixtures import look_at_camera, random_gaussians

    key = jax.random.PRNGKey(0)
    g = random_gaussians(key, 100)
    config = ms.MLPSceneConfig(point_features=8, image_features=8)
    scene = ms.init_scene(jax.random.PRNGKey(1), config, g, 2, capacity=128)
    cc = BilateralCorrectorConfig(grid_width=4, grid_height=4, grid_luma=2)
    grids = identity_grids(2, 4, 4, 2)
    scene = scene.replace(corrector_grids=grids,
                          corrector_opt=row_adam_init(grids.reshape(2, -1)))

    rcfg = RasterConfig(backend="dense", max_instances=1 << 12, chunk_size=16)
    cam = look_at_camera((32, 32))
    target = jnp.clip(ms.render(scene, config, cam, None, rcfg).image, 0, 1)
    # target with a color cast that only the corrector can absorb
    target = jnp.clip(target * 0.7 + 0.1, 0, 1)

    batch = ts.TrainBatch(
        images=target[None], image_idx=jnp.array([0]),
        T_camera_world=cam.T_camera_world[None],
        projection=cam.projection[None],
        near=cam.near_plane[None], far=cam.far_plane[None])

    class Cfg:
        l1_weight, mse_weight, ssim_weight = 0.0, 10.0, 0.0
        color_corrector = cc

    hyper = ts.make_hyper(config, Cfg, 0.0)
    assert hyper["lrs"]["corrector"] > 0

    grids0 = np.asarray(grids)  # snapshot before donation consumes the buffer
    step = jax.jit(functools.partial(
        ts.train_step, scene_config=config, raster_config=rcfg,
        image_size=(32, 32), ssim_levels=2), donate_argnums=(0, 1))
    pstate = PointState.new_zeros(scene.capacity)
    for i in range(5):
        scene, pstate, metrics = step(scene, pstate, batch, hyper,
                                      jax.random.PRNGKey(i))
    # the touched image's grid moved; the other stayed identity
    moved = np.abs(np.asarray(scene.corrector_grids[0]) - grids0[0])
    assert moved.max() > 1e-5
    np.testing.assert_allclose(np.asarray(scene.corrector_grids[1]), grids0[1])
