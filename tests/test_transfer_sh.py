"""SH export distillation: rendered-visibility weighting + round-trip
(export -> render via ops/sh -> compare against the MLP render)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splat_trainer_tpu.core.types import RasterConfig
from splat_trainer_tpu.models import color_model as cm
from splat_trainer_tpu.models import mlp_scene as ms
from splat_trainer_tpu.models.transfer_sh import scene_to_sh_gaussians
from splat_trainer_tpu.ops import renderer
from splat_trainer_tpu.ops.sh import evaluate_sh_at


@pytest.fixture(scope="module")
def trained_ish():
    """A small scene with a few training steps so colors are non-degenerate."""
    from splat_trainer_tpu.controller.point_state import PointState
    from splat_trainer_tpu.data.synthetic import SyntheticDataset
    from splat_trainer_tpu.trainer.config import TrainConfig
    from splat_trainer_tpu.trainer.init import CloudInitConfig, get_initial_gaussians
    from splat_trainer_tpu.trainer.train_step import TrainBatch, make_hyper, train_step
    import functools

    ds = SyntheticDataset(num_images=8, image_size=(48, 48), num_points=200)
    cfg = TrainConfig(
        scene=ms.MLPSceneConfig(point_features=8, image_features=8),
        cloud_init=CloudInitConfig(initial_points=256, limit_points=128,
                                   num_neighbors=3, min_view_overlap=2,
                                   clamp_near=0.1),
        target_points=512, raster_backend="dense",
        max_instances=1 << 14, chunk_size=16)
    key = jax.random.PRNGKey(0)
    initial = get_initial_gaussians(cfg.cloud_init, ds.camera_table,
                                    ds.pointcloud(), key)
    scene = ms.init_scene(jax.random.PRNGKey(1), cfg.scene, initial, 8,
                          capacity=cfg.capacity)
    pstate = PointState.new_zeros(scene.capacity)
    step = jax.jit(functools.partial(
        train_step, scene_config=cfg.scene, raster_config=cfg.raster_config(),
        image_size=ds.camera_table.image_size, ssim_levels=2),
        donate_argnums=(0, 1))
    hyper = make_hyper(cfg.scene, cfg, 0.0)
    for i in range(30):
        v = ds.loader([i % 6])[0]
        t, proj, near, far = ds.camera_table.gather_batch(jnp.asarray([v.image_idx]))
        batch = TrainBatch(images=jnp.asarray(v.image)[None],
                           image_idx=jnp.asarray([v.image_idx]),
                           T_camera_world=t, projection=proj, near=near, far=far)
        scene, pstate, _ = step(scene, pstate, batch, hyper, key)
    return ds, cfg, scene


def test_visibility_weighted_export_roundtrip(trained_ish):
    ds, cfg, scene = trained_ish
    rcfg = cfg.raster_config()
    g = scene_to_sh_gaussians(scene, cfg.scene, ds.camera_table, sh_degree=2,
                              raster_config=rcfg, active_only=True)
    n = g.position.shape[0]
    assert n == int(np.asarray(scene.active).sum())
    assert g.feature.shape == (n, 3, 9)
    assert np.isfinite(np.asarray(g.feature)).all()

    # round trip: render the exported SH gaussians and the MLP scene from the
    # same camera; the SH approximation should track the MLP render closely
    cam = ds.camera_table.camera_params(1)
    mlp_render = ms.render(scene, cfg.scene, cam, jnp.int32(1), rcfg)

    dirs_colors = evaluate_sh_at(
        g.feature, g.position, cam.camera_position, degree=2)
    sh_colors = jnp.clip(dirs_colors, 0.0, 1.0)
    sh_render = renderer.render_gaussians(g, sh_colors, cam, rcfg)

    a = np.asarray(mlp_render.image)
    b = np.asarray(sh_render.image)
    mse = float(((a - b) ** 2).mean())
    psnr = 10 * np.log10(1.0 / max(mse, 1e-10))
    assert psnr > 25.0, f"SH round-trip degraded: psnr={psnr:.2f}"


def test_occluded_points_get_zero_weight(trained_ish):
    """A point that renders with zero visibility everywhere must fall back to
    the ridge prior (near-zero SH), not confident garbage."""
    ds, cfg, scene = trained_ish
    # bury one active point far outside every frustum
    pos = scene.points["position"]
    idx = int(np.asarray(scene.active).nonzero()[0][0])
    scene2 = scene.replace(points={**scene.points,
                                   "position": pos.at[idx].set(jnp.array([0., 0., 1e4]))})
    g = scene_to_sh_gaussians(scene2, cfg.scene, ds.camera_table, sh_degree=2,
                              raster_config=cfg.raster_config(),
                              active_only=True)
    # the buried point keeps its slot order among active points
    active_idx = np.asarray(scene2.active).nonzero()[0]
    row = int(np.where(active_idx == idx)[0][0])
    assert np.abs(np.asarray(g.feature[row])).max() < 1e-3
