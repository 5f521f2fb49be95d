"""Data-parallel training on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splat_trainer_tpu.controller.point_state import PointState
from splat_trainer_tpu.core.types import RasterConfig
from splat_trainer_tpu.data.synthetic import SyntheticDataset
from splat_trainer_tpu.models import mlp_scene as ms
from splat_trainer_tpu.parallel import make_camera_mesh, make_dp_train_step
from splat_trainer_tpu.trainer.train_step import (
    TrainBatch, make_hyper, train_step,
)


class DummyTrainCfg:
    l1_weight = 0.0
    mse_weight = 10.0
    ssim_weight = 1.0


IMAGE_SIZE = (32, 32)


@pytest.fixture(scope="module")
def setup():
    dataset = SyntheticDataset(num_images=16, image_size=IMAGE_SIZE,
                               num_points=150, split_every=0)
    config = ms.MLPSceneConfig(point_features=8, image_features=8)
    key = jax.random.PRNGKey(0)
    scene = ms.init_scene(key, config, dataset.gaussians, 16, capacity=256)
    return dataset, config, scene


def make_batch(dataset, idx):
    views = dataset.loader(idx)
    table = dataset.camera_table
    i = jnp.asarray([v.image_idx for v in views])
    t, proj, near, far = table.gather_batch(i)
    return TrainBatch(images=jnp.stack([jnp.asarray(v.image) for v in views]),
                      image_idx=i, T_camera_world=t, projection=proj,
                      near=near, far=far)


def test_dp_matches_single_device(setup):
    dataset, config, scene = setup
    n_dev = len(jax.devices())
    assert n_dev == 8

    rcfg = RasterConfig(backend="dense", max_instances=1 << 13, chunk_size=16)
    mesh = make_camera_mesh()
    dp_step, batch_sharding, rep = make_dp_train_step(
        mesh, scene_config=config, raster_config=rcfg,
        image_size=IMAGE_SIZE, ssim_levels=2)

    batch = make_batch(dataset, np.arange(8))
    hyper = make_hyper(config, DummyTrainCfg, 0.0)
    pstate = PointState.new_zeros(scene.capacity)

    # reference first: dp_step donates its inputs
    scene_sd, pstate_sd, metrics_sd = train_step(
        jax.tree_util.tree_map(jnp.copy, scene),
        PointState.new_zeros(scene.capacity), batch, hyper,
        jax.random.PRNGKey(0), scene_config=config, raster_config=rcfg,
        image_size=IMAGE_SIZE, ssim_levels=2)

    sharded_batch = jax.device_put(batch, batch_sharding)
    scene_dp, pstate_dp, metrics_dp = dp_step(
        jax.device_put(jax.tree_util.tree_map(jnp.copy, scene), rep),
        jax.device_put(pstate, rep),
        sharded_batch, hyper, jax.random.PRNGKey(0))

    np.testing.assert_allclose(
        np.asarray(scene_dp.points["position"]),
        np.asarray(scene_sd.points["position"]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pstate_dp.visibility), np.asarray(pstate_sd.visibility),
        atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        float(metrics_dp.psnr), float(metrics_sd.psnr), atol=1e-2)


def test_points_parallel_matches_single_device(setup):
    """Point-sharded step (all_to_all transpose) == single-device step:
    params, per-point statistics, and densify heuristics all agree."""
    from splat_trainer_tpu.parallel import make_points_mesh, make_pp_train_step

    dataset, config, scene = setup
    rcfg = RasterConfig(backend="dense", max_instances=1 << 13, chunk_size=16)
    mesh = make_points_mesh()
    pp_step, batch_sh, scene_sh, pstate_sh = make_pp_train_step(
        mesh, scene, scene_config=config, raster_config=rcfg,
        image_size=IMAGE_SIZE, ssim_levels=2)

    batch = make_batch(dataset, np.arange(8))
    hyper = make_hyper(config, DummyTrainCfg, 0.0)

    scene_sd, pstate_sd, metrics_sd = train_step(
        jax.tree_util.tree_map(jnp.copy, scene),
        PointState.new_zeros(scene.capacity), batch, hyper,
        jax.random.PRNGKey(0), scene_config=config, raster_config=rcfg,
        image_size=IMAGE_SIZE, ssim_levels=2)

    scene_pp, pstate_pp, metrics_pp = pp_step(
        jax.device_put(jax.tree_util.tree_map(jnp.copy, scene), scene_sh),
        jax.device_put(PointState.new_zeros(scene.capacity), pstate_sh),
        jax.device_put(batch, batch_sh), hyper, jax.random.PRNGKey(0))

    np.testing.assert_allclose(
        np.asarray(scene_pp.points["position"]),
        np.asarray(scene_sd.points["position"]), atol=1e-5)
    # color-MLP grads arrive via psum (pp) vs a sequential per-camera sum
    # (single device); the differing reduction order is amplified by Adam's
    # rsqrt on the very first step — tolerance reflects fp noise, not routing
    for a, b in zip(jax.tree_util.tree_leaves(scene_pp.color_params),
                    jax.tree_util.tree_leaves(scene_sd.color_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(pstate_pp.visibility), np.asarray(pstate_sd.visibility),
        atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(pstate_pp.split_score), np.asarray(pstate_sd.split_score),
        atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(
        float(metrics_pp.psnr), float(metrics_sd.psnr), atol=1e-2)
    # memory claim: every capacity-shaped leaf is physically 1/8 per device
    shard = scene_pp.points["position"].addressable_shards[0]
    assert shard.data.shape[0] == scene.capacity // 8


def test_points_parallel_subbatch_matches_single_device(setup):
    """B = 2 * mesh: each chip composites two cameras; still must match the
    single-device 16-image batch step."""
    from splat_trainer_tpu.parallel import make_points_mesh, make_pp_train_step

    dataset, config, scene = setup
    rcfg = RasterConfig(backend="dense", max_instances=1 << 13, chunk_size=16)
    mesh = make_points_mesh()
    pp_step, batch_sh, scene_sh, pstate_sh = make_pp_train_step(
        mesh, scene, scene_config=config, raster_config=rcfg,
        image_size=IMAGE_SIZE, ssim_levels=2)

    batch = make_batch(dataset, np.arange(16))
    hyper = make_hyper(config, DummyTrainCfg, 0.0)

    scene_sd, pstate_sd, metrics_sd = train_step(
        jax.tree_util.tree_map(jnp.copy, scene),
        PointState.new_zeros(scene.capacity), batch, hyper,
        jax.random.PRNGKey(0), scene_config=config, raster_config=rcfg,
        image_size=IMAGE_SIZE, ssim_levels=2)

    scene_pp, pstate_pp, metrics_pp = pp_step(
        jax.device_put(jax.tree_util.tree_map(jnp.copy, scene), scene_sh),
        jax.device_put(PointState.new_zeros(scene.capacity), pstate_sh),
        jax.device_put(batch, batch_sh), hyper, jax.random.PRNGKey(0))

    np.testing.assert_allclose(
        np.asarray(scene_pp.points["position"]),
        np.asarray(scene_sd.points["position"]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pstate_pp.visibility), np.asarray(pstate_sd.visibility),
        atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        float(metrics_pp.psnr), float(metrics_sd.psnr), atol=1e-2)


def test_dp_multiple_steps_improve(setup):
    dataset, config, scene = setup
    rcfg = RasterConfig(backend="dense", max_instances=1 << 13, chunk_size=16)
    mesh = make_camera_mesh()
    dp_step, batch_sharding, rep = make_dp_train_step(
        mesh, scene_config=config, raster_config=rcfg,
        image_size=IMAGE_SIZE, ssim_levels=2)

    hyper = make_hyper(config, DummyTrainCfg, 0.0)
    hyper["reg"] = {k: 0.0 for k in hyper["reg"]}
    pstate = PointState.new_zeros(scene.capacity)
    # explicit copy: device_put to the same device can alias the fixture's
    # buffers, and dp_step donates its inputs — donation must not eat the
    # module-scoped fixture
    scene = jax.device_put(jax.tree_util.tree_map(jnp.copy, scene), rep)

    first = last = None
    for step in range(10):
        idx = np.random.RandomState(step).choice(16, 8, replace=False)
        batch = jax.device_put(make_batch(dataset, idx), batch_sharding)
        scene, pstate, metrics = dp_step(scene, pstate, batch, hyper,
                                         jax.random.PRNGKey(step))
        last = float(metrics.mse)
        if first is None:
            first = last
    assert last < first, (first, last)


def _assert_replicated(tree, what: str):
    """Every device's shard of a replicated array must be bitwise equal."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(leaf, "addressable_shards"):
            continue
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(
                shards[0], s,
                err_msg=f"{what}{jax.tree_util.keystr(path)} diverged")


@pytest.mark.parametrize("batch_size", [8, 16])
def test_trainer_dp_path(tmp_path, monkeypatch, batch_size):
    """The Trainer's own dp route: sub-batched camera shards, densify on
    replicated state with bitwise-identical results on every chip."""
    import os
    from splat_trainer_tpu.config import Constant
    from splat_trainer_tpu.controller import TargetConfig
    from splat_trainer_tpu.logger import NullLogger
    from splat_trainer_tpu.trainer.config import TrainConfig
    from splat_trainer_tpu.trainer.init import CloudInitConfig
    from splat_trainer_tpu.trainer.trainer import Trainer
    from splat_trainer_tpu.trainer.view_selection import RandomSamplerConfig

    monkeypatch.chdir(tmp_path)
    os.environ["TQDM_DISABLE"] = "1"
    dataset = SyntheticDataset(num_images=16, image_size=IMAGE_SIZE,
                               num_points=150, split_every=8)
    config = TrainConfig(
        dp=True,
        scene=ms.MLPSceneConfig(point_features=8, image_features=8),
        controller=TargetConfig(densify_prune_interval=Constant(8),
                                min_views=1),
        view_selection=RandomSamplerConfig(batch_size=batch_size),
        cloud_init=CloudInitConfig(initial_points=200, limit_points=100,
                                   num_neighbors=3, min_view_overlap=2,
                                   clamp_near=0.1),
        total_steps=32, eval_steps=16, log_interval=8,
        target_points=400, raster_backend="dense",
        max_instances=1 << 13, chunk_size=16,
        save_output=False, log_images=False, max_ssim_regression=1.0)

    trainer = Trainer.initialize(config, dataset, NullLogger())
    assert trainer.mesh is not None and trainer.mesh.size == 8

    metrics = trainer.train()
    assert np.isfinite(metrics["train_psnr"])
    # at least one densify fired on the mesh
    assert "densify" in trainer.logger

    _assert_replicated(trainer.scene.points, "scene.points")
    _assert_replicated(trainer.scene.active, "scene.active")
    _assert_replicated(trainer.pstate, "pstate")
    trainer.close()


def test_trainer_pp_path(tmp_path, monkeypatch):
    """The Trainer's point-sharded route: capacity-sharded state end-to-end
    through train/densify/eval/checkpoint."""
    import os
    from splat_trainer_tpu.config import Constant
    from splat_trainer_tpu.controller import TargetConfig
    from splat_trainer_tpu.logger import NullLogger
    from splat_trainer_tpu.trainer.config import TrainConfig
    from splat_trainer_tpu.trainer.init import CloudInitConfig
    from splat_trainer_tpu.trainer.trainer import Trainer
    from splat_trainer_tpu.trainer.view_selection import RandomSamplerConfig

    monkeypatch.chdir(tmp_path)
    os.environ["TQDM_DISABLE"] = "1"
    dataset = SyntheticDataset(num_images=16, image_size=IMAGE_SIZE,
                               num_points=150, split_every=8)
    config = TrainConfig(
        pp=True,
        scene=ms.MLPSceneConfig(point_features=8, image_features=8),
        controller=TargetConfig(densify_prune_interval=Constant(8),
                                min_views=1),
        view_selection=RandomSamplerConfig(batch_size=8),
        cloud_init=CloudInitConfig(initial_points=200, limit_points=100,
                                   num_neighbors=3, min_view_overlap=2,
                                   clamp_near=0.1),
        total_steps=24, eval_steps=12, log_interval=8,
        target_points=400, raster_backend="dense",
        max_instances=1 << 13, chunk_size=16,
        save_output=False, log_images=False, max_ssim_regression=1.0)

    trainer = Trainer.initialize(config, dataset, NullLogger())
    assert trainer.mesh is not None and trainer.mesh.size == 8

    metrics = trainer.train()
    assert np.isfinite(metrics["train_psnr"])
    assert "densify" in trainer.logger

    # the scene really is point-sharded: 1/8 of capacity per device
    pos = trainer.scene.points["position"]
    assert pos.addressable_shards[0].data.shape[0] == trainer.scene.capacity // 8

    # shard-LOCAL densify (VERDICT r1 item 5): interleaved init + occupancy-
    # proportional targets keep every shard populated, and the controller's
    # output state is still point-sharded (no replicated capacity-shaped
    # result from a global-jit densify)
    active = trainer.scene.active
    per_shard = [int(np.asarray(s.data).sum())
                 for s in active.addressable_shards]
    assert len(per_shard) == 8 and min(per_shard) > 0, per_shard
    from jax.sharding import PartitionSpec as P
    assert active.sharding.spec == P("points")
    trainer.close()


def test_trainer_dp_rejects_bad_batch():
    from splat_trainer_tpu.logger import NullLogger
    from splat_trainer_tpu.trainer.config import TrainConfig
    from splat_trainer_tpu.trainer.init import CloudInitConfig
    from splat_trainer_tpu.trainer.trainer import Trainer
    from splat_trainer_tpu.trainer.view_selection import RandomSamplerConfig

    dataset = SyntheticDataset(num_images=16, image_size=IMAGE_SIZE,
                               num_points=50, split_every=8)
    config = TrainConfig(
        dp=True, view_selection=RandomSamplerConfig(batch_size=3),
        scene=ms.MLPSceneConfig(point_features=8, image_features=8),
        cloud_init=CloudInitConfig(initial_points=64, limit_points=32,
                                   num_neighbors=3, min_view_overlap=2,
                                   clamp_near=0.1),
        target_points=128, raster_backend="dense", save_output=False)
    with pytest.raises(ValueError, match="batch_size"):
        Trainer.initialize(config, dataset, NullLogger())


def test_sharded_giant_render_matches_full(setup):
    """image_parallel: one frame rendered as 8 horizontal slabs across the
    mesh equals the single full render (pixel decomposition is exact)."""
    from splat_trainer_tpu.parallel.image_parallel import (
        make_slab_mesh, make_sharded_render,
    )

    dataset, config, scene = setup
    rcfg = RasterConfig(backend="dense", max_instances=1 << 13, chunk_size=16)
    w, h = 64, 48
    table = dataset.camera_table
    from splat_trainer_tpu.core.types import CameraParams
    cams = table.cameras
    sx, sy = w / table.image_size[0], h / table.image_size[1]
    camera = CameraParams(
        T_camera_world=cams.camera_t_world[0],
        projection=cams.intrinsics[0] * jnp.asarray([sx, sy, sx, sy]),
        near_plane=cams.depth_range[0, 0], far_plane=cams.depth_range[0, 1],
        image_size=(w, h))

    mesh = make_slab_mesh()
    sharded = make_sharded_render(
        mesh, scene_config=config, raster_config=rcfg, image_size=(w, h))
    img_sharded = np.asarray(sharded(scene, camera))

    from splat_trainer_tpu.models import mlp_scene as ms
    img_full = np.asarray(ms.render(scene, config, camera, image_idx=None,
                                    raster_config=rcfg).image)
    assert img_sharded.shape == img_full.shape == (h, w, 3)
    # slabs see different subsets of the (depth-sorted) gaussian array, so
    # the oracle's vectorized reductions group differently — fp association
    # noise only; anything structural (e.g. the Jacobian frustum clamp
    # using the slab height instead of clip_size) shows up at 1e-1 scale
    np.testing.assert_allclose(img_sharded, img_full, atol=2e-3)
    assert float(np.abs(img_sharded - img_full).mean()) < 1e-4


def test_dp_pp_2d_mesh_matches_single_device(setup):
    """2D cameras x points mesh (VERDICT r1 item 9): batch split over 2
    camera rows x points sharded 4-way == single-device step."""
    from splat_trainer_tpu.parallel.points_parallel import (
        make_2d_mesh, make_dp_pp_train_step,
    )

    dataset, config, scene = setup
    rcfg = RasterConfig(backend="dense", max_instances=1 << 13, chunk_size=16)
    mesh = make_2d_mesh(2, 4)
    step2d, batch_sh, scene_sh, pstate_sh = make_dp_pp_train_step(
        mesh, scene, scene_config=config, raster_config=rcfg,
        image_size=IMAGE_SIZE, ssim_levels=2)

    batch = make_batch(dataset, np.arange(8))
    hyper = make_hyper(config, DummyTrainCfg, 0.0)

    scene_sd, pstate_sd, metrics_sd = train_step(
        jax.tree_util.tree_map(jnp.copy, scene),
        PointState.new_zeros(scene.capacity), batch, hyper,
        jax.random.PRNGKey(0), scene_config=config, raster_config=rcfg,
        image_size=IMAGE_SIZE, ssim_levels=2)

    scene_2d, pstate_2d, metrics_2d = step2d(
        jax.device_put(jax.tree_util.tree_map(jnp.copy, scene), scene_sh),
        jax.device_put(PointState.new_zeros(scene.capacity), pstate_sh),
        jax.device_put(batch, batch_sh), hyper, jax.random.PRNGKey(0))

    np.testing.assert_allclose(
        np.asarray(scene_2d.points["position"]),
        np.asarray(scene_sd.points["position"]), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(scene_2d.color_params),
                    jax.tree_util.tree_leaves(scene_sd.color_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(pstate_2d.visibility), np.asarray(pstate_sd.visibility),
        atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        float(metrics_2d.psnr), float(metrics_sd.psnr), atol=1e-2)
    # points sharded 4-way within each camera row: 1/4 capacity per shard,
    # replicated across the 2 rows
    shard = scene_2d.points["position"].addressable_shards[0]
    assert shard.data.shape[0] == scene.capacity // 4
