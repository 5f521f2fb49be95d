"""WandbLogger (fake wandb module) and diagnostics-histogram suite."""

import time
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from splat_trainer_tpu.config import Progress
from splat_trainer_tpu.logger import StateLogger
from splat_trainer_tpu.logger.wandb import WandbLogger


class FakeRun:
    def __init__(self):
        self.logged = []          # (data, step) in delivery order
        self.config = SimpleNamespace(update=lambda *a, **k: None)
        self.finished = False

    def log(self, data, step=None):
        self.logged.append((data, step))

    def finish(self):
        self.finished = True


class FakeWandb:
    Image = staticmethod(lambda img, **k: ("image", img.shape))
    Histogram = staticmethod(lambda np_histogram=None: ("hist", len(np_histogram[0])))
    Object3D = staticmethod(lambda arr: ("cloud", arr.shape))

    class Table:
        def __init__(self, columns):
            self.columns, self.rows = columns, []

        def add_data(self, *row):
            self.rows.append(row)


def test_wandb_logger_step_ordered_delivery():
    run = FakeRun()
    logger = WandbLogger(run=run, wandb_module=FakeWandb())

    logger.step(Progress(step=10, total_steps=100))
    # slow encode at step 10 (image), then fast scalars at step 20
    logger.log_image("img", np.random.rand(8, 8, 3))
    logger.step(Progress(step=20, total_steps=100))
    logger.log_value("loss", 0.5)
    logger.log_values("m", dict(a=1, b=jnp.float32(2.0)))
    logger.log_histogram("h", np.random.randn(100))
    logger.log_cloud("c", np.random.rand(5, 3), np.random.rand(5, 3))
    logger.log_evaluations("e", {"f.png": dict(psnr=30.0)})
    logger.log_json("j", {"k": 1})
    logger.close()

    assert run.finished
    steps = [s for _, s in run.logged]
    assert steps == sorted(steps), steps  # never delivered out of order
    flat = {}
    for data, _ in run.logged:
        flat.update(data)
    assert flat["loss"] == 0.5 and flat["m/a"] == 1 and flat["m/b"] == 2.0
    assert flat["img"][0] == "image" and flat["h"][0] == "hist"
    assert flat["c"][0] == "cloud" and flat["e"].rows == [("f.png", 30.0)]


def test_diagnostics_histograms():
    from splat_trainer_tpu.controller.point_state import PointState
    from splat_trainer_tpu.debug.diagnostics import (
        log_checkpoint_diagnostics, log_gradient_histograms,
    )
    from splat_trainer_tpu.models.mlp_scene import MLPSceneConfig, init_scene
    from tests.fixtures import random_gaussians

    key = jax.random.PRNGKey(0)
    cfg = MLPSceneConfig(point_features=4, image_features=4)
    scene = init_scene(key, cfg, random_gaussians(key, 50, feature_dim=4),
                       num_images=2, capacity=64)
    pstate = PointState.new_zeros(scene.capacity).replace(
        prune_cost=jnp.abs(jax.random.normal(key, (scene.capacity,))),
        split_score=jnp.abs(jax.random.normal(key, (scene.capacity,))),
        max_scale_px=jnp.ones((scene.capacity,)) * 3.0,
        visibility=jnp.ones((scene.capacity,)))

    class Recorder(StateLogger):
        def __init__(self):
            super().__init__()
            self.hists = {}

        def log_histogram(self, name, values, step=None):
            self.hists[name] = np.asarray(values)

    logger = Recorder()
    log_checkpoint_diagnostics(logger, scene, pstate)
    for tag in ("params/opacity", "params/stable_rank", "params/aspect",
                "rendering/log10_prune_cost", "rendering/log10_split_score",
                "rendering/log10_visibility"):
        assert tag in logger.hists, (tag, sorted(logger.hists))
    # optimizer moments are all-zero at init, so log10 panels are skipped
    assert not any(k.startswith("optimizer/") for k in logger.hists)
    assert logger.hists["params/opacity"].shape[0] == 50  # active only

    grads = {k: jnp.ones_like(v) for k, v in scene.points.items()}
    vis = jnp.where(jnp.arange(scene.capacity) < 50, 1.0, 0.0)
    log_gradient_histograms(logger, grads, vis)
    assert "log10_grad/position" in logger.hists
    assert "log10_norm_grad/position" in logger.hists
