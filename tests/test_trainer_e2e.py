"""End-to-end Trainer integration: init -> train -> eval -> checkpoint ->
resume on a tiny synthetic scene (dense backend, CPU). This is the
BASELINE.md milestone-1 equivalent."""

import os

import numpy as np
import pytest

from splat_trainer_tpu.controller import DisabledConfig, TargetConfig
from splat_trainer_tpu.data.synthetic import SyntheticDataset
from splat_trainer_tpu.logger import NullLogger
from splat_trainer_tpu.models.mlp_scene import MLPSceneConfig
from splat_trainer_tpu.trainer.config import TrainConfig
from splat_trainer_tpu.trainer.init import CloudInitConfig
from splat_trainer_tpu.trainer.trainer import Trainer
from splat_trainer_tpu.trainer.view_selection import RandomSamplerConfig


@pytest.fixture(scope="module")
def dataset():
    return SyntheticDataset(num_images=8, image_size=(48, 48), num_points=200)


def make_config(tmp_path, total_steps=60, controller=None, **kw):
    scene = MLPSceneConfig(point_features=8, image_features=8)
    defaults = dict(
        scene=scene,
        controller=controller or DisabledConfig(),
        view_selection=RandomSamplerConfig(batch_size=1),
        cloud_init=CloudInitConfig(initial_points=256, limit_points=128,
                                   num_neighbors=3, min_view_overlap=2,
                                   clamp_near=0.1),
        total_steps=total_steps,
        eval_steps=total_steps // 2,
        log_interval=10,
        target_points=512,
        raster_backend="dense",
        max_instances=1 << 14,
        chunk_size=16,
        save_output=True,
        log_images=False,
        max_ssim_regression=1.0,  # tiny runs are noisy
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def test_trainer_end_to_end(dataset, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    os.environ["TQDM_DISABLE"] = "1"

    config = make_config(tmp_path)
    trainer = Trainer.initialize(config, dataset, NullLogger())
    n0 = int(trainer.scene.active.sum())
    assert n0 > 0

    metrics = trainer.train()
    assert "train_psnr" in metrics and np.isfinite(metrics["train_psnr"])
    assert len(trainer.evaluation_log) >= 2
    psnrs = [e["train_psnr"] for e in trainer.evaluation_log]
    assert psnrs[-1] > psnrs[0], psnrs

    # outputs written
    assert (tmp_path / "cameras.json").exists()
    assert (tmp_path / "checkpoint").exists()
    trainer.close()


def test_checkpoint_resume(dataset, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    os.environ["TQDM_DISABLE"] = "1"

    config = make_config(tmp_path, total_steps=30, save_checkpoints=True)
    trainer = Trainer.initialize(config, dataset, NullLogger())
    trainer.train()
    step0 = trainer.step
    pos0 = np.asarray(trainer.scene.points["position"])

    from splat_trainer_tpu.trainer.checkpoint import (
        find_latest_checkpoint, load_checkpoint)
    path = find_latest_checkpoint(tmp_path)
    # fresh templates with matching shapes
    t2 = Trainer.initialize(config, dataset, NullLogger())
    state = load_checkpoint(path, t2.scene, t2.pstate)
    resumed = Trainer.from_state_dict(config, dataset, NullLogger(), state)

    assert resumed.step == step0
    np.testing.assert_allclose(
        np.asarray(resumed.scene.points["position"]), pos0)
    # resumed trainer can keep rendering
    ev = resumed.evaluate_image(dataset.val()[0])
    assert np.isfinite(ev.psnr)


def test_trainer_with_target_controller(dataset, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    os.environ["TQDM_DISABLE"] = "1"

    from splat_trainer_tpu.config import Constant
    config = make_config(
        tmp_path, total_steps=80,
        controller=TargetConfig(densify_prune_interval=Constant(20),
                                min_views=1),
        target_points=400, save_output=False)
    trainer = Trainer.initialize(config, dataset, NullLogger())
    n0 = int(trainer.scene.active.sum())
    trainer.train()
    n1 = int(trainer.scene.active.sum())
    # densification ran and grew the cloud toward the target
    assert "densify" in trainer.logger
    assert n1 != n0
    trainer.close()


def test_batch_summary(dataset, tmp_path, monkeypatch):
    """debug.batch_summary: one backward per view, tabulated stats
    (reference trainer/debug.py:30)."""
    monkeypatch.chdir(tmp_path)
    config = make_config(tmp_path, total_steps=4, save_output=False)
    trainer = Trainer.initialize(config, dataset, NullLogger())
    trainer.dataset.load_images()

    from splat_trainer_tpu.debug import batch_summary
    df = batch_summary(trainer, limit=3)
    assert len(df) == 3
    assert {"psnr", "num_visible", "grad_position"} <= set(df.columns)
    assert (df["num_visible"] > 0).all()
    trainer.close()


def test_trainer_batched_steps(dataset, tmp_path, monkeypatch):
    """Single-device batch_size=4: one optimizer step per 4 accumulated
    images (reference semantics trainer.py:500-514 — loss.backward() per
    image, one step per batch). The DP tests shard B>1 over a mesh
    (test_multichip.py); this covers the unrolled single-device path the
    bench.py batch4 probe and the ab_batch4 quality arm measure."""
    monkeypatch.chdir(tmp_path)
    os.environ["TQDM_DISABLE"] = "1"

    config = make_config(
        tmp_path, total_steps=30,
        view_selection=RandomSamplerConfig(batch_size=4),
        save_output=False)
    trainer = Trainer.initialize(config, dataset, NullLogger())
    metrics = trainer.train()
    assert np.isfinite(metrics["train_psnr"])
    # 30 optimizer steps x 4 images must improve over the step-0 eval
    first = trainer.evaluation_log[0]["train_psnr"]
    assert metrics["train_psnr"] > first + 3.0, (first, metrics)
    trainer.close()
